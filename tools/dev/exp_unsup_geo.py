"""Unsupervised-regime geometry-consistency ablation (r3 quality item).

The r2 tier-B (photometric-only, the reference's regime) result was
the weakest measured number: t_err 62.4 % with eval scale 0.09 —
per-snippet depth-scale drift dominates. SC-SfMLearner's
geometry-consistency loss (losses.geometry_consistency_loss) exists
to lock adjacent-frame depth scales together; this harness trains the
SAME unsupervised regime as train_e2e tier B with geo weight 0 vs W
and compares snippet ATE / t_err / trajectory-scale stability.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_unsup_geo.py [STEPS] [OUT]
       [weights,comma] [masking] [warmup]" <t> 1
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, "/root/repo")

import numpy as np

from davo_tpu.config import Config, TrainConfig
from davo_tpu.data.snippets import MultiSourceDataset
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.eval.metrics import align_trajectory_scale
from davo_tpu.eval.runner import (
    assemble_trajectory,
    evaluate_sequence,
    make_pose_apply_fn,
    predict_sequence,
)
from davo_tpu.models import presets
from davo_tpu.train.loop import fit

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/unsup_geo.json"
# Tokens: float geo weight + optional suffix letters:
#   n = SC-SfM depth normalization (TrainConfig.depth_norm)
#   f = davo-fast serving knobs (8-ch corr projection, search=3) —
#       the unsupervised-tier half of VERDICT r2 weak #6's gate
_TOK = sys.argv[3].split(",") if len(sys.argv) > 3 else ["0.0", "0.5", "0.5n"]


def _parse(t):
    suf = ""
    while t and t[-1] in "nf":
        suf += t[-1]
        t = t[:-1]
    return float(t), "n" in suf, "f" in suf


ARMS = [_parse(t) for t in _TOK]
MASKING = sys.argv[4] if len(sys.argv) > 4 else "border"
WARMUP = int(sys.argv[5]) if len(sys.argv) > 5 else 250
EVAL_FRAMES = 1300

base = presets.get("tiny")
H, W = base.model.img_height, base.model.img_width
WORLD_KW = dict(
    height=H, width=W, plane_z=30.0, forward_speed=0.8,
    trajectory="loop", loop_roll=True, texture_mode="procedural",
)
train_worlds = [
    SyntheticSequence(
        n_frames=24, seed=s,
        loop_radius=(30.0, 60.0, 100.0, 160.0)[s % 4], **WORLD_KW,
    )
    for s in range(1, 17)
]
eval_seq = SyntheticSequence(n_frames=EVAL_FRAMES, seed=99, **WORLD_KW)
frames = np.stack([eval_seq.frame(i) for i in range(EVAL_FRAMES)])
segs = np.stack([eval_seq.seg(i) for i in range(EVAL_FRAMES)])
gt = eval_seq.poses

report = {
    "steps": STEPS, "photo_masking": MASKING,
    "depth_warmup_steps": WARMUP, "arms": {},
}

# Resumable: re-runs skip arms already in OUT (tunnel flake guard).
if os.path.exists(OUT):
    with open(OUT) as f:
        prev = json.load(f)
    if (
        prev.get("steps") == STEPS
        and prev.get("photo_masking") == MASKING
        and prev.get("depth_warmup_steps") == WARMUP
    ):
        report["arms"].update(prev.get("arms", {}))

for w, dnorm, fast in ARMS:
    arm_key = str(w) + ("n" if dnorm else "") + ("f" if fast else "")
    if arm_key in report["arms"]:
        print(f"[{arm_key}] done previously, skipping", flush=True)
        continue
    cfg = Config(
        model=(
            dataclasses.replace(
                base.model, costvol_feat_channels=8, flow_search_range=3
            )
            if fast
            else base.model
        ),
        train=TrainConfig(
            batch_size=16, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=STEPS, pose_supervision_weight=0.0,
            smooth_weight=0.1, photo_masking=MASKING,
            depth_warmup_steps=WARMUP, geo_consistency_weight=w,
            depth_norm=dnorm,
            log_every=max(STEPS // 10, 1),
        ),
    )
    ds = MultiSourceDataset(
        train_worlds, batch_size=16, with_seg=True, with_gt=False,
        augment=True, seed=0,
    )
    t0 = time.time()
    model, state, history = fit(
        cfg, ds.batches(steps=STEPS),
        log_fn=lambda s, m, w=arm_key: print(
            f"[geo={w}] step {s}: "
            + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
            flush=True,
        ),
    )
    apply_fn = make_pose_apply_fn(model, state.params, "flow_seg")
    rels = predict_sequence(apply_fn, frames, seg=segs, batch_size=64)
    pred = assemble_trajectory(rels)
    aligned, scale = align_trajectory_scale(gt, pred)
    arm = {
        "train_s": time.time() - t0,
        "train_last": history[-1],
        "eval_scale_aligned": evaluate_sequence(aligned, gt),
        "scale": scale,
    }
    # Per-window scale stability: the drift this loss targets. Fit the
    # lsq scale on each 100-frame window independently; report the
    # coefficient of variation across windows (0 = no drift).
    win_scales = []
    for a in range(0, EVAL_FRAMES - 100, 100):
        _, s_w = align_trajectory_scale(gt[a : a + 100], pred[a : a + 100])
        win_scales.append(s_w)
    ws = np.asarray(win_scales)
    arm["window_scale_cv"] = float(ws.std() / max(abs(ws.mean()), 1e-12))
    report["arms"][arm_key] = arm
    print(f"[geo={arm_key}] {json.dumps(arm, default=float)}", flush=True)
    with open(OUT + ".tmp", "w") as f:
        json.dump(report, f, indent=2, default=float)
        f.write("\n")
    os.replace(OUT + ".tmp", OUT)

for k, a in report["arms"].items():
    e = a["eval_scale_aligned"]
    print(
        f"[{k}] snippet {e['snippet_ate_mean']:.4f} t_err "
        f"{e['t_err_pct']:.1f} scale_cv {a['window_scale_cv']:.3f}",
        flush=True,
    )
print("report ->", OUT, flush=True)
