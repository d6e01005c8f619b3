"""Absolute-quality ladder, stage 3 (r3): static depth structure.

Stage 2's decomposition proved the pose net regresses the dataset's
rotation PRIOR (pred/GT rotation correlation -0.02 at 48x64 AND at
128x416): a single-plane world makes yaw visually near-unidentifiable
(planar rotation/translation ambiguity). `SyntheticSequence(n_static=
N)` adds fixed textured billboards at varying depths — parallax
between layers is what makes rotation observable.

Arms (train AND eval worlds carry the same structure — this
REDEFINES the quality world class for r4; single-plane numbers are
not comparable):

  static8      tiny recipe, n_static=8
  static8_geo  + rotation diagnostics decide next steps

Usage: tools/dev/tpu_run.sh "tools/dev/exp_quality_ladder3.py [OUT]" 9000 8
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from davo_tpu.config import Config, TrainConfig
from davo_tpu.data.snippets import MultiSourceDataset
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.eval.runner import (
    assemble_trajectory,
    evaluate_sequence,
    make_pose_apply_fn,
    predict_sequence,
)
from davo_tpu.models import presets

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r3_quality3.json"
)
EVAL_FRAMES = 1300


def run_arm(preset, n_static, steps=2500, batch=16, n_worlds=16):
    base = presets.get(preset)
    H, W = base.model.img_height, base.model.img_width
    kw = dict(
        height=H, width=W, plane_z=30.0, forward_speed=0.8,
        trajectory="loop", loop_roll=True, texture_mode="procedural",
        n_static=n_static,
    )
    train_worlds = [
        SyntheticSequence(
            n_frames=24, seed=s,
            loop_radius=(30.0, 60.0, 100.0, 160.0)[s % 4], **kw,
        )
        for s in range(1, n_worlds + 1)
    ]
    eval_seq = SyntheticSequence(n_frames=EVAL_FRAMES, seed=99, **kw)
    frames = np.stack([eval_seq.frame(i) for i in range(EVAL_FRAMES)])
    segs = np.stack([eval_seq.seg(i) for i in range(EVAL_FRAMES)])
    gt = np.asarray(eval_seq.poses)

    cfg = Config(
        model=base.model,
        train=TrainConfig(
            batch_size=batch, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=steps, pose_supervision_weight=100.0,
            rot_weight=10.0, smooth_weight=0.1,
            photo_masking="border", depth_warmup_steps=250,
            log_every=max(steps // 8, 1),
        ),
    )
    ds = MultiSourceDataset(
        train_worlds, batch_size=batch, with_seg=True, with_gt=True,
        augment="color", seed=0,
    )
    from davo_tpu.train.loop import fit

    t0 = time.time()
    model, state, _ = fit(
        cfg, ds.batches(steps=steps),
        log_fn=lambda s, m: print(
            f"  step {s}: total={m.get('total', float('nan')):.4f} "
            f"pose_sup={m.get('pose_sup', float('nan')):.5f}",
            flush=True,
        ),
    )
    apply_fn = make_pose_apply_fn(model, state.params, "flow_seg")
    rels = predict_sequence(apply_fn, frames, seg=segs, batch_size=64)
    pred = assemble_trajectory(rels)
    ev = evaluate_sequence(pred, gt)
    ev["train_s"] = time.time() - t0

    gt_rel_t = np.stack([
        (np.linalg.inv(gt[i]) @ gt[i + 1])[:3, 3]
        for i in range(len(gt) - 1)
    ])
    pr_t = np.asarray(rels)[:, :3, 3]
    gn = np.linalg.norm(gt_rel_t, axis=1)
    pn = np.linalg.norm(pr_t, axis=1)

    def rot_angle(m):
        tr = np.trace(m[:3, :3])
        return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1.0, 1.0)))

    gt_ang = np.array([
        rot_angle(np.linalg.inv(gt[i]) @ gt[i + 1])
        for i in range(len(gt) - 1)
    ])
    pr_ang = np.array([rot_angle(np.asarray(r)) for r in rels])
    ev["diag_norm_corr"] = float(np.corrcoef(pn, gn)[0, 1])
    ev["diag_rot_ratio_mean"] = float(np.mean(pr_ang / (gt_ang + 1e-9)))
    ev["diag_rot_corr"] = float(np.corrcoef(pr_ang, gt_ang)[0, 1])
    print(
        f"  diag: |t| corr {ev['diag_norm_corr']:.3f} rot-ratio "
        f"{ev['diag_rot_ratio_mean']:.3f} rot-corr "
        f"{ev['diag_rot_corr']:.3f}",
        flush=True,
    )
    return ev


def main():
    print("devices:", jax.devices(), flush=True)
    if jax.devices()[0].platform != "tpu":
        print("REFUSING: not on TPU (training-dynamics conclusions "
              "require chip runs — CLAUDE.md)", flush=True)
        sys.exit(2)
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)

    def arm(name, fn):
        if name in res:
            print(f"{name}: done previously "
                  f"(t_err {res[name]['t_err_pct']:.2f})", flush=True)
            return
        print(f"=== arm {name} ===", flush=True)
        res[name] = fn()
        with open(OUT + ".tmp", "w") as f:
            json.dump(res, f, indent=1, default=float)
            f.write("\n")
        os.replace(OUT + ".tmp", OUT)
        e = res[name]
        print(
            f"{name}: t_err {e['t_err_pct']:.2f} %  "
            f"r_err {e['r_err_deg_per_100m']:.2f}  "
            f"snippet {e['snippet_ate_mean']:.3f}  "
            f"ate_full {e['ate_full']:.1f}  ({e['train_s']:.0f}s)",
            flush=True,
        )

    arm("static8", lambda: run_arm("tiny", 8))
    arm("static16", lambda: run_arm("tiny", 16))
    arm("static8_long", lambda: run_arm("tiny", 8, steps=6000))
    print("ladder3 ->", OUT, flush=True)


if __name__ == "__main__":
    main()
