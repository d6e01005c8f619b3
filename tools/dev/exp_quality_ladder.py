"""Absolute-quality ladder (r3, VERDICT #3): drive supervised t_err
down from r2's 38 % toward <= 20 % on the 1,300-frame KITTI-scale eval
world, and fix the rotation term (r_err 33 deg/100m; the squared
rotation residual is ~10^4 smaller than translation's so the
historical rot_weight=10 leaves it ~600x under-trained — suspected
root cause of the attention r_err inversion, VERDICT weak #4).

Arms (each: train supervised tier -> full 1,300-frame eval):
  base       rot_weight=10, 2500 steps      (r2 recipe anchor)
  rot100     rot_weight=100
  rot1000    rot_weight=1000
  cap2       rot_weight best-of-above, 2x pose/disp widths
  long       best config, 6000 steps

Resumable: each arm's result lands in the output JSON as it finishes;
re-runs skip completed arms (tunnel-death protection).

Usage: tools/dev/tpu_run.sh "tools/dev/exp_quality_ladder.py [OUT]" 7200 2
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

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/results_r3_quality.json"
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


def run_arm(steps, rot_weight, model_overrides=None):
    cfg = Config(
        model=(
            dataclasses.replace(base.model, **model_overrides)
            if model_overrides
            else base.model
        ),
        train=TrainConfig(
            batch_size=16, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=steps, pose_supervision_weight=100.0,
            rot_weight=rot_weight, smooth_weight=0.1,
            photo_masking="border", depth_warmup_steps=250,
            log_every=max(steps // 8, 1),
        ),
    )
    ds = MultiSourceDataset(
        train_worlds, batch_size=16, with_seg=True, with_gt=True,
        augment="color", seed=0,
    )
    from davo_tpu.train.loop import fit

    t0 = time.time()
    model, state, history = fit(
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

    arm("base_rot10", lambda: run_arm(2500, 10.0))
    arm("rot100", lambda: run_arm(2500, 100.0))
    arm("rot1000", lambda: run_arm(2500, 1000.0))
    best_rot = min(
        (res[k]["t_err_pct"] + res[k]["r_err_deg_per_100m"], rw)
        for k, rw in (
            ("base_rot10", 10.0), ("rot100", 100.0), ("rot1000", 1000.0)
        )
    )[1]
    print(f"best rot_weight by t+r: {best_rot}", flush=True)
    res["_best_rot"] = best_rot
    arm(
        "cap2",
        lambda: run_arm(
            2500, best_rot,
            {"pose_channels": (16, 24, 32), "disp_channels": (16, 24, 32)},
        ),
    )
    use_cap = (
        res["cap2"]["t_err_pct"]
        < res[
            {10.0: "base_rot10", 100.0: "rot100", 1000.0: "rot1000"}[best_rot]
        ]["t_err_pct"]
    )
    arm(
        "long6000",
        lambda: run_arm(
            6000, best_rot,
            {"pose_channels": (16, 24, 32), "disp_channels": (16, 24, 32)}
            if use_cap
            else None,
        ),
    )
    print("ladder ->", OUT, flush=True)


if __name__ == "__main__":
    main()
