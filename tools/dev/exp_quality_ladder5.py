"""Absolute-quality ladder, stage 5 (r4): the DRIVE world class.

Ladder 4 re-anchored the quality ratchet on "wander" plane worlds
(within-world varying rotation — rotation finally falsifiable). But a
fronto-parallel plane keeps two structural handicaps the reference's
actual regime (KITTI odometry) does not have:

  * the narrow-FOV planar yaw <-> lateral-translation ambiguity
    (exp_rot_convention: ry corr 0.71 vs rx/rz 0.92-0.96), and
  * near-constant depth, so DispNet never faces real structure.

DriveSequence (data/synthetic.py) is the forward-looking fix: ground
plane + upright billboards at 4-300 m + a direction-only sky field
(photometric signal that moves purely with rotation — yaw is
unambiguous). Exact GT for pose/depth/seg/flow. This ladder measures
the supervised tier on drive worlds; if the wander floor is the
plane-world ambiguity, it should fall here.

Arms (supervised tier, 1,300-frame eval world, protocol == ladder4):

  drive_tiny    tiny preset (48x64), 16 train worlds, 2500 steps
  drive_yawrich same but yaw_amp 0.035 (~2 deg/frame peaks)
  drive_res128  davo-small (128x416), 16 worlds, 2500 steps, B=8
  drive_long    tiny, 6000 steps (convergence check)

Gate (BASELINE.md ratchet): r3 must-pass t_err <= 20 %, r4 target
<= 12 %; diag_rot_corr > 0.9 for the arm to count.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_quality_ladder5.py [OUT]" 21600 3
"""

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
from davo_tpu.data.synthetic import DriveSequence
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
    else "/root/repo/results_r4_quality_drive.json"
)
EVAL_FRAMES = 1300

# Drive-world knobs: yaw_amp is the peak heading RATE (rad/frame) of
# the 3-sinusoid; 0.02 ~ 1.1 deg/frame peaks (KITTI-like urban
# driving), billboards at real depth spread break what little
# ambiguity the ground plane leaves.
DRIVE_KW = dict(
    forward_speed=0.8, yaw_amp=0.02, n_static=12,
)


def mat_to_euler_np(R):
    sy = np.clip(-R[..., 2, 0], -1 + 1e-7, 1 - 1e-7)
    ry = np.arcsin(sy)
    rx = np.arctan2(R[..., 2, 1], R[..., 2, 2])
    rz = np.arctan2(R[..., 1, 0], R[..., 0, 0])
    return np.stack([rx, ry, rz], -1)


def rot_angle(m):
    tr = np.trace(m[..., :3, :3], axis1=-2, axis2=-1)
    return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1.0, 1.0)))


def run_arm(preset, steps=2500, batch=16, n_worlds=16, yaw_amp=None):
    base = presets.get(preset)
    H, W = base.model.img_height, base.model.img_width
    kw = dict(DRIVE_KW)
    if yaw_amp is not None:
        kw["yaw_amp"] = yaw_amp
    train_worlds = [
        DriveSequence(n_frames=24, height=H, width=W, seed=s, **kw)
        for s in range(1, n_worlds + 1)
    ]
    eval_seq = DriveSequence(
        n_frames=EVAL_FRAMES, height=H, width=W, seed=99, **kw
    )
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
    rels = np.asarray(
        predict_sequence(apply_fn, frames, seg=segs, batch_size=64)
    )
    pred = assemble_trajectory(rels)
    ev = evaluate_sequence(pred, gt)
    ev["train_s"] = time.time() - t0

    gt_rels = np.stack(
        [np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(len(gt) - 1)]
    )
    pred_eul = mat_to_euler_np(rels[:, :3, :3])
    gt_eul = mat_to_euler_np(gt_rels[:, :3, :3])
    for k, name in enumerate(("rx", "ry", "rz")):
        ev[f"diag_corr_{name}"] = float(
            np.corrcoef(pred_eul[:, k], gt_eul[:, k])[0, 1]
        )
    pr_ang, gt_ang = rot_angle(rels), rot_angle(gt_rels)
    ev["diag_rot_corr"] = float(np.corrcoef(pr_ang, gt_ang)[0, 1])
    ev["diag_rot_ratio_mean"] = float(np.mean(pr_ang / (gt_ang + 1e-9)))
    ev["diag_norm_corr"] = float(
        np.corrcoef(
            np.linalg.norm(rels[:, :3, 3], axis=1),
            np.linalg.norm(gt_rels[:, :3, 3], axis=1),
        )[0, 1]
    )
    print(
        "  diag: rot-corr {diag_rot_corr:.3f} (rx {diag_corr_rx:.2f} "
        "ry {diag_corr_ry:.2f} rz {diag_corr_rz:.2f}) ratio "
        "{diag_rot_ratio_mean:.3f} |t|corr {diag_norm_corr:.3f}".format(
            **ev
        ),
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
            f"rot_corr {e['diag_rot_corr']:.3f}  ({e['train_s']:.0f}s)",
            flush=True,
        )

    arm("drive_tiny", lambda: run_arm("tiny"))
    arm("drive_yawrich", lambda: run_arm("tiny", yaw_amp=0.035))
    arm("drive_res128", lambda: run_arm("davo-small", batch=8))
    arm("drive_long", lambda: run_arm("tiny", steps=6000))
    print("ladder5 ->", OUT, flush=True)


if __name__ == "__main__":
    main()
