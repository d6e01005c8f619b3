"""Quality ladder 6: the GEOMETRY-GROUNDED pose head on held-out worlds.

Ladders 4/4b/5 established that the pure conv pose head does not
generalize rotation: held-out pred-vs-GT rot corr ~0 on wander AND
drive worlds (three world classes), rot magnitude regressing to the
training prior, while the overfit micro-test reaches 0.96 — texture
memorization, not motion reading. `pose_head="geo_hybrid"`
(models/geopose.py) solves pose from the predicted flow + depth by
dense IRLS Gauss-Newton (conv head becomes a residual): rotation is
then a geometric functional of the flow field, which is local
matching — the thing that CAN generalize across textures.
Validated exact on GT flow/depth (tests/test_geopose.py).

Arms (protocol == ladder4: tiny preset, 16 train worlds, 2500 steps,
1,300-frame held-out eval world, per-arm JSON, resumable):

  geo_wander       wander worlds (vs ladder4 wander_tiny: t_err 30.5,
                   rot_corr ~0)
  geo_drive        drive worlds (vs ladder5 drive_tiny: 27.4 / ~0)
  geo_wander_long  6000 steps (vs wander_long: 25.1)

Gate: held-out diag_rot_corr — the arm "wins" if corr leaves the
~0 band (> 0.5) regardless of t_err; t_err <= 20 % is the r3 ratchet.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_quality_ladder6.py [OUT]" 21600 3
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
from davo_tpu.data.synthetic import DriveSequence, SyntheticSequence
from davo_tpu.eval.runner import (
    assemble_trajectory,
    evaluate_sequence,
    make_pose_apply_fn,
    predict_sequence,
)
from davo_tpu.models import presets

sys.path.insert(0, os.path.dirname(__file__))
from exp_quality_ladder4 import (  # noqa: E402
    EVAL_FRAMES,
    WANDER_KW,
    mat_to_euler_np,
    rot_angle,
)

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r4_quality_geo.json"
)


def make_world(kind, **kw):
    if kind == "wander":
        return SyntheticSequence(**kw, **WANDER_KW)
    return DriveSequence(**kw)


def run_arm(kind="wander", steps=2500, batch=16, n_worlds=16):
    base = presets.get("tiny")
    mcfg = dataclasses.replace(base.model, pose_head="geo_hybrid")
    H, W = mcfg.img_height, mcfg.img_width
    train_worlds = [
        make_world(kind, n_frames=24, height=H, width=W, seed=s)
        for s in range(1, n_worlds + 1)
    ]
    eval_seq = make_world(
        kind, n_frames=EVAL_FRAMES, height=H, width=W, seed=99
    )
    frames = np.stack([eval_seq.frame(i) for i in range(EVAL_FRAMES)])
    segs = np.stack([eval_seq.seg(i) for i in range(EVAL_FRAMES)])
    gt = np.asarray(eval_seq.poses)

    cfg = Config(
        model=mcfg,
        train=TrainConfig(
            batch_size=batch, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=steps, pose_supervision_weight=100.0,
            rot_weight=10.0, smooth_weight=0.1,
            photo_masking="border", depth_warmup_steps=250,
            grad_clip_norm=10.0,  # geo-head early-phase spikes
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
    apply_fn = make_pose_apply_fn(
        model, state.params, "flow_seg", K=np.asarray(eval_seq.K)
    )
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
    print(
        "  diag: rot-corr {diag_rot_corr:.3f} (rx {diag_corr_rx:.2f} "
        "ry {diag_corr_ry:.2f} rz {diag_corr_rz:.2f}) ratio "
        "{diag_rot_ratio_mean:.3f}".format(**ev),
        flush=True,
    )
    return ev


def main():
    print("devices:", jax.devices(), flush=True)
    if jax.devices()[0].platform != "tpu":
        print("REFUSING: not on TPU", flush=True)
        sys.exit(2)
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)

    def arm(name, fn):
        ddl = os.environ.get("DAVO_ARM_DEADLINE_UTC", "0615")
        if time.strftime("%H%M", time.gmtime()) >= ddl:
            print(f"deadline {ddl}Z passed; skipping arm {name} "
                  "(clean exit keeps the chip claim healthy)",
                  flush=True)
            return
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

    arm("geo_wander", lambda: run_arm("wander"))
    arm("geo_drive", lambda: run_arm("drive"))
    arm("geo_wander_long", lambda: run_arm("wander", steps=6000))
    print("ladder6 ->", OUT, flush=True)


if __name__ == "__main__":
    main()
