"""Quality ladder 7: flow supervision x the FIXED geometric head (r5).

The r5 GT-flow oracle (results_r5_geo_oracle.json) settled the r4
geo_hybrid blame split: the GN solve is exact on GT flow once
step-clipped (config defaults now iters=6, step_clip=0.5 — the r4
arms ran iters=4 unclipped, which DIVERGES on a few % of drive
pairs), so the open bottleneck is PREDICTED-flow quality. The worlds
render exact GT flow; TrainConfig.flow_supervision_weight trains the
flow net on it directly (losses.flow_supervision_loss).

Arms (protocol == ladder5 drive_tiny: tiny preset, 16 drive worlds,
B=16, 2500 steps, 1,300-frame seed-99 drive eval world; anchors:
conv drive_tiny t_err 27.42 / rot_corr ~0, r4 geo_drive 26.12 / ~0):

  geo_fixed        geo_hybrid, FIXED solver, no flow sup — does the
                   solver fix alone move held-out rotation?
  flowsup_geo      + flow_supervision_weight=1.0 — the decisive arm:
                   with GT-grade flow the geometric head must read
                   rotation (oracle corr 1.000) or the whole
                   flow->pose route is dead
  flowsup_conv     conv head + flow sup 1.0 — does better flow help
                   the learned head via the attention cue alone?
  flowsup_geo_long 6000 steps (convergence axis)

Gate: held-out diag_corr_ry leaves the ±0.05 band (target > 0.5).

Usage: tools/dev/tpu_run.sh "tools/dev/exp_quality_ladder7.py [OUT]" 14400 3
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
from davo_tpu.data.synthetic import DriveSequence
from davo_tpu.eval.runner import (
    assemble_trajectory,
    evaluate_sequence,
    make_pose_apply_fn,
    predict_sequence,
)
from davo_tpu.models import presets

sys.path.insert(0, os.path.dirname(__file__))
from exp_quality_ladder5 import (  # noqa: E402
    DRIVE_KW,
    EVAL_FRAMES,
    mat_to_euler_np,
    rot_angle,
)

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r5_quality_flowsup.json"
)


def run_arm(pose_head="geo_hybrid", flow_sup=0.0, steps=2500, batch=16):
    base = presets.get("tiny")
    mcfg = dataclasses.replace(base.model, pose_head=pose_head)
    H, W = mcfg.img_height, mcfg.img_width
    train_worlds = [
        DriveSequence(n_frames=24, height=H, width=W, seed=s, **DRIVE_KW)
        for s in range(1, 17)
    ]
    from probe_common import cached_eval_world

    frames, segs, gt, eval_K = cached_eval_world(
        "drive", 99, EVAL_FRAMES, H, W, DRIVE_KW
    )

    cfg = Config(
        model=mcfg,
        train=TrainConfig(
            batch_size=batch, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=steps, pose_supervision_weight=100.0,
            rot_weight=10.0, smooth_weight=0.1,
            flow_supervision_weight=flow_sup,
            photo_masking="border", depth_warmup_steps=250,
            grad_clip_norm=10.0 if pose_head == "geo_hybrid" else 0.0,
            # Anchor protocol (r4 tiny arms) is the exact take4
            # gather; pin it against the auto-policy flip.
            warp_gather="take4",
            log_every=max(steps // 8, 1),
        ),
    )
    ds = MultiSourceDataset(
        train_worlds, batch_size=batch, with_seg=True, with_gt=True,
        with_flow=flow_sup > 0.0, augment="color", seed=0,
    )
    from davo_tpu.train.loop import fit

    t0 = time.time()
    model, state, _ = fit(
        cfg, ds.batches(steps=steps),
        log_fn=lambda s, m: print(
            f"  step {s}: total={m.get('total', float('nan')):.4f} "
            f"pose_sup={m.get('pose_sup', float('nan')):.5f} "
            f"flow_sup={m.get('flow_sup', float('nan')):.4f}",
            flush=True,
        ),
    )
    apply_kw = {}
    if pose_head == "geo_hybrid":
        apply_kw["K"] = eval_K
    apply_fn = make_pose_apply_fn(
        model, state.params, "flow_seg", **apply_kw
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
        ddl = os.environ.get("DAVO_ARM_DEADLINE_UTC", "2000")
        if time.strftime("%H%M", time.gmtime()) >= ddl:
            print(f"deadline {ddl}Z passed; skipping arm {name}",
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
            f"rot_corr ry {e['diag_corr_ry']:.3f}  ({e['train_s']:.0f}s)",
            flush=True,
        )

    arm("flowsup_geo", lambda: run_arm("geo_hybrid", 1.0))
    arm("geo_fixed", lambda: run_arm("geo_hybrid", 0.0))
    arm("flowsup_conv", lambda: run_arm("conv", 1.0))
    arm("flowsup_geo_long",
        lambda: run_arm("geo_hybrid", 1.0, steps=6000))
    print("ladder7 ->", OUT, flush=True)


if __name__ == "__main__":
    main()
