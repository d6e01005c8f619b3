"""Unsupervised regime on the wander world class (VERDICT r3 next-#7).

r3 closed the snippet-level gap (unsup geo=0.5 at 1.05x supervised
snippet ATE) but long-horizon rotation still trailed badly (unsup
r_err 54-55 vs sup 33). Those numbers were measured on loop worlds
where rotation is a prior, not a signal — so the comparison itself
was confounded. This re-runs the sup-vs-unsup comparison on wander
worlds (rotation readable from images), with the r4 defaults
(geo_consistency=0.5) and the validated unsup pieces.

Arms (tiny preset, 16 wander train worlds, 1300-frame wander eval,
2500 steps):

  sup        pose_supervision 100 (the ladder4 anchor recipe) —
             read from results_r4_quality.json if present, else run
  unsup      pure photometric (+geo 0.5 default)
  unsup_dn   + depth_norm (long-horizon t_err lever from r3)

Gate: unsup r_err <= 1.3x sup on the same eval world.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_unsup_wander.py [OUT]" 12000 3
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
from davo_tpu.data.synthetic import SyntheticSequence
from davo_tpu.eval.runner import (
    assemble_trajectory,
    evaluate_sequence,
    make_pose_apply_fn,
    predict_sequence,
)
from davo_tpu.models import presets

sys.path.insert(0, os.path.dirname(__file__))
from exp_quality_ladder4 import WANDER_KW, mat_to_euler_np, rot_angle

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r4_unsup_wander.json"
)
EVAL_FRAMES = 1300
STEPS = 2500


def run_arm(sup_weight, depth_norm=False, masking="border",
            pose_head="conv"):
    import dataclasses

    base = presets.get("tiny")
    mcfg = dataclasses.replace(base.model, pose_head=pose_head)
    H, W = mcfg.img_height, mcfg.img_width
    train_worlds = [
        SyntheticSequence(n_frames=24, height=H, width=W, seed=s,
                          **WANDER_KW)
        for s in range(1, 17)
    ]
    from probe_common import cached_eval_world

    frames, segs, gt, _K = cached_eval_world(
        "wander", 99, EVAL_FRAMES, H, W, WANDER_KW
    )

    cfg = Config(
        model=mcfg,
        train=TrainConfig(
            batch_size=16, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=STEPS, pose_supervision_weight=sup_weight,
            rot_weight=10.0, smooth_weight=0.1,
            warp_gather="take4",  # pin the r4 anchor protocol
            photo_masking=masking, depth_warmup_steps=250,
            depth_norm=depth_norm, log_every=max(STEPS // 8, 1),
            grad_clip_norm=10.0 if pose_head == "geo_hybrid" else 0.0,
        ),
    )
    ds = MultiSourceDataset(
        train_worlds, batch_size=16, with_seg=True,
        with_gt=sup_weight > 0, augment="color", seed=0,
    )
    from davo_tpu.train.loop import fit

    t0 = time.time()
    model, state, _ = fit(
        cfg, ds.batches(steps=STEPS),
        log_fn=lambda s, m: print(
            f"  step {s}: total={m.get('total', float('nan')):.4f}",
            flush=True,
        ),
    )
    apply_kw = {"K": _K} if pose_head == "geo_hybrid" else {}
    apply_fn = make_pose_apply_fn(
        model, state.params, "flow_seg", **apply_kw
    )
    rels = np.asarray(
        predict_sequence(apply_fn, frames, seg=segs, batch_size=64)
    )
    pred = assemble_trajectory(rels)
    # Unsupervised predictions carry no metric scale: align the global
    # trajectory scale on GT once (same policy as r2/r3 unsup tiers).
    if sup_weight == 0:
        gt_rel_norm = np.linalg.norm(
            np.stack([
                (np.linalg.inv(gt[i]) @ gt[i + 1])[:3, 3]
                for i in range(len(gt) - 1)
            ]), axis=1,
        ).mean()
        pr_norm = np.linalg.norm(rels[:, :3, 3], axis=1).mean()
        scale = gt_rel_norm / (pr_norm + 1e-12)
        rels_s = rels.copy()
        rels_s[:, :3, 3] *= scale
        pred = assemble_trajectory(rels_s)
    ev = evaluate_sequence(pred, gt)
    ev["train_s"] = time.time() - t0
    gt_rels = np.stack(
        [np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(len(gt) - 1)]
    )
    pr_ang, gt_ang = rot_angle(rels), rot_angle(gt_rels)
    ev["diag_rot_corr"] = float(np.corrcoef(pr_ang, gt_ang)[0, 1])
    pred_eul = mat_to_euler_np(rels[:, :3, :3])
    gt_eul = mat_to_euler_np(gt_rels[:, :3, :3])
    for k, name in enumerate(("rx", "ry", "rz")):
        ev[f"diag_corr_{name}"] = float(
            np.corrcoef(pred_eul[:, k], gt_eul[:, k])[0, 1]
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

    # Reuse the ladder4 supervised anchor when available.
    lad = "/root/repo/results_r4_quality.json"
    if "sup" not in res and os.path.exists(lad):
        with open(lad) as f:
            l4 = json.load(f)
        if "wander_tiny" in l4:
            res["sup"] = dict(l4["wander_tiny"], reused="ladder4")
            print("sup: reused ladder4 wander_tiny", flush=True)

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
            f"rot_corr {e.get('diag_rot_corr', float('nan')):.3f}",
            flush=True,
        )

    arm("sup", lambda: run_arm(100.0))
    arm("unsup", lambda: run_arm(0.0))
    arm("unsup_dn", lambda: run_arm(0.0, depth_norm=True))
    # VERDICT r3 #7 "compose the validated pieces": occlusion-aware
    # per-pixel-min masking (automin converges on chip at wu=0,
    # R2_RESULTS ladder #6) + depth_norm, on top of the geo=0.5
    # default.
    # PLAN_R5 #4: the unsup regime THROUGH the geometric head — the
    # photometric loss trains flow+depth, the GN solve turns them
    # into pose; the r3 unsup rotation gap should shrink iff pose-
    # from-geometry beats pose-from-conv-regression without GT.
    # Ordered before the automin composition: the geo arm is the
    # decisive one for the geometry route (r5 session 3 wall clock).
    arm("unsup_geo",
        lambda: run_arm(0.0, depth_norm=True,
                        pose_head="geo_hybrid"))
    arm("unsup_automin_dn",
        lambda: run_arm(0.0, depth_norm=True, masking="automin"))
    if "sup" in res and "unsup" in res:
        ratio = res["unsup"]["r_err_deg_per_100m"] / max(
            res["sup"]["r_err_deg_per_100m"], 1e-9
        )
        print(f"unsup/sup r_err ratio: {ratio:.2f} (gate <= 1.3)",
              flush=True)
    print("->", OUT, flush=True)


if __name__ == "__main__":
    main()
