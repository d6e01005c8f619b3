"""Banded-warp QUALITY gate (r5 item #1, VERDICT r4 next-#1).

The gather-free banded Pallas warp (kernels/bandwarp.py) is the
project's first in-context Pallas win: 458 -> 194 ms/step at the
flagship train shape (results_r4_train_prof3.json flow_level_banded).
It is NOT production because the band clamp (rv, rh) biases gradients
for pixels whose true displacement exceeds the band — and at 128x416
drive worlds the near-ground rows DO exceed rv=4 (the gate world's
own GT flow quantifies this; written to the JSON as band_exceed_*).

This gate runs the ladder5 drive_res128 protocol (davo-small 128x416,
16 drive worlds, B=8, 2500 steps, 1,300-frame held-out eval world —
anchor: t_err 23.34 / r_err 7.49 / snippet 0.582,
results_r4_quality_drive.json) with only the warp gather swapped:

  banded_4_16   the measured-2.36x kernel at its probe band
  banded_8_32   doubled band (kernel cost scales with rv only)
  take4         same-window twin anchor (runs LAST; if the deadline
                eats it, the ladder5 anchor stands)

Flip rule (PLAN_R5 #1): flip core/warp._DEFAULT_GATHER to "banded"
iff a banded arm lands within the ~0.4 % arm-noise band of the take4
anchor on t_err AND does not degrade r_err/rot_corr; record the
per-arm ms/step ratio alongside.

Usage: tools/dev/tpu_run.sh "tools/dev/exp_warp_gate.py [OUT]" 14400 3
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
from davo_tpu.core import warp as warp_mod
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
    else "/root/repo/results_r5_warp_gate.json"
)
STEPS = 2500


def band_exceed_stats(H, W, bands):
    """P(displacement exceeds band) from the gate world's exact GT
    flow, sampled over 24 adjacent pairs of a fresh drive world —
    names the clamp's actual bite instead of guessing."""
    seq = DriveSequence(n_frames=25, height=H, width=W, seed=7,
                        **DRIVE_KW)
    du, dv = [], []
    for i in range(24):
        f = seq.gt_flow(i, i + 1)
        du.append(np.abs(f[..., 0]).ravel())
        dv.append(np.abs(f[..., 1]).ravel())
    du = np.concatenate(du)
    dv = np.concatenate(dv)
    out = {}
    for rv, rh in bands:
        out[f"exceed_rv{rv}"] = float((dv > rv).mean())
        out[f"exceed_rh{rh}"] = float((du > rh).mean())
    out["dv_p99"] = float(np.percentile(dv, 99))
    out["du_p99"] = float(np.percentile(du, 99))
    return out


def run_arm(gather, band=(4, 16)):
    warp_mod._DEFAULT_GATHER = gather
    warp_mod._BAND = band
    base = presets.get("davo-small")
    H, W = base.model.img_height, base.model.img_width
    train_worlds = [
        DriveSequence(n_frames=24, height=H, width=W, seed=s, **DRIVE_KW)
        for s in range(1, 17)
    ]
    from probe_common import cached_eval_world

    frames, segs, gt, _K = cached_eval_world(
        "drive", 99, EVAL_FRAMES, H, W, DRIVE_KW
    )

    cfg = Config(
        model=base.model,
        train=TrainConfig(
            batch_size=8, learning_rate=4e-3, lr_schedule="cosine",
            max_steps=STEPS, pose_supervision_weight=100.0,
            rot_weight=10.0, smooth_weight=0.1,
            photo_masking="border", depth_warmup_steps=250,
            log_every=max(STEPS // 8, 1),
            # Explicit config wins over the module globals / auto
            # policy inside make_train_step — each arm pins its own
            # gather regardless of the production default.
            warp_gather=gather, warp_band=band,
        ),
    )
    ds = MultiSourceDataset(
        train_worlds, batch_size=8, with_seg=True, with_gt=True,
        augment="color", seed=0,
    )
    from davo_tpu.train.loop import fit

    # Steady-state ms/step from inter-log timing (excludes compile:
    # the first segment is dropped).
    marks = []

    def log_fn(s, m):
        marks.append((s, time.time()))
        print(
            f"  step {s}: total={m.get('total', float('nan')):.4f} "
            f"pose_sup={m.get('pose_sup', float('nan')):.5f}",
            flush=True,
        )

    t0 = time.time()
    model, state, _ = fit(cfg, ds.batches(steps=STEPS), log_fn=log_fn)
    train_s = time.time() - t0
    apply_fn = make_pose_apply_fn(model, state.params, "flow_seg")
    rels = np.asarray(
        predict_sequence(apply_fn, frames, seg=segs, batch_size=64)
    )
    pred = assemble_trajectory(rels)
    ev = evaluate_sequence(pred, gt)
    ev["train_s"] = train_s
    if len(marks) >= 3:
        (s1, t1), (s2, t2) = marks[1], marks[-1]
        ev["step_ms"] = (t2 - t1) / (s2 - s1) * 1000.0

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

    if "band_stats" not in res:
        res["band_stats"] = band_exceed_stats(128, 416, [(4, 16), (8, 32)])
        print("band stats:", json.dumps(res["band_stats"]), flush=True)

    def arm(name, fn):
        ddl = os.environ.get("DAVO_ARM_DEADLINE_UTC", "2030")
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
            f"rot_corr {e['diag_rot_corr']:.3f}  "
            f"step_ms {e.get('step_ms', float('nan')):.0f}  "
            f"({e['train_s']:.0f}s)",
            flush=True,
        )

    # Band-stat priors: (4, 16) clamps ~9.7 % of pixels vertically at
    # this world/resolution; rv=8 drops that to 0.25 %, and rh=16
    # leaves only 2.5 % horizontal. The first (8, 32) attempt's
    # train-step compile ran >25 min without returning (the Mosaic
    # unroll scales with (2rh+2)*(2rv+2); 66x18 vs the r4-proven
    # 34x10), so the sweep uses (8, 16) — the rv axis is the one the
    # stats say matters — and runs the proven-compile (4, 16) first
    # on any retry.
    arm("banded_4_16", lambda: run_arm("banded", (4, 16)))
    # The rv=8 sweep point is opt-in after TWO server-side Mosaic
    # compile wedges at this shape: (8, 32) froze >65 min (queue 1,
    # killed) and (8, 16) froze >70 min with the local process 0 %
    # CPU (this session) — the unroll-product scaling note in
    # R5_RESULTS underestimated the davo-small x7-instantiation
    # blowup. (4, 16) already matches the take4 anchor on quality
    # (21.96 vs 23.34), so the wider band is informational only.
    if os.environ.get("DAVO_GATE_WIDE_BAND"):
        arm("banded_8_16", lambda: run_arm("banded", (8, 16)))
    arm("take4", lambda: run_arm("take4"))
    print("warp gate ->", OUT, flush=True)


if __name__ == "__main__":
    main()
