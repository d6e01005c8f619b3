"""GT-flow oracle for the geometric pose solve (r5, VERDICT r4 #2).

geo_hybrid's first chip arms LOST (rot corr ~0, t_err 26.1 % —
results_r4_quality_geo.json). Two competing explanations:

  (a) the predicted flow is not good enough to read rotation from
      (PLAN_R5 #2's surviving branch -> fix = flow supervision), or
  (b) the solve itself under-converges at the production config
      (ADVICE r4 #2: iters=4, damping=1e-4, robust=2.0 were never
      exactness-tested; the measured rot ratio 0.08-0.18 is
      consistent with an under-converged GN).

This oracle separates them WITHOUT training: feed the solve the
worlds' exact GT flow (downsampled to the /4 level grid the model
uses) + GT depth over hundreds of eval-world frame pairs and measure
pred-vs-GT rotation correlation at the production config and along
the iters/damping axes. corr ~1 at production config => (a); corr
low until iters >> 4 => (b) and the config default must change.

Runs on CPU (pure jit math, small shapes):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/dev/exp_geo_oracle.py [OUT]
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.data.synthetic import DriveSequence, SyntheticSequence
from davo_tpu.models.geopose import pose_from_flow_pyramid

sys.path.insert(0, os.path.dirname(__file__))
from exp_quality_ladder4 import WANDER_KW, mat_to_euler_np  # noqa: E402
from exp_quality_ladder5 import DRIVE_KW  # noqa: E402

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r5_geo_oracle.json"
)
N_PAIRS = 240


def gt_level_flow(seq, i, sy, sx):
    """Exact GT flow on the /stride level grid, in LEVEL-pixel units
    (the flownet's native convention, models/flownet.py)."""
    f = seq.gt_flow(i, i + 1)[::sy, ::sx]
    return np.stack([f[..., 0] / sx, f[..., 1] / sy], -1)


def run(world, H, W, stride=4, iters=6, damping=1e-4, robust=2.0,
        step_clip=0.5, depth_mode="gt", batch=48):
    if world == "drive":
        seq = DriveSequence(n_frames=N_PAIRS + 1, height=H, width=W,
                            seed=99, **DRIVE_KW)
    else:
        seq = SyntheticSequence(n_frames=N_PAIRS + 1, height=H,
                                width=W, seed=99, **WANDER_KW)
    gt = np.asarray(seq.poses)
    K = np.asarray(seq.K, np.float32)
    sy = sx = stride

    solve = jax.jit(
        lambda fl, dp: pose_from_flow_pyramid(
            fl, dp, jnp.asarray(K), (H, W), iters=iters,
            damping=damping, robust_delta=robust, step_clip=step_clip,
        )
    )

    preds = []
    for b0 in range(0, N_PAIRS, batch):
        idx = range(b0, min(b0 + batch, N_PAIRS))
        fl = np.stack([gt_level_flow(seq, i, sy, sx) for i in idx])
        if depth_mode == "gt":
            dp = np.stack([seq.depth(i) for i in idx])
        else:  # constant plane: rotation must not need depth
            dp = np.full((len(fl), H, W), 30.0, np.float32)
        preds.append(np.asarray(solve(jnp.asarray(fl), jnp.asarray(dp))))
    pred = np.concatenate(preds)  # (N, 6) [t, euler]

    # WARP convention (target i -> source i+1), matching the solve's
    # output — the ladders' inv(gt[i]) @ gt[i+1] is the INVERSE (their
    # predict_sequence converts model poses before chaining); the
    # first oracle run compared across conventions and read corr -1.
    gt_rels = np.stack(
        [np.linalg.inv(gt[i + 1]) @ gt[i] for i in range(N_PAIRS)]
    )
    gt_eul = mat_to_euler_np(gt_rels[:, :3, :3])
    gt_t = gt_rels[:, :3, 3]
    out = {}
    for k, name in enumerate(("rx", "ry", "rz")):
        out[f"corr_{name}"] = float(
            np.corrcoef(pred[:, 3 + k], gt_eul[:, k])[0, 1]
        )
    out["rot_rmse_deg"] = float(
        np.degrees(np.sqrt(np.mean((pred[:, 3:] - gt_eul) ** 2)))
    )
    out["rot_ratio"] = float(
        np.mean(
            np.linalg.norm(pred[:, 3:], axis=1)
            / (np.linalg.norm(gt_eul, axis=1) + 1e-9)
        )
    )
    out["t_rmse_m"] = float(np.sqrt(np.mean((pred[:, :3] - gt_t) ** 2)))
    out["corr_t_norm"] = float(
        np.corrcoef(
            np.linalg.norm(pred[:, :3], axis=1),
            np.linalg.norm(gt_t, axis=1),
        )[0, 1]
    )
    return out


def main():
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)

    def arm(name, **kw):
        if name in res:
            print(f"{name}: done previously", flush=True)
            return
        res[name] = run(**kw)
        with open(OUT + ".tmp", "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")
        os.replace(OUT + ".tmp", OUT)
        r = res[name]
        print(
            f"{name}: corr rx {r['corr_rx']:.3f} ry {r['corr_ry']:.3f} "
            f"rz {r['corr_rz']:.3f}  ratio {r['rot_ratio']:.3f}  "
            f"rot_rmse {r['rot_rmse_deg']:.3f} deg  "
            f"t_rmse {r['t_rmse_m']:.3f} m  |t|corr {r['corr_t_norm']:.3f}",
            flush=True,
        )

    # Production config (r5 ModelConfig defaults: iters=6, clip=0.5)
    # on both eval worlds, both ladder resolutions.
    arm("drive_tiny_prod", world="drive", H=48, W=64)
    arm("drive_128_prod", world="drive", H=128, W=416)
    arm("wander_tiny_prod", world="wander", H=48, W=64)
    # The r4 shipped config (iters=4, NO clip): documents the
    # divergence mode the clip fixes (a few % of pairs overshoot to
    # ~9 deg and wreck the correlation).
    arm("drive_tiny_r4cfg", world="drive", H=48, W=64, iters=4,
        step_clip=0.0)
    arm("drive_tiny_r4cfg_it20", world="drive", H=48, W=64, iters=20,
        step_clip=0.0)
    # Robustness axes at the r5 config.
    arm("drive_tiny_norobust", world="drive", H=48, W=64, robust=0.0)
    arm("drive_tiny_it4clip", world="drive", H=48, W=64, iters=4)
    # Depth insensitivity of rotation: constant-30m depth (translation
    # needs depth; rotation should survive).
    arm("drive_tiny_flatdepth", world="drive", H=48, W=64,
        depth_mode="flat")
    # Finer level grid (stride 2): is the /4 grid losing the signal?
    arm("drive_tiny_s2", world="drive", H=48, W=64, stride=2)
    print("->", OUT, flush=True)


if __name__ == "__main__":
    main()
