"""Quantify the rotational-flow pixel scale on drive worlds (CPU).

Ladder7's central negative — held-out rotation corr ~0 even with
GT-flow supervision at 48x64 — rests on the claim that the rotational
component of the optical flow is sub-pixel at tiny resolution, i.e.
below the trained flow net's EPE floor (~0.27 px per the flow_sup
loss plateau). This measures the claim instead of asserting it:

For adjacent pairs of a drive world, split the GT relative pose
T = [R | t] and compute, from the GT depth of the target frame,
  flow_rot   = project(K, R, t=0)  - identity      (pure rotation)
  flow_trans = project(K, R=I, t)  - identity      (pure translation)
at 48x64 AND 128x416. The artifact records per-pair |flow| stats.
If median |flow_rot| at 48x64 is below the flow EPE floor while at
128x416 it clears it, the resolution hypothesis is quantified and
the composed ratchet run (geo recipe at 128x416) is the right probe.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/dev/exp_rotflow_scale.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from davo_tpu.data.synthetic import DriveSequence  # noqa: E402
from exp_quality_ladder5 import DRIVE_KW  # noqa: E402

OUT = "/root/repo/results_r5_rotflow_scale.json"
N_PAIRS = 48


def component_flows(seq, i):
    """(|flow_rot|, |flow_trans|) pixel-magnitude maps for pair i->i+1."""
    H, W = seq.height, seq.width
    K = np.asarray(seq.K, np.float64)
    depth = np.asarray(seq.depth(i), np.float64)  # (H, W) target depth
    T = np.asarray(seq.warp_pose(i, i + 1), np.float64)  # target->source
    R, t = T[:3, :3], T[:3, 3]

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    ones = np.ones_like(xx)
    pix = np.stack([xx, yy, ones], 0).reshape(3, -1)  # (3, HW)
    cam = np.linalg.inv(K) @ pix * depth.reshape(1, -1)  # (3, HW)

    def project(Rm, tv):
        p = Rm @ cam + tv[:, None]
        uvw = K @ p
        uv = uvw[:2] / np.maximum(uvw[2:3], 1e-9)
        du = uv[0] - pix[0]
        dv = uv[1] - pix[1]
        return np.hypot(du, dv).reshape(H, W)

    return project(R, np.zeros(3)), project(np.eye(3), t)


def stats(seq):
    rot, trn = [], []
    for i in range(min(N_PAIRS, len(seq) - 1)):
        fr, ft = component_flows(seq, i)
        rot.append(fr.ravel())
        trn.append(ft.ravel())
    rot = np.concatenate(rot)
    trn = np.concatenate(trn)
    pct = lambda a, q: float(np.percentile(a, q))  # noqa: E731
    return {
        "rot_px_median": pct(rot, 50), "rot_px_p90": pct(rot, 90),
        "rot_px_p99": pct(rot, 99), "rot_px_max": float(rot.max()),
        "trans_px_median": pct(trn, 50), "trans_px_p90": pct(trn, 90),
        "trans_px_max": float(trn.max()),
        "rot_to_trans_median_ratio": pct(rot, 50) / max(pct(trn, 50), 1e-9),
    }


def main():
    res = {}
    for H, W in ((48, 64), (128, 416)):
        seq = DriveSequence(n_frames=N_PAIRS + 1, height=H, width=W,
                            seed=99, **DRIVE_KW)
        res[f"{H}x{W}"] = stats(seq)
        print(f"{H}x{W}:", json.dumps(res[f"{H}x{W}"], indent=1),
              flush=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print("->", OUT)


if __name__ == "__main__":
    main()
