"""Promote a measured, equality-checked serving win into BENCH_FLAGS.json.

Reads serving_probe_results.json (written incrementally on hardware by
exp_costvol_rows.py) and, if a davo-fast candidate (a) ran to
completion on the TPU, (b) matched the XLA baseline's poses within
tolerance, and (c) beat the baseline throughput by >2 %, writes the
winning model-config overrides to BENCH_FLAGS.json, which bench.py
applies on top of the davo-fast preset.

This is the only writer of BENCH_FLAGS.json: bench.py never runs an
unvalidated fused path at round end (a Mosaic rejection or a hung
remote compile there would torch the round's headline artifact).

CPU-only; run as:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/dev/update_bench_flags.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_common import fingerprint  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
RESULTS = os.path.join(ROOT, "serving_probe_results.json")
FLAGS = os.path.join(ROOT, "BENCH_FLAGS.json")

# Poses are bf16-computed on both paths; gate at 2 % of the output's
# dynamic range (plus an absolute floor for near-zero outputs).
REL_TOL = 0.02
ABS_FLOOR = 1e-5
MIN_SPEEDUP = 1.02


def main() -> None:
    if not os.path.exists(RESULTS):
        print("no serving_probe_results.json; nothing to do")
        return
    with open(RESULTS) as f:
        res = json.load(f)
    fp = fingerprint()
    if res.get("_fingerprint") != fp:
        print(
            "probe results were measured against different kernel/model "
            "code (stale fingerprint); refusing to promote — also "
            "removing any existing BENCH_FLAGS.json for the same reason"
        )
        if os.path.exists(FLAGS):
            os.remove(FLAGS)
        return
    base = res.get("davo-fast (slices baseline)")
    if not base or base.get("status") != "done":
        print("no completed baseline probe; nothing to do")
        return
    tol = REL_TOL * base.get("out_absmax", 0.0) + ABS_FLOOR
    best = None
    for tag, r in res.items():
        if (
            isinstance(r, dict)  # skip the _fingerprint entry
            and r.get("status") == "done"
            and r.get("base") == "davo-fast"
            and r.get("equality_checked")
            and r.get("maxerr", float("inf")) <= tol
            and r.get("fps", 0.0) >= base["fps"] * MIN_SPEEDUP
            and (best is None or r["fps"] > best[1]["fps"])
        ):
            best = (tag, r)
    if best is None:
        print(
            f"no candidate beat baseline {base['fps']:.0f} fps within "
            f"tol={tol:.2e}; BENCH_FLAGS.json untouched"
        )
        return
    tag, r = best
    flags = {
        "overrides": {f"model.{k}": v for k, v in r["overrides"].items()},
        "validated_on": "tpu",
        "fingerprint": fp,
        "probe": tag,
        "probe_fps": r["fps"],
        "baseline_fps": base["fps"],
        "maxerr": r["maxerr"],
        "tolerance": tol,
    }
    # The fused kernels only compile under extra per-computation PJRT
    # compiler options (scoped-vmem promotion OOM, R3_RESULTS.md;
    # XLA_FLAGS cannot carry TPU-only flags — the client parser
    # fatals). A promoted winner carries the options it was measured
    # under; bench.py re-applies them via lower().compile(...).
    if r.get("compiler_options"):
        flags["compiler_options"] = dict(r["compiler_options"])
    tmp = FLAGS + ".tmp"
    with open(tmp, "w") as f:
        json.dump(flags, f, indent=1, sort_keys=True)
    os.replace(tmp, FLAGS)
    print(
        f"BENCH_FLAGS.json <- {tag}: {r['fps']:.0f} fps "
        f"(baseline {base['fps']:.0f}), maxerr {r['maxerr']:.2e}"
    )


if __name__ == "__main__":
    main()
