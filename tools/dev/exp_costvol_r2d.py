"""Costvol kernel-count attack (r2d): the r2c subtractive profile
showed the cost volume's ~5.4 ms is LAUNCH-COUNT-bound (243 sliced
kernels at search=4; search=3 saved exactly the count fraction).
Measure the lax.scan formulation (3 kernels total) and the learned
1x1 correlation projection, alone and combined, inside the real
flagship program.

Usage: tools/dev/tpu_run.sh tools/dev/exp_costvol_r2d.py <t> 1
"""

import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.config import ModelConfig
from tools.dev.exp_prof_r2c import bench


def main():
    print("devices:", jax.devices(), flush=True)
    base = ModelConfig(attention="flow_seg")
    bench("slices (baseline)", base)
    bench("scan", dataclasses.replace(base, costvol_impl="scan"))
    bench("proj=16", dataclasses.replace(base, costvol_feat_channels=16))
    bench("scan + proj=16", dataclasses.replace(
        base, costvol_impl="scan", costvol_feat_channels=16))
    bench("scan + search=3", dataclasses.replace(
        base, costvol_impl="scan", flow_search_range=3))
    bench("scan + proj=16 + search=3", dataclasses.replace(
        base, costvol_impl="scan", costvol_feat_channels=16,
        flow_search_range=3))


if __name__ == "__main__":
    main()
