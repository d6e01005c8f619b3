"""r2e: the r2d verdict — scan is a fusion-killer (183 ms), the
learned 1x1 correlation projection is the win (11.69 ms at proj=16).
Map the remaining slice-impl combos for the flagship default and a
davo-fast preset.

Usage: tools/dev/tpu_run.sh tools/dev/exp_costvol_r2e.py <t> 1
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
    bench("proj=16 (r2d best)", dataclasses.replace(
        base, costvol_feat_channels=16))
    bench("proj=8", dataclasses.replace(base, costvol_feat_channels=8))
    bench("proj=16 + search=3", dataclasses.replace(
        base, costvol_feat_channels=16, flow_search_range=3))
    bench("proj=8 + search=3", dataclasses.replace(
        base, costvol_feat_channels=8, flow_search_range=3))
    bench("proj=16 + search=3 + bneck=48", dataclasses.replace(
        base, costvol_feat_channels=16, flow_search_range=3,
        flow_est_bottleneck=48))


if __name__ == "__main__":
    main()
