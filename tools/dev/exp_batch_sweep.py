"""Batch-size sweep of the flagship flow_seg forward (post-warp-fix).

Rationale: ~7 ms of the 14.46 ms B=128 program is per-kernel launch
overhead (~70 us x ~100 kernels, constant per program) — doubling the
batch halves the overhead per frame. Pre-fix B=256 lost because the
gather-warp scaled linearly; re-test now that the warp is matmul-based.

Usage: tools/dev/tpu_run.sh tools/dev/exp_batch_sweep.py <timeout> 1
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.config import ModelConfig
from davo_tpu.models.davo import DavoModel
from davo_tpu.utils.profiling import timed


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig(attention="flow_seg")
    H, W = cfg.img_height, cfg.img_width
    model = DavoModel(cfg)
    rng = np.random.default_rng(0)

    for B in (128, 256, 384, 512):
        t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
        s = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
        seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
        params = jax.jit(model.init, static_argnames=("train",))(
            jax.random.key(0), t, s, seg=seg, train=False
        )
        f = jax.jit(
            lambda a, b, c: model.apply(params, a, b, seg=c, train=False)[
                "poses"
            ]
        )
        jax.block_until_ready(f(t, s, seg))
        r = timed(f, t, s, seg, iters=8, loops=5)
        print(
            f"B={B:4d}  {r['ms']:8.2f} ms  -> {B / r['ms'] * 1000:8.0f} frames/s",
            flush=True,
        )
        del t, s, seg, params, f


if __name__ == "__main__":
    main()
