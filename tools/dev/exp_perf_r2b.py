"""r2b perf session: costvol slices-vs-gram, then a batch sweep.

In-context measurements of the REAL flagship jitted program (subtractive
protocol — microbenchmarks lie on this stack, see R2_RESULTS.md).

Usage: tools/dev/tpu_run.sh tools/dev/exp_perf_r2b.py <timeout> 1
"""

import dataclasses
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


def bench_model(cfg: ModelConfig, B: int) -> float:
    model = DavoModel(cfg)
    H, W = cfg.img_height, cfg.img_width
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), t, s, seg=seg, train=False
    )
    f = jax.jit(
        lambda a, b, c: model.apply(params, a, b, seg=c, train=False)["poses"]
    )
    jax.block_until_ready(f(t, s, seg))
    r = timed(f, t, s, seg, iters=8, loops=5)
    del t, s, seg, params, f
    return r["ms"]


def main():
    print("devices:", jax.devices(), flush=True)
    base = ModelConfig(attention="flow_seg")

    results = {}
    for impl in ("slices", "gram"):
        cfg = dataclasses.replace(base, costvol_impl=impl)
        ms = bench_model(cfg, 128)
        results[impl] = ms
        print(f"B=128 costvol={impl:7s} {ms:8.2f} ms "
              f"-> {128 / ms * 1000:8.0f} frames/s", flush=True)

    best = min(results, key=results.get)
    print(f"best impl: {best}", flush=True)
    cfg = dataclasses.replace(base, costvol_impl=best)
    for B in (256, 512):
        ms = bench_model(cfg, B)
        print(f"B={B:4d} costvol={best:7s} {ms:8.2f} ms "
              f"-> {B / ms * 1000:8.0f} frames/s", flush=True)


if __name__ == "__main__":
    main()
