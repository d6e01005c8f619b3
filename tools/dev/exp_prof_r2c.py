"""Subtractive profile of the FULL flagship model (post-warp-fix).

The B=256/512 sweep showed super-linear degradation (34.7/83 ms vs
15.2 at 128) — the program is throughput-bound, not launch-bound, so
the r2a "~7 ms fixed overhead" model is stale. Re-measure where the
15 ms goes by swapping one component at a time inside the real jitted
program, plus cheap config ablations (search range, levels) to map the
perf/quality trade space for r3.

Usage: tools/dev/tpu_run.sh tools/dev/exp_prof_r2c.py <timeout> 1
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

import davo_tpu.models.flownet as fn_mod
from davo_tpu.config import ModelConfig
from davo_tpu.models.davo import DavoModel
from davo_tpu.utils.profiling import timed

B = 128


def bench(tag, cfg, patch=None):
    rng = np.random.default_rng(0)
    H, W = cfg.img_height, cfg.img_width
    t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    saved = {}
    if patch:
        for name, fn in patch.items():
            saved[name] = getattr(fn_mod, name)
            setattr(fn_mod, name, fn)
    try:
        model = DavoModel(cfg)
        kw = {}
        if cfg.attention == "flow_seg":
            kw["seg"] = seg
        params = jax.jit(model.init, static_argnames=("train",))(
            jax.random.key(0), t, s, train=False, **kw
        )
        f = jax.jit(
            lambda a, b, c: model.apply(
                params, a, b, train=False, **({"seg": c} if kw else {})
            )["poses"]
        )
        jax.block_until_ready(f(t, s, seg))
        r = timed(f, t, s, seg, iters=10, loops=5)
        print(f"{tag:<36} {r['ms']:8.2f} ms  {B / r['ms'] * 1000:7.0f} fps",
              flush=True)
        return r["ms"]
    finally:
        for name, fn in saved.items():
            setattr(fn_mod, name, fn)


def cv_zero(f1, f2, search):
    B_, H_, W_, _ = f1.shape
    return jnp.zeros((B_, H_, W_, (2 * search + 1) ** 2), jnp.float32)


def warp_identity(f2, flow):
    return f2, jnp.ones(f2.shape[:3] + (1,), f2.dtype)


def main():
    print("devices:", jax.devices(), flush=True)
    base = ModelConfig(attention="flow_seg")

    bench("full flow_seg (baseline)", base)
    bench("cv -> zeros", base, {"cost_volume": cv_zero})
    bench("sep warp -> identity", base, {"flow_warp_separable": warp_identity})
    bench("cv+warp removed", base, {
        "cost_volume": cv_zero, "flow_warp_separable": warp_identity,
    })
    bench("search=3 (49ch cv)", dataclasses.replace(base, flow_search_range=3))
    bench("search=2 (25ch cv)", dataclasses.replace(base, flow_search_range=2))
    bench("flow_levels=3", dataclasses.replace(base, flow_levels=3))
    bench("est bottleneck=48",
          dataclasses.replace(base, flow_est_bottleneck=48))
    bench("est bottleneck=32",
          dataclasses.replace(base, flow_est_bottleneck=32))
    bench("bneck=48 + search=3", dataclasses.replace(
        base, flow_est_bottleneck=48, flow_search_range=3))
    bench("attention=flow (no regions)",
          dataclasses.replace(base, attention="flow"))
    bench("attention=none (no flownet)",
          dataclasses.replace(base, attention="none"))


if __name__ == "__main__":
    main()
