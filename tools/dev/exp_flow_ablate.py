"""Subtractive profiling of FlowNetLite on TPU: replace one component
at a time and measure the in-context delta (microbenchmarks of
isolated pieces disagree wildly on this stack; in-context deltas on
the real program are the ground truth).
"""

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
from davo_tpu.models.flownet import FlowNetLite
from davo_tpu.utils.profiling import timed

B = 128


def bench(tag, cfg, patch=None):
    """Build a fresh FlowNetLite with optional monkeypatches, time it."""
    rng = np.random.default_rng(0)
    H, W = cfg.img_height, cfg.img_width
    t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    saved = {}
    if patch:
        for name, fn in patch.items():
            saved[name] = getattr(fn_mod, name)
            setattr(fn_mod, name, fn)
    try:
        net = FlowNetLite(cfg)
        params = jax.jit(net.init)(jax.random.key(0), t, s)
        f = jax.jit(lambda a, b: net.apply(params, a, b)[0])
        jax.block_until_ready(f(t, s))
        r = timed(f, t, s, iters=10, loops=5)
        print(f"{tag:<34} {r['ms']:8.2f} ms", flush=True)
        return r["ms"]
    finally:
        for name, fn in saved.items():
            setattr(fn_mod, name, fn)


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig()

    full = bench("full flownet", cfg)

    # (a) cost volume -> zeros of the right shape (removes cv compute
    # AND its f32 casts, keeps estimator shapes identical).
    def cv_zero(f1, f2, search):
        B_, H_, W_, _ = f1.shape
        return jnp.zeros((B_, H_, W_, (2 * search + 1) ** 2), jnp.float32)

    bench("cv -> zeros", cfg, {"cost_volume": cv_zero})

    # (b) cost volume in bf16, no casts (same math, half the traffic).
    def cv_bf16(f1, f2, search):
        pad = search
        f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        Bs, H_, W_, C_ = f1.shape
        outs = []
        for dy in range(2 * search + 1):
            for dx in range(2 * search + 1):
                sh = jax.lax.dynamic_slice(
                    f2p, (0, dy, dx, 0), (Bs, H_, W_, C_)
                )
                outs.append(jnp.mean(f1 * sh, axis=-1))
        return jnp.stack(outs, axis=-1).astype(jnp.float32)

    import davo_tpu.models.flownet as m

    orig_call = FlowNetLite.__call__

    def call_bf16cv(self, img1, img2):
        # identical to the original but skips the f32 casts around cv
        Bs = img1.shape[0]
        pboth = self.pyramid(jnp.concatenate([img1, img2], axis=0))
        p1 = [p[:Bs] for p in pboth]
        p2 = [p[Bs:] for p in pboth]
        search = self.cfg.flow_search_range
        flows = []
        flow = None
        for level in range(len(p1) - 1, 0, -1):
            f1, f2 = p1[level], p2[level]
            _, H_, W_, _ = f1.shape
            if flow is None:
                flow_up = jnp.zeros((Bs, H_, W_, 2), jnp.float32)
                f2w = f2
            else:
                flow_up = 2.0 * m.resize_bilinear_aligned(flow, H_, W_)
                f2w, _ = m.flow_warp(f2, flow_up)
            cv = jax.nn.relu(m.cost_volume(f1, f2w.astype(f1.dtype), search))
            flow = self.estimators[level - 1](cv, f1, flow_up)
            flows.append(flow)
        return flows[::-1]

    FlowNetLite.__call__ = call_bf16cv
    try:
        bench("cv in bf16 (no casts)", cfg)
    finally:
        FlowNetLite.__call__ = orig_call

    # (c) flow_warp -> identity (removes the bilinear gather).
    def warp_id(src, flow):
        return src, jnp.ones(src.shape[:3] + (1,), src.dtype)

    bench("flow_warp -> identity", cfg, {"flow_warp": warp_id})

    # (d) both removed: upper bound of cv+warp attack.
    bench(
        "cv->zeros + warp->identity", cfg,
        {"cost_volume": cv_zero, "flow_warp": warp_id},
    )

    # (e) search range 2 instead of 4 (25 offsets, quality knob).
    bench("search=2 (25 offsets)", ModelConfig(flow_search_range=2))

    # (f) 3 levels instead of 4.
    bench("flow_levels=3", ModelConfig(flow_levels=3))


if __name__ == "__main__":
    main()
