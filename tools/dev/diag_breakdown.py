"""r2 perf diagnosis: where does the full-model forward time go?

Times each subnet in isolation (jitted, same shapes as the e2e bench),
counts compiled fusions/kernels per program, and sweeps batch size.
Run on TPU: tools/dev/tpu_run.sh tools/dev/diag_breakdown.py 1800 2
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.config import ModelConfig
from davo_tpu.models.attention import RegionAttention
from davo_tpu.models.davo import DavoModel
from davo_tpu.models.flownet import FlowNetLite, cost_volume
from davo_tpu.models.posenet import PoseNet
from davo_tpu.utils.profiling import timed


def kernel_stats(compiled) -> str:
    txt = compiled.as_text()
    n_fusion = txt.count(" fusion(")
    n_conv = txt.count("convolution(")
    n_cc = txt.count("custom-call(")
    n_while = txt.count("while(")
    return f"fusions={n_fusion} convs={n_conv} custom_calls={n_cc} whiles={n_while}"


def bench_fn(name, fn, *args):
    jfn = jax.jit(fn)
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    r = timed(jfn, *args, iters=10, loops=5)
    print(f"{name:<28} {r['ms']:8.2f} ms   {kernel_stats(compiled)}")
    return r["ms"]


def main():
    print("devices:", jax.devices())
    cfg = ModelConfig(attention="flow_seg")
    H, W = cfg.img_height, cfg.img_width
    rng = np.random.default_rng(0)

    for B in (128, 256):
        print(f"\n=== batch {B} ===")
        tgt = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
        src = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
        seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)

        model = DavoModel(cfg)
        params = jax.jit(model.init, static_argnames=("train",))(
            jax.random.key(0), tgt, src, seg=seg, train=False
        )

        def infer(t, s, g):
            return model.apply(params, t, s, seg=g, train=False)["poses"]

        ms = bench_fn("full flow_seg model", infer, tgt, src, seg)
        print(f"  -> {B / ms * 1000:.0f} frames/s")

        # FlowNet alone (input: target+source pair, like the model).
        fnet = FlowNetLite(cfg)
        s0 = src[:, 0]
        fparams = jax.jit(fnet.init)(jax.random.key(1), tgt, s0)

        def flow_fn(t, s):
            return fnet.apply(fparams, t, s)[0]

        bench_fn("flownet (pyr+cv+est)", flow_fn, tgt, s0)

        # Feature pyramid alone (2B batch, both images).
        both = jnp.concatenate([tgt, s0], axis=0)
        from davo_tpu.models.flownet import FeaturePyramid

        fp = FeaturePyramid(cfg)
        fpp = jax.jit(fp.init)(jax.random.key(2), both)

        def pyr_fn(x):
            return fp.apply(fpp, x)[-1]

        bench_fn("feature pyramid (2B)", pyr_fn, both)

        # Cost volume alone at the finest refined level (/4).
        f1 = jnp.asarray(
            rng.uniform(size=(B, H // 4, W // 4, 32)), jnp.float32
        )
        bench_fn(
            "cost_volume /4 (XLA)",
            lambda a, b: cost_volume(a, b, 4),
            f1,
            f1,
        )

        # PoseNet alone (9-channel input: pair + dir + flow).
        pnet = PoseNet(cfg)
        extra = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
        pparams = jax.jit(pnet.init)(jax.random.key(3), tgt, s0, extra)

        def pose_fn(t, s, e):
            return pnet.apply(pparams, t, s, extra=e)

        bench_fn("posenet (7conv enc+head)", pose_fn, tgt, s0, extra)

        # RegionAttention alone.
        att = RegionAttention(cfg)
        flow_full = jnp.asarray(rng.uniform(size=(B, H, W, 2)), jnp.float32)
        aparams = jax.jit(att.init)(jax.random.key(4), flow_full)

        def attn_fn(f):
            return att.apply(aparams, f)

        bench_fn("region attention net", attn_fn, flow_full)


if __name__ == "__main__":
    main()
