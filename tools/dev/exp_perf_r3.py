"""r3 perf candidates, measured in the REAL jitted serving program
(microbenchmarks are unreliable on this stack — see R2_RESULTS).

Candidates this round:
  * costvol_impl="patches": one conv_general_dilated_patches op + one
    einsum instead of (2s+1)^2 slice kernels (r2c: costvol time scales
    with kernel count, not bytes).
  * space-to-depth stems: the pose encoder's early convs run at ~6/128
    MXU input-channel utilization (C_in=6 at 128x416); S2D(2) packs
    2x2 pixels into channels (6->24) with the same FLOPs. Timing proxy
    uses fresh params (a weight-exact remap of a trained 7x7/s2 conv
    to 4x4/s1-on-packed exists if the win is real).

Usage: tools/dev/tpu_run.sh tools/dev/exp_perf_r3.py <timeout> 1
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

import flax.linen as nn

import davo_tpu.models.flownet as fn_mod
import davo_tpu.models.posenet as pn_mod
from davo_tpu.config import ModelConfig
from davo_tpu.models.common import ConvBlock, dtype_of
from davo_tpu.models.davo import DavoModel
from davo_tpu.utils.profiling import timed

B = 128


def space_to_depth(x, r):
    Bb, H, W, C = x.shape
    x = x.reshape(Bb, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(Bb, H // r, W // r, r * r * C)


class S2DPoseEncoder(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, pair):
        dt = dtype_of(self.cfg.compute_dtype)
        x = pair.astype(dt)
        for i, ch in enumerate(self.cfg.pose_channels):
            if i == 0:
                x = space_to_depth(x, 2)
                x = ConvBlock(ch, 4, 1, dt, name=f"enc{i}")(x)
            else:
                k = 5 if i == 1 else 3
                x = ConvBlock(ch, k, 2, dt, name=f"enc{i}")(x)
        return x


class S2DFeaturePyramid(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, img):
        dt = dtype_of(self.cfg.compute_dtype)
        x = img.astype(dt)
        pyr = []
        for i, ch in enumerate(fn_mod._LEVEL_CHANNELS[: self.cfg.flow_levels]):
            if i == 0:
                x = space_to_depth(x, 2)
                x = ConvBlock(ch, 2, 1, dt, name=f"feat{i}a")(x)
            else:
                x = ConvBlock(ch, 3, 2, dt, name=f"feat{i}a")(x)
            x = ConvBlock(ch, 3, 1, dt, name=f"feat{i}b")(x)
            pyr.append(x)
        return pyr


def bench(tag, cfg, patch=None):
    rng = np.random.default_rng(0)
    H, W = cfg.img_height, cfg.img_width
    t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    saved = []
    if patch:
        for mod, name, obj in patch:
            saved.append((mod, name, getattr(mod, name)))
            setattr(mod, name, obj)
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
        print(f"{tag:<40} {r['ms']:8.2f} ms  {B / r['ms'] * 1000:7.0f} fps",
              flush=True)
        return r["ms"]
    finally:
        for mod, name, obj in saved:
            setattr(mod, name, obj)


def main():
    print("devices:", jax.devices(), flush=True)
    fast = ModelConfig(
        attention="flow_seg", costvol_feat_channels=8, flow_search_range=3
    )
    davo = ModelConfig(attention="flow_seg")
    none = ModelConfig(attention="none")

    s2d_pose = [(pn_mod, "PoseEncoder", S2DPoseEncoder)]
    s2d_pyr = [(fn_mod, "FeaturePyramid", S2DFeaturePyramid)]

    bench("davo-fast (baseline)", fast)
    bench("davo-fast + patches cv",
          dataclasses.replace(fast, costvol_impl="patches"))
    bench("davo (paper) + patches cv",
          dataclasses.replace(davo, costvol_impl="patches"))
    bench("attention=none (floor)", none)
    bench("none + s2d pose stem", none, s2d_pose)
    bench("davo-fast + s2d pose stem", fast, s2d_pose)
    bench("davo-fast + s2d pyramid stem", fast, s2d_pyr)
    bench("davo-fast + s2d both", fast, s2d_pose + s2d_pyr)
    bench("davo-fast + patches + s2d both",
          dataclasses.replace(fast, costvol_impl="patches"),
          s2d_pose + s2d_pyr)


if __name__ == "__main__":
    main()
