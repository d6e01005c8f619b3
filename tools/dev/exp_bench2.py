"""Quick full-model re-bench after perf changes (B=128 flagship)."""

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
from davo_tpu.models.flownet import FlowNetLite
from davo_tpu.utils.profiling import timed

B = 128


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig(attention="flow_seg")
    H, W = cfg.img_height, cfg.img_width
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)

    net = FlowNetLite(cfg)
    fp = jax.jit(net.init)(jax.random.key(0), t, s[:, 0])
    ff = jax.jit(lambda a, b: net.apply(fp, a, b)[0])
    jax.block_until_ready(ff(t, s[:, 0]))
    r = timed(ff, t, s[:, 0], iters=10, loops=5)
    print(f"flownet forward      {r['ms']:8.2f} ms", flush=True)

    model = DavoModel(cfg)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), t, s, seg=seg, train=False
    )
    f = jax.jit(
        lambda a, b, c: model.apply(params, a, b, seg=c, train=False)["poses"]
    )
    jax.block_until_ready(f(t, s, seg))
    r = timed(f, t, s, seg, iters=10, loops=5)
    print(
        f"full flow_seg model  {r['ms']:8.2f} ms -> {B / r['ms'] * 1000:.0f} frames/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
