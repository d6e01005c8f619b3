"""In-context measurement of costvol_impl="pallas_rows" (r3).

The r2c profile showed the cost volume's cost scales with SLICE-KERNEL
COUNT (~33 us dispatch each; search=3 x 3 levels = 147 kernels). The
rows-layout one-kernel-per-level Pallas costvol collapses that to 3
dispatches with no transpose on its output path. This measures the
REAL davo-fast serving program (the r1 lesson: kernels that win
standalone can lose in context by blocking XLA fusion — the old
use_pallas kernel cost 1,100 fps e2e).

Usage: tools/dev/tpu_run.sh tools/dev/exp_costvol_rows.py 3600 3
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

from davo_tpu.models import presets
from davo_tpu.models.davo import DavoModel
from davo_tpu.utils.profiling import timed

B = 128


def bench(tag, cfg):
    rng = np.random.default_rng(0)
    H, W = cfg.img_height, cfg.img_width
    t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    model = DavoModel(cfg)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), t, s, train=False, seg=seg
    )
    f = jax.jit(
        lambda a, b, c: model.apply(params, a, b, seg=c, train=False)[
            "poses"
        ]
    )
    out = jax.block_until_ready(f(t, s, seg))
    r = timed(f, t, s, seg, iters=10, loops=5)
    print(
        f"{tag:<36} {r['ms']:8.2f} ms  {B / r['ms'] * 1000:7.0f} fps",
        flush=True,
    )
    return np.asarray(out), r["ms"]


def main():
    print("devices:", jax.devices(), flush=True)
    fast = presets.get("davo-fast").model
    davo = presets.get("davo").model
    ref_out, _ = bench("davo-fast (slices baseline)", fast)

    # Every probe is independent: a Mosaic failure in one must not
    # skip the rest (TPU access is scarce and serialized).
    probes = [
        (
            "davo-fast (pallas_rows)",
            dataclasses.replace(fast, costvol_impl="pallas_rows"),
            True,
        ),
        ("davo (slices baseline)", davo, False),
        (
            "davo (pallas_rows)",
            dataclasses.replace(davo, costvol_impl="pallas_rows"),
            False,
        ),
        (
            "davo-fast (fuse_estimator)",
            dataclasses.replace(fast, fuse_estimator=True),
            True,
        ),
        (
            "davo-fast (fused est + rows cv)",
            dataclasses.replace(
                fast, fuse_estimator=True, costvol_impl="pallas_rows"
            ),
            True,
        ),
        (
            "davo-fast (fuse_flow_level)",
            dataclasses.replace(fast, fuse_flow_level=True),
            True,
        ),
        (
            "davo (fuse_flow_level)",
            dataclasses.replace(davo, fuse_flow_level=True),
            False,
        ),
        # Cheap config probe: 3-level pyramid saved ~10 % on paper-davo
        # (r2c); if it repeats, a quality gate (e2e tier) decides.
        (
            "davo-fast (flow_levels=3)",
            dataclasses.replace(fast, flow_levels=3),
            False,
        ),
        (
            "davo-fast (rows + levels=3)",
            dataclasses.replace(
                fast, costvol_impl="pallas_rows", flow_levels=3
            ),
            False,
        ),
    ]
    for tag, cfg, check_equal in probes:
        try:
            out, _ = bench(tag, cfg)
        except Exception as e:
            print(f"{tag} FAILED: {str(e)[:300]}", flush=True)
            continue
        if check_equal:
            print(
                f"  pose-vs-baseline maxerr={np.abs(ref_out - out).max():.3e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
