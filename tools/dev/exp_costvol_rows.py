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
    ref_out, ref_ms = bench("davo-fast (slices baseline)", fast)
    rows_cfg = dataclasses.replace(fast, costvol_impl="pallas_rows")
    try:
        got_out, rows_ms = bench("davo-fast (pallas_rows)", rows_cfg)
    except Exception as e:
        print("pallas_rows FAILED:", str(e)[:300], flush=True)
        return
    err = np.abs(ref_out - got_out).max()
    print(f"pose equality maxerr={err:.3e}", flush=True)
    # Paper-parity davo too (search=4, 96-ch correlation: more slices,
    # bigger win if dispatch-bound).
    davo = presets.get("davo").model
    _, davo_ms = bench("davo (slices baseline)", davo)
    try:
        bench(
            "davo (pallas_rows)",
            dataclasses.replace(davo, costvol_impl="pallas_rows"),
        )
    except Exception as e:
        print("davo pallas_rows FAILED:", str(e)[:300], flush=True)
    # Fused estimator (one rows-layout Pallas kernel per level) and
    # the combined all-fused candidate.
    try:
        fused_out, _ = bench(
            "davo-fast (fuse_estimator)",
            dataclasses.replace(fast, fuse_estimator=True),
        )
        print(
            f"fused-est pose maxerr={np.abs(ref_out - fused_out).max():.3e}",
            flush=True,
        )
        bench(
            "davo-fast (fused est + rows cv)",
            dataclasses.replace(
                fast, fuse_estimator=True, costvol_impl="pallas_rows"
            ),
        )
    except Exception as e:
        print("fuse_estimator FAILED:", str(e)[:300], flush=True)
    # Cheap config probe: davo-fast with a 3-level pyramid (coarsest
    # /8). On paper-davo this saved ~10 % (r2c); if it repeats here a
    # quality gate (e2e tier) decides adoption.
    bench(
        "davo-fast (flow_levels=3)",
        dataclasses.replace(fast, flow_levels=3),
    )
    bench(
        "davo-fast (rows + levels=3)",
        dataclasses.replace(
            fast, costvol_impl="pallas_rows", flow_levels=3
        ),
    )


if __name__ == "__main__":
    main()
