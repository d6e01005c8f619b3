"""Online-serving latency profile: davo-fast pose inference vs batch.

Real odometry serves frame pairs as they arrive; bench.py's B=128
throughput number hides the B=1 latency floor (dominated by per-kernel
dispatch on this stack — the quantity the fused serving kernels
attack). Measures ms/invocation and frames/s at B = 1..128, on the
plain davo-fast config and, when a valid BENCH_FLAGS.json exists, on
the hardware-validated fused config for comparison.

Usage: tools/dev/tpu_run.sh tools/dev/exp_latency.py 3600 3
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from probe_common import ROOT, fingerprint  # noqa: E402

from davo_tpu.models import presets  # noqa: E402
from davo_tpu.models.davo import DavoModel  # noqa: E402
from davo_tpu.utils.profiling import timed  # noqa: E402

BATCHES = (1, 4, 16, 64, 128)


def profile(tag, cfg, opts=None):
    rng = np.random.default_rng(0)
    H, W = cfg.img_height, cfg.img_width
    model = DavoModel(cfg)
    t128 = jnp.asarray(rng.uniform(size=(128, H, W, 3)), jnp.float32)
    s128 = jnp.asarray(rng.uniform(size=(128, 1, H, W, 3)), jnp.float32)
    g128 = jnp.asarray(rng.integers(0, 19, (128, H, W)), jnp.int32)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), t128, s128, train=False, seg=g128
    )
    jf = jax.jit(
        lambda a, b, c: model.apply(params, a, b, seg=c, train=False)[
            "poses"
        ]
    )
    for B in BATCHES:
        t, s, g = t128[:B], s128[:B], g128[:B]
        # per-batch-shape compile; apply the winner's compiler options
        # (the fused kernels need the scoped-vmem raise, R3_RESULTS)
        f = (
            jf.lower(t, s, g).compile(compiler_options=opts)
            if opts
            else jf
        )
        jax.block_until_ready(f(t, s, g))
        r = timed(f, t, s, g, iters=20, loops=5)
        print(
            f"{tag:<24} B={B:<4} {r['ms']:8.3f} ms/call  "
            f"{B / r['ms'] * 1000:8.0f} fps",
            flush=True,
        )


def main():
    print("devices:", jax.devices(), flush=True)
    if jax.devices()[0].platform != "tpu":
        print("REFUSING: not on TPU (serving-latency numbers must be "
              "chip numbers — ADVICE r2)", flush=True)
        sys.exit(2)
    cfg = presets.get("davo-fast")
    profile("davo-fast", cfg.model)
    flags_path = os.path.join(ROOT, "BENCH_FLAGS.json")
    if os.path.exists(flags_path):
        with open(flags_path) as fh:
            flags = json.load(fh)
        if (
            flags.get("validated_on") == "tpu"
            and flags.get("fingerprint") == fingerprint()
        ):
            from davo_tpu.config import apply_overrides

            profile(
                f"fused ({flags['probe']})",
                apply_overrides(cfg, flags["overrides"]).model,
                opts=flags.get("compiler_options") or None,
            )
        else:
            print("BENCH_FLAGS.json stale/unvalidated; skipped", flush=True)


if __name__ == "__main__":
    main()
