"""Per-computation compiler_options probe (r3).

XLA_FLAGS cannot carry --xla_tpu_scoped_vmem_limit_kib: this jaxlib's
client-side parse_flags_from_env FATALS on it (F-check, "Unknown flag
in XLA_FLAGS") because its DebugOptions proto predates the field. The
PJRT alternative is per-computation env_option_overrides —
`jitted.lower(...).compile(compiler_options={...})` — which the
client forwards unvalidated; parsing happens in the axon helper's
libtpu, where the flag exists (the OOM error text itself references
its doc page).

Reproduces the exact production failure (cost_volume_pallas_rows at
B=128, level-3 shape: stack-allocates the (128, 832, 49) result in
VMEM, 16.87M > 16M scoped default) and retries with the option.

Run: TPU_RUN_SKIP_PROBE=1 tools/dev/tpu_run.sh tools/dev/exp_copts.py 900 8
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from probe_common import compile_error_summary  # noqa: E402

print("devices:", jax.devices(), flush=True)
assert jax.devices()[0].platform == "tpu", "CPU fallback — abort"

from davo_tpu.kernels.costvol import cost_volume_pallas_rows  # noqa: E402

B, H, W, C, SEARCH = 128, 16, 52, 8, 3
rng = np.random.default_rng(0)
f1 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
f2 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)

fn = jax.jit(lambda a, b: cost_volume_pallas_rows(a, b, SEARCH))


def attempt(tag, run):
    try:
        out = jax.block_until_ready(run())
        print(f"{tag}: PASS absmax={float(jnp.abs(out).max()):.3e}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAIL — {compile_error_summary(e)}", flush=True)
        return False


# a. plain jit — expect the scoped-vmem OOM (negative control)
attempt("a. plain jit", lambda: fn(f1, f2))

# b. AOT with the scoped-vmem option — the fix candidate
low = fn.lower(f1, f2)
attempt(
    "b. compiler_options scoped-vmem 64M",
    lambda: low.compile(
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"}
    )(f1, f2),
)
