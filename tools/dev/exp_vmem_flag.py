"""Scoped-VMEM flag probe (r3).

R3_RESULTS: the remote-compile HTTP 500s are XLA stack-allocating the
pallas custom call's whole operands/result in VMEM (layout `S(1)`) and
blowing the 16 MiB *scoped* vmem limit — a limit the kernel-side
`CompilerParams(vmem_limit_bytes=...)` does NOT govern. XLA's knob is
the DebugOptions flag `--xla_tpu_scoped_vmem_limit_kib` (default
16384). The axon compile helper forwards proto-backed xla_* flags from
the client's XLA_FLAGS per-compile, so the client can raise it.

This probe compiles the smallest known-OOM reproducer (1-layer
conv_chain_nhwc at B=4, 32x104x64 — exact stage-5 failure) and prints
PASS or the full classified error. Run it twice:

  tools/dev/tpu_run.sh tools/dev/exp_vmem_flag.py 600 2           # expect FAIL (OOM)
  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
  tools/dev/tpu_run.sh tools/dev/exp_vmem_flag.py 600 2           # hypothesis: PASS

A flip FAIL->PASS proves the flag forwards and fixes the promotion
OOM; production wiring then sets it in bench.py/serving entries.
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
assert jax.devices()[0].platform == "tpu", (
    "CPU fallback — probe results would be meaningless (ADVICE.md)"
)
print("XLA_FLAGS:", os.environ.get("XLA_FLAGS", "<unset>"), flush=True)

from davo_tpu.kernels.rowconv import conv_chain_nhwc  # noqa: E402

H, W, C = 32, 104, 64
B = 4
rng = np.random.default_rng(0)
X3 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.1, jnp.float32)
b = jnp.ones((C,), jnp.float32)

try:
    out = jax.block_until_ready(
        jax.jit(
            lambda x: conv_chain_nhwc(x, [w], [b], (True,), "float32")
        )(X3)
    )
    print(f"conv_chain_nhwc 1L tiny: PASS absmax={float(jnp.abs(out).max()):.3e}",
          flush=True)
except Exception as e:  # noqa: BLE001
    print("conv_chain_nhwc 1L tiny: FAIL —", compile_error_summary(e),
          flush=True)
    sys.exit(1)
