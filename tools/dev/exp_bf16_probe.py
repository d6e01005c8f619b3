"""bf16-in-Mosaic timebox probe (VERDICT r3 next-#8 — ONE attempt,
then the book closes).

r3's hardware verdict: every bf16 rowconv variant dies with Mosaic
"Bad lhs type" at the MXU dot — even `bf16_dot` mode, which keeps all
VMEM state f32 and casts ONLY the dot operands. The f32 chains run
and match but lose 3-4x to XLA, largely because f32 MXU rate is 1/4
bf16. If some bf16 dot construct compiles, the family gets one more
in-context shot; if none do, the STATUS note closes permanently.

Probe axes (tiny standalone kernels, P=1024 rows x C=64):
  a. f32 dot (control — must PASS)
  b. whole-ref read -> cast bf16 -> dot_general(pref=f32)
  c. bf16 input refs end-to-end (no cast in kernel)
  d. 16-row-ALIGNED slice -> cast -> dot (vs r3's arbitrary tap slices)
  e. odd-offset slice -> cast -> dot (the r3 failing construct)
  f. dims-swapped contraction ((1,),(1,)) on bf16
  g. preferred_element_type=bf16 (bf16 accum)
  h. mixed: bf16 lhs x f32 rhs
All arms also retried under the scoped-vmem compiler option (the r3
promotion-OOM fix) so an OOM cannot masquerade as a type rejection.

Capability-probe caveat (R3_RESULTS): PASS/FAIL can flip across
terminal sessions; any PASS here only licenses an in-context rerun of
exp_costvol_rows-style serving probes — it is not a production claim.

Usage: tools/dev/tpu_run.sh tools/dev/exp_bf16_probe.py 1800 3
"""

import os
import sys
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

print("devices:", jax.devices(), flush=True)
assert jax.devices()[0].platform == "tpu", "CPU fallback — abort"

P, C = 1024, 64
rng = np.random.default_rng(0)
X32 = jnp.asarray(rng.normal(size=(P, C)), jnp.float32)
XBF = X32.astype(jnp.bfloat16)
W32 = jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32)
WBF = W32.astype(jnp.bfloat16)

VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "131072"}
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def vspec(shape):
    # Variadic index_map: with no grid, pallas calls it with ZERO
    # args (the r4 first-run bug: a unary lambda made every arm FAIL
    # on a Python TypeError masquerading as a kernel failure).
    return pl.BlockSpec(
        tuple(shape),
        partial(lambda nd, *i: (0,) * nd, len(shape)),
        memory_space=pltpu.VMEM,
    )


def run_kernel(body, args, out_shape):
    fn = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct(*out_shape),
        in_specs=[vspec(a.shape) for a in args],
        out_specs=vspec(out_shape[0]),
        compiler_params=CP,
    )
    return jax.jit(fn), args


def attempt(tag, make):
    """Try plain jit, then the scoped-vmem option; report first PASS."""
    for mode in ("plain", "vmem_opt"):
        try:
            fn, args = make()
            if mode == "plain":
                out = jax.block_until_ready(fn(*args))
            else:
                c = fn.lower(*args).compile(compiler_options=VMEM_OPT)
                out = jax.block_until_ready(c(*args))
            print(
                f"{tag:<44} PASS ({mode}) "
                f"absmax={float(jnp.abs(out).max()):.3e}",
                flush=True,
            )
            return True
        except Exception as e:  # noqa: BLE001
            msg = " ".join(str(e).split())[:160]
            if mode == "vmem_opt":
                print(f"{tag:<44} FAIL  {msg}", flush=True)
    return False


# a. f32 control
def body_f32(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


attempt("a f32 dot (control)",
        lambda: run_kernel(body_f32, (X32, W32), ((P, C), jnp.float32)))


# b. whole-ref cast -> bf16 dot, f32 accum
def body_cast(x_ref, w_ref, o_ref):
    xb = x_ref[...].astype(jnp.bfloat16)
    wb = w_ref[...].astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(
        xb, wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


attempt("b cast whole-ref bf16 dot pref=f32",
        lambda: run_kernel(body_cast, (X32, W32), ((P, C), jnp.float32)))


# c. bf16 refs end-to-end
def body_bf(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


attempt("c bf16 input refs dot pref=f32",
        lambda: run_kernel(body_bf, (XBF, WBF), ((P, C), jnp.float32)))


# d/e. sliced lhs (aligned vs odd offset)
def make_slice(offset):
    def body(x_ref, w_ref, o_ref):
        xs = x_ref[pl.dslice(offset, 256), :].astype(jnp.bfloat16)
        wb = w_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            xs, wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return run_kernel(body, (X32, W32), ((256, C), jnp.float32))


attempt("d 16-aligned slice cast bf16 dot", lambda: make_slice(32))
attempt("e odd-offset slice cast bf16 dot", lambda: make_slice(13))


# f. dims-swapped contraction on bf16: contract x dim1 with w dim1
def body_swap(x_ref, w_ref, o_ref):
    xb = x_ref[...].astype(jnp.bfloat16)
    wb = w_ref[...].astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(
        xb, wb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


attempt("f dims ((1,),(1,)) bf16 dot",
        lambda: run_kernel(body_swap, (X32, W32), ((P, C), jnp.float32)))


# g. bf16 accumulate
def body_bfacc(x_ref, w_ref, o_ref):
    xb = x_ref[...].astype(jnp.bfloat16)
    wb = w_ref[...].astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(
        xb, wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    )


attempt("g bf16 dot pref=bf16",
        lambda: run_kernel(body_bfacc, (X32, W32), ((P, C), jnp.bfloat16)))


# h. mixed bf16 lhs x f32 rhs
def body_mixed(x_ref, w_ref, o_ref):
    xb = x_ref[...].astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(
        xb, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


attempt("h mixed bf16 lhs x f32 rhs",
        lambda: run_kernel(body_mixed, (X32, W32), ((P, C), jnp.float32)))

print("done", flush=True)
