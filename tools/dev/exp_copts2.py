"""Scoped-vmem promotion probe, stage 2 (r3).

Stage 1 (exp_copts.py) proved compiler_options forward and fix the
level-3 OOM — but the level-2 costvol OOMs even at a 64M limit (XLA
promotes a 112.68M footprint; the limit only moves the cliff), and the
with-option baselines measured ~9-21 % slower than r2's no-option
baselines. Two follow-up hypotheses, each one probe:

  a. negative control: current cost_volume_pallas_rows at the LEVEL-2
     shape (P=3328, D=49), plain jit -> expect OOM
  b. same kernel but BlockSpecs WITHOUT memory_space=pltpu.VMEM
     (plain blocked pipelining, compiler-chosen spaces), plain jit —
     if this compiles, the explicit VMEM memory_space on blocked
     specs is what invites whole-operand stack promotion and the
     kernels can drop it (no compiler option needed at all)
  c. b + the 64M option (interaction check)
  d/e. davo-fast full-model baseline timed WITHOUT vs WITH the 64M
     option, same process — is the option's baseline cost real?

Run: TPU_RUN_SKIP_PROBE=1 tools/dev/tpu_run.sh tools/dev/exp_copts2.py 2400 8
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
from probe_common import compile_error_summary  # noqa: E402

print("devices:", jax.devices(), flush=True)
assert jax.devices()[0].platform == "tpu", "CPU fallback — abort"

from davo_tpu.kernels.costvol import (  # noqa: E402
    _costvol_rows_kernel,
    cost_volume_pallas_rows,
)

B, H, W, C, SEARCH = 128, 32, 104, 8, 3
P, D = H * W, (2 * SEARCH + 1) ** 2
pad = SEARCH * W + SEARCH
rng = np.random.default_rng(0)
f1 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
f2 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)

OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def attempt(tag, run):
    try:
        out = jax.block_until_ready(run())
        print(f"{tag}: PASS absmax={float(jnp.abs(out).max()):.3e}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAIL — {compile_error_summary(e)}", flush=True)
        return False


def rows_nospace(a, b):
    return pl.pallas_call(
        partial(_costvol_rows_kernel, height=H, width=W, search=SEARCH),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, P, C), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, P, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * pad, C), jnp.float32)],
    )(a.reshape(B, P, C), b.reshape(B, P, C)).reshape(B, H, W, D)


attempt(
    "a. level-2 current kernel, plain jit",
    lambda: jax.jit(lambda a, b: cost_volume_pallas_rows(a, b, SEARCH))(
        f1, f2
    ),
)
attempt(
    "b. level-2 no-memory_space specs, plain jit",
    lambda: jax.jit(rows_nospace)(f1, f2),
)
attempt(
    "c. level-2 no-memory_space + 64M option",
    lambda: jax.jit(rows_nospace).lower(f1, f2).compile(
        compiler_options=OPTS
    )(f1, f2),
)
# The level-2 promotion footprint is 112.68M; v5e VMEM is 128M, so a
# 128M scoped limit might just fit (promoted arrays + kernel windows).
attempt(
    "f. level-2 current kernel + 128M option",
    lambda: jax.jit(
        lambda a, b: cost_volume_pallas_rows(a, b, SEARCH)
    ).lower(f1, f2).compile(
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "131072"}
    )(f1, f2),
)

# --- d/e: is the option's baseline cost real? --------------------------
from davo_tpu.models import presets  # noqa: E402
from davo_tpu.models.davo import DavoModel  # noqa: E402
from davo_tpu.utils.profiling import timed  # noqa: E402

cfg = presets.get("davo-fast").model
t = jnp.asarray(rng.uniform(size=(B, cfg.img_height, cfg.img_width, 3)),
                jnp.float32)
s = jnp.asarray(
    rng.uniform(size=(B, 1, cfg.img_height, cfg.img_width, 3)), jnp.float32
)
seg = jnp.asarray(
    rng.integers(0, 19, (B, cfg.img_height, cfg.img_width)), jnp.int32
)
model = DavoModel(cfg)
params = jax.jit(model.init, static_argnames=("train",))(
    jax.random.key(0), t, s, train=False, seg=seg
)
low = jax.jit(
    lambda a, b, c: model.apply(params, a, b, seg=c, train=False)["poses"]
).lower(t, s, seg)
for tag, opts in (("d. baseline no-options", None),
                  ("e. baseline 64M option", OPTS)):
    fn = low.compile() if opts is None else low.compile(
        compiler_options=opts
    )
    jax.block_until_ready(fn(t, s, seg))
    r = timed(fn, t, s, seg, iters=10, loops=5)
    print(f"{tag}: {r['ms']:.2f} ms  {B / r['ms'] * 1000:.0f} fps",
          flush=True)
