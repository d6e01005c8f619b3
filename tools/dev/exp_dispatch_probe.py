"""Dispatch-overhead probe: is the tunnel window healthy?

Times (a) a chained jitted matmul (pure-compute reference), (b) the
davo-fast serving forward at B=128 (known ~8.4 ms from exp_latency),
(c) a tiny train step. If all three show ~1 s/call, the tunnel is in
a degraded per-dispatch mode and absolute numbers from this window
are invalid; if (a)/(b) match r3 and only the full train step is slow,
the train-step cost is real.

Usage: tools/dev/tpu_run.sh tools/dev/exp_dispatch_probe.py 1500 3
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

print("devices:", jax.devices(), flush=True)
assert jax.devices()[0].platform == "tpu", "CPU fallback — abort"


def timeit(tag, fn, x, iters=8, loops=5):
    y = fn(x)
    jax.block_until_ready(y)
    times = []
    for _ in range(loops):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = fn(y)
        jax.block_until_ready(y)
        times.append((time.perf_counter() - t0) / iters)
    print(f"{tag:<40} min {min(times)*1e3:9.3f} ms  "
          f"med {sorted(times)[len(times)//2]*1e3:9.3f} ms", flush=True)
    return min(times)


# (a) pure-compute chained matmul: 4096^3 matmul ~ 0.7 ms at 200 TF/s
x = jnp.asarray(np.random.default_rng(0).normal(size=(4096, 4096)),
                jnp.bfloat16)
mm = jax.jit(lambda a: a @ a / 64.0)
timeit("chained bf16 4096^3 matmul", mm, x)

# (a2) same chain, but each loop ends with a D2H scalar pull — if this
# is >> (a), block_until_ready on this tunnel is NOT a compute fence
# and every block-synced absolute number needs re-deriving.
def mm_d2h(a):
    y = a
    for _ in range(8):
        y = mm(y)
    return float(jnp.sum(y.astype(jnp.float32)))

y0 = mm_d2h(x)
times = []
for _ in range(5):
    t0 = time.perf_counter()
    s = mm_d2h(x)
    times.append((time.perf_counter() - t0) / 8)
print(f"{'matmul chain + D2H scalar':<40} min {min(times)*1e3:9.3f} ms  "
      f"med {sorted(times)[2]*1e3:9.3f} ms (sum {s:.1f})", flush=True)

# (b) serving forward at B=128 (expected ~8.4 ms, exp_latency r3)
from davo_tpu.models import presets
from davo_tpu.models.davo import DavoModel

cfg = presets.get("davo-fast").model
model = DavoModel(cfg)
rng = np.random.default_rng(0)
B, H, W = 128, cfg.img_height, cfg.img_width
tgt = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
src = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
seg = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
params = jax.jit(model.init, static_argnames=("train",))(
    jax.random.key(0), tgt, src, seg=seg, train=False
)

@jax.jit
def infer(tgt):
    return model.apply(params, tgt, src, seg=seg, train=False)["poses"]

y = infer(tgt)
jax.block_until_ready(y)
times = []
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(8):
        y = infer(tgt)
    jax.block_until_ready(y)
    times.append((time.perf_counter() - t0) / 8)
print(f"{'davo-fast serving fwd B=128':<40} min {min(times)*1e3:9.3f} ms  "
      f"med {sorted(times)[2]*1e3:9.3f} ms "
      f"({B/min(times):.0f} fps)", flush=True)

# (c) tiny train step (48x64, tiny channels): compute ~nothing, so its
# wall time ~= per-dispatch overhead of a train-step-shaped program.
from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.train.loop import create_state, make_train_step

tcfg = Config(
    model=ModelConfig(
        img_height=48, img_width=64, pose_channels=(8, 12, 16),
        disp_channels=(8, 12, 16), flow_levels=2, flow_search_range=2,
        attention="flow_seg", compute_dtype="float32",
    ),
    train=TrainConfig(batch_size=8, smooth_weight=0.1),
)
b = {
    "target": jnp.asarray(rng.uniform(size=(8, 48, 64, 3)), jnp.float32),
    "sources": jnp.asarray(rng.uniform(size=(8, 2, 48, 64, 3)), jnp.float32),
    "K": jnp.asarray(np.tile(np.array(
        [[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32), (8, 1, 1))),
    "seg": jnp.asarray(rng.integers(0, 19, (8, 48, 64)), jnp.int32),
}
tmodel, tstate, ttx = create_state(tcfg, jax.random.key(0), b)
tstep = make_train_step(tmodel, ttx, tcfg)
tstate, _ = tstep(tstate, b)
jax.block_until_ready(tstate.params)
times = []
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(8):
        tstate, _ = tstep(tstate, b)
    jax.block_until_ready(tstate.params)
    times.append((time.perf_counter() - t0) / 8)
print(f"{'tiny train step B=8 48x64':<40} min {min(times)*1e3:9.3f} ms  "
      f"med {sorted(times)[2]*1e3:9.3f} ms", flush=True)
