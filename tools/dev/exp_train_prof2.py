"""Train-step timing cross-check (r3 anomaly).

exp_train_prof measured davo B=128 at 2.24 ms/step — but XLA's own
cost analysis puts the train step at 14.2x the inference forward's
FLOPs (two sources + backward + multi-scale losses), so that rate
implies ~11x the chip's peak: the measurement is wrong. Suspect:
`jax.block_until_ready` on the axon tunnel backend may not force
completion of the donated-state chain (RPC-ack instead of
compute-done).

A/B at the same config:
  A. harness style — 8 chained steps, block_until_ready(params) once
  B. truth style   — same 8 steps, but each step's loss scalar is
     pulled to HOST (D2H np.asarray), which cannot complete before
     the step's compute does
  C. param-delta check — params must actually change (no elision)

If B >> A, every absolute number in exp_train_prof is invalid and the
harness must sync via D2H.

Run: TPU_RUN_SKIP_PROBE=1 tools/dev/tpu_run.sh tools/dev/exp_train_prof2.py 1800 8
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

from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.train.loop import create_state, make_train_step

print("devices:", jax.devices(), flush=True)
assert jax.devices()[0].platform == "tpu", "CPU fallback — abort"

B, H, W = 64, 128, 416
rng = np.random.default_rng(0)
batch = {
    "target": jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32),
    "sources": jnp.asarray(
        rng.uniform(size=(B, 2, H, W, 3)), jnp.float32
    ),
    "K": jnp.asarray(
        np.tile(
            np.array(
                [[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]],
                np.float32,
            ),
            (B, 1, 1),
        )
    ),
    "seg": jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32),
}
cfg = Config(
    model=ModelConfig(img_height=H, img_width=W, attention="flow_seg"),
    train=TrainConfig(batch_size=B, smooth_weight=0.1),
)
model, state, tx = create_state(cfg, jax.random.key(0), batch)
step = make_train_step(model, tx, cfg)

p0 = float(
    jnp.linalg.norm(
        jax.flatten_util.ravel_pytree(state.params)[0].astype(jnp.float32)
    )
)

# warmup/compile
state, m = step(state, batch)
jax.block_until_ready(state.params)

# A. harness style
times_a = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(8):
        state, m = step(state, batch)
    jax.block_until_ready(state.params)
    times_a.append((time.perf_counter() - t0) / 8)
print(f"A harness-style block(params): {min(times_a)*1000:8.2f} ms/step",
      flush=True)

# B. truth style (per-step D2H of the loss scalar)
times_b = []
for _ in range(3):
    t0 = time.perf_counter()
    tot = 0.0
    for _ in range(8):
        state, m = step(state, batch)
        tot += float(m["total"])  # D2H: cannot complete before compute
    times_b.append((time.perf_counter() - t0) / 8)
print(f"B per-step D2H loss sync:      {min(times_b)*1000:8.2f} ms/step "
      f"(loss sum {tot:.4f})", flush=True)

p1 = float(
    jnp.linalg.norm(
        jax.flatten_util.ravel_pytree(state.params)[0].astype(jnp.float32)
    )
)
print(f"C param-norm before/after: {p0:.4f} -> {p1:.4f} "
      f"(delta {abs(p1 - p0):.4f})", flush=True)
print(f"B/A ratio: {min(times_b) / min(times_a):.2f}", flush=True)
