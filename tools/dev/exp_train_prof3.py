"""Subtractive profile of the REAL train step cost (r4).

exp_train_prof2 + exp_dispatch_probe established:
  - block_until_ready IS a compute fence for big programs here
    (B/A = 1.02), and the serving forward reproduces its r3 number
    (9.3 ms @ B=128) in the same window -> the window is healthy.
  - the flagship train step at B=64 costs ~1146 ms/step — r3's
    2.2-2.8 ms table (exp_train_prof) was an elision artifact class
    also visible as a 0.013 ms "4096^3 matmul".
  - a tiny train step costs ~12 ms -> per-step dispatch overhead is
    small; the 1146 ms is real device time at ~1 % MFU.

This harness decomposes the step by rebuilding the loss from its
pieces and DROPPING one term per arm (XLA DCEs the dead subgraph,
including its backward):

  full            photometric(4 scales) + smooth + flow_losses + sup
  no_flow_loss    drop flow_losses (2 src x 3 levels FULL-RES gather
                  warps + SSIM — prime suspect)
  no_photo        drop photometric+smooth (8 scale-res warps + SSIM)
  photo_s0        photometric at scale 0 only
  sup_only        drop both (net fwd+bwd + Adam only)
  no_ssim         ssim_weight=0 in both photometric and flow terms
  fwd_only        loss value without grad (forward incl. loss terms)

Per-arm JSON, resumable.

Usage: tools/dev/tpu_run.sh tools/dev/exp_train_prof3.py 3600 5
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.config import Config, ModelConfig, TrainConfig
from davo_tpu.train import losses as L
from davo_tpu.train.loop import create_state

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r4_train_prof3.json"
)
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
H, W = 128, 416

print("devices:", jax.devices(), flush=True)
assert jax.devices()[0].platform == "tpu", "CPU fallback — abort"

res: dict = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        res = json.load(f)


def save():
    with open(OUT + ".tmp", "w") as f:
        json.dump(res, f, indent=1, default=float)
        f.write("\n")
    os.replace(OUT + ".tmp", OUT)


cfg = Config(
    model=ModelConfig(img_height=H, img_width=W, attention="flow_seg"),
    train=TrainConfig(
        batch_size=B, smooth_weight=0.1, pose_supervision_weight=100.0
    ),
)
rng = np.random.default_rng(0)
batch = {
    "target": jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32),
    "sources": jnp.asarray(rng.uniform(size=(B, 2, H, W, 3)), jnp.float32),
    "K": jnp.asarray(
        np.tile(
            np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]],
                     np.float32),
            (B, 1, 1),
        )
    ),
    "seg": jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32),
    "gt_pose": jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (B, 2, 1, 1))
    ),
}
model, state0, tx = create_state(cfg, jax.random.key(0), batch)


def build_loss(photo_scales, flow_on, photo_on, ssim_w, flow_res="full"):
    def loss_fn(params, batch):
        outputs = model.apply(
            params, batch["target"], batch["sources"],
            seg=batch["seg"], train=True,
        )
        loss = 0.0
        if photo_on:
            disps = outputs["disp"][:photo_scales]
            photo = L.photometric_loss(
                disps, outputs["poses"], batch["target"],
                batch["sources"], batch["K"], ssim_w,
                masking="border",
            )
            smooth = L.smoothness_loss(outputs["disp"], batch["target"])
            loss = loss + photo + 0.1 * smooth
        if flow_on:
            loss = loss + L.flow_losses(
                outputs["flows"], batch["target"], batch["sources"],
                ssim_w, masking="border", res_mode=flow_res,
            )
        sup = L.pose_supervision_loss(
            outputs["poses"], batch["gt_pose"], 10.0
        )
        return loss + 100.0 * sup

    return loss_fn


def bench_step(tag, loss_fn, grad=True):
    if tag in res:
        print(f"{tag}: done previously ({res[tag]['ms']:.1f} ms)",
              flush=True)
        return
    if grad:
        @functools.partial(jax.jit, donate_argnums=0)
        def step(state, batch):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch)
            )(state["params"])
            updates, opt_state = tx.update(
                grads, state["opt"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            return {"params": params, "opt": opt_state}, loss
    else:
        @jax.jit
        def value(params, batch):
            return loss_fn(params, batch)

    if grad:
        # Fresh param COPIES per arm: the step donates its state, and
        # donating state0.params itself would delete the buffers every
        # later arm (and fwd_only) still needs.
        params = jax.tree.map(jnp.copy, state0.params)
        state = {"params": params, "opt": tx.init(params)}
        state, l0 = step(state, batch)
        float(l0)  # D2H fence
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            tot = 0.0
            for _ in range(4):
                state, l = step(state, batch)
                tot += float(l)  # per-step D2H: cannot elide
            times.append((time.perf_counter() - t0) / 4)
    else:
        float(value(state0.params, batch))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                v = float(value(state0.params, batch))
            times.append((time.perf_counter() - t0) / 4)
    ms = min(times) * 1000.0
    res[tag] = {"ms": ms, "all_ms": [t * 1e3 for t in times]}
    save()
    print(f"{tag:<20} {ms:9.1f} ms/step  ({B / ms * 1000:7.0f} frames/s)",
          flush=True)


bench_step("full", build_loss(4, True, True, 0.85))
bench_step("no_flow_loss", build_loss(4, False, True, 0.85))
bench_step("no_photo", build_loss(4, True, False, 0.85))
bench_step("photo_s0", build_loss(1, False, True, 0.85))
bench_step("sup_only", build_loss(4, False, False, 0.85))
bench_step("no_ssim", build_loss(4, True, True, 0.0))
bench_step("fwd_only", build_loss(4, True, True, 0.85), grad=False)
# The remedy: flow photometric at level resolution (losses.flow_losses
# res_mode="level") — expect ~full minus ~720 ms.
bench_step("flow_level_loss", build_loss(4, True, True, 0.85, "level"))

# In-context A/B of the r4 block-gather bilinear sampler (installed
# as the core/warp default after results_r4_warp_probe.json: 1.39x
# fwd / 1.30x grad per full-res warp, standalone). Both arms run
# FRESH in one window (the cached flow_level_loss above predates the
# block default — a different window AND the take4 gather; it is the
# historical anchor only). Photometric's full-res warps are the
# remaining gather load under res_mode="level".
from davo_tpu.core import warp as _warp  # noqa: E402

_warp._DEFAULT_GATHER = "take4"
bench_step("flow_level_take4", build_loss(4, True, True, 0.85, "level"))
_warp._DEFAULT_GATHER = "block"
bench_step("flow_level_block", build_loss(4, True, True, 0.85, "level"))
# Gather-free banded Pallas warp (kernels/bandwarp.py) in the REAL
# train step — the production GO/NO-GO for the kernel (standalone
# numbers: exp_warp_probe2).
_warp._DEFAULT_GATHER = "banded"
bench_step("flow_level_banded", build_loss(4, True, True, 0.85, "level"))
_warp._DEFAULT_GATHER = os.environ.get("DAVO_WARP_GATHER", "block")

print(json.dumps({k: round(v["ms"], 1) for k, v in res.items()},
                 indent=1), flush=True)
print("->", OUT, flush=True)
