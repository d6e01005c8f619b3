"""Space-to-depth first-conv probe (serving forward, in-context).

The r4 fusion map (results_r4_serving_bites.json) puts the single
largest device op at posenet enc0 — a 7x7/2 conv contracting over
just 9 input channels (700 us/call at B=128, ~7 % of the MXU's
contraction lanes used); flownet feat0a (3 ch) is the same disease.
`ModelConfig.s2d_first_conv` evaluates both through the exact
space-to-depth rewrite (models/common.conv_same_stride2_s2d: C -> 4C,
H,W -> /2, stride-1 conv, algebraically identical — CPU-equality
tested in tests/test_models.py::TestS2dFirstConv).

Arms (davo-fast, per-arm JSON, resumable; A/B within ONE window):

  eq_f32          f32 forward s2d vs plain at B=8, atol 1e-4
  eq_bf16         production bf16 poses s2d vs plain at B=128
  fwd_B{B}_{arm}  B in {128, 256} x {plain, s2d} timing

Usage: tools/dev/tpu_run.sh tools/dev/exp_s2d_conv.py 3600 5
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.models import presets
from davo_tpu.models.davo import DavoModel

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r4_s2d.json"
)

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


base = presets.get("davo-fast").model
cfgs = {
    "plain": base,
    "s2d": dataclasses.replace(base, s2d_first_conv=True),
}
H, W = base.img_height, base.img_width
rng = np.random.default_rng(0)


def inputs(B):
    t = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 1, H, W, 3)), jnp.float32)
    g = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    return t, s, g


t8, s8, g8 = inputs(8)
params = jax.jit(
    DavoModel(cfgs["plain"]).init, static_argnames=("train",)
)(jax.random.key(0), t8, s8, seg=g8, train=False)


def infer_fn(cfg):
    model = DavoModel(cfg)

    @jax.jit
    def infer(t, s, g):
        return model.apply(params, t, s, seg=g, train=False)["poses"]

    return infer


# --- equality ---------------------------------------------------------
if "eq_f32" not in res:
    f32 = {
        k: dataclasses.replace(v, compute_dtype="float32")
        for k, v in cfgs.items()
    }
    ya = np.asarray(infer_fn(f32["plain"])(t8, s8, g8))
    yb = np.asarray(infer_fn(f32["s2d"])(t8, s8, g8))
    err = float(np.abs(ya - yb).max())
    res["eq_f32"] = {"max_abs_err": err, "pass": err < 1e-4}
    print(f"eq_f32: {err:.2e}", flush=True)
    save()
    assert err < 1e-4, "s2d != plain in f32 on chip — abort"

if "eq_bf16" not in res:
    t, s, g = inputs(128)
    ya = np.asarray(infer_fn(cfgs["plain"])(t, s, g))
    yb = np.asarray(infer_fn(cfgs["s2d"])(t, s, g))
    err = float(np.abs(ya - yb).max())
    scale = float(np.abs(ya).mean())
    res["eq_bf16"] = {"max_abs_err": err, "mean_abs_pose": scale}
    print(f"eq_bf16: max_abs_err={err:.2e} (mean |pose| {scale:.3e})",
          flush=True)
    save()

# --- timing (interleaved plain/s2d within the window) -----------------
for B in (128, 256):
    for arm in ("plain", "s2d"):
        tag = f"fwd_B{B}_{arm}"
        if tag in res:
            print(f"{tag}: done ({res[tag].get('fps', 0):.0f} fps)",
                  flush=True)
            continue
        try:
            t, s, g = inputs(B)
            infer = infer_fn(cfgs[arm])
            y = infer(t, s, g)
            jax.block_until_ready(y)
            times = []
            for _ in range(7):
                t0 = time.perf_counter()
                for _ in range(8):
                    y = infer(t, s, g)
                jax.block_until_ready(y)
                times.append((time.perf_counter() - t0) / 8)
            ms = min(times) * 1e3
            res[tag] = {
                "ms": ms,
                "fps": B / ms * 1e3,
                "med_fps": B / (sorted(times)[len(times) // 2] * 1e3)
                * 1e3,
            }
            print(f"{tag:<16} {ms:8.3f} ms  {res[tag]['fps']:8.0f} fps "
                  f"(med {res[tag]['med_fps']:.0f})", flush=True)
        except Exception as e:  # noqa: BLE001
            res[tag] = {"error": " ".join(str(e).split())[:300]}
            print(f"{tag}: FAIL {res[tag]['error'][:120]}", flush=True)
        save()

for B in (128, 256):
    a, b = res.get(f"fwd_B{B}_plain"), res.get(f"fwd_B{B}_s2d")
    if a and b and "fps" in a and "fps" in b:
        print(f"B={B}: s2d/plain fps = {b['fps']/a['fps']:.3f}",
              flush=True)
print("done", flush=True)
