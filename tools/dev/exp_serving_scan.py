"""Dispatch-amortized serving probe: K batches per device call.

The r4 op-level profile (results_r4_serving_bites.json) measured the
B=128 serving forward at 8.96 ms wall vs 6.13 ms device — a ~2.8 ms
per-call host+dispatch gap over the tunnel that batch size only
partially amortizes (B=256 wins at 14.9k fps, B>=384 regresses).
`lax.scan` over K stacked batches pays that gap once per K batches
with zero change in numerics (the scan body is the same forward).
Production path: eval/runner.make_pose_apply_scan_fn +
predict_sequence(scan_chunks=K); this probe measures the same program
shape bench.py would flip to.

Arms (davo-fast, bench.py's serving config, per-arm JSON, resumable):

  eq_check          scan(K=2, B=128) == per-call, atol 1e-5
  scan_B{B}_K{K}    B in {128, 256}, K in {1, 2, 4, 8}, K*B <= 2048
                    (K=1 scan re-measures the per-call baseline shape
                    in the SAME window — the A/B is in-window only)

Usage: tools/dev/tpu_run.sh tools/dev/exp_serving_scan.py 3600 5
"""

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
    else "/root/repo/results_r4_serving_scan.json"
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


cfg = presets.get("davo-fast").model
H, W = cfg.img_height, cfg.img_width
model = DavoModel(cfg)
rng = np.random.default_rng(0)

_t0 = jnp.asarray(rng.uniform(size=(8, H, W, 3)), jnp.float32)
_s0 = jnp.asarray(rng.uniform(size=(8, 1, H, W, 3)), jnp.float32)
_g0 = jnp.asarray(rng.integers(0, 19, (8, H, W)), jnp.int32)
params = jax.jit(model.init, static_argnames=("train",))(
    jax.random.key(0), _t0, _s0, seg=_g0, train=False
)


@jax.jit
def infer(t, s, g):
    return model.apply(params, t, s, seg=g, train=False)["poses"]


@jax.jit
def infer_scan(t, s, g):
    def body(_, xs):
        tt, ss, gg = xs
        out = model.apply(params, tt, ss, seg=gg, train=False)
        return None, out["poses"]

    return jax.lax.scan(body, None, (t, s, g))[1]


def inputs(K, B):
    t = jnp.asarray(rng.uniform(size=(K, B, H, W, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(K, B, 1, H, W, 3)), jnp.float32)
    g = jnp.asarray(rng.integers(0, 19, (K, B, H, W)), jnp.int32)
    return t, s, g


# --- equality: scan == per-call ------------------------------------
if "eq_check" not in res:
    t, s, g = inputs(2, 128)
    y_scan = np.asarray(infer_scan(t, s, g))
    y0 = np.asarray(infer(t[0], s[0], g[0]))
    y1 = np.asarray(infer(t[1], s[1], g[1]))
    err = float(
        max(np.abs(y_scan[0] - y0).max(), np.abs(y_scan[1] - y1).max())
    )
    res["eq_check"] = {"max_abs_err": err, "pass": err < 1e-5}
    print(f"eq_check: max_abs_err={err:.2e}", flush=True)
    save()
    assert err < 1e-5, "scan path diverges from per-call — abort"

# --- timing sweep ---------------------------------------------------
for B in (128, 256):
    for K in (1, 2, 4, 8):
        if K * B > 2048:
            continue
        tag = f"scan_B{B}_K{K}"
        if tag in res:
            print(f"{tag}: done ({res[tag].get('fps', 0):.0f} fps)",
                  flush=True)
            continue
        try:
            t, s, g = inputs(K, B)
            y = infer_scan(t, s, g)
            jax.block_until_ready(y)
            iters = max(1, 8 // K)
            times = []
            for _ in range(7):
                t0 = time.perf_counter()
                for _ in range(iters):
                    y = infer_scan(t, s, g)
                jax.block_until_ready(y)
                times.append((time.perf_counter() - t0) / iters)
            ms = min(times) * 1e3
            res[tag] = {
                "ms_per_call": ms,
                "fps": K * B / ms * 1e3,
                "med_fps": K * B / (sorted(times)[len(times) // 2] * 1e3)
                * 1e3,
            }
            print(
                f"{tag:<14} {ms:9.3f} ms/call  "
                f"{res[tag]['fps']:8.0f} fps (med {res[tag]['med_fps']:.0f})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            res[tag] = {"error": " ".join(str(e).split())[:300]}
            print(f"{tag}: FAIL {res[tag]['error'][:120]}", flush=True)
        save()

best = max(
    (v["fps"], k)
    for k, v in res.items()
    if isinstance(v, dict) and "fps" in v
)
res["best"] = {"arm": best[1], "fps": best[0]}
save()
print(json.dumps(res["best"]), flush=True)
