"""Banded shift-accumulate warp vs the block gather (chip probe).

exp_warp_probe settled the gather-formulation axis (block gather
1.39x; landed as the core.warp default). This probes the
gather-FREE kernel (kernels/bandwarp.py): exact bilinear as a static
band sum of VPU shift-FMAs — the only remaining idea with
order-of-magnitude headroom on the loss warps (per-pixel gather
~38 M idx/s vs VPU Tops/s).

Arms (B=64, 128x416, C=3, smooth in-band field; each equality-checked
vs the block-gather anchor before timing):

  anchor_block     core.warp bilinear_sample (production default)
  banded_rv2_rh8   narrow band (108 terms) — synthetic-world flows
  banded_rv4_rh16  default band (340 terms) — r4 quality worlds
  banded_rv4_rh32  wide band (748 terms) — KITTI-scale flows
  xla_rv2_rh8      same algorithm, pure-XLA unrolled (Mosaic-risk
                   fallback datapoint)

Usage: tools/dev/tpu_run.sh tools/dev/exp_warp_probe2.py 3600 5
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

from davo_tpu.core.warp import bilinear_sample
from davo_tpu.kernels.bandwarp import banded_warp

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r4_warp_probe2.json"
)
B, H, W, C = 64, 128, 416, 3

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


rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(size=(B, H, W, C)), jnp.float32)
gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
du = 3.0 * np.sin(gy / 17.0)[None] + 2.0 * np.cos(gx / 23.0)[None]
dv = 1.5 * np.cos(gy / 13.0)[None] + 0.9 * np.sin(gx / 29.0)[None]
coords = jnp.asarray(
    np.stack(
        [np.broadcast_to(gx + du, (B, H, W)),
         np.broadcast_to(gy + dv, (B, H, W))], -1
    ),
    jnp.float32,
)  # |du| <= 5, |dv| <= 2.4 — inside every probed band


def xla_banded(img, coords, rv, rh):
    Bv, Hv, Wv, Cv = img.shape
    u, v = coords[..., 0], coords[..., 1]
    xg = jnp.arange(Wv, dtype=jnp.float32)[None, None, :]
    yg = jnp.arange(Hv, dtype=jnp.float32)[None, :, None]
    uc = jnp.clip(jnp.clip(u - xg, -rh, rh) + xg, 0.0, Wv - 1.0)
    vc = jnp.clip(jnp.clip(v - yg, -rv, rv) + yg, 0.0, Hv - 1.0)
    pad = jnp.pad(img, ((0, 0), (rv, rv + 1), (rh, rh + 1), (0, 0)))
    out = jnp.zeros_like(img)
    for oy in range(-rv, rv + 2):
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(vc - (yg + oy)))
        for ox in range(-rh, rh + 2):
            wu = jnp.maximum(0.0, 1.0 - jnp.abs(uc - (xg + ox)))
            sl = pad[:, rv + oy:rv + oy + Hv, rh + ox:rh + ox + Wv]
            out = out + (wv * wu)[..., None] * sl
    return out


def timeit(tag, fn, *args, check=True, tol=1e-5):
    if tag in res:
        print(f"{tag}: done previously", flush=True)
        return
    try:
        out = jax.block_until_ready(fn(*args))
        if check:
            err = float(jnp.abs(out - REF).max())
            if err > tol:
                res[tag] = {"error": f"equality FAIL maxerr {err:.3e}"}
                print(f"{tag}: equality FAIL {err:.3e}", flush=True)
                save()
                return
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn(*args)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / 4)
        res[tag] = {"ms": min(times) * 1e3,
                    "all_ms": [t * 1e3 for t in times]}
        print(f"{tag:<20} {res[tag]['ms']:9.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        res[tag] = {"error": " ".join(str(e).split())[:400]}
        print(f"{tag}: FAIL {res[tag]['error'][:160]}", flush=True)
    save()


anchor = jax.jit(lambda i, c: bilinear_sample(i, c, fill="border")[0])
REF = jax.block_until_ready(anchor(img, coords))

timeit("anchor_block", anchor, img, coords, check=False)
timeit("banded_rv2_rh8",
       jax.jit(lambda i, c: banded_warp(i, c, rv=2, rh=8)[0]),
       img, coords)
timeit("banded_rv4_rh16",
       jax.jit(lambda i, c: banded_warp(i, c, rv=4, rh=16)[0]),
       img, coords)
timeit("banded_rv4_rh32",
       jax.jit(lambda i, c: banded_warp(i, c, rv=4, rh=32)[0]),
       img, coords)
timeit("xla_rv2_rh8",
       jax.jit(lambda i, c: xla_banded(i, c, 2, 8)),
       img, coords)

# Gradient arms (d/d(coords) — the loss's live direction); equality
# is CPU-pinned in tests/test_kernels.py, timing-only here.
ga = jax.jit(jax.grad(
    lambda c: bilinear_sample(img, c, fill="border")[0].mean()))
gb16 = jax.jit(jax.grad(
    lambda c: banded_warp(img, c, rv=4, rh=16)[0].mean()))
timeit("anchor_block_grad", ga, coords, check=False)
timeit("banded_rv4_rh16_grad", gb16, coords, check=False)

print(json.dumps({k: (round(v["ms"], 2) if "ms" in v else v["error"])
                  for k, v in res.items()}, indent=1), flush=True)
print("->", OUT, flush=True)
