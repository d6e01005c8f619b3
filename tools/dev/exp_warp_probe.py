"""Bilinear-warp gather variants (the train step's named sink).

results_r4_train_prof3.json: one full-res bilinear gather warp costs
~124 ms at B=64 128x416 C=3 — take_along_axis x4 taps lowers to a
~330 M elem/s gather. Candidates probed here, fwd AND fwd+grad (the
loss needs d/d(coords); d/d(img) is never required — images are data):

  a. current bilinear_sample (4 flat take_along_axis taps)   [anchor]
  b. block gather: ONE lax.gather of a (2,2,C) footprint per pixel
     (4x fewer indices; lerp computed from the gathered block)
  c. payload width: (a) with C padded 3->8 (is cost per-index or
     per-byte?)
  d. row-pair gather + in-row lerp: gather 2 full rows per OUTPUT ROW
     at v0(y) only when v is row-constant — NOT valid for projective
     warps; skipped (kept here as a note).
  e. flow_warp_separable at /4 (existing matmul warp, for scale)

Each variant is equality-checked against (a) before timing.

Usage: tools/dev/tpu_run.sh tools/dev/exp_warp_probe.py 3600 5
"""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.core.warp import bilinear_sample

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/repo/results_r4_warp_probe.json"
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
# Smooth in-frame warp field (VO-like): identity + smooth displacement.
gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
du = 3.0 * np.sin(gy / 17.0)[None] + 2.0 * np.cos(gx / 23.0)[None]
dv = 2.5 * np.cos(gy / 13.0)[None] + 1.5 * np.sin(gx / 29.0)[None]
coords = jnp.asarray(
    np.stack(
        [np.broadcast_to(gx + du, (B, H, W)),
         np.broadcast_to(gy + dv, (B, H, W))], -1
    ),
    jnp.float32,
)


def bilinear_block_gather(img, coords, fill="border"):
    """bilinear_sample via ONE (2,2,C) lax.gather per pixel."""
    Bv, Hv, Wv, Cv = img.shape
    u = coords[..., 0]
    v = coords[..., 1]
    valid = (
        (u >= 0.0) & (u <= Wv - 1.0) & (v >= 0.0) & (v <= Hv - 1.0)
    )[..., None].astype(img.dtype)
    uc = jnp.clip(u, 0.0, Wv - 1.0)
    vc = jnp.clip(v, 0.0, Hv - 1.0)
    u0 = jnp.clip(jnp.floor(uc), 0, Wv - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(vc), 0, Hv - 2).astype(jnp.int32)
    fu = (uc - u0.astype(uc.dtype))[..., None]
    fv = (vc - v0.astype(vc.dtype))[..., None]

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def per_image(im, vv, uu):
        idx = jnp.stack(
            [vv.reshape(-1), uu.reshape(-1)], axis=-1
        )  # (N, 2)
        blk = lax.gather(
            im, idx, dn, slice_sizes=(2, 2, Cv),
            indices_are_sorted=False, unique_indices=False,
            mode=lax.GatherScatterMode.CLIP,
        )  # (N, 2, 2, C)
        return blk.reshape(vv.shape + (2, 2, Cv))

    blk = jax.vmap(per_image)(img, v0, u0)  # (B, H, W, 2, 2, C)
    p00 = blk[..., 0, 0, :]
    p01 = blk[..., 0, 1, :]
    p10 = blk[..., 1, 0, :]
    p11 = blk[..., 1, 1, :]
    top = p00 * (1.0 - fu) + p01 * fu
    bot = p10 * (1.0 - fu) + p11 * fu
    out = top * (1.0 - fv) + bot * fv
    if fill == "zeros":
        out = out * valid
    return out, valid


def timeit(tag, fn, *args):
    if tag in res:
        print(f"{tag}: done previously ({res[tag]['ms']:.2f} ms)",
              flush=True)
        return
    try:
        out = jax.block_until_ready(fn(*args))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn(*args)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / 4)
        res[tag] = {"ms": min(times) * 1e3,
                    "all_ms": [t * 1e3 for t in times]}
        print(f"{tag:<36} {res[tag]['ms']:9.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        res[tag] = {"error": " ".join(str(e).split())[:300]}
        print(f"{tag}: FAIL {res[tag]['error'][:140]}", flush=True)
    save()


# Equality check (block gather vs anchor) BEFORE timing.
ref = jax.jit(lambda i, c: bilinear_sample(i, c, fill="border")[0])
cand = jax.jit(lambda i, c: bilinear_block_gather(i, c, "border")[0])
err = float(jnp.abs(cand(img, coords) - ref(img, coords)).max())
print(f"block-gather equality vs anchor: {err:.2e}", flush=True)
res["block_equality_maxerr"] = err
save()
assert err < 1e-5, "block gather does not match bilinear_sample"

timeit("a_fwd_take4", ref, img, coords)
timeit("b_fwd_block", cand, img, coords)

imgC8 = jnp.concatenate([img] * 3, axis=-1)[..., :8]
timeit("c_fwd_take4_C8",
       jax.jit(lambda i, c: bilinear_sample(i, c, fill="border")[0]),
       imgC8, coords)


def loss_a(c):
    return bilinear_sample(img, c, fill="border")[0].mean()


def loss_b(c):
    return bilinear_block_gather(img, c, "border")[0].mean()


ga = jax.jit(jax.grad(loss_a))
gb = jax.jit(jax.grad(loss_b))
gerr = float(jnp.abs(ga(coords) - gb(coords)).max())
print(f"grad equality: {gerr:.2e}", flush=True)
res["grad_equality_maxerr"] = gerr
save()
timeit("a_grad_take4", ga, coords)
timeit("b_grad_block", gb, coords)

from davo_tpu.core.warp import flow_warp_separable

img4 = img[:, ::4, ::4, :]
flow4 = jnp.asarray(rng.normal(size=(B, H // 4, W // 4, 2)), jnp.float32)
timeit("e_sep_quarter_res",
       jax.jit(lambda i, f: flow_warp_separable(i, f)[0]), img4, flow4)

print(json.dumps({k: (round(v["ms"], 2) if isinstance(v, dict) and "ms"
                      in v else v)
                  for k, v in res.items()}, indent=1), flush=True)
print("->", OUT, flush=True)
