"""Gather-free banded bilinear warp (Pallas, VPU shift-accumulate).

The training loss's dominant op is the full-res bilinear gather warp
(results_r4_train_prof3.json: ~124 ms per warp at B=64 128x416 —
XLA lowers per-pixel gathers at ~38 M indices/s, ~0.3 % of HBM
bandwidth; the (2,2,C)-block gather form recovers only 1.39x).

This kernel removes the gather entirely. For VO warps the
displacement is BOUNDED (|u - x| <= rh, |v - y| <= rv for almost all
pixels), so exact bilinear interpolation is a static sum over the
band of integer offsets:

    out[y,x] = sum_{oy in [-rv, rv+1]} sum_{ox in [-rh, rh+1]}
                 hat(vc - (y+oy)) * hat(uc - (x+ox)) * img[y+oy, x+ox]

with hat(t) = max(0, 1 - |t|): exactly two nonzero terms per axis.
Every term is a STATIC shifted slice of a padded VMEM plane times an
elementwise weight — pure VPU f32 work (full rate; none of the
bf16-MXU constraints that killed the rowconv family, R3_RESULTS).

Semantics vs `core.warp.bilinear_sample`:
* displacement is clamped into the band before sampling (pixels whose
  true correspondence is farther than (rh, rv) sample the band edge —
  the band analog of border clamping). EXACT equality whenever
  |du| <= rh and |dv| <= rv.
* `valid` is computed on the ORIGINAL coords (in-frame test), same as
  bilinear_sample.
* LOSS-PATH ONLY: the custom VJP carries d/d(coords) and d/d(img);
  both banded (the img cotangent is the transposed shift-accumulate).

STATUS: probe candidate (tools/dev/exp_warp_probe2.py) — flag-gated
off until the in-context train-step A/B passes on hardware
(CLAUDE.md: only in-context runs are trustworthy evidence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Interpret mode lets the same kernel run (slowly) on CPU for tests.
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(u_ref, v_ref, img_ref, out_ref, pad_ref, hsh_ref,
                wv_ref, *, rv: int, rh: int, H: int, W: int, C: int):
    # Mosaic's tpu.iota is integer-only (f32 iota FATALs verification
    # on chip — r4); build i32 grids and cast.
    xg = lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    yg = lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    # Band clamp on displacement, then frame clamp (matches
    # bilinear_sample's interpolation exactly inside the band).
    u = u_ref[0]
    v = v_ref[0]
    uc = jnp.clip(jnp.clip(u - xg, -rh, rh) + xg, 0.0, W - 1.0)
    vc = jnp.clip(jnp.clip(v - yg, -rv, rv) + yg, 0.0, H - 1.0)

    # Padded per-channel planes: img at [rv : rv+H, rh : rh+W]; the
    # zero margins get hat weight 0 (coords are frame-clamped).
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, rv:rv + H, rh:rh + W] = img_ref[0]

    # Vertical hat weights per row offset (shared across all ox).
    for j, oy in enumerate(range(-rv, rv + 2)):
        wv_ref[j] = jnp.maximum(0.0, 1.0 - jnp.abs(vc - (yg + oy)))

    out_ref[...] = jnp.zeros_like(out_ref)
    for ox in range(-rh, rh + 2):
        # One horizontal shift (lane rotation) per ox, all channels.
        hsh_ref[...] = pad_ref[:, :, rh + ox:rh + ox + W]
        wu = jnp.maximum(0.0, 1.0 - jnp.abs(uc - (xg + ox)))
        for j, oy in enumerate(range(-rv, rv + 2)):
            wvu = wv_ref[j] * wu
            for c in range(C):
                out_ref[0, c] += wvu * hsh_ref[c, rv + oy:rv + oy + H, :]


def _dhat(t):
    """d/dt max(0, 1-|t|) with the floor-cell subgradient convention
    (matches take_along_axis autodiff at exactly-integer coords: the
    slope of the cell [floor(t), floor(t)+1))."""
    return jnp.where(
        (t >= 0.0) & (t < 1.0), -1.0,
        jnp.where((t >= -1.0) & (t < 0.0), 1.0, 0.0),
    )


def _bwd_kernel(u_ref, v_ref, img_ref, g_ref, du_ref, dv_ref,
                dimg_ref, pad_ref, hsh_ref, wv_ref, dwv_ref, dpad_ref,
                *, rv: int, rh: int, H: int, W: int, C: int):
    # Mosaic's tpu.iota is integer-only (f32 iota FATALs verification
    # on chip — r4); build i32 grids and cast.
    xg = lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    yg = lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    u = u_ref[0]
    v = v_ref[0]
    ucp = jnp.clip(u - xg, -rh, rh) + xg
    vcp = jnp.clip(v - yg, -rv, rv) + yg
    uc = jnp.clip(ucp, 0.0, W - 1.0)
    vc = jnp.clip(vcp, 0.0, H - 1.0)
    # d uc/du through both clips. Left/low frame edge is INCLUSIVE
    # (clip passes gradient at its boundary, matching take4's floor
    # cell there); right/high edge EXCLUSIVE — at exactly W-1 the
    # floor cell's upper tap is the zero pad, where take4's clamped
    # taps coincide and give slope 0.
    mask_u = (
        (jnp.abs(u - xg) <= rh) & (ucp >= 0.0) & (ucp < W - 1.0)
    ).astype(jnp.float32)
    mask_v = (
        (jnp.abs(v - yg) <= rv) & (vcp >= 0.0) & (vcp < H - 1.0)
    ).astype(jnp.float32)

    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, rv:rv + H, rh:rh + W] = img_ref[0]
    dpad_ref[...] = jnp.zeros_like(dpad_ref)

    for j, oy in enumerate(range(-rv, rv + 2)):
        t = vc - (yg + oy)
        wv_ref[j] = jnp.maximum(0.0, 1.0 - jnp.abs(t))
        dwv_ref[j] = _dhat(t)

    du_ref[...] = jnp.zeros_like(du_ref)
    dv_ref[...] = jnp.zeros_like(dv_ref)
    for ox in range(-rh, rh + 2):
        hsh_ref[...] = pad_ref[:, :, rh + ox:rh + ox + W]
        t = uc - (xg + ox)
        wu = jnp.maximum(0.0, 1.0 - jnp.abs(t))
        dwu = _dhat(t)
        for j, oy in enumerate(range(-rv, rv + 2)):
            # Channel-contracted cotangent x shifted image.
            gc = g_ref[0, 0] * hsh_ref[0, rv + oy:rv + oy + H, :]
            for c in range(1, C):
                gc += g_ref[0, c] * hsh_ref[c, rv + oy:rv + oy + H, :]
            du_ref[0] += (dwu * wv_ref[j]) * gc
            dv_ref[0] += (wu * dwv_ref[j]) * gc
            wvu = wv_ref[j] * wu
            for c in range(C):
                dpad_ref[c, rv + oy:rv + oy + H, rh + ox:rh + ox + W] \
                    += wvu * g_ref[0, c]
    du_ref[0] *= mask_u
    dv_ref[0] *= mask_v
    dimg_ref[0] = dpad_ref[:, rv:rv + H, rh:rh + W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _core(imgs, u, v, rv, rh):
    return _core_fwd(imgs, u, v, rv, rh)[0]


def _core_fwd(imgs, u, v, rv, rh):
    B, C, H, W = imgs.shape
    HP = H + 2 * rv + 1
    WP = _round_up(W + 2 * rh + 1, 128)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rv=rv, rh=rh, H=H, W=W, C=C),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C, H, W), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, H, W), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, HP, WP), jnp.float32),     # padded planes
            pltpu.VMEM((C, HP, W), jnp.float32),      # h-shifted copy
            pltpu.VMEM((2 * rv + 2, H, W), jnp.float32),  # wv planes
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(u, v, imgs)
    return out, (imgs, u, v)


def _core_bwd(rv, rh, res, g):
    imgs, u, v = res
    B, C, H, W = imgs.shape
    HP = H + 2 * rv + 1
    WP = _round_up(W + 2 * rh + 1, 128)
    BV = 2 * rv + 2
    du, dv, dimgs = pl.pallas_call(
        functools.partial(_bwd_kernel, rv=rv, rh=rh, H=H, W=W, C=C),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C, H, W), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, C, H, W), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C, H, W), lambda b: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, HP, WP), jnp.float32),     # padded img
            pltpu.VMEM((C, HP, W), jnp.float32),      # h-shifted copy
            pltpu.VMEM((BV, H, W), jnp.float32),      # wv planes
            pltpu.VMEM((BV, H, W), jnp.float32),      # dwv planes
            pltpu.VMEM((C, HP, WP), jnp.float32),     # padded dimg
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(u, v, imgs, g)
    return dimgs, du, dv


_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.jit, static_argnames=("rv", "rh", "fill"))
def banded_warp(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    rv: int = 4,
    rh: int = 16,
    fill: str = "border",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Banded bilinear sample. img (B,H,W,C) f32, coords (B,H,W,2).

    Returns (out (B,H,W,C), valid (B,H,W,1)) — `bilinear_sample`'s
    contract; exact wherever the displacement fits the (rh, rv) band.
    Differentiable in both img and coords (hand-written banded VJP;
    the img cotangent is the transposed shift-accumulate).
    """
    B, H, W, C = img.shape
    u = coords[..., 0]
    v = coords[..., 1]
    valid = (
        (u >= 0.0) & (u <= W - 1.0) & (v >= 0.0) & (v <= H - 1.0)
    )[..., None].astype(img.dtype)

    imgs = jnp.moveaxis(img, -1, 1)  # (B, C, H, W): lanes = W
    out = _core(
        imgs.astype(jnp.float32),
        u.astype(jnp.float32),
        v.astype(jnp.float32),
        rv, rh,
    )
    out = jnp.moveaxis(out, 1, -1)
    if fill == "border":
        return out, valid
    return out * valid, valid
