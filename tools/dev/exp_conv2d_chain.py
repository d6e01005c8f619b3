"""Mosaic conv-chain bisect + fused-kernel candidates, all in strictly
2-D (pixels, C) activation layout.

Every r1 formulation with 3-D/4-D in-kernel activations hit Mosaic's
"Bad lhs type" on the SECOND in-kernel conv (the bug is a second round
of spatial-op -> reshape -> dot). This layout has NO reshape at all:
activations live as (P, C) matrices, spatial taps are CONTIGUOUS ROW
SLICES of a zero-padded (P + 2*pad, C) scratch ref (row-major: the
(dy, dx) tap of pixel p is row p + dy*W + dx), and column wrap is
masked with iota masks.

Phases (each independently try/except'd so one Mosaic failure still
lets the rest report):
  1. bisect: 1/2/3-layer 3x3 chains, small shapes — does the second
     in-kernel dot compile at all in this layout?
  2. estimator: the REAL /4 flow-estimator chain (Cin 115 -> 96, 64,
     32, 2-linear) at production shapes (B=256 folded, 32x104),
     correctness + timing vs XLA.
  3. costvol: ALL (2s+1)^2 correlation slices in ONE kernel
     (elementwise mul + lane reduce per row-sliced tap — NO matmul,
     so it cannot hit the matmul layout bug), /4 shapes, search=3,
     C=8 (davo-fast), vs the XLA slice loop. The slice loop is ~33 us
     dispatch per slice kernel (r2c profile) => ~1.6 ms/level.
  4. stride-2 s2d chains (conv_chain_strided): the in-kernel
     space-to-depth needs value merge-reshapes, the one op class the
     r1 landmine list flags — bisected from s2d-alone (no dot) up to
     the 5-layer PoseEncoder prefix and the RegionAttention stack at
     production shapes, each timed vs XLA.
  5. the hand-written VJP (conv_chain_nhwc_ad): fwd-with-residuals and
     the one-kernel backward (P-contracted dW dots, grid-accumulated
     outputs, transposed-tap dx) — grads vs jax.grad of the XLA chain
     at production estimator shapes, fwd+bwd timed vs XLA.

Run: tools/dev/tpu_run.sh tools/dev/exp_conv2d_chain.py 2400 3
"""

import os
import sys
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from davo_tpu.kernels.rowconv import conv_chain_nhwc
from davo_tpu.utils.profiling import timed

INTERP = jax.default_backend() != "tpu"


def xla_chain(img, weights, biases, n_layers, relus=None):
    """Reference: lax convs on (B, H, W, C)."""
    if relus is None:
        relus = (True,) * n_layers
    x = img.astype(jnp.float32)
    for i in range(n_layers):
        k = weights[i].astype(jnp.float32)  # (3, 3, Cin, Cout) HWIO
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = x + biases[i].astype(jnp.float32)
        if relus[i]:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# Phases
# ---------------------------------------------------------------------------

def phase1_bisect():
    print("== phase 1: 2-D layout bisect ==", flush=True)
    rng = np.random.default_rng(0)
    B, H, W = 8, 32, 104  # /4 estimator level
    chans = [115, 96, 64, 32]
    weights = [
        jnp.asarray(
            rng.normal(0, 0.1, (3, 3, chans[i], chans[i + 1])), jnp.float32
        )
        for i in range(3)
    ]
    biases = [
        jnp.asarray(rng.normal(0, 0.1, (chans[i + 1],)), jnp.float32)
        for i in range(3)
    ]
    img = jnp.asarray(rng.normal(0, 1, (B, H, W, chans[0])), jnp.bfloat16)

    for n_layers in (1, 2, 3):
        try:
            out = jax.block_until_ready(
                conv_chain_nhwc(
                    img, tuple(weights[:n_layers]),
                    tuple(biases[:n_layers]), (True,) * n_layers,
                )
            )
        except Exception as e:
            print(f"{n_layers}-layer chain FAILED: {str(e)[:300]}", flush=True)
            continue
        ref = xla_chain(img, weights, biases, n_layers)
        got = np.asarray(out, np.float32)
        err = np.abs(got - np.asarray(ref)).max()
        rel = err / (np.abs(np.asarray(ref)).max() + 1e-6)
        print(f"{n_layers}-layer chain OK maxerr={err:.3e} rel={rel:.3e}",
              flush=True)


def phase2_estimator():
    print("== phase 2: estimator chain at production shapes ==", flush=True)
    rng = np.random.default_rng(1)
    B, H, W = 64 if INTERP else 256, 32, 104
    chans = [115, 96, 64, 32, 2]
    relus = (True, True, True, False)
    weights = tuple(
        jnp.asarray(
            rng.normal(0, 0.05, (3, 3, chans[i], chans[i + 1])), jnp.float32
        )
        for i in range(4)
    )
    biases = tuple(
        jnp.asarray(rng.normal(0, 0.05, (chans[i + 1],)), jnp.float32)
        for i in range(4)
    )
    img = jnp.asarray(rng.normal(0, 1, (B, H, W, chans[0])), jnp.bfloat16)
    try:
        out = jax.block_until_ready(
            conv_chain_nhwc(img, weights, biases, relus)
        )
    except Exception as e:
        print(f"estimator chain FAILED: {str(e)[:300]}", flush=True)
        return
    ref = xla_chain(img, weights, biases, 4, relus)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    print(f"estimator chain OK maxerr={err:.3e}", flush=True)
    if INTERP:
        return
    jx = jax.jit(lambda a: xla_chain(a, weights, biases, 4, relus))
    jax.block_until_ready(jx(img))
    r_x = timed(jx, img, iters=20, loops=5)
    for cd in ("bfloat16", "float32"):
        fn = partial(conv_chain_nhwc, relus=relus, compute_dtype_name=cd)
        try:
            jax.block_until_ready(fn(img, weights, biases))
        except Exception as e:
            print(f"estimator {cd} FAILED: {str(e)[:200]}", flush=True)
            continue
        r_p = timed(fn, img, weights, biases, iters=20, loops=5)
        print(
            f"estimator timing (B={B}, {cd}): pallas {r_p['ms']:.3f} ms "
            f"vs XLA {r_x['ms']:.3f} ms",
            flush=True,
        )


def phase3_costvol():
    print("== phase 3: one-kernel costvol ==", flush=True)
    from davo_tpu.kernels.costvol import cost_volume_pallas_rows
    from davo_tpu.models.flownet import cost_volume

    rng = np.random.default_rng(2)
    search, C = 3, 8
    for (H, W) in ((32, 104), (16, 52)):
        B = 32 if INTERP else 256
        f1 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
        f2 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
        try:
            out = jax.block_until_ready(
                cost_volume_pallas_rows(f1, f2, search)
            )
        except Exception as e:
            print(f"costvol {H}x{W} FAILED: {str(e)[:300]}", flush=True)
            return
        ref = cost_volume(f1, f2, search)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        print(f"costvol {H}x{W} OK maxerr={err:.3e}", flush=True)
        if INTERP:
            continue
        fn = partial(cost_volume_pallas_rows, search=search)
        r_p = timed(fn, f1, f2, iters=20, loops=5)
        jx = jax.jit(lambda a, b: cost_volume(a, b, search))
        jax.block_until_ready(jx(f1, f2))
        r_x = timed(jx, f1, f2, iters=20, loops=5)
        print(
            f"costvol {H}x{W} timing (B={B}): pallas {r_p['ms']:.3f} ms "
            f"vs XLA slices {r_x['ms']:.3f} ms",
            flush=True,
        )


def xla_strided(img, weights, biases, strides, relus):
    x = img.astype(jnp.float32)
    for w, b, s, r in zip(weights, biases, strides, relus):
        x = jax.lax.conv_general_dilated(
            x, w.astype(jnp.float32), (s, s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = x + b.astype(jnp.float32)
        if r:
            x = jax.nn.relu(x)
    return x


def phase4_strided():
    print("== phase 4: stride-2 s2d chains ==", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from davo_tpu.kernels.rowconv import _s2d_rows, conv_chain_strided

    rng = np.random.default_rng(3)

    # --- 4a: s2d alone (merge-reshapes + slices + concat, NO dot) ---
    B, H, W, C = 4, 16, 24, 8
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)

    def s2d_kernel(x_ref, o_ref):
        o_ref[0] = _s2d_rows(x_ref[0], H, W, C)

    try:
        got = pl.pallas_call(
            s2d_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, H * W, C), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, H * W // 4, 4 * C), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B, H * W // 4, 4 * C), jnp.float32
            ),
            interpret=INTERP,
        )(x.reshape(B, H * W, C))
        # reference: [ee, eo, oe, oo] plane order
        v = x.reshape(B, H // 2, 2, W // 2, 2, C)
        ref = jnp.concatenate(
            [v[:, :, 0, :, 0], v[:, :, 0, :, 1], v[:, :, 1, :, 0],
             v[:, :, 1, :, 1]],
            axis=-1,
        ).reshape(B, H * W // 4, 4 * C)
        err = np.abs(np.asarray(got) - np.asarray(ref)).max()
        print(f"4a s2d-alone OK maxerr={err:.3e}", flush=True)
    except Exception as e:
        print(f"4a s2d-alone FAILED: {str(e)[:300]}", flush=True)

    def make(ks, chans, cin, seed):
        r = np.random.default_rng(seed)
        ws, bs = [], []
        for k, c in zip(ks, chans):
            ws.append(jnp.asarray(
                r.normal(0, 1, (k, k, cin, c)) / np.sqrt(k * k * cin),
                jnp.float32,
            ))
            bs.append(jnp.asarray(r.normal(0, 0.01, (c,)), jnp.float32))
            cin = c
        return tuple(ws), tuple(bs)

    # --- 4b..4e: chains of increasing depth, then production shapes ---
    cases = [
        ("4b single s2 k3", 8, 16, 24, 6, (3,), (8,), (2,), None),
        ("4c s2 then s1", 8, 16, 24, 6, (3, 3), (8, 16), (2, 1), None),
        ("4d s2 k7 stem", 8, 16, 24, 6, (7,), (8,), (2,), None),
        (
            "4e pose prefix (prod 128x416, B=64)",
            4 if INTERP else 64, 128, 416, 8,
            (7, 5, 3, 3, 3), (16, 32, 64, 128, 256), (2,) * 5, None,
        ),
        (
            "4f attention stack (prod, B=64)",
            4 if INTERP else 64, 128, 416, 4,
            (3, 3, 3), (16, 32, 64), (2, 2, 2), None,
        ),
    ]
    for tag, b, h, w, cin, ks, chans, strides, _ in cases:
        if INTERP and h > 32:
            b, h, w = 1, 32, 64
        ws, bs = make(ks, chans, cin, sum(map(ord, tag)) % 2**31)
        relus = (True,) * len(ks)
        img = jnp.asarray(
            np.random.default_rng(9).normal(0, 1, (b, h, w, cin)),
            jnp.bfloat16,
        )
        try:
            out = jax.block_until_ready(
                conv_chain_strided(img, ws, bs, strides, relus)
            )
        except Exception as e:
            print(f"{tag} FAILED: {str(e)[:300]}", flush=True)
            continue
        ref = xla_strided(img, ws, bs, strides, relus)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
        rel = err / (np.abs(np.asarray(ref)).max() + 1e-6)
        print(f"{tag} OK maxerr={err:.3e} rel={rel:.3e}", flush=True)
        if INTERP:
            continue
        jx = jax.jit(
            lambda a, _w=ws, _b=bs, _s=strides, _r=relus: xla_strided(
                a, _w, _b, _s, _r
            )
        )
        jax.block_until_ready(jx(img))
        r_x = timed(jx, img, iters=20, loops=5)
        fn = partial(
            conv_chain_strided, strides=strides, relus=relus,
        )
        r_p = timed(fn, img, ws, bs, iters=20, loops=5)
        print(
            f"{tag} timing (B={b}): pallas {r_p['ms']:.3f} ms "
            f"vs XLA {r_x['ms']:.3f} ms",
            flush=True,
        )


def phase5_vjp():
    print("== phase 5: fused-chain VJP ==", flush=True)
    from davo_tpu.kernels.rowconv import conv_chain_nhwc_ad

    rng = np.random.default_rng(5)
    B, H, W = 8 if INTERP else 64, 32, 104
    chans = [115, 96, 64, 32, 2]
    relus = (True, True, True, False)
    ws = tuple(
        jnp.asarray(
            rng.normal(0, 1, (3, 3, chans[i], chans[i + 1]))
            / np.sqrt(9 * chans[i]),
            jnp.float32,
        )
        for i in range(4)
    )
    bs = tuple(
        jnp.asarray(rng.normal(0, 0.01, (chans[i + 1],)), jnp.float32)
        for i in range(4)
    )
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, chans[0])), jnp.float32)

    def loss_fused(x, ws, bs):
        return jnp.sum(conv_chain_nhwc_ad(x, ws, bs, relus, "bfloat16") ** 2)

    def xla_bf16(x, ws, bs):
        # apples-to-apples reference: bf16 operands, f32 accumulation
        # (the fused kernel's compute recipe and ConvBlock's dtype).
        y = x.astype(jnp.bfloat16)
        for w, b, r in zip(ws, bs, relus):
            y = jax.lax.conv_general_dilated(
                y, w.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y + b.astype(jnp.bfloat16)
            if r:
                y = jax.nn.relu(y)
        return y.astype(jnp.float32)

    def loss_xla_bf16(x, ws, bs):
        return jnp.sum(xla_bf16(x, ws, bs) ** 2)

    def loss_xla(x, ws, bs):
        return jnp.sum(xla_strided(x, ws, bs, (1,) * 4, relus) ** 2)

    def worst_rel(got, ref):
        w = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(ref)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            w = max(w, np.abs(a - b).max() / (np.abs(b).max() + 1e-9))
        return w

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
    gxb = jax.jit(jax.grad(loss_xla_bf16, argnums=(0, 1, 2)))
    try:
        got = jax.block_until_ready(gf(x, ws, bs))
    except Exception as e:
        print(f"vjp grad FAILED: {str(e)[:300]}", flush=True)
        return
    ref = gx(x, ws, bs)
    # Yardstick: what the ordinary XLA mixed-precision path deviates
    # from f32 ground truth — the fused VJP only needs to match that
    # class, not exceed it.
    print(
        f"vjp grads OK: fused-bf16 vs f32 worst-rel={worst_rel(got, ref):.3e}"
        f" | xla-bf16 yardstick={worst_rel(gxb(x, ws, bs), ref):.3e}",
        flush=True,
    )
    if INTERP:
        return
    r_p = timed(gf, x, ws, bs, iters=10, loops=5)
    r_x = timed(gx, x, ws, bs, iters=10, loops=5)
    print(
        f"estimator fwd+bwd (B={B}): pallas-vjp {r_p['ms']:.3f} ms "
        f"vs XLA {r_x['ms']:.3f} ms",
        flush=True,
    )


def main():
    print("devices:", jax.devices(), flush=True)
    try:
        phase1_bisect()
    except Exception as e:
        print("phase1 crashed:", str(e)[:300], flush=True)
    try:
        phase2_estimator()
    except Exception as e:
        print("phase2 crashed:", str(e)[:300], flush=True)
    try:
        phase3_costvol()
    except Exception as e:
        print("phase3 crashed:", str(e)[:300], flush=True)
    try:
        phase4_strided()
    except Exception as e:
        print("phase4 crashed:", str(e)[:300], flush=True)
    try:
        phase5_vjp()
    except Exception as e:
        print("phase5 crashed:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
