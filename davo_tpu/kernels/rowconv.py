"""Fused stride-1 3x3 conv chains in 2-D rows layout (Pallas TPU).

The r1 multi-layer conv kernel (`conv_stack.py`) is blocked on this
libtpu by a Mosaic "Bad lhs type" on any SECOND in-kernel
(spatial op -> reshape -> dot) round. This formulation never reshapes:
activations live as (P, C) row-major matrices, the (dy, dx) tap of a
SAME 3x3 conv is the CONTIGUOUS ROW SLICE starting at dy*W + dx of a
zero-padded VMEM scratch (vertical wrap is naturally correct in
row-major layout; horizontal wrap is masked with iota masks), and each
tap is one (P, Cin) x (Cin, Cout) MXU dot.

Whole chains (e.g. the flow estimator's est0->est1->est2->flow head,
four layers) run as ONE pallas_call: activations never leave VMEM
between layers, and the ~70 us/kernel dispatch cost (kernels/__init__)
is paid once instead of per conv.

Forward-only: `pallas_call` has no automatic VJP, so this is a SERVING
path (`ModelConfig.fuse_estimator`); training uses the XLA lowering
with identical parameters (equality-tested in
tests/test_models.py::TestFlowNet::test_fuse_estimator_matches_xla_path).

STATUS (r3 hardware verdict, R3_RESULTS.md): the stride-1 f32 chains
COMPILE, RUN AND MATCH XLA on a real v5e (maxerr ~3e-06 in the full
serving program, under the per-computation scoped-vmem compiler
option) — and measure 3-4x SLOWER than XLA's fused lowering (f32 MXU
rate + per-tap relayout copies). Mosaic rejects every bf16 variant
("Bad lhs type", including fresh-value casts — _DTYPE_MODES) and the
strided/s2d family ("infer-vector-layout: unsupported shape cast").
All fuse_* flags therefore stay default-off: capability demonstrated
and equality-proven on chip, XLA remains the production path.

r4 amendment (results_r4_bf16_probe.json): with the fixed probe
harness, bf16 MXU dots DO verify and match inside Mosaic kernels when
the accumulator stays f32 (only preferred_element_type=bf16 is
rejected), including odd-offset slices — the r3 "f32-only Mosaic"
blanket was partly a harness bug. The family nonetheless STAYS CLOSED
for production: the measured in-context loss (2.2-4.4x) also includes
per-tap relayouts and lost cross-op fusion, and the sunk-cost ledger
(three rounds, ~13 % of the package) caps further investment absent a
toolchain change.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# XLA promotes SMALL pallas operands wholly into VMEM ("allocating on
# stack"); with the 16 MiB default scoped-vmem limit that OOMs the
# compile at probe/test shapes even though production shapes stream
# from HBM (R3_RESULTS "Mosaic mystery"). Raise the per-kernel limit.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _const_spec(shape) -> pl.BlockSpec:
    """BlockSpec for an operand every grid step sees whole (weights,
    grid-accumulated grads)."""
    return pl.BlockSpec(
        tuple(shape),
        partial(lambda nd, i: (0,) * nd, len(shape)),
        memory_space=pltpu.VMEM,
    )


def _wb_and_specs(weights, biases):
    """(9, Cin, Cout) f32 tap weights + (1, Cout) biases, interleaved,
    with their BlockSpecs — the operand packing every chain kernel
    shares."""
    wb, specs = [], []
    for w, b in zip(weights, biases):
        w9 = w.astype(jnp.float32).reshape(9, w.shape[2], w.shape[3])
        wb.extend([w9, b.astype(jnp.float32)[None]])
        specs.extend([_const_spec(w9.shape), _const_spec((1, w.shape[3]))])
    return wb, specs


# Compute-mode name -> (scratch/activation dtype, MXU dot operand
# dtype). "bf16_dot" keeps activations + masks f32 in VMEM and casts
# tap/weight VALUES to bf16 at each dot: same MXU rate as "bfloat16",
# but the dot's LHS is a freshly-cast value with a natural layout
# rather than a bf16 row-slice at an odd offset — the suspected cause
# of Mosaic's "Bad lhs type" rejection of the bf16 chains on hardware
# (R3_RESULTS; bf16 tiles 16 rows vs f32's 8, so odd-offset slices
# need a relayout Mosaic may not support for the MXU operand).
_DTYPE_MODES = {
    "float32": (jnp.float32, jnp.float32),
    "bfloat16": (jnp.bfloat16, jnp.bfloat16),
    "bf16_dot": (jnp.float32, jnp.bfloat16),
}


def _run_3x3_chain(
    x, wb_refs, scratch, width, relus, compute_dtype, act_refs=None,
    dot_dtype=None,
):
    """Stride-1 3x3 SAME chain body on a rows-layout (P, C) value.

    Shared by `_chain_kernel` and `_flow_level_kernel`: per layer the
    zero-padded activation goes through the VMEM scratch ref (layout
    laundering — kernels/conv_stack.py recipe), each (dy, dx) tap is a
    contiguous row slice, horizontal wrap is iota-masked, and each tap
    is one MXU dot (compute_dtype operands, f32 accumulation).
    When `act_refs` is given, layer i's post-activation output is also
    written to act_refs[i] (the VJP forward's residuals).
    """
    if dot_dtype is None:
        dot_dtype = compute_dtype
    P = x.shape[0]
    pad = width + 1
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % width
    mask_l = (col >= 1).astype(compute_dtype)       # dx = -1 valid
    mask_r = (col < width - 1).astype(compute_dtype)  # dx = +1 valid
    for layer in range(len(relus)):
        w_ref = wb_refs[2 * layer]
        b_ref = wb_refs[2 * layer + 1]
        cin = w_ref.shape[1]
        cout = w_ref.shape[2]
        scratch[0:pad, :cin] = jnp.zeros((pad, cin), compute_dtype)
        scratch[pad : pad + P, :cin] = x
        scratch[pad + P : 2 * pad + P, :cin] = jnp.zeros(
            (pad, cin), compute_dtype
        )
        acc = jnp.zeros((P, cout), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = pad + (ky - 1) * width + (kx - 1)
                tap = scratch[off : off + P, :cin]
                if kx == 0:
                    tap = tap * mask_l
                elif kx == 2:
                    tap = tap * mask_r
                acc += jax.lax.dot(
                    tap.astype(dot_dtype),
                    w_ref[ky * 3 + kx].astype(dot_dtype),
                    preferred_element_type=jnp.float32,
                )
        x = (acc + b_ref[0]).astype(compute_dtype)
        if relus[layer]:
            x = jax.nn.relu(x)
        if act_refs is not None:
            o = act_refs[layer]
            o[0] = x.astype(o.dtype)
    return x


def _chain_kernel(
    *refs, height, width, n_layers, relus, compute_dtype, dot_dtype=None
):
    """refs = [x_ref, (w_ref, b_ref) * n_layers, out_ref, scratch].

    x_ref (1, P, C0); w (9, Cin, Cout); b (1, Cout);
    scratch (P + 2*(W+1), Cmax) zero-padded activation buffer in
    compute_dtype (bf16 doubles the MXU rate; dots accumulate f32
    either way via preferred_element_type — the known-good Mosaic
    combination from the r1 bisects).
    """
    x_ref = refs[0]
    wb_refs = refs[1 : 1 + 2 * n_layers]
    out_ref = refs[1 + 2 * n_layers]
    scratch = refs[2 + 2 * n_layers]
    x = _run_3x3_chain(
        x_ref[0].astype(compute_dtype), wb_refs, scratch, width, relus,
        compute_dtype, dot_dtype=dot_dtype,
    )
    out_ref[0] = x.astype(out_ref.dtype)


def _rows_costvol(f1, f2_ref, cv_scratch, width, search):
    """Masked, ReLU'd correlation columns in rows layout.

    f1 (P, C) f32 value; f2 read from its ref into the zero-padded
    cv_scratch; returns (2*search+1)^2 (P, 1) columns — the fwd body
    shared by `_flow_level_kernel` and its VJP variant.
    """
    P, C = f1.shape
    pad_cv = search * width + search
    cv_scratch[0:pad_cv, :] = jnp.zeros((pad_cv, C), jnp.float32)
    cv_scratch[pad_cv : pad_cv + P, :] = f2_ref[0].astype(jnp.float32)
    cv_scratch[pad_cv + P : 2 * pad_cv + P, :] = jnp.zeros(
        (pad_cv, C), jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % width
    cols = []
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            off = pad_cv + dy * width + dx
            tap = cv_scratch[off : off + P, :]
            corr = jnp.sum(f1 * tap, axis=1, keepdims=True) / C
            valid = jnp.logical_and(col >= -dx, col < width - dx)
            cols.append(jnp.where(valid, jnp.maximum(corr, 0.0), 0.0))
    return cols


def _flow_level_kernel(
    *refs, height, width, search, n_layers, relus, compute_dtype,
    dot_dtype=None,
):
    """Cost volume + ReLU + concat + estimator conv chain, one kernel.

    refs = [f1, f2, feat, flow_up, (w, b) * n_layers, out,
            cv_scratch, chain_scratch]:
    f1/f2 (1, P, C) correlation features (f2 pre-warped outside);
    feat (1, P, Cf); flow_up (1, P, 2); out (1, P, 2) = delta.
    cv_scratch (P + 2*(search*W+search), C) f32;
    chain_scratch (P + 2*(W+1), Cmax) compute_dtype.
    """
    f1_ref, f2_ref, feat_ref, flow_ref = refs[:4]
    wb_refs = refs[4 : 4 + 2 * n_layers]
    out_ref = refs[4 + 2 * n_layers]
    cv_scratch = refs[5 + 2 * n_layers]
    scratch = refs[6 + 2 * n_layers]

    cols = _rows_costvol(
        f1_ref[0].astype(jnp.float32), f2_ref, cv_scratch, width, search
    )

    # --- estimator input: concat([relu(cv), feat, flow_up], ch) ---
    x = jnp.concatenate(
        cols
        + [
            feat_ref[0].astype(jnp.float32),
            flow_ref[0].astype(jnp.float32),
        ],
        axis=1,
    ).astype(compute_dtype)

    # --- conv chain (shared body, same tap scheme as _chain_kernel) ---
    x = _run_3x3_chain(
        x, wb_refs, scratch, width, relus, compute_dtype,
        dot_dtype=dot_dtype,
    )
    out_ref[0] = x.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("search", "relus", "compute_dtype_name"))
def flow_level_fused(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    feat: jnp.ndarray,
    flow_up: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    search: int,
    relus: tuple,
    compute_dtype_name: str = "bfloat16",
) -> jnp.ndarray:
    """One flow-pyramid level as ONE Pallas kernel.

    Covers relu(cost_volume(f1, f2, search)) -> concat with feat +
    flow_up -> the estimator conv chain; returns the DELTA flow
    (B, H, W, Cout_last) f32 (caller adds flow_up, mirroring
    FlowEstimator). Replaces ~(2s+1)^2 slice kernels + concat + 4
    convs (~55 dispatches/level at search=3) with one.
    f1/f2: (B, H, W, C) (f2 pre-warped); feat: (B, H, W, Cf);
    flow_up: (B, H, W, 2); weights[i]: (3, 3, Cin_i, Cout_i) HWIO.
    """
    B, H, W, C = f1.shape
    P = H * W
    D = (2 * search + 1) ** 2
    n_layers = len(relus)
    compute_dtype, dot_dtype = _DTYPE_MODES[compute_dtype_name]
    cin0 = D + feat.shape[3] + flow_up.shape[3]
    assert weights[0].shape[2] == cin0, (weights[0].shape, cin0)
    cmax = max([cin0] + [w.shape[3] for w in weights])
    cout = weights[-1].shape[3]
    pad_cv = search * W + search
    wb, wb_specs = _wb_and_specs(weights, biases)
    flops = 2 * B * D * P * C
    cin = cin0
    for w in weights:
        flops += 2 * B * P * 9 * cin * w.shape[3]
        cin = w.shape[3]
    out = pl.pallas_call(
        partial(
            _flow_level_kernel, height=H, width=W, search=search,
            n_layers=n_layers, relus=relus, compute_dtype=compute_dtype,
            dot_dtype=dot_dtype,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, P, a.shape[-1]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for a in (f1, f2, feat, flow_up)
        ]
        + wb_specs,
        out_specs=pl.BlockSpec(
            (1, P, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, P, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P + 2 * pad_cv, C), jnp.float32),
            pltpu.VMEM((P + 2 * (W + 1), cmax), compute_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * P * (2 * C + feat.shape[3] + 2 + cout),
            transcendentals=0,
        ),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(
        f1.reshape(B, P, C),
        f2.reshape(B, P, C),
        feat.reshape(B, P, feat.shape[3]),
        flow_up.reshape(B, P, flow_up.shape[3]),
        *wb,
    )
    return out.reshape(B, H, W, cout)


def _s2d_rows(x, H, W, C):
    """Space-to-depth of a rows-layout (H*W, C) value -> (H/2*W/2, 4C).

    Channel plane order [ee, eo, oe, oo] (row parity major). Pure
    contiguous merge-reshapes + column slices: row-major flattening
    packs pixel (2q, 2q+1) channel pairs, then image-row pairs, so no
    gather/transpose is needed. Requires even H, W.
    """
    W2, H2 = W // 2, H // 2
    x2 = x.reshape(H2, 2 * W2 * 2 * C)
    even = x2[:, : W2 * 2 * C].reshape(H2 * W2, 2 * C)
    odd = x2[:, W2 * 2 * C :].reshape(H2 * W2, 2 * C)
    return jnp.concatenate([even, odd], axis=1)


def fusable_even_prefix(h: int, w: int, strides: Sequence[int]) -> int:
    """Longest chain prefix whose stride-2 layers all see even dims.

    `conv_chain_strided`'s in-kernel s2d needs even H, W at every
    stride-2 layer; the tail past the prefix runs via XLA.
    """
    n = 0
    for s in strides:
        if s == 2:
            if h % 2 or w % 2:
                break
            h, w = h // 2, w // 2
        n += 1
    return n


def _same_pad_low(size: int, k: int, stride: int) -> int:
    """XLA SAME low padding (flax nn.Conv convention)."""
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    return total // 2


def s2d_weights(w: jnp.ndarray, pad_low: int):
    """Remap (k, k, Cin, Cout) stride-2 SAME weights onto the s2d grid.

    A stride-2 tap at full-res offset d = dy - pad_low lands on s2d
    window row d // 2, input plane parity d % 2 (floor semantics), so
    the conv becomes a stride-1 window conv over the (H/2, W/2, 4Cin)
    s2d tensor. Returns (win*win, 4Cin, Cout) weights (zeros where no
    full-res tap maps) plus the window offset range [lo, hi].

    Implementation: d + (pad_low + 2*(-lo)) = 2*(win_row) + parity, so
    one pad to length 2*win per spatial axis followed by a (win, 2)
    split-reshape separates window index from parity — a single
    pad/reshape/transpose chain XLA fuses into one kernel, instead of
    k^2 dynamic-update-slices in the traced serving graph (this runs
    per forward call; params are runtime inputs, never folded).
    """
    k, _, cin, cout = w.shape
    lo = (0 - pad_low) // 2
    hi = (k - 1 - pad_low) // 2
    win = hi - lo + 1
    a = -pad_low - 2 * lo  # left pad so index = 2*(win_row - lo) + parity
    wp = jnp.pad(
        w, ((a, 2 * win - k - a), (a, 2 * win - k - a), (0, 0), (0, 0))
    )
    w6 = wp.reshape(win, 2, win, 2, cin, cout)
    w2 = w6.transpose(0, 2, 1, 3, 4, 5).reshape(win, win, 4 * cin, cout)
    return w2.reshape(win * win, 4 * cin, cout), lo, hi


def _strided_plan(H, W, weights, strides):
    """Static geometry + remapped weights for a mixed-stride chain.

    Returns (geoms, w9s, scratch_rows): geoms[i] = (H, W, stride,
    win_lo, win_hi, pad_b) at layer i's post-s2d resolution; w9s[i]
    the (win^2, Cin_eff, Cout) f32 tap weights (s2d-remapped for
    stride-2 layers); scratch_rows[i] the padded scratch extent.
    Shared by the serving forward and the VJP's backward.
    """
    geoms, w9s, scratch_rows = [], [], []
    h, w_dim = H, W
    for i, (wt, stride) in enumerate(zip(weights, strides)):
        k = wt.shape[0]
        if stride == 2:
            if h % 2 or w_dim % 2:
                raise ValueError(
                    f"stride-2 layer {i} needs even dims, got {h}x{w_dim}"
                )
            padl = _same_pad_low(h, k, 2)
            w9, lo, hi = s2d_weights(wt.astype(jnp.float32), padl)
            h, w_dim = h // 2, w_dim // 2
        else:
            padl = (k - 1) // 2
            lo, hi = -padl, k - 1 - padl
            w9 = wt.astype(jnp.float32).reshape(
                k * k, wt.shape[2], wt.shape[3]
            )
        pad_b = max(0, -lo) * (w_dim + 1)
        pad_a = max(0, hi) * (w_dim + 1)
        geoms.append((h, w_dim, stride, lo, hi, pad_b))
        w9s.append(w9)
        scratch_rows.append(h * w_dim + pad_b + pad_a)
    return geoms, w9s, scratch_rows


def _strided_chain_kernel(
    *refs, height, width, geoms, relus, taps, compute_dtype,
    dot_dtype=None,
):
    """refs = [x_ref, (w_ref, b_ref) * n, out_ref * len(taps),
    scratch * n].

    (height, width) is the kernel input resolution; geoms[i] =
    (H, W, stride, win_lo, win_hi, pad_b) for layer i, at the layer's
    POST-s2d resolution (H, W) when stride == 2. Taps are contiguous
    row slices of the layer's own exactly-sized scratch; horizontal
    validity is masked per window column offset. `taps` lists the
    layers whose post-activation outputs are emitted (pyramid levels).
    """
    if dot_dtype is None:
        dot_dtype = compute_dtype
    n_layers = len(geoms)
    x_ref = refs[0]
    wb_refs = refs[1 : 1 + 2 * n_layers]
    out_refs = refs[1 + 2 * n_layers : 1 + 2 * n_layers + len(taps)]
    scratches = refs[1 + 2 * n_layers + len(taps) :]
    x = x_ref[0].astype(compute_dtype)
    H_in, W_in = height, width
    for layer in range(n_layers):
        H, W, stride, win_lo, win_hi, pad_b = geoms[layer]
        if stride == 2:
            x = _s2d_rows(x, H_in, W_in, x.shape[-1])
        P = H * W
        scratch = scratches[layer]
        w_ref = wb_refs[2 * layer]
        b_ref = wb_refs[2 * layer + 1]
        cin = w_ref.shape[1]
        cout = w_ref.shape[2]
        win = win_hi - win_lo + 1
        col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
        # Static guards: a k=3 stride-2 layer has pad_b == 0 and a
        # zero-row jnp.zeros store is the "Invalid type:
        # broadcast_in_dim" Mosaic rejection (r3 probe finding).
        if pad_b:
            scratch[0:pad_b, :] = jnp.zeros((pad_b, cin), compute_dtype)
        scratch[pad_b : pad_b + P, :] = x
        pad_a = scratch.shape[0] - pad_b - P
        if pad_a:
            scratch[pad_b + P :, :] = jnp.zeros(
                (pad_a, cin), compute_dtype
            )
        acc = jnp.zeros((P, cout), jnp.float32)
        for wy in range(win_lo, win_hi + 1):
            for wx in range(win_lo, win_hi + 1):
                off = pad_b + wy * W + wx
                tap = scratch[off : off + P, :]
                if wx != 0:
                    mask = jnp.logical_and(
                        col >= -wx, col < W - wx
                    ).astype(compute_dtype)
                    tap = tap * mask
                acc += jax.lax.dot(
                    tap.astype(dot_dtype),
                    w_ref[(wy - win_lo) * win + (wx - win_lo)].astype(
                        dot_dtype
                    ),
                    preferred_element_type=jnp.float32,
                )
        x = (acc + b_ref[0]).astype(compute_dtype)
        if relus[layer]:
            x = jax.nn.relu(x)
        if layer in taps:
            o = out_refs[taps.index(layer)]
            o[0] = x.astype(o.dtype)
        H_in, W_in = H, W


@partial(
    jax.jit,
    static_argnames=("strides", "relus", "taps", "compute_dtype_name"),
)
def conv_chain_strided(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    strides: tuple,
    relus: tuple,
    taps: tuple | None = None,
    compute_dtype_name: str = "bfloat16",
):
    """Fused mixed-stride SAME conv chain as ONE Pallas kernel.

    Generalizes `conv_chain_nhwc` to stride-2 layers and any odd kernel
    size (the PoseEncoder's 7/5/3 stack, the RegionAttention conv
    stack, the flow feature pyramid): a stride-2 layer space-to-depths
    its input in-kernel (contiguous merge-reshapes, `_s2d_rows`) and
    runs as a stride-1 window conv over the (H/2, W/2, 4Cin) grid with
    host-remapped weights (`s2d_weights`) — numerically exact vs XLA's
    stride-2 SAME conv, ~1.3-1.8x the taps' FLOPs (zero-filled window
    slots), everything still contiguous-row-slice + MXU dot.

    x: (B, H, W, C0); weights[i]: (k_i, k_i, Cin_i, Cout_i) HWIO f32;
    strides[i] in {1, 2}; stride-2 layers require even input H, W
    (fuse the even prefix of a net; run the tail via XLA).
    Returns (B, H_out, W_out, Cout_last) f32, or — when `taps` names
    the layers to emit (a feature pyramid) — the list of those layers'
    post-activation outputs. Forward-only (serving).

    STATUS: interpret-validated (tests/test_kernels.py); hardware
    validation rides exp_conv2d_chain.py phase 4.
    """
    B, H, W, C0 = x.shape
    n_layers = len(relus)
    assert len(weights) == len(biases) == len(strides) == n_layers
    compute_dtype, dot_dtype = _DTYPE_MODES[compute_dtype_name]
    geoms, w9s, scratch_rows = _strided_plan(H, W, weights, strides)
    scratch_shapes = [
        pltpu.VMEM((rows, w9.shape[1]), compute_dtype)
        for rows, w9 in zip(scratch_rows, w9s)
    ]
    wb = []
    for w9, b in zip(w9s, biases):
        wb.extend([w9, b.astype(jnp.float32)[None]])
    wb_specs = [_const_spec(arr.shape) for arr in wb]
    single = taps is None
    taps_t = (n_layers - 1,) if single else tuple(taps)
    assert all(0 <= t < n_layers for t in taps_t) and sorted(
        set(taps_t)
    ) == list(taps_t), taps_t
    flops = 0
    for g, wt in zip(geoms, weights):
        # s2d layers: win^2 * 4Cin effective taps (incl. zero slots).
        win = g[4] - g[3] + 1
        cin_eff = wt.shape[2] * (4 if g[2] == 2 else 1)
        flops += 2 * B * g[0] * g[1] * win * win * cin_eff * wt.shape[3]
    out_shapes = [
        jax.ShapeDtypeStruct(
            (B, geoms[t][0] * geoms[t][1], weights[t].shape[3]),
            jnp.float32,
        )
        for t in taps_t
    ]
    out_bytes = sum(4 * B * s.shape[1] * s.shape[2] for s in out_shapes)
    outs = pl.pallas_call(
        partial(
            _strided_chain_kernel, height=H, width=W,
            geoms=tuple(geoms), relus=relus, taps=taps_t,
            compute_dtype=compute_dtype, dot_dtype=dot_dtype,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H * W, C0), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + wb_specs,
        out_specs=[
            pl.BlockSpec(
                (1, s.shape[1], s.shape[2]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for s in out_shapes
        ],
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * H * W * C0 + out_bytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(x.reshape(B, H * W, C0), *wb)
    outs = [
        o.reshape(B, geoms[t][0], geoms[t][1], weights[t].shape[3])
        for o, t in zip(outs, taps_t)
    ]
    return outs[0] if single else outs


@partial(jax.jit, static_argnames=("relus", "compute_dtype_name"))
def conv_chain_nhwc(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    relus: tuple,
    compute_dtype_name: str = "bfloat16",
) -> jnp.ndarray:
    """Run a SAME stride-1 3x3 conv chain as one Pallas kernel.

    x: (B, H, W, Cin); weights[i]: (3, 3, Cin_i, Cout_i) HWIO f32;
    biases[i]: (Cout_i,); relus[i]: apply ReLU after layer i.
    compute_dtype_name: in-kernel operand dtype — "bfloat16" (default,
    matches ConvBlock's MXU dtype; f32 accumulation) or "float32".
    Returns (B, H, W, Cout_last) float32. The NHWC<->rows reshapes live
    outside the kernel where XLA fuses them.
    """
    B, H, W, C0 = x.shape
    P = H * W
    n_layers = len(relus)
    compute_dtype, dot_dtype = _DTYPE_MODES[compute_dtype_name]
    cmax = max([C0] + [w.shape[3] for w in weights])
    cout = weights[-1].shape[3]
    wb, wb_specs = _wb_and_specs(weights, biases)
    flops = 0
    cin = C0
    for w in weights:
        flops += 2 * B * P * 9 * cin * w.shape[3]
        cin = w.shape[3]
    out = pl.pallas_call(
        partial(
            _chain_kernel, height=H, width=W, n_layers=n_layers,
            relus=relus, compute_dtype=compute_dtype,
            dot_dtype=dot_dtype,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, P, C0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + wb_specs,
        out_specs=pl.BlockSpec(
            (1, P, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, P, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), cmax), compute_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * P * (C0 + cout),
            transcendentals=0,
        ),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(x.reshape(B, P, C0), *wb)
    return out.reshape(B, H, W, cout)


# ---------------------------------------------------------------------------
# Differentiable fused chain (training path): custom VJP whose forward
# AND backward each run as ONE Pallas kernel.
# ---------------------------------------------------------------------------

def _chain_fwd_kernel(*refs, height, width, n_layers, relus, compute_dtype):
    """Forward emitting every layer's post-activation (VJP residuals).

    refs = [x_ref, (w_ref, b_ref) * n, act_ref * n, scratch];
    act_ref[i] (1, P, Cout_i) f32 — act_ref[n-1] is the primal output.
    """
    x_ref = refs[0]
    wb_refs = refs[1 : 1 + 2 * n_layers]
    act_refs = refs[1 + 2 * n_layers : 1 + 3 * n_layers]
    scratch = refs[1 + 3 * n_layers]
    _run_3x3_chain(
        x_ref[0].astype(compute_dtype), wb_refs, scratch, width, relus,
        compute_dtype, act_refs=act_refs,
    )


def _chain_bwd_kernel(*refs, height, width, n_layers, relus, compute_dtype):
    """Backward for the stride-1 3x3 chain, one kernel for all layers.

    refs = [a_0..a_n (layer inputs + primal out), dy,
            w_0..w_{n-1} ((9, Cin, Cout) f32),
            dx, dw_0..dw_{n-1}, db_0..db_{n-1},
            scratch_in (compute_dtype), scratch_dx (f32)].

    dW/db accumulate across the batch grid in-place (constant output
    index maps; zeroed at grid step 0 — TPU grid steps run serially).
    Per layer, reversed:
      dz = dy * relu'(a_out)
      db += sum_P dz
      dW[tap] = (masked shifted a_in)^T @ dz      (contract P on MXU)
      da_in[p + off] += mask(p) * (dz @ W[tap]^T)[p]  (padded scratch,
        central slice read back — the exact transpose of the forward's
        zero-padded tap reads, including the iota wrap masks)
    """
    a_refs = refs[: n_layers + 1]
    dy_ref = refs[n_layers + 1]
    w_refs = refs[n_layers + 2 : 2 * n_layers + 2]
    dx_ref = refs[2 * n_layers + 2]
    dw_refs = refs[2 * n_layers + 3 : 3 * n_layers + 3]
    db_refs = refs[3 * n_layers + 3 : 4 * n_layers + 3]
    scratch_in = refs[4 * n_layers + 3]
    scratch_dx = refs[4 * n_layers + 4]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        for r in list(dw_refs) + list(db_refs):
            r[...] = jnp.zeros(r.shape, r.dtype)

    acts = [r[0] for r in a_refs]
    dx = _run_3x3_chain_bwd(
        dy_ref[0].astype(jnp.float32), acts, w_refs, dw_refs, db_refs,
        scratch_in, scratch_dx, width, relus,
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _run_3x3_chain_bwd(
    dy, acts, w_refs, dw_refs, db_refs, scratch_in, scratch_dx, width,
    relus,
):
    """Reverse pass over a stride-1 3x3 chain; returns d(acts[0]).

    acts = [a_0 (chain input), a_1..a_n (post-activation outputs)] as
    (P, C) values; dW/db are accumulated (+=) into their refs. Shared
    by `_chain_bwd_kernel` and the flow-level backward.
    """
    n_layers = len(relus)
    P = acts[0].shape[0]
    pad = width + 1
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % width
    mask_l = (col >= 1).astype(jnp.float32)
    mask_r = (col < width - 1).astype(jnp.float32)
    for layer in reversed(range(n_layers)):
        a_in = acts[layer].astype(jnp.float32)
        a_out = acts[layer + 1]
        dz = dy
        if relus[layer]:
            dz = dz * (a_out > 0).astype(jnp.float32)
        cin = w_refs[layer].shape[1]
        db_refs[layer][0] += jnp.sum(dz, axis=0)
        # padded input for dW taps (fwd's exact tap construction)
        scratch_in[0:pad, :cin] = jnp.zeros((pad, cin), jnp.float32)
        scratch_in[pad : pad + P, :cin] = a_in
        scratch_in[pad + P : 2 * pad + P, :cin] = jnp.zeros(
            (pad, cin), jnp.float32
        )
        # zero the dx accumulator region (full padded extent)
        scratch_dx[:, :cin] = jnp.zeros(
            (scratch_dx.shape[0], cin), jnp.float32
        )
        for ky in range(3):
            for kx in range(3):
                t = ky * 3 + kx
                off = (ky - 1) * width + (kx - 1)
                tap = scratch_in[pad + off : pad + off + P, :cin]
                if kx == 0:
                    tap = tap * mask_l
                elif kx == 2:
                    tap = tap * mask_r
                dw_refs[layer][t] += jax.lax.dot_general(
                    tap, dz, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                u = jax.lax.dot_general(
                    dz, w_refs[layer][t],
                    (((1,), (1,)), ((), ())),  # dz @ W[t]^T
                    preferred_element_type=jnp.float32,
                )
                if kx == 0:
                    u = u * mask_l
                elif kx == 2:
                    u = u * mask_r
                scratch_dx[pad + off : pad + off + P, :cin] += u
        dy = scratch_dx[pad : pad + P, :cin]
    return dy


def _chain_fwd_all(x, weights, biases, relus, compute_dtype_name):
    """Run the fused forward, returning every layer's activation."""
    B, H, W, C0 = x.shape
    P = H * W
    n_layers = len(relus)
    compute_dtype = {
        "bfloat16": jnp.bfloat16, "float32": jnp.float32
    }[compute_dtype_name]
    cmax = max([C0] + [w.shape[3] for w in weights])
    wb, wb_specs = _wb_and_specs(weights, biases)
    acts = pl.pallas_call(
        partial(
            _chain_fwd_kernel, height=H, width=W, n_layers=n_layers,
            relus=relus, compute_dtype=compute_dtype,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, P, C0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + wb_specs,
        out_specs=[
            pl.BlockSpec(
                (1, P, w.shape[3]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for w in weights
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, P, w.shape[3]), jnp.float32)
            for w in weights
        ],
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), cmax), compute_dtype)],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(x.reshape(B, P, C0), *wb)
    return acts


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv_chain_nhwc_ad(
    x, weights, biases, relus, compute_dtype_name="bfloat16"
):
    """Differentiable fused stride-1 3x3 chain (training path).

    Same semantics as `conv_chain_nhwc`, with a hand-written VJP: the
    forward is one Pallas kernel (emitting per-layer activations as
    residuals) and the whole backward — relu', db, all dW taps, and
    the transposed-conv dx — is ONE more Pallas kernel. dW/db
    accumulate across the batch grid in VMEM instead of materializing
    (B, 9, Cin, Cout) partials.

    STATUS: interpret-validated vs jax.grad of the XLA chain
    (tests/test_kernels.py::TestChainVJP); hardware validation rides
    exp_conv2d_chain.py phase 5.
    """
    # Primal (non-differentiated call): the serving kernel — no
    # residual activations written to HBM.
    return conv_chain_nhwc(
        x, tuple(weights), tuple(biases), relus,
        compute_dtype_name=compute_dtype_name,
    )


def _chain_ad_fwd(x, weights, biases, relus, compute_dtype_name):
    B, H, W, _ = x.shape
    acts = _chain_fwd_all(x, weights, biases, relus, compute_dtype_name)
    out = acts[-1].reshape(B, H, W, weights[-1].shape[3])
    return out, (x, acts, tuple(weights), tuple(biases))


def _chain_ad_bwd(relus, compute_dtype_name, res, g):
    x, acts, weights, biases = res
    B, H, W, C0 = x.shape
    P = H * W
    n_layers = len(relus)
    compute_dtype = {
        "bfloat16": jnp.bfloat16, "float32": jnp.float32
    }[compute_dtype_name]
    cmax = max([C0] + [w.shape[3] for w in weights])
    w9s = [
        w.astype(jnp.float32).reshape(9, w.shape[2], w.shape[3])
        for w in weights
    ]
    a_ins = [x.reshape(B, P, C0)] + [a for a in acts]
    dx, *dwdb = pl.pallas_call(
        partial(
            _chain_bwd_kernel, height=H, width=W, n_layers=n_layers,
            relus=relus, compute_dtype=compute_dtype,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, P, a.shape[-1]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for a in a_ins
        ]
        + [
            pl.BlockSpec(
                (1, P, weights[-1].shape[3]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [_const_spec(w9.shape) for w9 in w9s],
        out_specs=[
            pl.BlockSpec(
                (1, P, C0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + [_const_spec(w9.shape) for w9 in w9s]
        + [_const_spec((1, w.shape[3])) for w in weights],
        out_shape=[jax.ShapeDtypeStruct((B, P, C0), jnp.float32)]
        + [
            jax.ShapeDtypeStruct(w9.shape, jnp.float32) for w9 in w9s
        ]
        + [
            jax.ShapeDtypeStruct((1, w.shape[3]), jnp.float32)
            for w in weights
        ],
        scratch_shapes=[
            pltpu.VMEM((P + 2 * (W + 1), cmax), jnp.float32),
            pltpu.VMEM((P + 2 * (W + 1), cmax), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*a_ins, g.reshape(B, P, weights[-1].shape[3]), *w9s)
    dws = tuple(
        dwdb[i].reshape(3, 3, *weights[i].shape[2:]).astype(
            weights[i].dtype
        )
        for i in range(n_layers)
    )
    dbs = tuple(
        dwdb[n_layers + i][0].astype(biases[i].dtype)
        for i in range(n_layers)
    )
    # Cotangent dtypes must match the primals (x may be bf16 when the
    # chain input is built in the model's compute dtype).
    return (dx.reshape(B, H, W, C0).astype(x.dtype), dws, dbs)


conv_chain_nhwc_ad.defvjp(_chain_ad_fwd, _chain_ad_bwd)


# ---------------------------------------------------------------------------
# Differentiable fused flow level: cost volume + concat + estimator
# chain with a hand-written VJP (one kernel forward, one backward).
# ---------------------------------------------------------------------------

def _flow_level_fwd_ad_kernel(
    *refs, height, width, search, n_layers, relus, compute_dtype
):
    """Forward emitting the ReLU'd cost volume and every chain
    activation (VJP residuals).

    refs = [f1, f2, feat, flow_up, (w, b) * n, cv_out, act * n,
            cv_scratch, chain_scratch].
    """
    f1_ref, f2_ref, feat_ref, flow_ref = refs[:4]
    wb_refs = refs[4 : 4 + 2 * n_layers]
    cv_ref = refs[4 + 2 * n_layers]
    act_refs = refs[5 + 2 * n_layers : 5 + 3 * n_layers]
    cv_scratch = refs[5 + 3 * n_layers]
    scratch = refs[6 + 3 * n_layers]

    cols = _rows_costvol(
        f1_ref[0].astype(jnp.float32), f2_ref, cv_scratch, width, search
    )
    cv = jnp.concatenate(cols, axis=1)
    cv_ref[0] = cv
    x = jnp.concatenate(
        [
            cv,
            feat_ref[0].astype(jnp.float32),
            flow_ref[0].astype(jnp.float32),
        ],
        axis=1,
    ).astype(compute_dtype)
    _run_3x3_chain(
        x, wb_refs, scratch, width, relus, compute_dtype,
        act_refs=act_refs,
    )


def _flow_level_bwd_kernel(
    *refs, height, width, search, n_layers, relus, compute_dtype
):
    """Backward for the fused flow level, one kernel.

    refs = [f1, f2, feat, flow_up, cv, act * n, dy,
            w_0..w_{n-1} ((9, Cin, Cout) f32),
            df1, df2, dfeat, dflow, dw * n, db * n,
            scratch_in, scratch_dx, cv_scratch, df2_scratch].

    Chain backward via `_run_3x3_chain_bwd` (the estimator input a_0 =
    concat(cv, feat, flow_up) is rebuilt from residuals), then the
    cost-volume backward: per displacement d, with the relu+valid gate
    g_d = dcv_d * (cv_d > 0) / C,
      df1  += g_d * f2w[p + d]            (tap reads of padded f2w)
      df2w[p + d] += g_d * f1[p]          (transposed-tap scatter-add)
    """
    f1_ref, f2_ref, feat_ref, flow_ref = refs[:4]
    cv_ref = refs[4]
    act_refs = refs[5 : 5 + n_layers]
    dy_ref = refs[5 + n_layers]
    w_refs = refs[6 + n_layers : 6 + 2 * n_layers]
    df1_ref = refs[6 + 2 * n_layers]
    df2_ref = refs[7 + 2 * n_layers]
    dfeat_ref = refs[8 + 2 * n_layers]
    dflow_ref = refs[9 + 2 * n_layers]
    dw_refs = refs[10 + 2 * n_layers : 10 + 3 * n_layers]
    db_refs = refs[10 + 3 * n_layers : 10 + 4 * n_layers]
    scratch_in = refs[10 + 4 * n_layers]
    scratch_dx = refs[11 + 4 * n_layers]
    cv_scratch = refs[12 + 4 * n_layers]
    df2_scratch = refs[13 + 4 * n_layers]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        for r in list(dw_refs) + list(db_refs):
            r[...] = jnp.zeros(r.shape, r.dtype)

    P = height * width
    C = f1_ref.shape[2]
    D = (2 * search + 1) ** 2
    Cf = feat_ref.shape[2]

    cv = cv_ref[0]
    feat = feat_ref[0].astype(jnp.float32)
    flow_up = flow_ref[0].astype(jnp.float32)
    a0 = jnp.concatenate([cv, feat, flow_up], axis=1)
    acts = [a0] + [r[0] for r in act_refs]
    da0 = _run_3x3_chain_bwd(
        dy_ref[0].astype(jnp.float32), acts, w_refs, dw_refs, db_refs,
        scratch_in, scratch_dx, width, relus,
    )
    dcv = da0[:, :D]
    dfeat_ref[0] = da0[:, D : D + Cf].astype(dfeat_ref.dtype)
    dflow_ref[0] = da0[:, D + Cf :].astype(dflow_ref.dtype)

    # --- cost volume backward ---
    pad_cv = search * width + search
    f1 = f1_ref[0].astype(jnp.float32)
    # padded f2 for the forward-direction taps
    cv_scratch[0:pad_cv, :] = jnp.zeros((pad_cv, C), jnp.float32)
    cv_scratch[pad_cv : pad_cv + P, :] = f2_ref[0].astype(jnp.float32)
    cv_scratch[pad_cv + P : 2 * pad_cv + P, :] = jnp.zeros(
        (pad_cv, C), jnp.float32
    )
    # df2 accumulates in its own padded scratch (transposed taps)
    df2_scratch[...] = jnp.zeros(df2_scratch.shape, jnp.float32)
    df1 = jnp.zeros((P, C), jnp.float32)
    t = 0
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            off = pad_cv + dy * width + dx
            # relu' and the valid mask are both encoded in cv > 0
            # (invalid or negative-corr slots are exactly 0 and their
            # gradient is 0; corr == 0 has measure zero).
            g = dcv[:, t : t + 1] * (cv[:, t : t + 1] > 0).astype(
                jnp.float32
            ) * (1.0 / C)
            df1 += g * cv_scratch[off : off + P, :]
            df2_scratch[off : off + P, :] += g * f1
            t += 1
    df1_ref[0] = df1.astype(df1_ref.dtype)
    df2_ref[0] = df2_scratch[pad_cv : pad_cv + P, :].astype(
        df2_ref.dtype
    )


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def flow_level_fused_ad(
    f1, f2, feat, flow_up, weights, biases, search, relus,
    compute_dtype_name="bfloat16",
):
    """Differentiable fused flow level (training path).

    Same semantics as `flow_level_fused` (cost volume + ReLU + concat
    + estimator chain, returns the DELTA flow), with a hand-written
    VJP: one forward kernel (residuals: ReLU'd cost volume + per-layer
    activations) and one backward kernel (chain backward + the
    cost-volume transpose back to both feature maps).

    STATUS: interpret-validated vs jax.grad of the XLA composite
    (tests/test_kernels.py::TestFlowLevelVJP); hardware arms ride
    exp_train_prof.py (fuse_flow_level_train).
    """
    # Primal (non-differentiated call): the serving kernel — no
    # residuals written to HBM.
    return flow_level_fused(
        f1, f2, feat, flow_up, tuple(weights), tuple(biases), search,
        relus, compute_dtype_name=compute_dtype_name,
    )


def _flow_level_fwd_all(
    f1, f2, feat, flow_up, weights, biases, search, relus,
    compute_dtype_name,
):
    B, H, W, C = f1.shape
    P = H * W
    D = (2 * search + 1) ** 2
    n_layers = len(relus)
    compute_dtype = {
        "bfloat16": jnp.bfloat16, "float32": jnp.float32
    }[compute_dtype_name]
    cin0 = D + feat.shape[3] + flow_up.shape[3]
    assert weights[0].shape[2] == cin0, (weights[0].shape, cin0)
    cmax = max([cin0] + [w.shape[3] for w in weights])
    pad_cv = search * W + search
    wb, wb_specs = _wb_and_specs(weights, biases)
    out_shapes = [jax.ShapeDtypeStruct((B, P, D), jnp.float32)] + [
        jax.ShapeDtypeStruct((B, P, w.shape[3]), jnp.float32)
        for w in weights
    ]
    return pl.pallas_call(
        partial(
            _flow_level_fwd_ad_kernel, height=H, width=W, search=search,
            n_layers=n_layers, relus=relus, compute_dtype=compute_dtype,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, P, a.shape[-1]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for a in (f1, f2, feat, flow_up)
        ]
        + wb_specs,
        out_specs=[
            pl.BlockSpec(
                (1, s.shape[1], s.shape[2]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for s in out_shapes
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((P + 2 * pad_cv, C), jnp.float32),
            pltpu.VMEM((P + 2 * (W + 1), cmax), compute_dtype),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(
        f1.reshape(B, P, C),
        f2.reshape(B, P, C),
        feat.reshape(B, P, feat.shape[3]),
        flow_up.reshape(B, P, flow_up.shape[3]),
        *wb,
    )


def _flow_level_ad_fwd(
    f1, f2, feat, flow_up, weights, biases, search, relus,
    compute_dtype_name,
):
    outs = _flow_level_fwd_all(
        f1, f2, feat, flow_up, weights, biases, search, relus,
        compute_dtype_name,
    )
    B, H, W, _ = f1.shape
    out = outs[-1].reshape(B, H, W, weights[-1].shape[3])
    res = (
        f1, f2, feat, flow_up, outs[0], outs[1:], tuple(weights),
        tuple(biases),
    )
    return out, res


def _flow_level_ad_bwd(search, relus, compute_dtype_name, res, g):
    f1, f2, feat, flow_up, cv, acts, weights, biases = res
    B, H, W, C = f1.shape
    P = H * W
    D = (2 * search + 1) ** 2
    Cf = feat.shape[3]
    n_layers = len(relus)
    compute_dtype = {
        "bfloat16": jnp.bfloat16, "float32": jnp.float32
    }[compute_dtype_name]
    cin0 = D + Cf + flow_up.shape[3]
    cmax = max([cin0] + [w.shape[3] for w in weights])
    pad_cv = search * W + search
    w9s = [
        w.astype(jnp.float32).reshape(9, w.shape[2], w.shape[3])
        for w in weights
    ]
    item_spec = lambda c: pl.BlockSpec(
        (1, P, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    ins = [
        f1.reshape(B, P, C),
        f2.reshape(B, P, C),
        feat.reshape(B, P, Cf),
        flow_up.reshape(B, P, flow_up.shape[3]),
        cv,
        *acts,
        g.reshape(B, P, weights[-1].shape[3]),
    ]
    outs = pl.pallas_call(
        partial(
            _flow_level_bwd_kernel, height=H, width=W, search=search,
            n_layers=n_layers, relus=relus, compute_dtype=compute_dtype,
        ),
        grid=(B,),
        in_specs=[item_spec(a.shape[-1]) for a in ins]
        + [_const_spec(w9.shape) for w9 in w9s],
        out_specs=[
            item_spec(C), item_spec(C), item_spec(Cf),
            item_spec(flow_up.shape[3]),
        ]
        + [_const_spec(w9.shape) for w9 in w9s]
        + [_const_spec((1, w.shape[3])) for w in weights],
        out_shape=[
            jax.ShapeDtypeStruct((B, P, C), jnp.float32),
            jax.ShapeDtypeStruct((B, P, C), jnp.float32),
            jax.ShapeDtypeStruct((B, P, Cf), jnp.float32),
            jax.ShapeDtypeStruct((B, P, flow_up.shape[3]), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(w9.shape, jnp.float32) for w9 in w9s]
        + [
            jax.ShapeDtypeStruct((1, w.shape[3]), jnp.float32)
            for w in weights
        ],
        scratch_shapes=[
            pltpu.VMEM((P + 2 * (W + 1), cmax), jnp.float32),
            pltpu.VMEM((P + 2 * (W + 1), cmax), jnp.float32),
            pltpu.VMEM((P + 2 * pad_cv, C), jnp.float32),
            pltpu.VMEM((P + 2 * pad_cv, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*ins, *w9s)
    df1, df2, dfeat, dflow = outs[:4]
    dws = tuple(
        outs[4 + i].reshape(3, 3, *weights[i].shape[2:]).astype(
            weights[i].dtype
        )
        for i in range(n_layers)
    )
    dbs = tuple(
        outs[4 + n_layers + i][0].astype(biases[i].dtype)
        for i in range(n_layers)
    )
    shape4 = lambda a, c: a.reshape(B, H, W, c)
    return (
        shape4(df1, C).astype(f1.dtype),
        shape4(df2, C).astype(f2.dtype),
        shape4(dfeat, Cf).astype(feat.dtype),
        shape4(dflow, flow_up.shape[3]).astype(flow_up.dtype),
        dws,
        dbs,
    )


flow_level_fused_ad.defvjp(_flow_level_ad_fwd, _flow_level_ad_bwd)


# ---------------------------------------------------------------------------
# Differentiable fused mixed-stride chain (training path for the
# PoseEncoder / RegionAttention / feature-pyramid stacks).
# ---------------------------------------------------------------------------

def _d2s_rows(y, H2, W2, C4):
    """Depth-to-space: inverse of `_s2d_rows`.

    y (H2*W2, 4C) with plane order [ee, eo, oe, oo] -> (4*H2*W2, C) at
    the doubled resolution. Same contiguous reshape/concat op class as
    the forward.
    """
    C = C4 // 4
    even = y[:, : 2 * C].reshape(H2, W2 * 2 * C)
    odd = y[:, 2 * C :].reshape(H2, W2 * 2 * C)
    x2 = jnp.concatenate([even, odd], axis=1)  # (H2, 2*W2*2C)
    return x2.reshape(4 * H2 * W2, C)


def s2d_weights_bwd(dw2: jnp.ndarray, k: int, pad_low: int) -> jnp.ndarray:
    """Map a (win*win, 4Cin, Cout) s2d-space weight cotangent back to
    the original (k, k, Cin, Cout) layout (inverse of `s2d_weights`;
    the zero-slot positions carry no original weight and are cropped).
    """
    lo = (0 - pad_low) // 2
    hi = (k - 1 - pad_low) // 2
    win = hi - lo + 1
    a = -pad_low - 2 * lo
    cin = dw2.shape[1] // 4
    cout = dw2.shape[2]
    w6 = dw2.reshape(win, win, 2, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    wp = w6.reshape(2 * win, 2 * win, cin, cout)
    return wp[a : a + k, a : a + k]


def _strided_bwd_kernel(
    *refs, height, width, geoms, relus, taps, compute_dtype
):
    """Backward for the mixed-stride chain, one kernel for all layers.

    refs = [x, act * n, g_tap * len(taps), w9 * n,
            dx, dw9 * n, db * n, (scratch_in, scratch_dx) * n].

    Layer inputs at conv (post-s2d) resolution are rebuilt from the
    residual activations via `_s2d_rows` (contiguous reshapes); the
    per-layer window backward mirrors `_run_3x3_chain_bwd` with the
    layer's own [lo, hi] window, and stride-2 layers depth-to-space
    their input cotangent back to the parent resolution. Tap outputs'
    cotangents are injected into dy as the reverse sweep passes their
    layer. dw9/db accumulate across the batch grid.
    """
    n_layers = len(geoms)
    n_taps = len(taps)
    x_ref = refs[0]
    act_refs = refs[1 : 1 + n_layers]
    g_refs = refs[1 + n_layers : 1 + n_layers + n_taps]
    w_refs = refs[1 + n_layers + n_taps : 1 + 2 * n_layers + n_taps]
    dx_ref = refs[1 + 2 * n_layers + n_taps]
    dw_refs = refs[2 + 2 * n_layers + n_taps : 2 + 3 * n_layers + n_taps]
    db_refs = refs[2 + 3 * n_layers + n_taps : 2 + 4 * n_layers + n_taps]
    scratches = refs[2 + 4 * n_layers + n_taps :]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        for r in list(dw_refs) + list(db_refs):
            r[...] = jnp.zeros(r.shape, r.dtype)

    # Rebuild each layer's conv-resolution input from the residuals.
    acts_in = []
    cur_h, cur_w = height, width
    prev = x_ref[0].astype(jnp.float32)
    for layer in range(n_layers):
        H, W, stride, lo, hi, pad_b = geoms[layer]
        a_in = (
            _s2d_rows(prev, cur_h, cur_w, prev.shape[-1])
            if stride == 2
            else prev
        )
        acts_in.append(a_in)
        prev = act_refs[layer][0].astype(jnp.float32)
        cur_h, cur_w = H, W

    dy = None
    for layer in reversed(range(n_layers)):
        H, W, stride, lo, hi, pad_b = geoms[layer]
        P = H * W
        cout = w_refs[layer].shape[2]
        if dy is None:
            dy = jnp.zeros((P, cout), jnp.float32)
        if layer in taps:
            dy = dy + g_refs[taps.index(layer)][0].astype(jnp.float32)
        a_out = act_refs[layer][0]
        dz = dy
        if relus[layer]:
            dz = dz * (a_out > 0).astype(jnp.float32)
        db_refs[layer][0] += jnp.sum(dz, axis=0)
        a_in = acts_in[layer]
        cin = w_refs[layer].shape[1]
        win = hi - lo + 1
        scratch_in = scratches[2 * layer]
        scratch_dx = scratches[2 * layer + 1]
        col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
        # Static guards: pad_b/pad_a can be 0 (k=3 stride-2 layers) and
        # zero-row stores are rejected by Mosaic (r3 probe finding).
        if pad_b:
            scratch_in[0:pad_b, :] = jnp.zeros((pad_b, cin), jnp.float32)
        scratch_in[pad_b : pad_b + P, :] = a_in
        pad_a = scratch_in.shape[0] - pad_b - P
        if pad_a:
            scratch_in[pad_b + P :, :] = jnp.zeros(
                (pad_a, cin), jnp.float32
            )
        scratch_dx[...] = jnp.zeros(scratch_dx.shape, jnp.float32)
        for wy in range(lo, hi + 1):
            for wx in range(lo, hi + 1):
                t = (wy - lo) * win + (wx - lo)
                off = pad_b + wy * W + wx
                tap = scratch_in[off : off + P, :]
                if wx != 0:
                    mask = jnp.logical_and(
                        col >= -wx, col < W - wx
                    ).astype(jnp.float32)
                    tap = tap * mask
                dw_refs[layer][t] += jax.lax.dot_general(
                    tap, dz, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                u = jax.lax.dot_general(
                    dz, w_refs[layer][t],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if wx != 0:
                    u = u * mask
                scratch_dx[off : off + P, :] += u
        da_in = scratch_dx[pad_b : pad_b + P, :]
        if stride == 2:
            da_in = _d2s_rows(da_in, H, W, cin)
        dy = da_in
    dx_ref[0] = dy.astype(dx_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def conv_chain_strided_ad(
    x, weights, biases, strides, relus, taps=None,
    compute_dtype_name="bfloat16",
):
    """Differentiable fused mixed-stride chain (training path).

    Same semantics as `conv_chain_strided` (incl. multi-output taps),
    with a hand-written VJP: the forward emits every layer's
    activation as residuals; the whole backward — tap-injected
    cotangents, relu', db, window dW dots, the transposed window
    scatter for dx, and depth-to-space across stride boundaries — is
    ONE more Pallas kernel. s2d-space weight cotangents are mapped
    back to (k, k, Cin, Cout) on the host (`s2d_weights_bwd`).

    STATUS: interpret-validated vs jax.grad of the XLA chain
    (tests/test_kernels.py::TestStridedVJP).
    """
    return conv_chain_strided(
        x, tuple(weights), tuple(biases), strides, relus, taps=taps,
        compute_dtype_name=compute_dtype_name,
    )


def _strided_ad_fwd(
    x, weights, biases, strides, relus, taps, compute_dtype_name
):
    n_layers = len(relus)
    acts = conv_chain_strided(
        x, tuple(weights), tuple(biases), strides, relus,
        taps=tuple(range(n_layers)),
        compute_dtype_name=compute_dtype_name,
    )
    if taps is None:
        out = acts[-1]
    else:
        out = [acts[t] for t in taps]
    return out, (x, acts, tuple(weights), tuple(biases))


def _strided_ad_bwd(strides, relus, taps, compute_dtype_name, res, g):
    x, acts, weights, biases = res
    B, H, W, C0 = x.shape
    n_layers = len(relus)
    taps_t = (n_layers - 1,) if taps is None else tuple(taps)
    gs = [g] if taps is None else list(g)
    compute_dtype = {
        "bfloat16": jnp.bfloat16, "float32": jnp.float32
    }[compute_dtype_name]
    geoms, w9s, scratch_rows = _strided_plan(H, W, weights, strides)
    item_spec = lambda p, c: pl.BlockSpec(
        (1, p, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    ins = [x.reshape(B, H * W, C0)] + [
        a.reshape(B, geoms[l][0] * geoms[l][1], weights[l].shape[3])
        for l, a in enumerate(acts)
    ] + [
        gs[j].reshape(
            B, geoms[t][0] * geoms[t][1], weights[t].shape[3]
        )
        for j, t in enumerate(taps_t)
    ]
    scratch_shapes = []
    for rows, w9 in zip(scratch_rows, w9s):
        scratch_shapes.append(pltpu.VMEM((rows, w9.shape[1]), jnp.float32))
        scratch_shapes.append(pltpu.VMEM((rows, w9.shape[1]), jnp.float32))
    outs = pl.pallas_call(
        partial(
            _strided_bwd_kernel, height=H, width=W,
            geoms=tuple(geoms), relus=relus, taps=taps_t,
            compute_dtype=compute_dtype,
        ),
        grid=(B,),
        in_specs=[item_spec(a.shape[1], a.shape[2]) for a in ins]
        + [_const_spec(w9.shape) for w9 in w9s],
        out_specs=[item_spec(H * W, C0)]
        + [_const_spec(w9.shape) for w9 in w9s]
        + [_const_spec((1, w.shape[3])) for w in weights],
        out_shape=[jax.ShapeDtypeStruct((B, H * W, C0), jnp.float32)]
        + [jax.ShapeDtypeStruct(w9.shape, jnp.float32) for w9 in w9s]
        + [
            jax.ShapeDtypeStruct((1, w.shape[3]), jnp.float32)
            for w in weights
        ],
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*ins, *w9s)
    dx = outs[0].reshape(B, H, W, C0).astype(x.dtype)
    dws = []
    for l, w in enumerate(weights):
        dw9 = outs[1 + l]
        k = w.shape[0]
        if strides[l] == 2:
            h_in = geoms[l][0] * 2
            padl = _same_pad_low(h_in, k, 2)
            dw = s2d_weights_bwd(dw9, k, padl)
        else:
            dw = dw9.reshape(k, k, w.shape[2], w.shape[3])
        dws.append(dw.astype(w.dtype))
    dbs = tuple(
        outs[1 + n_layers + l][0].astype(biases[l].dtype)
        for l in range(n_layers)
    )
    return (dx, tuple(dws), dbs)


conv_chain_strided_ad.defvjp(_strided_ad_fwd, _strided_ad_bwd)
