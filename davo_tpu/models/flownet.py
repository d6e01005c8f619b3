"""FlowNetLite: PWC-style coarse-to-fine optical flow.

Reference parity: the vendored PWC-Net TF implementation the reference
uses as its frozen flow cue (SURVEY.md R7 [M]): feature pyramids,
correlation cost volume, per-level flow estimation with warping.
Re-designed small ("lite") and trained in-repo — there are no
importable pretrained weights in a fresh framework (SURVEY.md §7.2).

TPU notes: the cost volume is a static (2d+1)^2 loop of elementwise
multiply-reduces that XLA fuses; levels are coarse (<= /4) so the
volume stays small. A Pallas kernel can replace it later
(`kernels/costvol.py`) — the module boundary is shaped for that swap.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from davo_tpu.config import ModelConfig
from davo_tpu.core.warp import flow_warp_separable
from davo_tpu.kernels.costvol import cost_volume_pallas
from davo_tpu.kernels.resize import resize_bilinear_aligned
from davo_tpu.models.common import ConvBlock, dtype_of

_LEVEL_CHANNELS = (16, 32, 64, 96)


def cost_volume(f1: jnp.ndarray, f2: jnp.ndarray, search: int) -> jnp.ndarray:
    """Correlation volume: (B, H, W, (2*search+1)^2).

    entry (dy, dx) = mean_c f1[y, x, c] * f2[y+dy, x+dx, c].
    """
    B, H, W, C = f1.shape
    pad = search
    f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    slices = []
    for dy in range(2 * search + 1):
        for dx in range(2 * search + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy, dx, 0), (B, H, W, C)
            )
            slices.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(slices, axis=-1)


def cost_volume_scan(
    f1: jnp.ndarray, f2: jnp.ndarray, search: int
) -> jnp.ndarray:
    """`cost_volume` as ONE `lax.scan` over shift indices (identical
    output). The unrolled form emits (2s+1)^2 slice+reduce kernels per
    level (243 at search=4 over 3 levels); at ~70 us/kernel dispatch on
    the tunneled TPU that is ~5 ms of pure launch overhead (r2c
    profile: search=3 saved exactly the kernel-count fraction). The
    scan compiles the body once and loops on-device."""
    B, H, W, C = f1.shape
    d = 2 * search + 1
    f2p = jnp.pad(f2, ((0, 0), (search, search), (search, search), (0, 0)))

    def body(_, k):
        slab = jax.lax.dynamic_slice(
            f2p, (0, k // d, k % d, 0), (B, H, W, C)
        )
        return None, jnp.mean(f1 * slab, axis=-1)

    _, cv = jax.lax.scan(body, None, jnp.arange(d * d))
    return jnp.moveaxis(cv, 0, -1)


def cost_volume_gram(
    f1: jnp.ndarray, f2: jnp.ndarray, search: int
) -> jnp.ndarray:
    """MXU formulation of `cost_volume` (identical output).

    The (2s+1)^2-slice form is a VPU elementwise multiply-reduce per
    shift (~5 ms of the 14.5 ms r2 flagship forward). Here, for each of
    the 2s+1 row shifts dy, one batched Gram matmul over the channel
    axis computes ALL column correlations at once —
    ``G[b,y,x,v] = sum_c f1[b,y,x,c] * f2p[b,y+dy,v,c]`` — and the
    (2s+1) needed diagonals ``out[...,dx] = G[b,y,x,x+dx]`` come out as
    STRIDED slices of the flattened last two axes (stride W'+1; no
    gather — the same trick as `core.warp.flow_warp_separable`). The
    off-band Gram entries are wasted FLOPs (~11x at /4), but they run
    at MXU rather than VPU rates. bf16 operands, f32 accumulation.
    """
    B, H, W, C = f1.shape
    d = 2 * search + 1
    Wp = W + 2 * search
    f2p = jnp.pad(f2, ((0, 0), (search, search), (search, search), (0, 0)))
    a = f1.astype(jnp.bfloat16)
    slices = []
    for dy in range(d):
        rows = jax.lax.dynamic_slice(f2p, (0, dy, 0, 0), (B, H, Wp, C))
        G = jax.lax.dot_general(
            a,
            rows.astype(jnp.bfloat16),
            (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # (B, H, W, Wp)
        Gf = G.reshape(B, H, W * Wp)
        for dx in range(d):
            # out[x] = Gf[x*(Wp+1) + dx]; (W-1)*(Wp+1)+d == W*Wp exactly.
            slices.append(
                jax.lax.slice(
                    Gf,
                    (0, 0, dx),
                    (B, H, dx + (W - 1) * (Wp + 1) + 1),
                    (1, 1, Wp + 1),
                )
            )
    return jnp.stack(slices, axis=-1) / C


def cost_volume_patches(
    f1: jnp.ndarray, f2: jnp.ndarray, search: int
) -> jnp.ndarray:
    """`cost_volume` as ONE patches op + ONE contraction (identical
    output, verified to 2e-7). `conv_general_dilated_patches` extracts
    all (2s+1)^2 shifted views of f2 in a single XLA op (feature order
    (C, ky, kx), ky-major — matching the slice loop's dy-major order),
    and the correlation is a single batched einsum over C. Candidate
    replacement for the (2s+1)^2 slice kernels whose dispatch count is
    the measured costvol cost (r2c profile: time scales with slice
    count, not bytes); the risk is materializing the (B,H,W,C*(2s+1)^2)
    patches tensor if XLA does not fuse it into the contraction.
    """
    B, H, W, C = f1.shape
    d = 2 * search + 1
    p = jax.lax.conv_general_dilated_patches(
        f2,
        filter_shape=(d, d),
        window_strides=(1, 1),
        padding=((search, search), (search, search)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    p = p.reshape(B, H, W, C, d * d)
    return jnp.einsum("bhwc,bhwck->bhwk", f1, p) / C


class FeaturePyramid(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> list[jnp.ndarray]:
        dt = dtype_of(self.cfg.compute_dtype)
        x = img.astype(dt)
        chans = _LEVEL_CHANNELS[: self.cfg.flow_levels]
        if (
            self.cfg.fuse_pyramid or self.cfg.fuse_pyramid_train
        ) and not self.is_initializing():
            # Fused fast path: the whole (s2, s1) x levels ladder as
            # ONE Pallas kernel, emitting every level via taps (same
            # mechanism + caveats as fuse_pose_encoder; the _train
            # variant carries the hand-written VJP with per-tap
            # cotangent injection). 416-wide inputs stay even through
            # all four s2 layers.
            from davo_tpu.kernels.rowconv import (
                conv_chain_strided,
                conv_chain_strided_ad,
                fusable_even_prefix,
            )

            strides = (2, 1) * len(chans)
            n = fusable_even_prefix(x.shape[1], x.shape[2], strides)
            if n == len(strides):
                p = self.variables["params"]
                ws, bs = [], []
                for i in range(len(chans)):
                    for suf in ("a", "b"):
                        ws.append(p[f"feat{i}{suf}"]["Conv_0"]["kernel"])
                        bs.append(p[f"feat{i}{suf}"]["Conv_0"]["bias"])
                fn = (
                    conv_chain_strided_ad
                    if self.cfg.fuse_pyramid_train
                    else conv_chain_strided
                )
                pyr = fn(
                    x, tuple(ws), tuple(bs), strides,
                    (True,) * len(strides),
                    taps=tuple(2 * i + 1 for i in range(len(chans))),
                    compute_dtype_name=(
                        self.cfg.fuse_compute or self.cfg.compute_dtype
                    ),
                )
                return [f.astype(dt) for f in pyr]
        pyr = []
        for i, ch in enumerate(chans):
            x = ConvBlock(
                ch, 3, 2, dt, name=f"feat{i}a",
                s2d=(i == 0 and self.cfg.s2d_first_conv),
            )(x)
            x = ConvBlock(ch, 3, 1, dt, name=f"feat{i}b")(x)
            pyr.append(x)
        return pyr  # fine (/2) -> coarse


class FlowEstimator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, cv, feat, flow_up):
        dt = dtype_of(self.cfg.compute_dtype)
        x = jnp.concatenate([cv.astype(dt), feat, flow_up.astype(dt)], axis=-1)
        if self.cfg.flow_est_bottleneck > 0:
            # 1x1 channel reduction: the 3x3 stack below dominates the
            # flagship's FLOPs; feeding it `bottleneck` instead of the
            # ~115-145-ch concat halves the estimator cost (measured
            # r2; quality-gated by the e2e tiers before any preset
            # adopts it).
            x = ConvBlock(
                self.cfg.flow_est_bottleneck, 1, 1, dt, name="est_in"
            )(x)
        if (
            self.cfg.fuse_estimator or self.cfg.fuse_estimator_train
        ) and not self.is_initializing():
            # Fused fast path: the whole est0->est1->est2->flow chain
            # as ONE Pallas kernel (kernels/rowconv.py), reading the
            # SAME parameters the XLA path trains (equality-tested).
            # Init still runs the XLA path below so the param tree is
            # identical. fuse_estimator has no VJP (serving only);
            # fuse_estimator_train uses the hand-written-VJP variant
            # (grads == XLA, tests/test_kernels.py::TestChainVJP) and
            # may be on during training.
            from davo_tpu.kernels.rowconv import (
                conv_chain_nhwc,
                conv_chain_nhwc_ad,
            )

            p = self.variables["params"]
            ws = tuple(
                p[f"est{i}"]["Conv_0"]["kernel"] for i in range(3)
            ) + (p["flow"]["kernel"],)
            bs = tuple(
                p[f"est{i}"]["Conv_0"]["bias"] for i in range(3)
            ) + (p["flow"]["bias"],)
            relus = (True, True, True, False)
            if self.cfg.fuse_estimator_train:
                delta = conv_chain_nhwc_ad(
                    x, ws, bs, relus, self.cfg.compute_dtype
                )
            else:
                delta = conv_chain_nhwc(
                    x, ws, bs, relus,
                    compute_dtype_name=(
                        self.cfg.fuse_compute or self.cfg.compute_dtype
                    ),
                )
            return flow_up + delta
        for i, ch in enumerate((96, 64, 32)):
            x = ConvBlock(ch, 3, 1, dt, name=f"est{i}")(x)
        delta = nn.Conv(
            2, (3, 3), padding="SAME", dtype=dt,
            param_dtype=jnp.float32, name="flow",
        )(x)
        return flow_up + delta.astype(jnp.float32)


class FlowNetLite(nn.Module):
    """Returns flow pyramid fine->coarse: [(B, H/4, W/4, 2), ...].

    Flows are in pixels at each level's own resolution. Finest level is
    /4 (PWC convention); `full_res_flow` upsamples to image resolution.
    """

    cfg: ModelConfig

    def setup(self):
        self.pyramid = FeaturePyramid(self.cfg)
        # One estimator per refined level (coarsest .. /4).
        self.estimators = [
            FlowEstimator(self.cfg, name=f"estimator{lv}")
            for lv in range(1, self.cfg.flow_levels)
        ]
        if self.cfg.costvol_feat_channels > 0:
            dt = dtype_of(self.cfg.compute_dtype)
            self.cv_projs = [
                nn.Conv(
                    self.cfg.costvol_feat_channels, (1, 1), dtype=dt,
                    param_dtype=jnp.float32, name=f"cv_proj{lv}",
                )
                for lv in range(1, self.cfg.flow_levels)
            ]

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> list[jnp.ndarray]:
        # One batched pyramid pass for both images: halves the dispatch
        # count and doubles the effective batch for the small convs.
        B = img1.shape[0]
        pboth = self.pyramid(jnp.concatenate([img1, img2], axis=0))
        p1 = [p[:B] for p in pboth]
        p2 = [p[B:] for p in pboth]
        search = self.cfg.flow_search_range

        flows: list[jnp.ndarray] = []
        flow = None
        # Coarse -> fine, skipping the /2 level (stop at index 1 == /4).
        for level in range(len(p1) - 1, 0, -1):
            f1, f2 = p1[level], p2[level]
            B, H, W, _ = f1.shape
            if flow is None:
                flow_up = jnp.zeros((B, H, W, 2), jnp.float32)
                f2w = f2
            else:
                flow_up = 2.0 * resize_bilinear_aligned(flow, H, W)
                # Separable matmul warp: the gather lowering costs 20 ms
                # of the 31 ms forward on TPU (r2 profile); the smooth
                # upsampled field makes the two-pass form near-exact.
                f2w, _ = flow_warp_separable(f2, flow_up)
            if self.cfg.use_pallas and jax.default_backend() == "tpu":
                cv_fn = cost_volume_pallas
            elif self.cfg.costvol_impl == "gram":
                cv_fn = cost_volume_gram
            elif self.cfg.costvol_impl == "scan":
                cv_fn = cost_volume_scan
            elif self.cfg.costvol_impl == "patches":
                cv_fn = cost_volume_patches
            elif self.cfg.costvol_impl == "pallas_rows":
                from davo_tpu.kernels.costvol import cost_volume_pallas_rows

                cv_fn = cost_volume_pallas_rows
            else:
                cv_fn = cost_volume
            f1c, f2c = f1, f2w
            if self.cfg.costvol_feat_channels > 0:
                # One linear 1x1 applied to BOTH maps (shared weights
                # keep the correlation a dot product in a learned
                # subspace).
                proj = self.cv_projs[level - 1]
                f1c, f2c = proj(f1), proj(f2w)
            if (
                (
                    self.cfg.fuse_flow_level
                    or self.cfg.fuse_flow_level_train
                )
                and not self.is_initializing()
                and self.cfg.flow_est_bottleneck == 0
            ):
                # Fused fast path: costvol + relu + concat + the
                # whole estimator chain as ONE kernel for this level
                # (kernels/rowconv), reading the same params the XLA
                # path trains. fuse_flow_level has no VJP (serving
                # only); fuse_flow_level_train uses the hand-written-
                # VJP variant and may be on during training.
                from davo_tpu.kernels.rowconv import (
                    flow_level_fused,
                    flow_level_fused_ad,
                )

                p = self.variables["params"][f"estimator{level}"]
                ws = tuple(
                    p[f"est{i}"]["Conv_0"]["kernel"] for i in range(3)
                ) + (p["flow"]["kernel"],)
                bs = tuple(
                    p[f"est{i}"]["Conv_0"]["bias"] for i in range(3)
                ) + (p["flow"]["bias"],)
                relus = (True, True, True, False)
                if self.cfg.fuse_flow_level_train:
                    delta = flow_level_fused_ad(
                        f1c, f2c, f1, flow_up, ws, bs, search, relus,
                        self.cfg.compute_dtype,
                    )
                else:
                    delta = flow_level_fused(
                        f1c, f2c, f1, flow_up, ws, bs, search, relus,
                        compute_dtype_name=(
                            self.cfg.fuse_compute
                            or self.cfg.compute_dtype
                        ),
                    )
                flow = flow_up + delta
            else:
                cv = nn.relu(
                    cv_fn(
                        f1c.astype(jnp.float32),
                        f2c.astype(jnp.float32),
                        search,
                    )
                )
                flow = self.estimators[level - 1](cv, f1, flow_up)
            flows.append(flow)
        return flows[::-1]  # fine (/4) first

    @staticmethod
    def full_res_flow(flow: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
        """Upsample a /k-level flow to full resolution (values rescaled).

        du and dv scale independently (width/w and height/h): the ratios
        differ whenever a pyramid level's stride does not divide the input
        evenly, and a shared factor would mis-scale dv.
        """
        _, h, w, _ = flow.shape
        scale = jnp.asarray([width / w, height / h], flow.dtype)
        return resize_bilinear_aligned(flow, height, width) * scale
