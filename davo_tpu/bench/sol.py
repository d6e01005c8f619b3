"""Speed-of-light accounting: FLOP/byte rooflines per component.

BASELINE requires per-chip SoL claims for the conv-attention forward
and the BA linear solve. These helpers compute analytic FLOP/byte
counts; `conv_stack_sol` compares a measured time against the v5e
roofline (bf16 MXU peak and HBM bandwidth below; adjust per chip).
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


@dataclass
class SolReport:
    flops: float
    bytes_accessed: float
    compute_bound_us: float
    memory_bound_us: float
    roofline_us: float
    measured_us: float | None = None

    @property
    def sol_fraction(self) -> float | None:
        if self.measured_us is None:
            return None
        return self.roofline_us / self.measured_us


def conv_stack_sol(
    shapes: list[tuple], measured_ms: float | None = None
) -> SolReport:
    """shapes: [(B, H, W, Cin, Cout, k, stride), ...] per layer."""
    flops = 0.0
    bytes_accessed = 0.0
    for (B, H, W, cin, cout, k, s) in shapes:
        oh, ow = -(-H // s), -(-W // s)
        flops += 2.0 * B * oh * ow * k * k * cin * cout
        bytes_accessed += 2.0 * B * H * W * cin  # bf16 in
        bytes_accessed += 2.0 * B * oh * ow * cout  # bf16 out
        bytes_accessed += 4.0 * k * k * cin * cout  # f32 weights
    compute_us = flops / (V5E_BF16_TFLOPS * 1e12) * 1e6
    memory_us = bytes_accessed / (V5E_HBM_GBPS * 1e9) * 1e6
    return SolReport(
        flops=flops,
        bytes_accessed=bytes_accessed,
        compute_bound_us=compute_us,
        memory_bound_us=memory_us,
        roofline_us=max(compute_us, memory_us),
        measured_us=None if measured_ms is None else measured_ms * 1000.0,
    )


def model_flops(cfg) -> float:
    """Analytic forward FLOPs of the full pose path (per frame pair):
    pose encoder, flow feature pyramid (x2 images), per-level cost
    volumes (with optional learned projection), flow estimators
    (optional 1x1 bottleneck), and the separable matmul warps."""
    H, W = cfg.img_height, cfg.img_width
    total = 0.0
    # Pose encoder
    cin = 6 + (2 if cfg.attention != "none" else 0)
    h, w = H, W
    for i, c in enumerate(cfg.pose_channels):
        k = 7 if i == 0 else (5 if i == 1 else 3)
        h, w = -(-h // 2), -(-w // 2)
        total += 2.0 * h * w * k * k * cin * c
        cin = c
    if cfg.attention == "none":
        return total

    level_ch = (16, 32, 64, 96)[: cfg.flow_levels]
    # Feature pyramid x2 images
    cin = 3
    h, w = H, W
    dims = []
    for c in level_ch:
        h, w = -(-h // 2), -(-w // 2)
        total += 2 * (2.0 * h * w * 9 * cin * c + 2.0 * h * w * 9 * c * c)
        dims.append((h, w))
        cin = c

    d2 = (2 * cfg.flow_search_range + 1) ** 2
    proj = cfg.costvol_feat_channels
    bneck = cfg.flow_est_bottleneck
    # Refined levels: pyramid indices 1 .. flow_levels-1
    for lv in range(1, cfg.flow_levels):
        h, w = dims[lv]
        px = h * w
        c = level_ch[lv]
        c_cv = proj if proj > 0 else c
        if proj > 0:  # 1x1 on both maps
            total += 2 * 2.0 * px * c * proj
        total += 2.0 * px * c_cv * d2  # correlation
        # Separable warp (all refined levels except the coarsest,
        # which starts from zero flow): two banded matmuls.
        if lv != cfg.flow_levels - 1:
            total += 2.0 * px * w * c + 2.0 * px * h * c
        # Estimator: optional 1x1 bottleneck + (96, 64, 32) 3x3s + head
        cin_est = d2 + c + 2
        if bneck > 0:
            total += 2.0 * px * cin_est * bneck
            cin_est = bneck
        for cout in (96, 64, 32):
            total += 2.0 * px * 9 * cin_est * cout
            cin_est = cout
        total += 2.0 * px * 9 * 32 * 2
    return total
