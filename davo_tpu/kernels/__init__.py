"""Pallas TPU kernels for the hot ops.

Measured motivation (v5e, batch 16, 128x416, this repo @ r1):
the XLA lowering of the correlation cost volume materializes all
(2d+1)^2 shifted products in HBM (6.3 ms for ~0.3 GFLOP — 100x off
roofline), and `take_along_axis` warps lower to degenerate gathers
(~2 ms each). The kernels here keep those ops resident in VMEM.

Every kernel has an XLA fallback (same math) selected automatically on
non-TPU backends, and is validated against the fallback in tests.
"""

from davo_tpu.kernels.costvol import cost_volume_pallas, cost_volume_auto  # noqa: F401
from davo_tpu.kernels.sample import bilinear_sample_matmul  # noqa: F401
from davo_tpu.kernels.resize import upsample2x_bilinear, resize_bilinear_aligned  # noqa: F401
