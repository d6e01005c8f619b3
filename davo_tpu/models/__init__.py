"""Model zoo: DispNet / PoseNet / FlowNet / dynamic region attention.

Flax-linen re-designs of the reference networks (`<ref>/nets.py`,
SURVEY.md R5-R7). TPU-first conventions shared by every module here:

* NHWC activations; channels-last maps to the TPU lane dimension.
* Parameters are float32; compute runs in `compute_dtype` (bfloat16 by
  default) so convolutions hit the MXU at full rate; outputs that feed
  geometry (poses, disparities) are cast back to float32.
* No transposed convs: decoders upsample with nearest-resize + conv
  (identical receptive field, better XLA/TPU lowering).
* Static shapes everywhere; variants are selected by config, not
  runtime branching.
"""

from davo_tpu.models.posenet import PoseNet  # noqa: F401
from davo_tpu.models.dispnet import DispNet, disp_to_depth  # noqa: F401
from davo_tpu.models.flownet import FlowNetLite  # noqa: F401
from davo_tpu.models.attention import RegionAttention  # noqa: F401
from davo_tpu.models.davo import DavoModel  # noqa: F401
