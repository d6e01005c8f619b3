"""Core geometry / image math for davo_tpu.

Pure-functional JAX reimplementation of the reference geometry layer
(reference: `<ref>/utils.py` — euler2mat, pose_vec2mat, pixel2cam,
cam2pixel, projective_inverse_warp; SURVEY.md §2.1 R10) plus the SE(3)
Lie-group toolkit the BA backend needs (absent in the reference).
"""

from davo_tpu.core.geometry import (  # noqa: F401
    euler_to_mat,
    mat_to_euler,
    pose_vec_to_mat,
    mat_to_pose_vec,
    so3_hat,
    so3_vee,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inverse,
    se3_compose,
    se3_adjoint,
    make_intrinsics,
    scale_intrinsics,
    intrinsics_pyramid,
    pixel_grid,
    pixel_to_cam,
    cam_to_pixel,
    trajectory_from_relatives,
    relative_from_trajectory,
)
from davo_tpu.core.warp import (  # noqa: F401
    bilinear_sample,
    projective_inverse_warp,
    flow_warp,
)
from davo_tpu.core.ssim import ssim  # noqa: F401
from davo_tpu.core.pyramid import image_pyramid, resize_bilinear  # noqa: F401
