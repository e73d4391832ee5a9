from videopose3d_tpu.ops.quaternion import qrot, qinverse
from videopose3d_tpu.ops.camera import (
    normalize_screen_coordinates,
    image_coordinates,
    world_to_camera,
    camera_to_world,
    project_to_2d,
    project_to_2d_linear,
)
from videopose3d_tpu.ops.losses import (
    mpjpe,
    weighted_mpjpe,
    n_mpjpe,
    p_mpjpe,
    mean_velocity_error,
)

__all__ = [
    "qrot",
    "qinverse",
    "normalize_screen_coordinates",
    "image_coordinates",
    "world_to_camera",
    "camera_to_world",
    "project_to_2d",
    "project_to_2d_linear",
    "mpjpe",
    "weighted_mpjpe",
    "n_mpjpe",
    "p_mpjpe",
    "mean_velocity_error",
]
