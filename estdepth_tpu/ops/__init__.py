from estdepth_tpu.ops.geometry import (
    pixel_grid,
    scale_intrinsics,
    relative_projection,
    backproject,
)
from estdepth_tpu.ops.sampling import bilinear_sample, trilinear_sample
from estdepth_tpu.ops.warp import plane_sweep_warp, frustum_warp

__all__ = [
    "pixel_grid",
    "scale_intrinsics",
    "relative_projection",
    "backproject",
    "bilinear_sample",
    "trilinear_sample",
    "plane_sweep_warp",
    "frustum_warp",
]
