from fbanet_tpu.ops.warp import (
    homography_coords,
    warp_burst_homography,
    warp_flow,
    warp_image,
)
from fbanet_tpu.ops.warp_pallas import (
    warp_burst_bilinear_pallas,
    warp_burst_coords_pallas,
)

__all__ = [
    "homography_coords",
    "warp_burst_homography",
    "warp_burst_bilinear_pallas",
    "warp_burst_coords_pallas",
    "warp_flow",
    "warp_image",
]
