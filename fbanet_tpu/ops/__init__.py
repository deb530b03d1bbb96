from fbanet_tpu.ops.warp import (
    homography_coords,
    warp_burst_homography,
    warp_flow,
    warp_image,
)

__all__ = [
    "homography_coords",
    "warp_burst_homography",
    "warp_flow",
    "warp_image",
]
