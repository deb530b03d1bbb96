from fbanet_tpu.utils.shape_check import assert_shape

__all__ = ["assert_shape"]
