from fbanet_tpu.utils.shape_check import assert_shape

__all__ = ["assert_shape"]

# checkpoint, profiling and raw are imported explicitly by their users to
# keep `import fbanet_tpu` light (no jax.profiler / serialization imports).
