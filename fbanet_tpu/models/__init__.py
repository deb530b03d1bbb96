from fbanet_tpu.models.fbanet import FBANet, create_model, init_model


def count_parameters(params) -> int:
    """Total parameter count (reference: fba_net/utils/calculate_parameters.py)."""
    import jax
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

# Arch registry with the reference's naming
# (reference: fba_net/utils/model_utils.py:65-82 maps "BaseModel" -> FBANetModel).
ARCHS = {"BaseModel": create_model}

__all__ = ["FBANet", "create_model", "init_model", "ARCHS", "count_parameters"]
