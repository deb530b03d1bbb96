from fbanet_tpu.models.fbanet import FBANet, create_model, init_model

# Arch registry with the reference's naming
# (reference: fba_net/utils/model_utils.py:65-82 maps "BaseModel" -> FBANetModel).
ARCHS = {"BaseModel": create_model}

__all__ = ["FBANet", "create_model", "init_model", "ARCHS"]
