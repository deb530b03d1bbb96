from fbanet_tpu.data.realbsr import RealBSRDataset
from fbanet_tpu.data.loader import BurstLoader

__all__ = ["RealBSRDataset", "BurstLoader"]
