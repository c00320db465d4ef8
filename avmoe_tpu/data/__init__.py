from avmoe_tpu.data.loader import BatchLoader
from avmoe_tpu.data.ave import AVEDataset, SyntheticAVEDataset

__all__ = ["BatchLoader", "AVEDataset", "SyntheticAVEDataset"]
