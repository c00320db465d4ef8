from avmoe_tpu.moe.adapter import CrossModalExpert, GroupedDense, MoEAdapter, UnimodalExpert
from avmoe_tpu.moe.injection import LockstepEncoder

__all__ = [
    "CrossModalExpert",
    "GroupedDense",
    "MoEAdapter",
    "UnimodalExpert",
    "LockstepEncoder",
]
