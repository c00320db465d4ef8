from avmoe_tpu.heads.common import TransformerDecoder, TransformerEncoder
from avmoe_tpu.heads.ave import CMBSHead, TemporalAttention

__all__ = ["TransformerDecoder", "TransformerEncoder", "CMBSHead", "TemporalAttention"]
