from avmoe_tpu.backbones.geometry import BlockSpec, swin_stage_specs
from avmoe_tpu.backbones.htsat import HTSATEncoder
from avmoe_tpu.backbones.swin_v2 import SwinV2Encoder

__all__ = ["BlockSpec", "swin_stage_specs", "HTSATEncoder", "SwinV2Encoder"]
