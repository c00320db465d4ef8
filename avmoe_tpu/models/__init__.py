from avmoe_tpu.models.ave import AVEModel

__all__ = ["AVEModel"]
