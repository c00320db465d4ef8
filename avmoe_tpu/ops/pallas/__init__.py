from avmoe_tpu.ops.pallas.window_attn import fused_window_attention

__all__ = ["fused_window_attention"]
