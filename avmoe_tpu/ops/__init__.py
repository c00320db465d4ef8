from avmoe_tpu.ops.swin import (
    DropPath,
    Mlp,
    PatchEmbed,
    PatchMergingV1,
    PatchMergingV2,
    SwinBlock,
    WindowAttentionV1,
    WindowAttentionV2,
    window_partition,
    window_reverse,
)

__all__ = [
    "DropPath",
    "Mlp",
    "PatchEmbed",
    "PatchMergingV1",
    "PatchMergingV2",
    "SwinBlock",
    "WindowAttentionV1",
    "WindowAttentionV2",
    "window_partition",
    "window_reverse",
]
