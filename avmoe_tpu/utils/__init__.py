from avmoe_tpu.utils.runtime import (
    apply_platform_override,
    count_params,
    dropout_det,
    enable_compilation_cache,
    pipelined,
)

__all__ = ["apply_platform_override", "enable_compilation_cache",
           "count_params", "dropout_det", "pipelined"]
