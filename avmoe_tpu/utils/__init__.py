from avmoe_tpu.utils.runtime import enable_compilation_cache, count_params

__all__ = ["enable_compilation_cache", "count_params"]
