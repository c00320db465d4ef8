from avmoe_tpu.metrics.ave import ave_accuracy

__all__ = ["ave_accuracy"]
