from avmoe_tpu.losses.classification import (
    binary_cross_entropy_with_logits,
    cross_entropy_with_logits,
    label_smoothed_bce,
)
from avmoe_tpu.losses.ave import ave_labels, ave_loss
from avmoe_tpu.losses.yb import yb_loss, yb_loss2

__all__ = [
    "binary_cross_entropy_with_logits",
    "cross_entropy_with_logits",
    "label_smoothed_bce",
    "ave_labels",
    "ave_loss",
    "yb_loss",
    "yb_loss2",
]
