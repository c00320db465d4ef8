from avmoe_tpu.train.freeze import merge_params, partition_params, trainable_mask
from avmoe_tpu.train.state import AVMoETrainState, create_train_state
from avmoe_tpu.train.steps import make_eval_step, make_train_step

__all__ = [
    "merge_params",
    "partition_params",
    "trainable_mask",
    "AVMoETrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
]
