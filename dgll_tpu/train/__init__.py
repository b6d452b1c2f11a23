from dgll_tpu.train.checkpoint import CheckpointManager
from dgll_tpu.train.metrics import (
    METRIC_FOR_DATASET,
    accuracy,
    macro_f1,
    masked_bce_loss,
    masked_nll_loss,
    metric_for_dataset,
    micro_f1,
    roc_auc,
)
from dgll_tpu.train.device_pipeline import (
    DeviceDPEpochRunner,
    DeviceEpochRunner,
    make_device_dp_epoch_fn,
    make_device_epoch_fn,
)
from dgll_tpu.train.pipeline import MQTrainer, PipelinedTrainer
from dgll_tpu.train.trainer import (
    FullBatchTrainer,
    MiniBatchTrainer,
    TrainState,
    blocks_from_packed,
    create_train_state,
    make_block_eval,
    make_block_step,
    make_packed_block_step,
    make_full_batch_eval,
    make_full_batch_step,
)

__all__ = [
    "PipelinedTrainer",
    "MQTrainer",
    "CheckpointManager",
    "accuracy",
    "micro_f1",
    "macro_f1",
    "roc_auc",
    "masked_nll_loss",
    "masked_bce_loss",
    "METRIC_FOR_DATASET",
    "metric_for_dataset",
    "FullBatchTrainer",
    "MiniBatchTrainer",
    "TrainState",
    "create_train_state",
    "make_full_batch_step",
    "make_full_batch_eval",
    "make_block_step",
    "make_block_eval",
    "blocks_from_packed",
    "make_packed_block_step",
    "DeviceEpochRunner",
    "DeviceDPEpochRunner",
    "make_device_epoch_fn",
    "make_device_dp_epoch_fn",
]
