from phantom_vlb_tpu.train.checkpoint import CheckpointManager, export_adapters, load_adapters
from phantom_vlb_tpu.train.loop import TrainLoopConfig, VLBTrainer
from phantom_vlb_tpu.train.metrics import CSVMetricsLogger, pearson_compute, pearson_init, pearson_update
from phantom_vlb_tpu.train.optim import OptimConfig, make_optimizer, trainable_labels
from phantom_vlb_tpu.train.step import TrainState, init_train_state, make_eval_step, make_train_step

__all__ = [
    "CheckpointManager", "export_adapters", "load_adapters",
    "TrainLoopConfig", "VLBTrainer",
    "CSVMetricsLogger", "pearson_compute", "pearson_init", "pearson_update",
    "OptimConfig", "make_optimizer", "trainable_labels",
    "TrainState", "init_train_state", "make_eval_step", "make_train_step",
]
