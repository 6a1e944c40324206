"""Experiment framework: args, config, logging, checkpoints, meters, metrics.

TPU-native rebuild of the reference's L6 layer (SURVEY.md §2.2).
"""
from .arguments import Args, BaseArgs, get_timestamp
from .checkpoint import CheckpointManager, load_state, save_state
from .environment import (enable_persistent_jit_cache,
                          scale_learning_rate, ulimit_n_max)
from .logging import TqdmHandler, set_logging_basic_config
from .meters import AverageMeter, MeterGroup, MetricSpool
from .metrics import accuracy, binary_accuracy, masked_accuracy
from .reproduction import initialize_seed
from .bootstrap import bootstrap

__all__ = [
    "Args", "BaseArgs", "get_timestamp",
    "CheckpointManager", "load_state", "save_state",
    "scale_learning_rate", "ulimit_n_max", "enable_persistent_jit_cache",
    "TqdmHandler", "set_logging_basic_config",
    "AverageMeter", "MeterGroup", "MetricSpool",
    "accuracy", "binary_accuracy", "masked_accuracy",
    "initialize_seed",
    "bootstrap",
]
