"""Trainers: cascaded SR->colorize (CasSRC) and CycleGAN; optim + state."""
from srcgan_tpu.train.cas import CasState, CasTrainer
from srcgan_tpu.train.cyclegan import CycleGANTrainer, CycleState, ImagePool
from srcgan_tpu.train.distill import DistillTrainer
from srcgan_tpu.train.multitask import MultiTaskTrainer
from srcgan_tpu.train import optim, state
from srcgan_tpu.train.state import (
    TrainState,
    checkpoint_name,
    load_params,
    parse_checkpoint_name,
    save_params,
)

__all__ = [
    "CasState", "CasTrainer", "CycleGANTrainer", "CycleState", "ImagePool",
    "DistillTrainer", "MultiTaskTrainer",
    "optim", "state", "TrainState", "checkpoint_name", "load_params",
    "parse_checkpoint_name", "save_params",
]
