"""Utilities: logging, visualization, image IO."""
from srcgan_tpu.utils.logging import Logger, StepTimer, profile_trace
from srcgan_tpu.utils import vis

__all__ = ["Logger", "StepTimer", "profile_trace", "vis"]
