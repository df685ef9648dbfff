"""Core TPU-native ops with PyTorch-parity semantics."""
from srcgan_tpu.ops.conv import (
    conv2d,
    conv_transpose2d,
    depthwise_conv2d,
    pixel_shuffle,
    pixel_unshuffle,
)
from srcgan_tpu.ops.resize import interpolate, resize_bilinear, resize_nearest
from srcgan_tpu.ops.color import (
    lab_norm_to_rgb,
    lab_to_rgb,
    luma,
    rgb_to_ab_norm,
    rgb_to_gray,
    rgb_to_lab,
    rgb_to_lab_norm,
)
from srcgan_tpu.ops.norm import batch_norm, group_norm, instance_norm
from srcgan_tpu.ops import initializers

__all__ = [
    "conv2d", "conv_transpose2d", "depthwise_conv2d", "pixel_shuffle",
    "pixel_unshuffle", "interpolate", "resize_bilinear", "resize_nearest",
    "lab_norm_to_rgb", "lab_to_rgb", "luma", "rgb_to_ab_norm", "rgb_to_gray",
    "rgb_to_lab", "rgb_to_lab_norm", "batch_norm", "group_norm",
    "instance_norm", "initializers",
]
