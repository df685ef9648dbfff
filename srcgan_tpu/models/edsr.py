"""EDSR variant with GroupNorm ResnetBlocks and deconv tail (reference edsr.py)."""
from __future__ import annotations

import math

import jax

from srcgan_tpu import nn
from srcgan_tpu.models.blocks import deconv


class EDSRResnetBlock(nn.Module):
    """conv -> GN -> LeakyReLU(0.2) -> conv -> GN -> +residual.

    Quirk replicated from edsr.py:40-54: the torch module allocates a SINGLE
    GroupNorm (``self.gn``) and applies it after both convs — the two norm
    applications share one (scale, bias).  We keep one 'gn' parameter set.
    """

    def __init__(self, num_channel: int, kernel: int = 3, stride: int = 1,
                 padding: int = 1):
        self.mods = nn.named({
            "conv1": nn.Conv2d(num_channel, num_channel, kernel, stride, padding),
            "conv2": nn.Conv2d(num_channel, num_channel, kernel, stride, padding),
            "gn": nn.GroupNorm(32, num_channel),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        residual = x
        y = m["gn"].fwd(p["gn"], m["conv1"].fwd(p["conv1"], x))
        y = jax.nn.leaky_relu(y, 0.2)
        y = m["gn"].fwd(p["gn"], m["conv2"].fwd(p["conv2"], y))
        return y + residual


class EDSR(nn.Module):
    """input_conv -> 50 ResnetBlocks -> mid_conv (+global residual) ->
    deconv tail (NO interleaved activation, edsr.py:85-88) -> output_conv.
    Matches /root/reference/src/model/edsr.py:69-107."""

    def __init__(self, in_ch: int, ou_ch: int, upscale_factor: int = 2,
                 base_channel: int = 64, num_residuals: int = 50):
        n_up = int(math.log2(upscale_factor)) if upscale_factor > 1 else 0
        self.mods = nn.named({
            "input_conv": nn.Conv2d(in_ch, base_channel, 3, 1, 1),
            "residual_layers": nn.Sequential(
                *[EDSRResnetBlock(base_channel) for _ in range(num_residuals)]),
            "mid_conv": nn.Conv2d(base_channel, base_channel, 3, 1, 1),
            "upscale_layers": nn.Sequential(
                *[deconv(base_channel, base_channel, 2) for _ in range(n_up)]),
            "output_conv": nn.Conv2d(base_channel, ou_ch, 3, 1, 1),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        x = m["input_conv"].fwd(p["input_conv"], x)
        residual = x
        x = m["residual_layers"].fwd(p["residual_layers"], x, train)
        x = m["mid_conv"].fwd(p["mid_conv"], x)
        x = x + residual
        x = m["upscale_layers"].fwd(p["upscale_layers"], x, train)
        return m["output_conv"].fwd(p["output_conv"], x)
