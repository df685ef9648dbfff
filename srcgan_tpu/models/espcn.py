"""ESPCN — sub-pixel convolution SR (reference espcn.py:9-51)."""
from __future__ import annotations

import jax

from srcgan_tpu import nn


class ESPCN(nn.Module):
    """conv5(relu) -> conv3(relu) -> conv3(relu) -> conv3 to base*r^2 ->
    PixelShuffle(r) -> conv3 out.  Kernels (64, 64, 32); kaiming init
    (espcn.py:24, :39-44)."""

    def __init__(self, in_ch: int = 3, ou_ch: int = 3, upscale_factor: int = 2,
                 base_kernel: int = 64):
        k = [int(x * base_kernel) for x in (1, 1, 0.5)]
        self.mods = nn.named({
            "conv1": nn.Conv2d(in_ch, k[0], 5, 1, 2),
            "conv2": nn.Conv2d(k[0], k[1], 3, 1, 1),
            "conv3": nn.Conv2d(k[1], k[2], 3, 1, 1),
            "conv4": nn.Conv2d(k[2], base_kernel * upscale_factor ** 2, 3, 1, 1),
            "conv5": nn.Conv2d(base_kernel, ou_ch, 3, 1, 1),
        })
        self.r = upscale_factor

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        from srcgan_tpu import ops
        m = self.mods.layers
        relu = jax.nn.relu
        x = relu(m["conv1"].fwd(p["conv1"], x))
        x = relu(m["conv2"].fwd(p["conv2"], x))
        x = relu(m["conv3"].fwd(p["conv3"], x))
        x = ops.pixel_shuffle(m["conv4"].fwd(p["conv4"], x), self.r)
        return m["conv5"].fwd(p["conv5"], x)


class SRCNN(nn.Module):
    """9-1-5 conv stack, resolution-preserving (reference srcnn.py:9-37 — the
    internal upsample is commented out at :33, so this is used by the *Const*
    pipelines).  Uses torch-default init (the reference does not re-init)."""

    def __init__(self, in_ch: int = 3, ou_ch: int = 3, upscale_factor: int = 2,
                 base_kernel: int = 64):
        k = [int(x * base_kernel) for x in (1, 0.5)]
        self.up = upscale_factor
        self.mods = nn.named({
            "conv1": nn.Conv2d(in_ch, k[0], 9, 1, 4, weight_init="torch"),
            "conv2": nn.Conv2d(k[0], k[1], 1, 1, 0, weight_init="torch"),
            "conv3": nn.Conv2d(k[1], ou_ch, 5, 1, 2, weight_init="torch"),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        relu = jax.nn.relu
        x = relu(m["conv1"].fwd(p["conv1"], x))
        x = relu(m["conv2"].fwd(p["conv2"], x))
        return relu(m["conv3"].fwd(p["conv3"], x))
