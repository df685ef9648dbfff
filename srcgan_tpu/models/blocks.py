"""Shared building blocks for the SR model zoo.

TPU-native re-creations of the blocks in /root/reference/src/model/rddb.py
(ResidualDenseBlock_5, RRDB, the deconv-spec helper) — NHWC tensors, HWIO
weights, explicit parameter pytrees.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from srcgan_tpu import nn


def get_deconv_params(upscale_factor: int) -> Tuple[int, int, int]:
    """(kernel, stride, output_padding) per upscale factor — the reference's
    exact triples (rddb.py:9-25): x2->(2,2,0), x4->(2,4,2), x8->(4,8,4).
    H_out = (H_in-1)*stride - 2*pad + k + opad = H_in * upscale_factor."""
    if upscale_factor == 2:
        k, s = 2, 2
    elif upscale_factor == 4:
        k, s = 2, 4
    elif upscale_factor == 8:
        k, s = 4, 8
    else:
        raise ValueError(f"unsupported upscale factor {upscale_factor}")
    return k, s, s - k


def deconv(in_ch: int, out_ch: int, upscale_factor: int = 2,
           weight_init="kaiming") -> nn.ConvTranspose2d:
    """Bias-free transposed conv with the reference deconv spec (rddb.py:28-38)."""
    k, s, opad = get_deconv_params(upscale_factor)
    return nn.ConvTranspose2d(in_ch, out_ch, k, s, padding=0, output_padding=opad,
                              bias=False, weight_init=weight_init)


class ResidualDenseBlock5(nn.Module):
    """5-conv dense block (rddb.py:48-68): conv_i sees concat(x, x1..x_{i-1});
    output = conv5(...) * 0.2 + x.  Channel growth 64->96->128->160->192."""

    def __init__(self, nf: int = 64, gc: int = 32, bias: bool = True):
        self.nf, self.gc = nf, gc
        self.convs = nn.named({
            f"conv{i + 1}": nn.Conv2d(nf + i * gc, gc if i < 4 else nf, 3, 1, 1,
                                      bias=bias)
            for i in range(5)
        })

    def init(self, key):
        return self.convs.init(key)

    def forward(self, p, x, train, lemda: float = 0.2):
        c = self.convs.layers
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        x1 = lrelu(c["conv1"].fwd(p["conv1"], x))
        x2 = lrelu(c["conv2"].fwd(p["conv2"], jnp.concatenate([x, x1], -1)))
        x3 = lrelu(c["conv3"].fwd(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(c["conv4"].fwd(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = c["conv5"].fwd(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * lemda + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (rddb.py:71-82): 3x RDB5, out*0.2 + x."""

    def __init__(self, nf: int, gc: int = 32):
        self.blocks = nn.named({f"RDB{i + 1}": ResidualDenseBlock5(nf, gc)
                                for i in range(3)})

    def init(self, key):
        return self.blocks.init(key)

    def forward(self, p, x, train, lemda: float = 0.2):
        out = x
        for name, blk in self.blocks.layers.items():
            out = blk.forward(p[name], out, train)
        return out * lemda + x


def rrdb_trunk(nf: int, nb: int, gc: int = 32) -> nn.Sequential:
    """Sequential repeat of RRDB blocks (rddb.py:41-45 make_layer)."""
    return nn.Sequential(*[RRDB(nf, gc) for _ in range(nb)])
