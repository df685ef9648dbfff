"""RDDBNet — the headline ESRGAN-style generator (reference rddb.py:85-114)."""
from __future__ import annotations

import math

from srcgan_tpu import nn
from srcgan_tpu.models.blocks import deconv, rrdb_trunk


class RDDBNet(nn.Module):
    """conv_first -> nb x RRDB -> trunk_conv (+global residual) ->
    log2(r) x [deconv x2 + LeakyReLU(0.2)] -> conv_last (no bias).

    Matches /root/reference/src/model/rddb.py:85-114 including the r=1 skip of
    the upscale tail (:111-112) and kaiming fan_out/relu conv init (:100-105).
    """

    def __init__(self, in_ch: int, ou_ch: int, upscale_factor: int,
                 nf: int = 64, nb: int = 3, gc: int = 32):
        self.upscale_factor = upscale_factor
        n_up = int(math.log2(upscale_factor)) if upscale_factor > 1 else 0
        self.mods = nn.named({
            "conv_first": nn.Conv2d(in_ch, nf, 3, 1, 1, bias=True),
            "trunk": rrdb_trunk(nf, nb, gc),
            "trunk_conv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "upscale": nn.Sequential(*sum(
                [[deconv(nf, nf, 2), nn.LeakyReLU(0.2)] for _ in range(n_up)], [])),
            "conv_last": nn.Conv2d(nf, ou_ch, 3, 1, 1, bias=False),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        fea = m["conv_first"].fwd(p["conv_first"], x)
        trunk = m["trunk_conv"].fwd(p["trunk_conv"],
                                    m["trunk"].fwd(p["trunk"], fea, train))
        fea = fea + trunk
        if self.upscale_factor != 1:
            fea = m["upscale"].fwd(p["upscale"], fea, train)
        return m["conv_last"].fwd(p["conv_last"], fea)
