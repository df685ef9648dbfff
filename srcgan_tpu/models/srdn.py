"""SRDN — resolution-preserving RRDB encoder/decoder (reference srdn.py:53-78)."""
from __future__ import annotations

from srcgan_tpu import nn
from srcgan_tpu.models.blocks import rrdb_trunk


class SRDN(nn.Module):
    """conv_first -> RRDB encoder (+res) -> RRDB decoder (+res) -> conv_last.

    Matches /root/reference/src/model/srdn.py:53-78.  Note: the reference
    constructs a ``trunk_conv`` whose forward never uses it (srdn.py:60 vs
    :71-78); we replicate the observable behavior and still allocate the
    parameter for checkpoint-shape compatibility.
    """

    def __init__(self, in_ch: int, ou_ch: int, upscale_factor: int = 1,
                 nf: int = 64, nb: int = 3, gc: int = 32):
        self.upscale_factor = upscale_factor  # unused; net is size-preserving
        self.mods = nn.named({
            "conv_first": nn.Conv2d(in_ch, nf, 3, 1, 1, bias=True),
            "encoder": rrdb_trunk(nf, nb, gc),
            "trunk_conv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),  # dead, as in ref
            "decoder": rrdb_trunk(nf, nb, gc),
            "conv_last": nn.Conv2d(nf, ou_ch, 3, 1, 1, bias=False),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        fea = m["conv_first"].fwd(p["conv_first"], x)
        enc = m["encoder"].fwd(p["encoder"], fea, train)
        fea = fea + enc
        dec = m["decoder"].fwd(p["decoder"], fea, train)
        fea = fea + dec
        return m["conv_last"].fwd(p["conv_last"], fea)
