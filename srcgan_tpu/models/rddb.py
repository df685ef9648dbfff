"""RDDBNet — the headline ESRGAN-style generator (reference rddb.py:85-114)."""
from __future__ import annotations

import contextlib
import math
import threading

import jax

from srcgan_tpu import nn
from srcgan_tpu.models.blocks import deconv, rrdb_trunk
from srcgan_tpu.ops import fused
from srcgan_tpu.ops.pallas import tail_kernel

# When True, the upsample tail (log2(r) x [k2s2 deconv + LeakyReLU] +
# conv_last) runs phase-folded at trunk resolution (ops.fused.
# phasefold_deconv_tail) — exact up to float-add reassociation, and
# differentiable.  Measured on v5e bf16 x4 (batch 8, 128^2): materialized
# tail 7.0 ms -> folded 2.8 ms of a 16.7 ms forward.
PHASEFOLD_TAIL = True
# r=8 folds the deconvs but materializes before conv_last: the fully-folded
# last conv would be a (3,3,64*nf,64*ou) conv — 16x the useful FLOPs.
MAX_FOLD_LAST_R = 4
# Eval-only Pallas kernel for the x4 bf16 tail on TPU (three chained VMEM
# matmuls per phase block; ops/pallas/tail_kernel.py).  Measured v5e, batch 8,
# 128^2 trunk: materialized 7.0 ms -> XLA fold 2.8 ms -> Pallas 0.85 ms.
# Training always uses the differentiable XLA fold.
PALLAS_TAIL = True

_TL = threading.local()


@contextlib.contextmanager
def no_pallas_tail():
    """Disable the eval-tail Pallas kernel for programs traced in this scope.

    Needed for GSPMD-sharded inference (SpatialShardedPredictor,
    parallel.make_spatial_infer): XLA cannot spatially partition the custom
    call, so those programs must trace the pure-XLA folded tail instead."""
    prev = getattr(_TL, "off", False)
    _TL.off = True
    try:
        yield
    finally:
        _TL.off = prev


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
        fea = self.head(p, x)
        return self.tail(p, fea, m["trunk"].fwd(p["trunk"], fea, train),
                         train)

    def head(self, p, x):
        """conv_first — the pre-trunk stem (split out so the trunk-pipeline
        parallel path, parallel/pipeline.py, shares the exact stem/tail
        code with forward)."""
        return self.mods.layers["conv_first"].fwd(p["conv_first"], x)

    def tail(self, p, fea, trunk_out, train=False):
        """trunk_conv + global residual + upscale tail (everything after
        the RRDB chain in forward)."""
        m = self.mods.layers
        fea = fea + m["trunk_conv"].fwd(p["trunk_conv"], trunk_out)
        if self.upscale_factor == 1:
            return m["conv_last"].fwd(p["conv_last"], fea)
        if PHASEFOLD_TAIL:
            n_up = int(math.log2(self.upscale_factor))
            dws = [p["upscale"][str(2 * i)]["w"] for i in range(n_up)]
            lw, lb = p["conv_last"]["w"], p["conv_last"].get("b")
            if (PALLAS_TAIL and not train and n_up == 2
                    and not getattr(_TL, "off", False)
                    and tail_kernel.supported(fea.shape, 4, fea.dtype)
                    and jax.default_backend() == "tpu"):
                return tail_kernel.tail_x4_fused(fea, dws[0], dws[1], lw, lb)
            return fused.phasefold_deconv_tail(
                fea, dws, lw, lb,
                alpha=0.2, fold_last=self.upscale_factor <= MAX_FOLD_LAST_R)
        fea = m["upscale"].fwd(p["upscale"], fea, train)
        return m["conv_last"].fwd(p["conv_last"], fea)
