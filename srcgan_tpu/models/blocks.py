"""Shared building blocks for the SR model zoo.

TPU-native re-creations of the blocks in /root/reference/src/model/rddb.py
(ResidualDenseBlock_5, RRDB, the deconv-spec helper) — NHWC tensors, HWIO
weights, explicit parameter pytrees.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Tuple

import jax
import jax.numpy as jnp

from srcgan_tpu import nn, ops

# RDB5 forward schedule: "paired" (default) > "grouped" > "naive".  All three
# are exact (same params, float-add reassociation only); measured on v5e bf16
# x4 RDDBNet forward: naive 93 MP/s, grouped 124, paired 128.  Scope-switch
# with the rdb5_schedule() context (like config.matmul_precision); the module
# default below applies outside any context.
DEFAULT_RDB5_SCHEDULE = "paired"
_SCHEDULES = ("naive", "grouped", "paired")
_SCHED_TL = threading.local()


@contextlib.contextmanager
def rdb5_schedule(name: str):
    """Scoped override of the RDB5 forward schedule for traces in this thread."""
    if name not in _SCHEDULES:
        raise ValueError(f"unknown RDB5 schedule {name!r}; one of {_SCHEDULES}")
    prev = getattr(_SCHED_TL, "value", None)
    _SCHED_TL.value = name
    try:
        yield
    finally:
        _SCHED_TL.value = prev


def current_rdb5_schedule() -> str:
    return getattr(_SCHED_TL, "value", None) or DEFAULT_RDB5_SCHEDULE


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
        from srcgan_tpu import quant

        if lemda == 0.2:  # the fused kernel hardcodes the default lemda
            y = quant.rdb5_dispatch(self, p, x, train)
            if y is not None:  # int8 serving: whole block fused in one kernel
                return y
        sched = current_rdb5_schedule()
        if sched == "paired":
            return self._forward_paired(p, x, lemda)
        if sched == "grouped":
            return self._forward_grouped(p, x, lemda)
        return self._forward_naive(p, x, lemda)

    def forward_with_sources(self, p, x, lemda: float = 0.2):
        """Naive forward that also returns the stage-5 concat [x, x1..x4] —
        the tensor whose per-channel absmax calibrates the fused int8 kernel
        (srcgan_tpu.quant.rdb5_dispatch)."""
        c = self.convs.layers
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        x1 = lrelu(c["conv1"].fwd(p["conv1"], x))
        x2 = lrelu(c["conv2"].fwd(p["conv2"], jnp.concatenate([x, x1], -1)))
        x3 = lrelu(c["conv3"].fwd(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(c["conv4"].fwd(p["conv4"],
                                  jnp.concatenate([x, x1, x2, x3], -1)))
        cat = jnp.concatenate([x, x1, x2, x3, x4], -1)
        x5 = c["conv5"].fwd(p["conv5"], cat)
        return x5 * lemda + x, cat

    def _forward_paired(self, p, x, lemda: float = 0.2):
        """Pair-grouped form — exact; keeps conv input widths >= 2*gc.

        Profiling on v5e shows Cin=gc(32) convs reach only ~34 TFLOPS while
        Cin=64 convs reach 80-150+ (the MXU contraction dim K = 9*Cin is too
        shallow at 32).  This schedule defers each source's contributions to
        later stages until a PAIR of sources exists, so the bulk of the FLOPs
        run as Cin=2*gc convs:
          x(nf)     -> [conv1 | s2..s5 parts]      nf  -> nf+4*gc
          x1        -> s2 part                     gc  -> gc       (4% FLOPs)
          [x1,x2]   -> s3..s5 parts                2gc -> 2gc+nf
          x3        -> s4 part                     gc  -> gc       (4% FLOPs)
          [x3,x4]   -> s5 parts                    2gc -> nf
        Same parameters, float-add reassociation only.
        """
        nf, gc = self.nf, self.gc
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        W = [p[f"conv{i + 1}"]["w"] for i in range(5)]
        b = [p[f"conv{i + 1}"].get("b") for i in range(5)]
        badd = lambda v, bi: v if bi is None else v + bi

        def wslice(i: int, s: int):
            lo, hi = (0, nf) if s == 0 else (nf + (s - 1) * gc, nf + s * gc)
            return W[i][:, :, lo:hi, :]

        def wpair(i: int, s: int):
            """conv_i weights for sources s and s+1 stacked on input ch."""
            return jnp.concatenate([wslice(i, s), wslice(i, s + 1)], axis=2)

        # x -> conv1 + its parts of conv2..5 (nf -> gc*4 + nf)
        u_x = jnp.concatenate([W[0]] + [wslice(i, 0) for i in range(1, 5)], -1)
        px = ops.conv2d(x, u_x, None, 1, 1)
        p1, p2, p3, p4, p5 = (px[..., :gc], px[..., gc:2 * gc],
                              px[..., 2 * gc:3 * gc], px[..., 3 * gc:4 * gc],
                              px[..., 4 * gc:])
        x1 = lrelu(badd(p1, b[0]))
        q2 = ops.conv2d(x1, wslice(1, 1), None, 1, 1)          # gc -> gc
        x2 = lrelu(badd(p2 + q2, b[1]))
        x12 = jnp.concatenate([x1, x2], -1)
        # [x1,x2] -> their parts of conv3..5 (2gc -> gc+gc+nf)
        u12 = jnp.concatenate([wpair(2, 1), wpair(3, 1), wpair(4, 1)], -1)
        r = ops.conv2d(x12, u12, None, 1, 1)
        x3 = lrelu(badd(p3 + r[..., :gc], b[2]))
        s4c = ops.conv2d(x3, wslice(3, 3), None, 1, 1)         # gc -> gc
        x4 = lrelu(badd(p4 + r[..., gc:2 * gc] + s4c, b[3]))
        x34 = jnp.concatenate([x3, x4], -1)
        t = ops.conv2d(x34, wpair(4, 3), None, 1, 1)           # 2gc -> nf
        x5 = badd(p5 + r[..., 2 * gc:] + t, b[4])
        return x5 * lemda + x

    def _forward_naive(self, p, x, lemda: float = 0.2):
        """Literal concat-chain form (rddb.py:62-68)."""
        c = self.convs.layers
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        x1 = lrelu(c["conv1"].fwd(p["conv1"], x))
        x2 = lrelu(c["conv2"].fwd(p["conv2"], jnp.concatenate([x, x1], -1)))
        x3 = lrelu(c["conv3"].fwd(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(c["conv4"].fwd(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = c["conv5"].fwd(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * lemda + x

    def _forward_grouped(self, p, x, lemda: float = 0.2):
        """Source-grouped form — exact same function, MXU-shaped for TPU.

        conv_i(concat(x, x1..x_{i-1})) decomposes over input slices, so the
        chain regroups by SOURCE: one conv per source tensor computing its
        contributions to ALL later stages at once.  Output-channel widths
        become (192, 160, 128, 96, 64) instead of five width-32 convs — the
        MXU's 128-lane systolic array goes from ~25% to ~75% occupancy, which
        is where the RDB5 trunk (the framework's dominant FLOPs, SURVEY.md
        §3.4) wins ~2x.  Only float-add reassociation differs from the naive
        form; parameters are bit-identical and checkpoint-compatible.
        """
        nf, gc = self.nf, self.gc
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        W = [p[f"conv{i + 1}"]["w"] for i in range(5)]
        b = [p[f"conv{i + 1}"].get("b") for i in range(5)]
        badd = lambda v, bi: v if bi is None else v + bi

        def wslice(i: int, s: int):
            """conv_i's weight slice for source s (0=x, k=x_k)."""
            lo, hi = (0, nf) if s == 0 else (nf + (s - 1) * gc, nf + s * gc)
            return W[i][:, :, lo:hi, :]

        def grouped(s: int, first_stage: int):
            """Source-s contributions to stages first_stage..5, concat out-ch."""
            return jnp.concatenate(
                [wslice(i, s) for i in range(first_stage, 5)], axis=-1)

        # contributions FROM x: conv1 whole + x-slices of conv2..5 -> 192ch
        u_x = jnp.concatenate([W[0]] + [wslice(i, 0) for i in range(1, 5)],
                              axis=-1)
        px = ops.conv2d(x, u_x, None, 1, 1)
        p1, p2, p3, p4, p5 = (px[..., :gc], px[..., gc:2 * gc],
                              px[..., 2 * gc:3 * gc], px[..., 3 * gc:4 * gc],
                              px[..., 4 * gc:])
        x1 = lrelu(badd(p1, b[0]))
        q = ops.conv2d(x1, grouped(1, 1), None, 1, 1)  # 32->160
        x2 = lrelu(badd(p2 + q[..., :gc], b[1]))
        r = ops.conv2d(x2, grouped(2, 2), None, 1, 1)  # 32->128
        x3 = lrelu(badd(p3 + q[..., gc:2 * gc] + r[..., :gc], b[2]))
        s_ = ops.conv2d(x3, grouped(3, 3), None, 1, 1)  # 32->96
        x4 = lrelu(badd(p4 + q[..., 2 * gc:3 * gc] + r[..., gc:2 * gc]
                        + s_[..., :gc], b[3]))
        t = ops.conv2d(x4, wslice(4, 4), None, 1, 1)  # 32->64
        x5 = badd(p5 + q[..., 3 * gc:] + r[..., 2 * gc:] + s_[..., gc:] + t,
                  b[4])
        return x5 * lemda + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (rddb.py:71-82): 3x RDB5, out*0.2 + x.

    ``remat`` is INSTANCE-scoped: when True this block's forward is wrapped
    in jax.checkpoint — under grad its internal activations are recomputed
    during the backward instead of stored (~15% extra trunk FLOPs, ~15x less
    gradient memory per RRDB).  The GAN trainers enable it on THEIR generator
    instances via set_trunk_remat (six generator passes per step otherwise
    exhaust HBM); other models in the same process are unaffected.
    """

    def __init__(self, nf: int, gc: int = 32, remat: bool = False):
        self.remat = remat
        self.blocks = nn.named({f"RDB{i + 1}": ResidualDenseBlock5(nf, gc)
                                for i in range(3)})

    def init(self, key):
        return self.blocks.init(key)

    def forward(self, p, x, train, lemda: float = 0.2):
        def run(p, x):
            out = x
            for name, blk in self.blocks.layers.items():
                out = blk.forward(p[name], out, train)
            return out * lemda + x

        from srcgan_tpu import quant

        # jax.checkpoint TRACES its body even under disable_jit, which would
        # hand the int8 calibration recorders tracers — remat is value-
        # neutral, so skip it during a calibration pass.
        if self.remat and not quant.is_calibrating():
            return jax.checkpoint(run)(p, x)
        return run(p, x)


def rrdb_trunk(nf: int, nb: int, gc: int = 32,
               remat: bool = False) -> nn.Sequential:
    """Sequential repeat of RRDB blocks (rddb.py:41-45 make_layer)."""
    return nn.Sequential(*[RRDB(nf, gc, remat=remat) for _ in range(nb)])


def set_trunk_remat(module: nn.Module, flag: bool) -> int:
    """Set per-RRDB rematerialization on every RRDB inside ``module``.

    Instance-scoped replacement for the old module-global REMAT_RRDB switch:
    two trainers with different remat settings now coexist in one process.
    Returns the number of RRDB instances updated.
    """
    n = 0
    for m in nn.iter_modules(module):
        if isinstance(m, RRDB):
            m.remat = flag
            n += 1
    return n
