"""Pallas-fused int8 ResidualDenseBlock_5 (serving path, forward-only).

The XLA int8 conv path (srcgan_tpu.quant) is accuracy-validated but SLOWER
than bf16 (docs/PERF.md "int8 serving path"): int32 conv outputs double the
HBM write traffic and the quantize/dequantize elementwise passes round-trip
fp32 activations through HBM between every conv.  This kernel runs a whole
RDB5 (reference rddb.py:48-68: 5 dense-chain convs + LeakyReLU + residual)
per pallas_call, keeping every intermediate in VMEM:

  grid = (image, H/TR row tile).  Per-image tiles make the block's +-5-row
  halo cheap (TR=32 -> 25% recompute); round 1's merged (H, W*N) layout
  needed 1024-wide rows and died on the halo pyramid (docs/PERF.md).

  Schedule: grouped-by-source (models/blocks.py _forward_grouped — exact
  reassociation of the dense chain): each source tensor (x, x1..x4) does ONE
  matmul producing its contributions to all later stages, so N stays in
  {64..192} instead of the chain's natural 32.  Contraction uses a full
  9-tap im2col built in VMEM (K = 9*Cin in {576, 288}), where the MXU's
  int8 path measured ~150+ TOP/s (scripts/pallas_matmul_probe.py) vs
  ~110 through lax.conv_general_dilated.

  Quantization math matches srcgan_tpu.quant exactly: symmetric int8,
  per-input-channel activation scales folded into the weights, per-output-
  channel weight scales, int32 accumulation (tap matmuls sum exactly like
  the conv — integer addition is associative), f32 dequant + bias.  The one
  reassociation vs the per-conv path: each stage's pre-activation is a sum
  of per-source f32 dequants instead of one int32 sum; f32 additions of
  int32-exact terms keep this within fp rounding of the per-conv result.

Forward-only: no VJP.  Training and the fp32/bf16 eval paths never touch
this module.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5  # rows of context a 5-conv chain needs on each side


def _source_slices(nf: int, gc: int):
    """Input-channel range of each source in the dense concat (x, x1..x4)."""
    out = [(0, nf)]
    for k in range(1, 5):
        out.append((nf + (k - 1) * gc, nf + k * gc))
    return out


def prep_int8(params, absmax, nf: int = 64, gc: int = 32):
    """Quantize RDB5 weights for the kernel (traced; tiny elementwise ops).

    params: {"conv1".."conv5": {"w": HWIO, "b": (width,)}} — reference
    registration order (rddb.py:50-56).  absmax: (nf+4*gc,) calibrated
    per-channel absolute maxima of the stage-5 concat input [x, x1..x4]
    (== every source's activation range).

    Returns (wq[5 per-source int8 (9*Cs, Ns)], sv (5,192) f32 dequant rows,
    rq (5,64) f32 reciprocal act scales, bias (5,64) f32), all zero-padded
    to fixed widths so the kernel takes a fixed arg list.
    """
    widths = [gc, gc, gc, gc, nf]
    slices = _source_slices(nf, gc)
    s_x = jnp.maximum(jnp.asarray(absmax, jnp.float32), 1e-8) / 127.0
    wq_stage, sw_stage, bias = [], [], []
    for i in range(5):
        cin = nf + i * gc
        w = params[f"conv{i + 1}"]["w"].astype(jnp.float32)
        w_eff = w * s_x[:cin].reshape(1, 1, -1, 1)
        s_w = jnp.max(jnp.abs(w_eff), axis=(0, 1, 2), keepdims=True) / 127.0
        s_w = jnp.maximum(s_w, 1e-30)
        wq_stage.append(jnp.clip(jnp.round(w_eff / s_w), -127, 127
                                 ).astype(jnp.int8))
        sw_stage.append(s_w.reshape(-1))
        b = params[f"conv{i + 1}"].get("b")
        b = jnp.zeros((widths[i],), jnp.float32) if b is None else b
        bias.append(jnp.pad(b.astype(jnp.float32), (0, nf - widths[i])))
    wq_src, sv_src, rq_src = [], [], []
    n_tot = sum(widths)
    for s in range(5):
        lo, hi = slices[s]
        cs = hi - lo
        # (3,3,Cs, N_s): this source's columns in stages s..4
        w_s = jnp.concatenate([wq_stage[i][:, :, lo:hi, :] for i in range(s, 5)],
                              axis=-1)
        wq_src.append(w_s.reshape(9 * cs, w_s.shape[-1]))
        sv = jnp.concatenate([sw_stage[i] for i in range(s, 5)])
        sv_src.append(jnp.pad(sv, (0, n_tot - sv.shape[0])))
        rq = 1.0 / s_x[lo:hi]
        rq_src.append(jnp.pad(rq, (0, nf - cs)))
    return (wq_src, jnp.stack(sv_src), jnp.stack(rq_src), jnp.stack(bias))


def _kernel(xp_ref, w0, w1, w2, w3, w4, sv_ref, rq_ref, b_ref, out_ref,
            src_ref, *, tr: int, w: int, h_img: int,
            nf: int, gc: int, alpha: float, lemda: float):
    j = pl.program_id(1)
    R, W2 = tr + 2 * HALO, w + 2
    widths = [gc, gc, gc, gc, nf]
    wq = [w0, w1, w2, w3, w4]

    # The input block is an XLA-materialized overlapping tile (halo included,
    # W zero-padded): manual DMA from an HBM-resident (…, W, 64) ref dies in
    # Mosaic's memref_slice lowering (the 64-lane minor dim is tile-padded),
    # so overlap is materialized outside and the kernel uses plain blocked
    # BlockSpecs like the tail kernel.
    mf, m0 = R * W2, (R - 2) * W2
    x_flat = xp_ref[:].astype(jnp.float32).reshape(mf, nf)
    # Stage intermediates must read as ZERO outside the image (conv zero
    # padding) — not as bias+lrelu of zero context.  Mask (a) the wrap-
    # garbage pad columns of the flat-shift trick, (b) halo rows that lie
    # outside the image (the out-grid row r sits at xp row j*tr + r + 1;
    # image rows are xp rows [HALO, HALO + h_img)).
    idx = jax.lax.broadcasted_iota(jnp.int32, (m0, 1), 0)
    col = idx % W2
    g = j * tr + idx // W2 + 1
    mask = ((col != 0) & (col != W2 - 1)
            & (g >= HALO) & (g < HALO + h_img))

    def quantize(v, s):  # f32 (mf, Cs) -> int8, with source s's scales
        cs = v.shape[-1]
        q = jnp.round(v * rq_ref[s, :cs].astype(jnp.float32))
        return jnp.clip(q, -127, 127).astype(jnp.int8)

    def im2col(q):  # int8 (mf, Cs) -> (m0, 9*Cs); taps in (dy,dx,c) order
        # Output flat position m sits at xs row m//W2 + 1, col m%W2; tap
        # (dy,dx) reads flat m + dy*W2 + (dx-1).  Pad a zero row on each side
        # so every tap's slice stays in-bounds (the out-of-image entries it
        # covers belong to masked-out pad columns).  The shifted views are
        # realized with jnp.roll (slice + axis-0 concat): a plain strided
        # slice leaves each tap at a different sublane offset and Mosaic can
        # neither lane-concat mismatched layouts ("offset mismatch on
        # non-concat dimension") nor rotate int8 vregs (pltpu.roll: "Rotate
        # with non-32-bit data"); the axis-0 concat copy re-aligns each tap
        # to offset 0.  Wrapped entries land in rows >= len-off >= m0 and
        # are never read.
        zrow = jnp.zeros((W2, q.shape[1]), q.dtype)
        q = jnp.concatenate([zrow, q, zrow], axis=0)
        taps = []
        for dy in range(3):
            for dx in range(3):
                off = (dy + 1) * W2 + dx - 1
                taps.append(jnp.roll(q, -off, axis=0)[:m0])
        return jnp.concatenate(taps, axis=1)

    pre = [None] * 5
    src_q = quantize(x_flat, 0)
    for s in range(5):
        ic = im2col(src_q)
        n_s = sum(widths[s:])
        # chunk the int32 dot transient (the full (m0, 192) int32 is ~4 MB)
        parts = []
        for c0 in range(0, n_s, 128):
            c1 = min(c0 + 128, n_s)
            acc = jax.lax.dot_general(
                ic, wq[s][:, c0:c1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            sv = sv_ref[s, c0:c1].astype(jnp.float32)
            parts.append(acc.astype(jnp.float32) * sv)
        contrib = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        o = 0
        for i in range(s, 5):
            c = contrib[:, o:o + widths[i]]
            pre[i] = c if pre[i] is None else pre[i] + c
            o += widths[i]
        if s < 4:
            # stage s is complete -> activation x_{s+1}, quantized in place.
            # The padded source goes through a VMEM scratch store/load pair:
            # the quantized value inherits the lane/sublane offsets of the
            # contrib slices it came from, and Mosaic cannot concat values
            # whose layouts mismatch — a ref round-trip re-canonicalizes.
            v = pre[s] + b_ref[s, :widths[s]]
            v = jnp.where(v >= 0, v, alpha * v)
            v = jnp.where(mask, v, 0.0)
            src_ref[0:W2] = jnp.zeros((W2, gc), jnp.int8)
            src_ref[W2:W2 + m0] = quantize(v, s + 1)
            src_ref[W2 + m0:mf] = jnp.zeros((W2, gc), jnp.int8)
            src_q = src_ref[:]

    x5 = pre[4] + b_ref[4, :nf]
    lo = (HALO - 1) * W2  # stage grid row 0 == xs row 1
    out = x5[lo:lo + tr * W2] * lemda + x_flat[HALO * W2:(HALO + tr) * W2]
    out = out.reshape(tr, W2, nf)[:, 1:w + 1, :]
    out_ref[:] = out.reshape(1, tr, w, nf).astype(out_ref.dtype)


def pick_tile_rows(h: int, w: int = 128):
    """Largest row tile whose VMEM working set fits: the per-tile buffers
    scale with tr*(w+2) flat rows (~12 MB at 4160, measured at TR=32/W=128)."""
    for tr in (32, 16, 8):
        if h % tr == 0 and tr * (w + 2) <= 4288:
            return tr
    return None


def supported(x_shape, nf: int, gc: int) -> bool:
    n, h, w, c = x_shape
    return (c == nf and nf == 64 and gc == 32 and w % 128 == 0 and w <= 512
            and pick_tile_rows(h, w) is not None and h >= 16)


def rdb5_int8_fused(x, params, absmax, lemda: float = 0.2, alpha: float = 0.2,
                    nf: int = 64, gc: int = 32, interpret: bool = False):
    """int8 RDB5 forward.  x: (N, H, W, nf) f32/bf16; params: the block's
    conv1..conv5 dict; absmax: (nf+4*gc,) calibrated activation maxima.
    Exact int32 conv accumulation; f32 cross-source partial sums."""
    n, h, w, c = x.shape
    assert c == nf, (x.shape, nf)
    tr = pick_tile_rows(h, w)
    R = tr + 2 * HALO
    t = h // tr
    wq, sv, rq, bias = prep_int8(params, absmax, nf, gc)
    # overlapping halo tiles, materialized by XLA (one fused pad+gather pass;
    # ~1.3x the input's HBM traffic — see _kernel docstring for why)
    xp = jnp.pad(x, ((0, 0), (HALO, HALO), (1, 1), (0, 0)))
    xt = jnp.stack([xp[:, i * tr: i * tr + R] for i in range(t)], axis=1)
    grid = (n, t)
    wspecs = [pl.BlockSpec(q.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM) for q in wq]
    vspec = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, tr=tr, w=w, h_img=h, nf=nf, gc=gc, alpha=alpha,
                lemda=lemda),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, R, w + 2, nf),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs
        + [vspec(sv), vspec(rq), vspec(bias)],
        out_specs=pl.BlockSpec((1, tr, w, nf), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, nf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R * (w + 2), gc), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, *wq, sv, rq, bias)


def rdb5_int8_xla(x, params, absmax, lemda: float = 0.2, alpha: float = 0.2,
                  nf: int = 64, gc: int = 32):
    """Reference XLA implementation of the kernel's EXACT semantics (same
    quantization, same int32 sums — integer addition is associative so conv
    == tap matmuls bitwise — same f32 dequant/partial-sum order).  Agreement
    with the kernel is within a few int8 LSBs at sparse positions, not
    bitwise: XLA fuses the f32 dequant chain differently per program (FMA),
    and a 1-ulp f32 difference occasionally flips a requantization round.
    Tests therefore bound the relative error, and separately bound the int8
    path against the fp32 block."""
    widths = [gc, gc, gc, gc, nf]
    slices = _source_slices(nf, gc)
    wq, sv, rq, bias = prep_int8(params, absmax, nf, gc)
    x32 = x.astype(jnp.float32)

    def quantize(v, s):
        cs = slices[s][1] - slices[s][0]
        q = jnp.round(v * rq[s, :cs].reshape(1, 1, 1, -1))
        return jnp.clip(q, -127, 127).astype(jnp.int8)

    pre = [None] * 5
    src_q = quantize(x32, 0)
    for s in range(5):
        cs = slices[s][1] - slices[s][0]
        n_s = sum(widths[s:])
        w_s = wq[s].reshape(3, 3, cs, n_s)
        acc = jax.lax.conv_general_dilated(
            src_q, w_s, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        contrib = acc.astype(jnp.float32) * sv[s, :n_s].reshape(1, 1, 1, -1)
        o = 0
        for i in range(s, 5):
            c = contrib[..., o:o + widths[i]]
            pre[i] = c if pre[i] is None else pre[i] + c
            o += widths[i]
        if s < 4:
            v = pre[s] + bias[s, :widths[s]]
            v = jnp.where(v >= 0, v, alpha * v)
            src_q = quantize(v, s + 1)

    x5 = pre[4] + bias[4, :nf]
    return (x5 * lemda + x32).astype(x.dtype)
