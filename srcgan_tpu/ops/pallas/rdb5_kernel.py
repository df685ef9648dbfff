"""Pallas-fused ResidualDenseBlock_5 (eval/serving path, forward-only).

Runs a whole RDB5 (reference rddb.py:48-68: 5 dense-chain convs + LeakyReLU
+ residual) per pallas_call with every intermediate in VMEM, in two dtype
modes sharing one kernel body:

  bf16 — the general eval trunk.  The XLA bf16 path leaves ~half the time in
  unfused conv<->elementwise serialization (docs/PERF.md "Trunk revisit");
  here the px/partial-sum chains never touch HBM and the partial sums stay
  f32 (the XLA paired schedule stores them bf16).
  int8 — the quantized serving path (srcgan_tpu.quant): symmetric int8 with
  per-input-channel activation scales folded into the weights, per-output-
  channel weight scales, int32-exact tap matmuls, f32 dequant + bias.

Structure (both modes):
  - Grid (image,) with the WHOLE padded image as one tile when it fits the
    (generous, ~100 MB on v5e — 16 MB is only the default scoped limit) VMEM
    budget: zero halo recompute.  Otherwise grid (image, H/TR) row tiles
    with a +-5-row halo (12.5% recompute at TR=64).  Round 1's merged
    (H, W*N) layout needed 1024-wide rows and died on the halo pyramid.
  - Grouped-by-source schedule (an exact reassociation of the dense chain,
    cf. models/blocks.py _forward_grouped): each source tensor (x, x1..x4)
    does ONE matmul producing its contributions to all later stages, so the
    MXU's N stays in {64..192} instead of the chain's natural 32.
  - Contraction over a 9-tap im2col built in VMEM (K = 9*Cin in {576,288}),
    taps realized with jnp.roll — the only layout-legal shift: Mosaic can
    neither lane-concat offset-mismatched vregs nor rotate sub-32-bit data,
    and the roll's axis-0-concat lowering re-aligns each tap to offset 0.
  - Stage activations round-trip a VMEM scratch ref between stages: values
    sliced out of matmul results carry lane/sublane offsets that Mosaic
    cannot re-concat; a store/load pair canonicalizes the layout.

Forward-only: no VJP.  Training always uses the XLA schedules.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5          # rows of context a 5-conv chain needs per side (tiled mode)
# Per-tile budget in padded flat rows: Mosaic's stack allocator charges
# ~7 kB of scoped VMEM per flat row for this kernel (measured: 16.9k rows
# -> 122 MB), so 13k rows stays under the 100 MB limit.  128x128 images run
# as two 64-row tiles (12.5% halo recompute).
MAX_TILE_ROWS = 13000
VMEM_LIMIT = 100 * 1024 * 1024


def _source_slices(nf: int, gc: int):
    """Input-channel range of each source in the dense concat (x, x1..x4)."""
    out = [(0, nf)]
    for k in range(1, 5):
        out.append((nf + (k - 1) * gc, nf + k * gc))
    return out


def _stage_weights(params, nf: int, gc: int):
    widths = [gc, gc, gc, gc, nf]
    ws, bs = [], []
    for i in range(5):
        ws.append(params[f"conv{i + 1}"]["w"])
        b = params[f"conv{i + 1}"].get("b")
        b = jnp.zeros((widths[i],), jnp.float32) if b is None else b
        bs.append(jnp.pad(b.astype(jnp.float32), (0, nf - widths[i])))
    return ws, bs


def _pack_sources(w_stage, nf: int, gc: int):
    """Per-source (9*Cs, N_s) matmul weights from stage HWIO weights; rows in
    the im2col's (dy, dx, c) order, columns = stages s..4 concatenated."""
    slices = _source_slices(nf, gc)
    out = []
    for s in range(5):
        lo, hi = slices[s]
        w_s = jnp.concatenate([w_stage[i][:, :, lo:hi, :] for i in range(s, 5)],
                              axis=-1)
        out.append(w_s.reshape(9 * (hi - lo), w_s.shape[-1]))
    return out


def prep_int8(params, absmax, nf: int = 64, gc: int = 32):
    """Quantize RDB5 weights for the kernel (traced; tiny elementwise ops).

    absmax: (nf+4*gc,) calibrated per-channel absolute maxima of the stage-5
    concat input [x, x1..x4] (== every source's activation range).

    Returns (wq[5 per-source int8 (9*Cs, Ns)], sw (5,64) f32 per-stage
    dequant scales, rq (5,64) f32 reciprocal act scales, bias (5,64) f32),
    zero-padded to fixed widths so the kernel takes a fixed arg list.
    """
    widths = [gc, gc, gc, gc, nf]
    slices = _source_slices(nf, gc)
    s_x = jnp.maximum(jnp.asarray(absmax, jnp.float32), 1e-8) / 127.0
    w_stage, bias = _stage_weights(params, nf, gc)
    wq_stage, sw_stage = [], []
    for i in range(5):
        cin = nf + i * gc
        w_eff = w_stage[i].astype(jnp.float32) * s_x[:cin].reshape(1, 1, -1, 1)
        s_w = jnp.max(jnp.abs(w_eff), axis=(0, 1, 2), keepdims=True) / 127.0
        s_w = jnp.maximum(s_w, 1e-30)
        wq_stage.append(jnp.clip(jnp.round(w_eff / s_w), -127, 127
                                 ).astype(jnp.int8))
        sw_stage.append(s_w.reshape(-1))
    wq_src = _pack_sources(wq_stage, nf, gc)
    sw = jnp.stack([jnp.pad(sw_stage[i], (0, nf - widths[i]))
                    for i in range(5)])
    rq_src = []
    for s in range(5):
        lo, hi = slices[s]
        rq_src.append(jnp.pad(1.0 / s_x[lo:hi], (0, nf - (hi - lo))))
    return (wq_src, sw, jnp.stack(rq_src), jnp.stack(bias))


def prep_bf16(params, nf: int = 64, gc: int = 32):
    """bf16 per-source matmul weights + f32 biases (traced, tiny)."""
    w_stage, bias = _stage_weights(params, nf, gc)
    wsrc = _pack_sources([w.astype(jnp.bfloat16) for w in w_stage], nf, gc)
    return wsrc, jnp.stack(bias)


def _kernel(xt_ref, w0, w1, w2, w3, w4, sw_ref, rq_ref, b_ref, out_ref,
            src_ref, *, tr: int, halo: int, w: int, h_img: int, nf: int,
            gc: int, alpha: float, lemda: float, quant: bool):
    j = pl.program_id(1)
    R, W2 = tr + 2 * halo, w + 2
    widths = [gc, gc, gc, gc, nf]
    wq = [w0, w1, w2, w3, w4]
    cdt = jnp.int8 if quant else jnp.bfloat16        # matmul operand dtype
    adt = jnp.int32 if quant else jnp.float32        # matmul accumulator

    mf, m0 = R * W2, (R - 2) * W2
    x_flat = xt_ref[:].reshape(mf, nf)
    x_f32 = x_flat.astype(jnp.float32)
    # Stage intermediates must read as ZERO outside the image (conv zero
    # padding) — not as bias+lrelu of zero context.  Mask (a) the wrap-
    # garbage pad columns of the flat-shift trick, (b) halo rows outside the
    # image (out-grid row r sits at padded row j*tr + r + 1; image rows are
    # padded rows [halo, halo + h_img)).  (b) is vacuous in whole-image mode.
    idx = jax.lax.broadcasted_iota(jnp.int32, (m0, 1), 0)
    col = idx % W2
    g = j * tr + idx // W2 + 1
    mask = ((col != 0) & (col != W2 - 1)
            & (g >= halo) & (g < halo + h_img))

    def quantize(v, s):  # f32 (mf, Cs) -> int8, with source s's scales
        cs = v.shape[-1]
        q = jnp.round(v * rq_ref[s, :cs].astype(jnp.float32))
        return jnp.clip(q, -127, 127).astype(jnp.int8)

    def im2col(q):  # (mf, Cs) -> (m0, 9*Cs); taps in (dy,dx,c) order
        # Output flat position m sits at padded row m//W2 + 1, col m%W2; tap
        # (dy,dx) reads flat m + dy*W2 + (dx-1).  One zero row padded per
        # side keeps every tap's slice in-bounds (the out-of-range entries
        # belong to masked-out pad columns); jnp.roll (slice + axis-0
        # concat) is the only layout-legal shift — see module docstring.
        zrow = jnp.zeros((W2, q.shape[1]), q.dtype)
        q = jnp.concatenate([zrow, q, zrow], axis=0)
        taps = []
        for dy in range(3):
            for dx in range(3):
                off = (dy + 1) * W2 + dx - 1
                taps.append(jnp.roll(q, -off, axis=0)[:m0])
        return jnp.concatenate(taps, axis=1)

    pre = [None] * 5
    src_q = quantize(x_f32, 0) if quant else x_flat.astype(cdt)
    for s in range(5):
        ic = im2col(src_q)
        n_s = sum(widths[s:])
        # Cross-source accumulation stays in the matmul dtype (int32 in
        # quant mode — EXACT, matching the per-conv path's single int32
        # conv — f32 otherwise); ONE dequant per stage.  Chunk the dot so
        # the (m0, 192) accumulator transient stays bounded.
        parts = []
        for c0 in range(0, n_s, 128):
            c1 = min(c0 + 128, n_s)
            parts.append(jax.lax.dot_general(
                ic, wq[s][:, c0:c1], (((1,), (0,)), ((), ())),
                preferred_element_type=adt))
        contrib = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        o = 0
        for i in range(s, 5):
            c = contrib[:, o:o + widths[i]]
            pre[i] = c if pre[i] is None else pre[i] + c
            o += widths[i]
        if s < 4:
            # stage s is complete -> dequant + activation x_{s+1}.  The
            # padded source round-trips a VMEM scratch: store/load
            # canonicalizes the sliced values' offset layouts (docstring).
            v = (pre[s].astype(jnp.float32) * sw_ref[s, :widths[s]]
                 + b_ref[s, :widths[s]])
            v = jnp.where(v >= 0, v, alpha * v)
            v = jnp.where(mask, v, 0.0)
            src_ref[0:W2] = jnp.zeros((W2, gc), cdt)
            src_ref[W2:W2 + m0] = quantize(v, s + 1) if quant else v.astype(cdt)
            src_ref[W2 + m0:mf] = jnp.zeros((W2, gc), cdt)
            src_q = src_ref[:]

    x5 = pre[4].astype(jnp.float32) * sw_ref[4, :nf] + b_ref[4, :nf]
    lo = (halo - 1) * W2  # stage grid row 0 == padded row 1
    out = x5[lo:lo + tr * W2] * lemda + x_f32[halo * W2:(halo + tr) * W2]
    out = out.reshape(tr, W2, nf)[:, 1:w + 1, :]
    out_ref[:] = out.reshape(1, tr, w, nf).astype(out_ref.dtype)


def pick_tiling(h: int, w: int):
    """(tile_rows, halo): the whole image when the padded flat-row count
    fits the VMEM budget (no halo recompute), else 64/32/16/8-row tiles."""
    if (h + 2) * (w + 2) <= MAX_TILE_ROWS:
        return h, 1
    for tr in (64, 32, 16, 8):
        if h % tr == 0 and (tr + 2 * HALO) * (w + 2) <= MAX_TILE_ROWS:
            return tr, HALO
    return None, None


def supported(x_shape, nf: int, gc: int) -> bool:
    n, h, w, c = x_shape
    return (c == nf and nf == 64 and gc == 32 and w % 128 == 0 and w <= 512
            and h >= 8 and pick_tiling(h, w)[0] is not None)


def _call(x, wq, sw, rq, bias, nf, gc, alpha, lemda, quant, interpret):
    n, h, w, c = x.shape
    assert c == nf, (x.shape, nf)
    tr, halo = pick_tiling(h, w)
    t = h // tr
    # overlapping halo tiles, materialized by XLA (a single fused pad+gather
    # pass; identity except for the pad in whole-image mode, where t == 1)
    xp = jnp.pad(x, ((0, 0), (halo, halo), (1, 1), (0, 0)))
    xt = jnp.stack([xp[:, i * tr: i * tr + tr + 2 * halo] for i in range(t)],
                   axis=1)
    R = tr + 2 * halo
    wspecs = [pl.BlockSpec(q.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM) for q in wq]
    vspec = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    cdt = jnp.int8 if quant else jnp.bfloat16
    return pl.pallas_call(
        partial(_kernel, tr=tr, halo=halo, w=w, h_img=h, nf=nf, gc=gc,
                alpha=alpha, lemda=lemda, quant=quant),
        grid=(n, t),
        in_specs=[pl.BlockSpec((1, 1, R, w + 2, nf),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs
        + [vspec(sw), vspec(rq), vspec(bias)],
        out_specs=pl.BlockSpec((1, tr, w, nf), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, nf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R * (w + 2), gc), cdt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xt, *wq, sw, rq, bias)


def rdb5_int8_fused(x, params, absmax, lemda: float = 0.2, alpha: float = 0.2,
                    nf: int = 64, gc: int = 32, interpret: bool = False):
    """int8 RDB5 forward.  x: (N, H, W, nf) f32/bf16; params: the block's
    conv1..conv5 dict; absmax: (nf+4*gc,) calibrated activation maxima.
    Exact int32 conv accumulation; f32 cross-source partial sums."""
    wq, sw, rq, bias = prep_int8(params, absmax, nf, gc)
    return _call(x, wq, sw, rq, bias, nf, gc, alpha, lemda, True, interpret)


def rdb5_bf16_fused(x, params, lemda: float = 0.2, alpha: float = 0.2,
                    nf: int = 64, gc: int = 32, interpret: bool = False):
    """bf16 RDB5 forward (eval): bf16 tap matmuls with f32 accumulation and
    f32 cross-source partial sums — at least as precise as the XLA paired
    schedule, which stores its partial sums bf16.  x: (N, H, W, nf) bf16."""
    wq, bias = prep_bf16(params, nf, gc)
    ones = jnp.ones((5, 64), jnp.float32)   # stage "dequant" is identity
    return _call(x, wq, ones, ones, bias, nf, gc, alpha, lemda,
                 False, interpret)


def rdb5_int8_xla(x, params, absmax, lemda: float = 0.2, alpha: float = 0.2,
                  nf: int = 64, gc: int = 32):
    """Reference XLA implementation of the int8 kernel's EXACT semantics —
    which now coincide with the per-conv srcgan_tpu.quant path: per stage,
    one int32 conv over the quantized concat (integer addition is
    associative, so the kernel's per-source tap matmuls sum identically),
    one f32 dequant + bias.  Agreement with the kernel is within a few int8
    LSBs at sparse positions, not bitwise: XLA fuses the f32 dequant chain
    differently per program (FMA), and a 1-ulp f32 difference occasionally
    flips a requantization round.  Tests therefore bound the relative error,
    and separately bound the int8 path against the fp32 block."""
    widths = [gc, gc, gc, gc, nf]
    slices = _source_slices(nf, gc)
    wq_src, sw, rq, bias = prep_int8(params, absmax, nf, gc)
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
        w_s = wq_src[s].reshape(3, 3, cs, n_s)
        acc = jax.lax.conv_general_dilated(
            src_q, w_s, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        o = 0
        for i in range(s, 5):
            c = acc[..., o:o + widths[i]]
            pre[i] = c if pre[i] is None else pre[i] + c
            o += widths[i]
        if s < 4:
            v = (pre[s].astype(jnp.float32)
                 * sw[s, :widths[s]] + bias[s, :widths[s]])
            v = jnp.where(v >= 0, v, alpha * v)
            src_q = quantize(v, s + 1)

    x5 = pre[4].astype(jnp.float32) * sw[4, :nf] + bias[4, :nf]
    return (x5 * lemda + x32).astype(x.dtype)
