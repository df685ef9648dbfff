"""Exact algebraic fusions of common op pairs (XLA-level, MXU-shaped).

These rewrite composite ops into mathematically identical forms that map
better onto the TPU: fewer HBM materializations, wider matmul lanes.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcgan_tpu.ops import conv as _conv
from srcgan_tpu.ops.conv import pixel_shuffle


def conv2d(*a, **kw):
    """Late-bound so srcgan_tpu.quant's int8 dispatch also covers the fused
    paths (the phase-folded tail's convs quantize through here)."""
    return _conv.conv2d(*a, **kw)


def nearest_up2_conv3x3(x, w, b=None):
    """conv3x3(nearest_upsample_x2(x)) without materializing the upsample.

    Used by the mode-based RDDB tails (reference model.py:383-388:
    ``upconv(F.interpolate(fea, 2, 'nearest'))``).  Each output phase (a, b)
    of the 2x-upsampled conv reads a fixed 2x2 input neighbourhood with
    phase-folded weights:

      rows, a=0: [W0, W1+W2, 0]   a=1: [0, W0+W1, W2]   (same for columns)

    so the whole op is ONE 3x3 conv at input resolution producing Cout*4
    channels + depth-to-space.  Identical arithmetic (plus structural zeros);
    4x fewer conv rows/cols, 4x wider output channels (256 lanes for Cout=64),
    and the 4x-size upsampled tensor never exists in HBM.
    """
    z = jnp.zeros_like(w[0])

    def mix_rows(a):
        if a == 0:
            return jnp.stack([w[0], w[1] + w[2], z], axis=0)
        return jnp.stack([z, w[0] + w[1], w[2]], axis=0)

    def mix_cols(r, bphase):
        zc = jnp.zeros_like(r[:, 0])
        if bphase == 0:
            return jnp.stack([r[:, 0], r[:, 1] + r[:, 2], zc], axis=1)
        return jnp.stack([zc, r[:, 0] + r[:, 1], r[:, 2]], axis=1)

    phases = []
    for a in (0, 1):
        ra = mix_rows(a)
        for bp in (0, 1):
            phases.append(mix_cols(ra, bp))  # (3,3,Cin,Cout)
    k = jnp.stack(phases, axis=-1)  # (3,3,Cin,Cout,4); phase = a*2+b
    kh, kw, cin, cout, _ = k.shape
    k = k.reshape(kh, kw, cin, cout * 4)  # channel = cout*4 + phase

    y = conv2d(x, k, None, 1, 1)
    y = pixel_shuffle(y, 2)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def phasefold_deconv_tail(x, deconv_ws, last_w, last_b=None, alpha: float = 0.2,
                          fold_last: bool = True):
    """The RDDBNet upsample tail — log2(r) x [ConvTranspose2d k2s2 (no bias) +
    LeakyReLU(alpha)] + conv3x3 (reference rddb.py:93-98) — computed ENTIRELY
    at input resolution ("phase space"), exactly.

    Why: the materialized form writes (r*H)^2 x nf tensors to HBM after every
    deconv (268 MB at 512^2) and runs pixel-shuffle 6-D transposes at full
    resolution; measured 7.0 ms of a 16.7 ms x4 forward at ~3 TFLOPS.  Here
    each k2s2 deconv is a 1x1 conv whose output keeps the r^2 phases packed
    in channel blocks (block beta = nf channels of one output phase), the
    LeakyReLU is pointwise (commutes with the packing), and the final 3x3
    conv is re-indexed onto the phase grid: a tap (dy,dx) at full resolution
    is a (cell-offset, phase, block) triple at input resolution, assembled
    into one statically-scattered (3,3, r^2*nf, ou*r^2) weight.  One small
    pixel-shuffle of the ou-channel output materializes the image.

    x: (N,H,W,nf);  deconv_ws: [(2,2,nf,nf), ...] torch-layout transposed-conv
    weights;  last_w: (3,3,nf,ou).  Exact up to float-add reassociation.
    fold_last=False pixel-shuffles after the deconv folds and runs the last
    conv at full resolution (for large r, where the folded conv's r^2*ou
    output lanes would underfill the MXU).
    """
    nf = x.shape[-1]
    t = x
    phases = [(0, 0)]  # channel-block index -> output phase (Py, Px)
    r = 1
    for w in deconv_ws:
        kh, kw, cin, cout = w.shape
        assert (kh, kw) == (2, 2) and cin == nf and cout == nf, w.shape
        # (2,2,nf,nf) -> (1,1,nf, 4nf) with out channel = (ty*2+tx)*nf + co:
        # out pixel (2i+ty, 2j+tx, co) = sum_ci t[i,j,ci] * w[ty,tx,ci,co].
        tile = w.astype(t.dtype).transpose(2, 0, 1, 3).reshape(1, 1, nf, 4 * nf)
        g = len(phases)
        if g == 1:
            t = conv2d(t, tile, None, 1, 0)
        else:
            # one grouped 1x1 conv: every phase block gets the same deconv.
            t = conv2d(t, jnp.tile(tile, (1, 1, 1, g)), None, 1, 0, groups=g)
        t = jax.nn.leaky_relu(t, alpha)
        phases = [(2 * py + ty, 2 * px + tx)
                  for (py, px) in phases for ty in (0, 1) for tx in (0, 1)]
        r *= 2

    g = len(phases)
    assert last_w.shape[:2] == (3, 3) and last_w.shape[2] == nf, last_w.shape
    ou = last_w.shape[3]

    if not fold_last:
        # un-interleave blocks into pixel_shuffle order (co*r^2 + Py*r + Px)
        if r > 1:
            order = {ph: b for b, ph in enumerate(phases)}
            # channel c = co*r^2 + Py*r + Px  <-  block*nf + co
            perm = np.empty(g * nf, np.int32)
            for co in range(nf):
                for py in range(r):
                    for px in range(r):
                        perm[co * r * r + py * r + px] = order[(py, px)] * nf + co
            t = pixel_shuffle(t[..., perm], r)
        return conv2d(t, last_w, last_b, 1, 1)

    wf = fold_last_weight(phases, last_w, r, nf, t.dtype)
    y = conv2d(t, wf, None, 1, 1)
    if last_b is not None:
        y = y + jnp.repeat(last_b.astype(y.dtype), r * r)
    return pixel_shuffle(y, r)


def tail_phases(n_up: int):
    """Channel-block -> output-phase map after n_up folded k2s2 deconvs."""
    phases = [(0, 0)]
    for _ in range(n_up):
        phases = [(2 * py + ty, 2 * px + tx)
                  for (py, px) in phases for ty in (0, 1) for tx in (0, 1)]
    return phases


def fold_last_weight(phases, last_w, r: int, nf: int, dtype):
    """(3,3,nf,ou) conv_last re-indexed onto the r x r phase grid.

    A full-res tap (dy,dx) on out phase (Pyo,Pxo) reads input phase
    Pyi=(Pyo+dy) mod r at cell offset oy=(Pyo+dy-Pyi)/r.  Returns a
    (3,3, r^2*nf, ou*r^2) weight: input channel beta*nf+ci in the `phases`
    block order; output channel co*r^2+phase (pixel_shuffle order).
    """
    g = len(phases)
    ou = last_w.shape[3]
    oy_l, ox_l, b_l, ph_l, dy_l, dx_l = [], [], [], [], [], []
    for beta, (pyi, pxi) in enumerate(phases):
        for pyo in range(r):
            for pxo in range(r):
                for dy in (-1, 0, 1):
                    if (pyo + dy - pyi) % r:
                        continue
                    oy = (pyo + dy - pyi) // r
                    if abs(oy) > 1:
                        continue
                    for dx in (-1, 0, 1):
                        if (pxo + dx - pxi) % r:
                            continue
                        ox = (pxo + dx - pxi) // r
                        if abs(ox) > 1:
                            continue
                        oy_l.append(oy + 1); ox_l.append(ox + 1)
                        b_l.append(beta); ph_l.append(pyo * r + pxo)
                        dy_l.append(dy + 1); dx_l.append(dx + 1)
    vals = last_w.astype(dtype)[np.asarray(dy_l), np.asarray(dx_l)]  # (K,nf,ou)
    wf = jnp.zeros((3, 3, g, nf, r * r, ou), dtype)
    wf = wf.at[np.asarray(oy_l), np.asarray(ox_l), np.asarray(b_l), :,
               np.asarray(ph_l), :].set(vals)
    return wf.transpose(0, 1, 2, 3, 5, 4).reshape(3, 3, g * nf, ou * r * r)
