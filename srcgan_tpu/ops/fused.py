"""Exact algebraic fusions of common op pairs (XLA-level, MXU-shaped).

These rewrite composite ops into mathematically identical forms that map
better onto the TPU: fewer HBM materializations, wider matmul lanes.
"""
from __future__ import annotations

import jax.numpy as jnp

from srcgan_tpu.ops.conv import conv2d, pixel_shuffle


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
