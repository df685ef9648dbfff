"""Functional convolution ops, NHWC/HWIO, with PyTorch-parity semantics.

All convs route through ``jax.lax.conv_general_dilated`` so XLA can tile them onto
the MXU and fuse surrounding elementwise work.  ``preferred_element_type=float32``
keeps accumulation in fp32 even when activations/weights are bfloat16.

Transposed convolution reproduces ``torch.nn.ConvTranspose2d`` exactly — including
the reference's unusual (kernel, stride, output_padding) triples from
/root/reference/src/model/rddb.py:9-25: x2->(2,2,0), x4->(2,4,2), x8->(4,8,4) —
by expressing it as a fractionally-strided conv (lhs_dilation) with a flipped
kernel:  H_out = (H_in - 1)*stride - 2*pad + k + output_padding.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from srcgan_tpu import config

_DIMS = ("NHWC", "HWIO", "NHWC")

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(x, w, b=None, stride: IntOr2 = 1, padding: IntOr2 = 0,
           dilation: IntOr2 = 1, groups: int = 1, *, accum_dtype=jnp.float32):
    """2D convolution matching torch.nn.functional.conv2d.

    x: (N, H, W, Cin); w: (kh, kw, Cin // groups, Cout); b: (Cout,) or None.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)  # mixed-precision: activations set compute dtype
    # bf16 inputs: emit bf16 (the MXU still accumulates fp32 internally);
    # requesting an f32 output would make the AD-generated gradient convs mix
    # dtypes (f32 cotangent vs bf16 operands) and fail to lower.
    pet = accum_dtype if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMS,
        feature_group_count=groups,
        preferred_element_type=pet,
        precision=config.get_conv_precision(),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def conv_transpose2d(x, w, b=None, stride: IntOr2 = 1, padding: IntOr2 = 0,
                     output_padding: IntOr2 = 0, *, accum_dtype=jnp.float32):
    """2D transposed convolution matching torch.nn.ConvTranspose2d.

    x: (N, H, W, Cin); w: (kh, kw, Cin, Cout) — NOTE: stored input-major like the
    forward-conv layout; the spatial flip + lhs_dilation below implements the
    transpose.  H_out = (H_in-1)*stride - 2*padding + kh + output_padding.
    """
    kh, kw = w.shape[0], w.shape[1]
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    pet = accum_dtype if x.dtype == jnp.float32 else None
    if (kh == kw == sh == sw) and (ph, pw) == (0, 0) and (oph, opw) == (0, 0):
        # Non-overlapping case (e.g. the reference's k2s2 x2 deconv): each
        # input pixel independently emits a k x k output patch, so the whole
        # op is one 1x1 conv to Cout*k*k channels + depth-to-space.  On the
        # MXU this turns a width-Cout matmul into width-Cout*k*k (4x lane
        # occupancy for k=2) with no scatter. Exact, not an approximation.
        cin, cout = w.shape[2], w.shape[3]
        # (kh, kw, cin, cout) -> (1, 1, cin, cout*kh*kw) with channel order
        # matching pixel_shuffle's (cout, kh, kw) convention.
        w11 = w.transpose(2, 3, 0, 1).reshape(1, 1, cin, cout * kh * kw)
        y = lax.conv_general_dilated(
            x, w11, window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=_DIMS, preferred_element_type=pet,
            precision=config.get_conv_precision(),
        )
        y = pixel_shuffle(y.astype(x.dtype), kh)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y.astype(x.dtype)
    pad_h = (kh - 1 - ph, kh - 1 - ph + oph)
    pad_w = (kw - 1 - pw, kw - 1 - pw + opw)
    w_flipped = w[::-1, ::-1]
    y = lax.conv_general_dilated(
        x, w_flipped,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMS,
        preferred_element_type=pet,
        precision=config.get_conv_precision(),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def depthwise_conv2d(x, w, b=None, stride: IntOr2 = 1, padding: IntOr2 = 0,
                     *, accum_dtype=jnp.float32):
    """Depthwise conv (groups == Cin).  w: (kh, kw, 1, Cin)."""
    cin = x.shape[-1]
    return conv2d(x, w, b, stride, padding, groups=cin, accum_dtype=accum_dtype)


def pixel_shuffle(x, r: int):
    """PixelShuffle matching torch.nn.PixelShuffle on NHWC tensors.

    Channel ordering follows torch's NCHW convention: the input channel index is
    c_out * r^2 + i * r + j, so parameters trained here map 1:1 onto torch layouts.
    x: (N, H, W, C*r^2) -> (N, H*r, W*r, C).
    """
    n, h, w_, c = x.shape
    assert c % (r * r) == 0, f"channels {c} not divisible by r^2={r*r}"
    co = c // (r * r)
    x = x.reshape(n, h, w_, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (N, H, r, W, r, Co)
    return x.reshape(n, h * r, w_ * r, co)


def pixel_unshuffle(x, r: int):
    """Inverse of pixel_shuffle. x: (N, H*r, W*r, C) -> (N, H, W, C*r^2)."""
    n, hr, wr, c = x.shape
    h, w_ = hr // r, wr // r
    x = x.reshape(n, h, r, w_, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (N, H, W, C, r, r)
    return x.reshape(n, h, w_, c * r * r)
