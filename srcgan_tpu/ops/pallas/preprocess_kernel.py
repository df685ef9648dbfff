"""Fused Pallas preprocessing: uint8 RGB -> (luma gray, degraded LR gray).

The cascaded trainers' input path (SURVEY.md §7.8c) is
  uint8 tar --/255--> RGB --luma--> real_BC --bilinear 1/up--> real_BA
(dataset.py:125-134 + trainCas.py:85-90).  This kernel does all of it in one
VMEM-resident pass per image:

  - uint8 pixels cross HBM once (4x smaller than fp32);
  - luma runs on the VPU; the separable bilinear downsample runs on the MXU as
    two small sampling-matrix dots (the exact matrices from ops.resize, so
    torch F.interpolate parity carries over bit-for-bit);
  - the full-res RGB float tensor never exists in HBM.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcgan_tpu.ops.resize import _bilinear_matrix

_LUMA_R, _LUMA_G, _LUMA_B = 0.2125, 0.7154, 0.0721


def _kernel(rgb_ref, mh_ref, mw_ref, gray_ref, low_ref):
    # Channel-PLANE layout (1, 3, H, W): blocks keep (H, W) as the tiled
    # last-two dims.  The original (1, H, W, 3) layout lane-padded the
    # trailing 3 to 128 (Mosaic (8,128) tiling), inflating every block 42x
    # and blowing the scoped-vmem budget at 256².
    # Mosaic has no direct u8->f32 cast; hop through int32 (free on the VPU).
    rgb = rgb_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    gray = (rgb[0] * _LUMA_R + rgb[1] * _LUMA_G + rgb[2] * _LUMA_B)  # (H, W)
    gray_ref[0] = gray
    # separable bilinear downsample on the MXU: (H2,H)@(H,W) then @(W,W2)
    tmp = jnp.dot(mh_ref[:], gray, preferred_element_type=jnp.float32)
    low_ref[0] = jnp.dot(tmp, mw_ref[:], preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("up", "interpret"))
def fused_gray_degrade(tar_u8, up: int, interpret: bool = False):
    """uint8 NHWC RGB -> (real_BC (N,H,W,1) f32, real_BA (N,H/up,W/up,1) f32).

    Exact match for luma + ops.interpolate(..., 1/up, 'bilinear').
    """
    n, h, w, _ = tar_u8.shape
    h2, w2 = h // up, w // up
    mh = jnp.asarray(_bilinear_matrix(h, h2))          # (h2, h)
    mw = jnp.asarray(_bilinear_matrix(w, w2)).T        # (w, w2)
    # channel-plane layout: (H, W) stay the (8,128)-tiled last-two dims
    planes = jnp.transpose(tar_u8, (0, 3, 1, 2))       # (N, 3, H, W) u8

    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2, w2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    gray, low = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((n, h2, w2), jnp.float32)],
        interpret=interpret,
    )(planes, mh, mw)
    return gray[..., None], low[..., None]
