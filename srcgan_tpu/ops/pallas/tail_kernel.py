"""Pallas-fused x4 upsample tail for RDDBNet-style generators (eval path).

Fuses, per (batch, row-tile) grid step, entirely in VMEM:

    deconv1(k2s2) + LeakyReLU + deconv2(k2s2) + LeakyReLU + conv_last taps

operating in phase space (see ops.fused.phasefold_deconv_tail for the math).
The XLA phase-folded form is exact but materializes the 16-phase intermediate
(268 MB at batch 8 x 128^2 trunk, bf16) in HBM twice — measured ~2.7 ms.  This
kernel reads only the trunk output t0 (17 MB) and writes the 9-tap partial
products zall (38 MB); the tap shift-reduce and the final pixel-shuffle are
cheap XLA elementwise ops (measured ~0.13 ms).

Per phase block b (of deconv1's 4 output phases), three chained MXU matmuls:
    t1_b = lrelu(t0 @ W1[b])          (M,nf)   x (nf,nf)
    z2_b = lrelu(t1_b @ W2m)          (M,nf)   x (nf,4nf)
    zall += z2_b @ Wall[b]            (M,4nf)  x (4nf, 9*16*ou)
with W1/W2m/Wall assembled from the torch-layout deconv / conv_last weights
outside the kernel (tiny traced ops).  fp32 accumulation; bf16 intermediates
match what the two-op XLA pipeline stores in HBM.

Forward-only: gradients are NOT defined (the training path uses the
differentiable XLA fold in ops.fused).  Reference semantics:
/root/reference/src/model/rddb.py:93-98 (upscale tail + conv_last).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcgan_tpu.ops import fused
from srcgan_tpu.ops.conv import pixel_shuffle


def _kernel(t0_ref, w1_ref, w2_ref, wall_ref, out_ref, *, alpha: float):
    x = t0_ref[:]                                  # (Tr, W, N, nf) or (Tr, W, nf)
    nf = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    co9 = out_ref.shape[-1]
    xm = x.reshape(m, nf)
    acc = jnp.zeros((m, co9), jnp.float32)
    for b in range(4):
        t1b = jax.nn.leaky_relu(
            jnp.dot(xm, w1_ref[b], preferred_element_type=jnp.float32), alpha
        ).astype(jnp.bfloat16)
        z2b = jax.nn.leaky_relu(
            jnp.dot(t1b, w2_ref[:], preferred_element_type=jnp.float32), alpha
        ).astype(jnp.bfloat16)
        acc = acc + jnp.dot(z2b, wall_ref[b],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(x.shape[:-1] + (co9,)).astype(out_ref.dtype)


def supported(t0_shape, upscale_factor: int, dtype) -> bool:
    n, h, w, nf = t0_shape
    return (upscale_factor == 4 and dtype == jnp.bfloat16
            and h % 8 == 0 and w % 8 == 0 and nf % 8 == 0)


def tail_x4_fused(t0, w_deconv1, w_deconv2, last_w, last_b=None,
                  alpha: float = 0.2, interpret: bool = False):
    """x4 tail from the trunk output.  t0: (N,H,W,nf) bf16;
    w_deconv{1,2}: (2,2,nf,nf) torch-layout k2s2 transposed-conv weights
    (bias-free); last_w: (3,3,nf,ou).  Returns (N,4H,4W,ou)."""
    n, h, w, nf = t0.shape
    ou = last_w.shape[3]
    co2 = 16 * ou
    bf = jnp.bfloat16

    # weight assembly (traced, tiny)
    w1s = w_deconv1.astype(bf).reshape(4, nf, nf)            # [b=ty*2+tx]
    w2m = w_deconv2.astype(bf).transpose(2, 0, 1, 3).reshape(nf, 4 * nf)
    wf = fused.fold_last_weight(fused.tail_phases(2), last_w, 4, nf, bf)
    # (3,3,16nf,16ou) -> (16nf, 9*co2) with column = tap*co2 + (co*16+phase)
    wall = jnp.moveaxis(wf.reshape(9, 16 * nf, co2), 0, 1).reshape(
        16 * nf, 9 * co2)
    walls = wall.reshape(4, 4 * nf, 9 * co2)

    # Work on the (H, W*N, C) view: the trunk convs' outputs physically live
    # in the image-major batch-in-sublanes layout ({3,0,2,1}: C minor, then N,
    # W, H), so transpose+reshape compile to a bitcast instead of a 17 MB
    # relayout copy at the custom-call boundary (measured: +2.1 ms when the
    # kernel demanded NHWC).
    t0t = t0.astype(bf).transpose(1, 2, 0, 3).reshape(h, w * n, nf)
    # t*w*n = matmul M per grid step; 4096 keeps Mosaic's scoped VMEM (f32
    # accumulator + bf16 staging) under the 16 MB budget (8192 OOMs at 21.9M).
    tr = next(t for t in (8, 4, 2, 1) if h % t == 0 and t * w * n <= 4096)
    zall = pl.pallas_call(
        partial(_kernel, alpha=alpha),
        grid=(h // tr,),
        in_specs=[
            pl.BlockSpec((tr, w * n, nf), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nf, nf), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, 4 * nf), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * nf, 9 * co2), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, w * n, 9 * co2), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w * n, 9 * co2), bf),
        interpret=interpret,
    )(t0t, w1s, w2m, walls)

    # 9-tap shift-reduce over (H, W): a W shift of 1 is a shift of n in the
    # merged W*N dim (batch entries of one cell move together).  One fused
    # elementwise pass, then back to NHWC for the final small pixel-shuffle.
    zp = jnp.pad(zall, ((1, 1), (n, n), (0, 0)))
    out = jnp.zeros((h, w * n, co2), zall.dtype)
    for oy in range(3):
        for ox in range(3):
            t = oy * 3 + ox
            out = out + zp[oy:oy + h, ox * n:ox * n + w * n,
                           t * co2:(t + 1) * co2]
    out = out.reshape(h, w, n, co2).transpose(2, 0, 1, 3)   # (N, H, W, co2)
    if last_b is not None:
        out = out + jnp.repeat(last_b.astype(out.dtype), 16)
    return pixel_shuffle(out, 4)
