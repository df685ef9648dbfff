"""Fused Pallas SSIM kernel.

The reference SSIM (metrics.py:71-144) runs five 11x11 grouped convolutions
plus a chain of elementwise maps — in XLA that is 5 non-separable 121-tap
convs with HBM round-trips between stages.  This kernel:

  - exploits separability (the window is an outer product g g^T): 2x11 taps
    instead of 121 per map;
  - keeps all five filtered maps in VMEM for one (image, channel) plane per
    grid step — nothing intermediate touches HBM;
  - embeds the Gaussian taps as compile-time constants;
  - emits per-plane sums; the host-side wrapper finishes the mean (planes are
    equal-sized, so the mean of per-plane sums equals the reference's global
    ssim_map mean exactly).

The dynamic-range auto-detect (max>128 -> 255, min<-0.5 -> -1) is computed in
XLA before the call (a cheap fused reduce) and passed as a scalar.
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gauss_taps(w_size: int = 11, sigma: float = 1.5):
    g = np.array([math.exp(-((i - w_size // 2) ** 2) / (2 * sigma ** 2))
                  for i in range(w_size)], dtype=np.float64)
    return tuple((g / g.sum()).astype(np.float32).tolist())


def _ssim_plane_kernel(l_ref, pred_ref, true_ref, ssim_sum_ref, cs_sum_ref,
                       *, taps, w_size):
    x = pred_ref[0].astype(jnp.float32)
    y = true_ref[0].astype(jnp.float32)
    plane = pl.program_id(0)
    dyn_l = l_ref[plane]
    h, w = x.shape
    vw = w - (w_size - 1)  # valid width
    vh = h - (w_size - 1)

    def filt(img):
        # row pass (along W) then column pass (along H); static shifts
        row = img[:, 0:vw] * taps[0]
        for k in range(1, w_size):
            row += img[:, k:k + vw] * taps[k]
        col = row[0:vh, :] * taps[0]
        for k in range(1, w_size):
            col += row[k:k + vh, :] * taps[k]
        return col

    mu1 = filt(x)
    mu2 = filt(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(x * x) - mu1_sq
    s2 = filt(y * y) - mu2_sq
    s12 = filt(x * y) - mu1_mu2

    c1 = (0.01 * dyn_l) ** 2
    c2 = (0.03 * dyn_l) ** 2
    v1 = 2.0 * s12 + c2
    v2 = s1 + s2 + c2
    ssim_map = ((2.0 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    ssim_sum_ref[plane] = jnp.sum(ssim_map)
    cs_sum_ref[plane] = jnp.sum(v1 / v2)


@partial(jax.jit,
         static_argnames=("w_size", "size_average", "full", "per_sample_range",
                          "interpret"))
def ssim_pallas(y_pred, y_true, w_size: int = 11, size_average: bool = True,
                full: bool = False, per_sample_range: bool = False,
                interpret: bool = False):
    """Drop-in fused replacement for srcgan_tpu.metrics.ssim (NHWC).

    per_sample_range=True detects the dynamic range PER SAMPLE (what the
    reference computes when fed one sample at a time — the batched-eval
    protocol) instead of over the whole batch.
    """
    n, h, w, c = y_pred.shape
    nc = n * c
    taps = _gauss_taps(w_size)

    if per_sample_range:
        mx = jnp.max(y_pred, axis=(1, 2, 3))
        mn = jnp.min(y_pred, axis=(1, 2, 3))
        max_val = jnp.where(mx > 128.0, 255.0, 1.0)
        min_val = jnp.where(mn < -0.5, -1.0, 0.0)
        dyn_l = jnp.repeat(max_val - min_val, c)          # (nc,)
    else:
        max_val = jnp.where(jnp.max(y_pred) > 128.0, 255.0, 1.0)
        min_val = jnp.where(jnp.min(y_pred) < -0.5, -1.0, 0.0)
        dyn_l = jnp.full((nc,), max_val - min_val)

    # planes layout: (N*C, H, W) so each block is a full (H, W) plane —
    # satisfies the TPU lowering's last-two-dims constraint.
    pred_planes = y_pred.transpose(0, 3, 1, 2).reshape(nc, h, w)
    true_planes = y_true.transpose(0, 3, 1, 2).reshape(nc, h, w)

    kernel = partial(_ssim_plane_kernel, taps=taps, w_size=w_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # dyn_l rides in SMEM ahead of the kernel
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # full 1-D result vectors live in SMEM across all grid steps;
            # each program writes its own slot
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    ssim_sums, cs_sums = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nc,), jnp.float32),
                   jax.ShapeDtypeStruct((nc,), jnp.float32)],
        interpret=interpret,
    )(dyn_l, pred_planes, true_planes)

    valid = (h - w_size + 1) * (w - w_size + 1)
    ssim_all = jnp.sum(ssim_sums) / (nc * valid)
    cs = jnp.sum(cs_sums) / (nc * valid)
    if size_average:
        ret = ssim_all
    else:
        per_plane = ssim_sums.reshape(n, c) / valid
        ret = per_plane.mean(axis=1)  # per-sample (mean over channels)
    if full:
        return ret, cs
    return ret
