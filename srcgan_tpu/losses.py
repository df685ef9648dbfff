"""Training losses, pure JAX over NHWC tensors.

Functional re-creations of /root/reference/src/losses.py (and the GAN objectives
defined inline in train.py:67-128), designed to live inside a single jit-compiled
train step: no modules, no device branching, explicit RNG where needed.

Inventory vs the reference:
  l1 / l1_3d             losses.py:95-120
  mse                    losses.py:123-133
  psnr                   losses.py:136-147 (used as a validation metric in-train)
  ce                     losses.py:150-167 (binary BCE / multi-class NLL)
  dssim / dssim_3d       losses.py:170-196   (1 - SSIM)/2
  con                    losses.py:258-274 (batch consistency)
  cross                  losses.py:277-293 (batch-shifted pairs)
  focal                  losses.py:296-341 (binary alpha=0.1 / multi, gamma=2)
  nearest_select         losses.py:199-255 (shift-search alignment)
  gan_loss               train.py:67-128 (lsgan | vanilla | wgangp | DSSIM)
  multi_task             train.py:131-142 (uncertainty weighting)
  vgg16 / perception     losses.py:344-470 — see srcgan_tpu.losses_vgg (weights
                         must be supplied locally; no download in this image)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from srcgan_tpu.metrics import ssim as _ssim

EPS = 1e-6


def l1(output, target):
    return jnp.mean(jnp.abs(output - target))


def mse(output, target):
    return jnp.mean((output - target) ** 2)


def psnr(output, target):
    return 10.0 * jnp.log10(1.0 / mse(output, target))


def l1_3d(output, target):
    """Mean per-frame L1 over (N, F, H, W, C) videos (losses.py:107-120)."""
    return jnp.mean(jnp.abs(output - target))


def dssim(output, target):
    return (1.0 - _ssim(output, target)) / 2.0


def dssim_3d(output, target):
    """(N, F, H, W, C): mean per-frame DSSIM (losses.py:183-196)."""
    n, f = output.shape[0], output.shape[1]
    vals = jax.vmap(lambda o, t: dssim(o, t), in_axes=(1, 1))(output, target)
    return jnp.mean(vals)


def ce(output, target):
    """Binary BCE when target has 1 channel, else NLL over log-probs
    (losses.py:150-167; channel dim is last here)."""
    if target.shape[-1] == 1:
        o = jnp.clip(output, EPS, 1.0 - EPS)
        return -jnp.mean(target * jnp.log(o) + (1.0 - target) * jnp.log(1.0 - o))
    labels = jnp.argmax(target, axis=-1)
    logp = jnp.log(jnp.clip(output, EPS, None))
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)
    return -jnp.mean(picked)


def con(feats):
    """Batch-consistency: MSE of (max - min) over the batch (losses.py:258-274)."""
    fmax = jnp.max(feats, axis=0)
    fmin = jnp.min(feats, axis=0)
    return jnp.mean(jnp.abs(fmax - fmin) ** 2)


def cross(output, target):
    """L1 between batch-shifted sample pairs (losses.py:277-293)."""
    return jnp.mean(jnp.abs(output[:-1] - target[1:]))


def focal(output, target, gamma: float = 2.0, size_average: bool = True):
    """Focal loss (losses.py:296-341): binary (alpha=0.1) or multi-class."""
    o = jnp.clip(output, EPS, 1.0 - EPS)
    if target.shape[-1] == 1:
        alpha = 0.1
        loss = (-(1.0 - alpha) * ((1.0 - o) ** gamma) * (target * jnp.log(o))
                - alpha * (o ** gamma) * ((1.0 - target) * jnp.log(1.0 - o)))
    else:
        loss = -((1.0 - o) ** gamma) * (target * jnp.log(o))
    return jnp.mean(loss) if size_average else jnp.sum(loss)


# ---------------------------------------------------------------------------
# GAN objectives (train.py:67-128)
# ---------------------------------------------------------------------------

GAN_MODES = ("lsgan", "vanilla", "wgangp", "DSSIM")


def gan_loss(prediction, target_is_real: bool, mode: str = "lsgan",
             real_label: float = 1.0, fake_label: float = 0.0):
    """GAN objective vs an expanded constant label tensor.

    lsgan: MSE; vanilla: BCE-with-logits; wgangp: +-mean; DSSIM: (1-SSIM)/2.
    ``target_is_real`` is a Python bool (static under jit — each branch traces
    its own graph, as the reference's two call sites do).
    """
    label = real_label if target_is_real else fake_label
    if mode == "lsgan":
        return jnp.mean((prediction - label) ** 2)
    if mode == "vanilla":
        target = jnp.full_like(prediction, label)
        # BCEWithLogits: max(x,0) - x*z + log(1+exp(-|x|))
        x = prediction
        return jnp.mean(jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))
    if mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
    if mode == "DSSIM":
        return dssim(prediction, jnp.full_like(prediction, label))
    raise ValueError(f"gan mode {mode} not implemented")


def multi_task(losses_vec, sigma):
    """Uncertainty-weighted multi-task loss (train.py:131-142):
    0.5 * sum(l_i / sigma_i^2) + log(prod sigma_i)."""
    losses_vec = jnp.asarray(losses_vec)
    return jnp.sum(0.5 * losses_vec / sigma ** 2) + jnp.log(jnp.prod(sigma))


# ---------------------------------------------------------------------------
# NearestSelector (losses.py:199-255) — shift-search alignment for
# misregistered imagery.  Fully jittable: the (2*shift)^2 candidate offsets are
# static, selection is a per-sample argmin + dynamic_slice.
# ---------------------------------------------------------------------------

def nearest_select(output, target, shift: int = 2, stride: int = 1
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (output_crop, target_crop) where target_crop is the min-L1
    aligned crop within +-shift.  Gradients flow through output only (the
    search itself uses stop_gradient, like the reference's .detach())."""
    n, h, w, c = output.shape
    crop_h = h - 2 * shift * stride
    crop_w = w - 2 * shift * stride
    off = shift * stride
    out_crop = jax.lax.dynamic_slice(output, (0, off, off, 0), (n, crop_h, crop_w, c))

    o_d = jax.lax.stop_gradient(out_crop)
    t_d = jax.lax.stop_gradient(target)

    # All (2*shift)^2 candidate target crops, batched: (S2, N, ch, cw, C)
    offsets = [(i * stride, j * stride)
               for i in range(2 * shift) for j in range(2 * shift)]
    cands = jnp.stack([
        jax.lax.dynamic_slice(t_d, (0, oi, oj, 0), (n, crop_h, crop_w, c))
        for oi, oj in offsets])
    diffs = jnp.sum(jnp.abs(cands - o_d[None]), axis=(2, 3, 4))  # (S2, N)
    best = jnp.argmin(diffs, axis=0)  # (N,)

    # NOTE: the reference (losses.py:253-254) slices the chosen target crop with
    # crop_row for BOTH dims — a bug that only matters for non-square inputs.
    # We use (crop_h, crop_w); on square inputs this is identical.
    def pick(tb, b):
        oi = (b // (2 * shift)) * stride
        oj = (b % (2 * shift)) * stride
        return jax.lax.dynamic_slice(tb, (oi, oj, 0), (crop_h, crop_w, c))

    tgt_crop = jax.vmap(pick)(target, best)
    return out_crop, tgt_crop


# Name-compatible aliases mirroring the reference class names.
L1Loss, MSELoss, PSNRLoss, DSSIMLoss, CELoss, FLoss = l1, mse, psnr, dssim, ce, focal
ConLoss, CrossLoss = con, cross
