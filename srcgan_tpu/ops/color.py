"""Colour-space conversions in pure JAX (skimage-compatible, D65 / sRGB).

The reference does colour math on the host with skimage (dataset.py:114-159) and a
hand-written luma inside the train step (trainCas.py:85-87).  Here everything runs
on-device so it fuses into the jit-compiled step: no host round-trips, and the
RGB<->LAB math rides the VPU.

Conventions reproduced exactly:
  - luma / rgb_to_gray: Y = 0.2125 R + 0.7154 G + 0.0721 B (same coefficients as
    skimage.color.rgb2gray and trainCas.py:85-87).
  - normalized LAB (dataset.py:148-159): L/100, (ab + 128)/255 — all in [0, 1].
  - denormalization for display (dataset.py:94-104): L*100, ab*255 - 128.

All functions take/return NHWC float arrays; RGB is in [0, 1].
"""
from __future__ import annotations

import jax.numpy as jnp

# skimage.color D65 2-degree observer constants.
_XYZ_FROM_RGB = jnp.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]], dtype=jnp.float32)
_RGB_FROM_XYZ = jnp.linalg.inv(_XYZ_FROM_RGB)
_WHITE = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)

_LUMA = jnp.array([0.2125, 0.7154, 0.0721], dtype=jnp.float32)


def rgb_to_gray(rgb):
    """(..., 3) RGB in [0,1] -> (..., 1) luma. skimage.rgb2gray coefficients."""
    return jnp.sum(rgb * _LUMA, axis=-1, keepdims=True)


def luma(rgb):
    """Alias used by the train-step degradation (trainCas.py:85-87)."""
    return rgb_to_gray(rgb)


def _srgb_to_linear(v):
    return jnp.where(v > 0.04045, ((v + 0.055) / 1.055) ** 2.4, v / 12.92)


def _linear_to_srgb(v):
    v = jnp.clip(v, 0.0, None)
    return jnp.where(v > 0.0031308, 1.055 * v ** (1.0 / 2.4) - 0.055, 12.92 * v)


def rgb_to_xyz(rgb):
    lin = _srgb_to_linear(rgb)
    return lin @ _XYZ_FROM_RGB.T


def xyz_to_rgb(xyz):
    lin = xyz @ _RGB_FROM_XYZ.T
    return jnp.clip(_linear_to_srgb(lin), 0.0, 1.0)


def rgb_to_lab(rgb):
    """(..., 3) sRGB in [0,1] -> (..., 3) LAB (L in [0,100], ab ~ [-128,127])."""
    xyz = rgb_to_xyz(rgb) / _WHITE
    f = jnp.where(xyz > 0.008856, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    lab_l = 116.0 * fy - 16.0
    lab_a = 500.0 * (fx - fy)
    lab_b = 200.0 * (fy - fz)
    return jnp.stack([lab_l, lab_a, lab_b], axis=-1)


def lab_to_rgb(lab):
    """Inverse of rgb_to_lab (skimage lab2rgb semantics, clipped to [0,1])."""
    lab_l, lab_a, lab_b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (lab_l + 16.0) / 116.0
    fx = lab_a / 500.0 + fy
    fz = fy - lab_b / 200.0
    f = jnp.stack([fx, fy, fz], axis=-1)
    xyz = jnp.where(f > 0.2068966, f ** 3, (f - 16.0 / 116.0) / 7.787)
    return xyz_to_rgb(xyz * _WHITE)


# --- dataset-normalized forms (dataset.py:136-159) ---------------------------

def rgb_to_lab_norm(rgb):
    """RGB [0,1] -> normalized LAB: L/100, (ab+128)/255 — all in [0,1]."""
    lab = rgb_to_lab(rgb)
    return jnp.stack([lab[..., 0] / 100.0,
                      (lab[..., 1] + 128.0) / 255.0,
                      (lab[..., 2] + 128.0) / 255.0], axis=-1)


def lab_norm_to_rgb(lab_n):
    """Normalized LAB -> RGB [0,1] (dataset.py:94-104 de-normalization)."""
    lab = jnp.stack([lab_n[..., 0] * 100.0,
                     lab_n[..., 1] * 255.0 - 128.0,
                     lab_n[..., 2] * 255.0 - 128.0], axis=-1)
    return lab_to_rgb(lab)


def rgb_to_ab_norm(rgb):
    """RGB [0,1] -> normalized ab channels only (dataset.py:136-146)."""
    return rgb_to_lab_norm(rgb)[..., 1:]
