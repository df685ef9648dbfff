"""Normalization ops (NHWC) with torch-parity semantics and eps values.

The reference zoo selects BN/IN/GN per model (resdeconv.py:59-75); GroupNorm(32, C)
is the default everywhere that matters (edsr.py:45, resdeconv BN='GN').
"""
from __future__ import annotations

import jax.numpy as jnp


def group_norm(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over NHWC, matching torch.nn.GroupNorm (eps=1e-5, affine).

    Stats are computed in fp32 regardless of input dtype for stability on TPU.
    """
    n, h, w, c = x.shape
    g = num_groups
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    return (xf * scale + bias).astype(x.dtype)


def instance_norm(x, scale=None, bias=None, eps: float = 1e-5):
    """InstanceNorm2d matching torch defaults (affine=False, no running stats)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    if scale is not None:
        y = y * scale + bias
    return y.astype(x.dtype)


def batch_norm(x, scale, bias, running_mean, running_var, *, train: bool,
               momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm2d matching torch semantics.

    train=True: normalize with batch stats over (N,H,W) and return exponentially
    updated running stats (torch uses *unbiased* variance for the running update
    but biased variance for normalization).  train=False: use running stats.

    Returns (y, new_running_mean, new_running_var).
    """
    xf = x.astype(jnp.float32)
    if train:
        mean = xf.mean(axis=(0, 1, 2))
        var = xf.var(axis=(0, 1, 2))
        count = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * count / max(count - 1, 1)
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    y = (xf - mean) / jnp.sqrt(var + eps) * scale + bias
    return y.astype(x.dtype), new_mean, new_var
