"""Weight initializers with PyTorch-parity fan computation.

The reference zoo initializes convs with ``nn.init.kaiming_normal_(w, mode='fan_out',
nonlinearity='relu')`` (see /root/reference/src/model/rddb.py:100-105) or leaves the
PyTorch default (kaiming_uniform with a=sqrt(5), e.g. srcnn.py).  Weights here are
stored HWIO (kh, kw, in_ch, out_ch) — the natural layout for XLA TPU convolutions —
so fan_in = kh*kw*in_ch and fan_out = kh*kw*out_ch.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_normal(key, shape, mode: str = "fan_out", nonlinearity: str = "relu",
                   a: float = 0.0, dtype=jnp.float32):
    """He-normal init. ``shape`` is HWIO for convs, (in, out) for dense."""
    if len(shape) == 4:
        kh, kw, cin, cout = shape
        fan_in, fan_out = kh * kw * cin, kh * kw * cout
    elif len(shape) == 2:
        fan_in, fan_out = shape
    else:
        raise ValueError(f"unsupported shape {shape}")
    fan = fan_out if mode == "fan_out" else fan_in
    if nonlinearity == "relu":
        gain = math.sqrt(2.0)
    elif nonlinearity == "leaky_relu":
        gain = math.sqrt(2.0 / (1 + a * a))
    elif nonlinearity == "linear":
        gain = 1.0
    else:
        raise ValueError(nonlinearity)
    std = gain / math.sqrt(fan)
    return std * jax.random.normal(key, shape, dtype)


def torch_conv_default(key, shape, dtype=jnp.float32):
    """PyTorch's default Conv2d weight init: kaiming_uniform(a=sqrt(5)).

    bound = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(1 / fan_in).
    """
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_default(key, shape, fan_in: int, dtype=jnp.float32):
    """PyTorch's default conv/linear bias init: uniform(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal(key, shape, std: float = 0.02, dtype=jnp.float32):
    """N(0, std) — the pix2pix/CycleGAN 'normal' init (basicModel.py:60-89)."""
    return std * jax.random.normal(key, shape, dtype)


def xavier_normal(key, shape, gain: float = 0.02, dtype=jnp.float32):
    if len(shape) == 4:
        kh, kw, cin, cout = shape
        fan_in, fan_out = kh * kw * cin, kh * kw * cout
    else:
        fan_in, fan_out = shape
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def orthogonal(key, shape, gain: float = 1.0, dtype=jnp.float32):
    flat = (int(jnp.prod(jnp.array(shape[:-1]))), shape[-1])
    return gain * jax.nn.initializers.orthogonal()(key, flat, dtype).reshape(shape)


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)
