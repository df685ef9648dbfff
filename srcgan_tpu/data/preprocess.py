"""On-device fused preprocessing (the TPU answer to dataset.py:114-159).

uint8 batches come over PCIe/ICI; everything numeric happens on device inside
jit so XLA fuses normalize + colourspace + degradation into the step graph:

  - convert_pair: uint8 RGB (src, tar) -> (gray src, RGB|LAB tar) float32
  - degrade_*: the training/eval degradation replays (luma + down/up-sampling)
    from trainCas.py:85-92, trainCasConst.py:89-92 and testCas.py:71-77.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from srcgan_tpu import ops


@partial(jax.jit, static_argnames=("ver",))
def convert_pair(src_u8, tar_u8, ver: str = "G2RGB"):
    """uint8 NHWC RGB pair -> float32 (src 1ch, tar 3ch) per dataset version.

    src: skimage-style rgb2gray on /255 floats (dataset.py:114-123).
    tar: /255 RGB (G2RGB, dataset.py:125-134) or normalized LAB (G2LAB,
    dataset.py:148-159).
    """
    src = src_u8.astype(jnp.float32) / 255.0
    tar = tar_u8.astype(jnp.float32) / 255.0
    src_gray = ops.rgb_to_gray(src)
    if ver == "G2LAB":
        tar = ops.rgb_to_lab_norm(tar)
    return src_gray, tar


def luma(rgb):
    """Y = 0.2125 R + 0.7154 G + 0.0721 B (trainCas.py:85-87)."""
    return ops.rgb_to_gray(rgb)


def degrade_bilinear(x, up: int):
    """Training degradation: bilinear downsample by 1/up (trainCas.py:89-90)."""
    return ops.interpolate(x, scale_factor=1.0 / up, mode="bilinear")


def degrade_const(x, up: int):
    """Const-pipeline degradation: down then up bilinear at same size
    (trainCasConst.py:89-92)."""
    lo = ops.interpolate(x, scale_factor=1.0 / up, mode="bilinear")
    return ops.interpolate(lo, scale_factor=float(up), mode="bilinear")


def degrade_nearest(x, up: int):
    """Eval-time degradation replay — the reference's testCas.py:75-77 uses
    F.interpolate's *default* (nearest) mode, unlike training."""
    return ops.interpolate(x, scale_factor=1.0 / up, mode="nearest")


def degrade_const_nearest(x, up: int):
    """testCasConst.py:75-78: nearest down then nearest up, same size."""
    lo = ops.interpolate(x, scale_factor=1.0 / up, mode="nearest")
    return ops.interpolate(lo, scale_factor=float(up), mode="nearest")


def device_put_iter(it, sharding=None):
    """Prefetch host batches onto device (optionally sharded) one step ahead."""
    prev = None
    for batch in it:
        nxt = jax.device_put(batch, sharding) if sharding is not None else (
            jax.device_put(batch))
        if prev is not None:
            yield prev
        prev = nxt
    if prev is not None:
        yield prev
