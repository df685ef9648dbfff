"""Image resizing with exact PyTorch ``F.interpolate`` semantics, as matmuls.

The reference's degradation pipeline is built on ``F.interpolate``:
  - training: bilinear, align_corners=False (trainCas.py:89-90, train.py:243)
  - eval:     nearest (the F.interpolate default; testCas.py:75-77)
PSNR/SSIM parity with the torch reference hinges on reproducing both bit-close
(SURVEY.md §7 "hard parts").

TPU-first design: because shapes are static under jit, each separable 1-D resample
is materialized as a small dense (out x in) sampling matrix at trace time and
applied as an einsum over H then W.  XLA maps these onto the MXU, which is far
faster than gather-based resampling on TPU and fuses with neighbouring elementwise
work.
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=256)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) sampling matrix for torch bilinear, align_corners=False.

    src = (dst + 0.5) * (in/out) - 0.5, clamped; two-tap linear weights.
    Matches torch's non-antialiased path (antialias=False) for both up and down
    scaling.
    """
    scale = in_size / out_size
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for d in range(out_size):
        src = (d + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1.0)
        lo = int(math.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[d, lo] += 1.0 - frac
        m[d, hi] += frac
    return m.astype(np.float32)


@lru_cache(maxsize=256)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) 0/1 matrix for torch mode='nearest': src = floor(dst * in/out)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for d in range(out_size):
        src = min(int(d * in_size / out_size), in_size - 1)
        m[d, src] = 1.0
    return m


def _apply_separable(x, mh: np.ndarray, mw: np.ndarray):
    """x: (N, H, W, C); mh: (H', H); mw: (W', W) -> (N, H', W', C)."""
    dt = x.dtype
    mh_ = jnp.asarray(mh, dtype=jnp.float32)
    mw_ = jnp.asarray(mw, dtype=jnp.float32)
    y = jnp.einsum("nhwc,oh->nowc", x.astype(jnp.float32), mh_)
    y = jnp.einsum("nhwc,ow->nhoc", y, mw_)
    return y.astype(dt)


def _out_size(in_size: int, scale) -> int:
    # torch: output size = floor(input * scale_factor)
    return int(math.floor(in_size * scale))


def resize_bilinear(x, out_hw):
    """Bilinear resize (align_corners=False, antialias=False) to (H', W')."""
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    return _apply_separable(x, _bilinear_matrix(h, oh), _bilinear_matrix(w, ow))


def resize_nearest(x, out_hw):
    """Nearest resize matching torch F.interpolate(mode='nearest')."""
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    return _apply_separable(x, _nearest_matrix(h, oh), _nearest_matrix(w, ow))


def interpolate(x, scale_factor=None, size=None, mode: str = "nearest"):
    """Drop-in equivalent of torch.nn.functional.interpolate (NHWC).

    Supports the two modes the reference uses; align_corners is always False
    (bilinear) which is torch's default.
    """
    _, h, w, _ = x.shape
    if size is not None:
        oh, ow = size
    else:
        oh, ow = _out_size(h, scale_factor), _out_size(w, scale_factor)
    if mode == "bilinear":
        return resize_bilinear(x, (oh, ow))
    if mode == "nearest":
        return resize_nearest(x, (oh, ow))
    raise ValueError(f"unsupported mode {mode!r}")
