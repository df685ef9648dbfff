"""Image IO and visualization helpers (utils.py / visCas.py equivalents)."""
from __future__ import annotations

import numpy as np


def save_png(path: str, arr: np.ndarray) -> None:
    """uint8 HWC (or HW) array -> PNG."""
    from PIL import Image

    Image.fromarray(arr).save(path)


def whitespace(img: np.ndarray, width: int = 5) -> np.ndarray:
    """5-px white border around an HWC uint8 image (dataset.py:59-67)."""
    h, w, c = img.shape
    out = np.full((h + 2 * width, w + 2 * width, c), 255, np.uint8)
    out[width:h + width, width:w + width] = img
    return out


def add_barrier(img: np.ndarray, width: int = 2, color: int = 0) -> np.ndarray:
    """Black/white framing (visCas.py:40-70)."""
    h, w, c = img.shape
    out = np.full((h + 2 * width, w + 2 * width, c), color, np.uint8)
    out[width:h + width, width:w + width] = img
    return out


def tensor2img(x, mode: str = "RGB", dsize=(256, 256)) -> np.ndarray:
    """First sample of an NHWC float batch -> uint8 HWC RGB at dsize
    (utils.py:15-29: LAB tensors are de-normalized + converted)."""
    from PIL import Image

    a = np.asarray(x[0], dtype=np.float32)
    if mode == "LAB":
        import jax.numpy as jnp
        from srcgan_tpu import ops

        a = np.asarray(ops.lab_norm_to_rgb(jnp.asarray(a[None]))[0])
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    img = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    if img.shape[:2] != dsize:
        img = np.asarray(Image.fromarray(img).resize(dsize[::-1], Image.BILINEAR))
    return img


def patch2vis(*imgs: np.ndarray) -> np.ndarray:
    """Horizontal concat of framed patches (visCas.py:73-80)."""
    return np.concatenate([add_barrier(im) for im in imgs], axis=1)


def tensor2image_u8(x) -> np.ndarray:
    """testCas.py:26-31: float NHWC -> uint8 HWC (squeezing 1-channel)."""
    a = np.asarray(x[0], dtype=np.float32) * 255.0
    a = a.astype(np.uint8)
    if a.shape[-1] == 1:
        a = a[..., 0]
    return a
