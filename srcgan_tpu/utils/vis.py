"""Image IO and visualization helpers (utils.py / visCas.py equivalents)."""
from __future__ import annotations

import numpy as np


def save_png(path: str, arr: np.ndarray) -> None:
    """uint8 HWC (or HW) array -> PNG (native libpng encoder when built,
    PIL otherwise)."""
    from srcgan_tpu.data import native

    if arr.dtype == np.uint8 and (arr.ndim == 2 or arr.shape[-1] in (1, 3)):
        try:
            native.encode(path, arr)
            return
        except RuntimeError:
            pass
    from PIL import Image

    Image.fromarray(arr).save(path)


def save_png_batch(paths, imgs) -> None:
    """Write a list/stack of same-shaped uint8 HWC images to one PNG each.
    Uses the C++ thread fan-out encoder (data/_native/loader.cc) — zlib
    compression is the host bottleneck of a batched eval pass — with a
    sequential PIL fallback."""
    from srcgan_tpu.data import native

    arr = np.asarray(imgs)
    if arr.ndim == 3:
        arr = arr[..., None]
    # Same gate as save_png: the native encoder hands the raw buffer to
    # libpng as unsigned char*, so a non-uint8 / odd-channel array would
    # silently write corrupt PNGs instead of erroring.
    if arr.dtype == np.uint8 and arr.shape[-1] in (1, 3):
        try:
            native.encode_batch(list(paths), arr)
            return
        except RuntimeError:
            pass
    for p, img in zip(paths, imgs):
        save_png(p, np.asarray(img))


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
