"""Global numerics configuration.

On TPU, XLA's default convolution/matmul precision feeds the MXU with bfloat16
operands.  That is the right choice for training throughput, but bit-close parity
with the fp32 torch reference (PSNR within 0.1 dB — BASELINE.md) needs full fp32.

``conv_precision`` therefore defaults to ``"highest"`` (fp32 accumulation via
multi-pass on the MXU); performance-critical paths (bench, bf16 training mode)
switch to ``"default"`` explicitly via ``set_conv_precision`` or the
``matmul_precision`` context manager.
"""
from __future__ import annotations

import contextlib

from jax import lax

_PRECISION = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}

conv_precision: lax.Precision = lax.Precision.HIGHEST


def set_conv_precision(name: str) -> None:
    global conv_precision
    conv_precision = _PRECISION[name]


def get_conv_precision() -> lax.Precision:
    return conv_precision


@contextlib.contextmanager
def matmul_precision(name: str):
    global conv_precision
    old = conv_precision
    conv_precision = _PRECISION[name]
    try:
        yield
    finally:
        conv_precision = old


def enable_compilation_cache(path: str = None) -> str:
    """Enable JAX's persistent compilation cache (works through the axon
    remote-compile relay: measured 4.0 s -> 0.2 s warm-start for a small
    model).  CLI drivers and bench call this at startup."""
    import os

    import jax

    path = path or os.environ.get(
        "SRCGAN_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "srcgan_tpu", "jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
