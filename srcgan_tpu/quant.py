"""Post-training int8 quantization for the inference cascade.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate at this zoo's
channel widths (measured ~325 TOPS at 64ch vs ~150 bf16 — docs/ROADMAP.md
probe), so serving throughput roughly doubles where convs dominate.

Scheme: symmetric int8.
  - weights: per-output-channel scales, computed in-graph from the fp32
    params (max|w| / 127 over kh,kw,cin) — exact, no stored quantized copy;
  - activations: per-callsite scales from a calibration pass (absmax over
    calibration batches), applied as static constants.

Mechanism: ``ops.conv2d`` becomes a dispatch point.  All hot convs route
through it — nn.Conv2d, the RDB5 paired/grouped schedules (models/blocks.py),
and the phase-folded upsample tail (ops/fused.py), which also converts the
tail deconvs into 1x1/grouped convs so they quantize for free.  A scoped
QuantContext switches it between three modes:

  calibrate  — run eagerly (jax.disable_jit), record each callsite's input
               absmax, keyed by call order (deterministic: one trace order ==
               one eager order for the same Python code path);
  int8       — quantize input with the calibrated scale, weights per-channel,
               conv in int8 (preferred_element_type=int32), dequantize, bias;
  off        — the regular fp32/bf16 path.

Convs with tiny channel counts (first/last layers) stay fp32: no MXU win,
disproportionate accuracy cost.  Reference being served: the testCas.py:71-88
inference cascade.
"""
from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from srcgan_tpu import ops as _ops
from srcgan_tpu.ops import conv as _conv

# channels below which a conv is left in float (Cin*Cout gate)
MIN_QUANT_CH = 16


class QuantContext(threading.local):
    def __init__(self):
        self.mode: Optional[str] = None      # None | "calibrate" | "int8"
        self.scales: Dict[int, float] = {}   # callsite index -> input absmax
        self.idx: int = 0


_CTX = QuantContext()
_REAL_CONV2D = _conv.conv2d


def is_calibrating() -> bool:
    """True inside a quant_mode('calibrate') block (this thread).  RRDB
    consults this to skip jax.checkpoint during calibration: checkpoint
    traces its body even under disable_jit, which would hand the eager
    absmax recorders tracers (remat is value-neutral, so skipping is safe)."""
    return _CTX.mode == "calibrate"


def _quantizable(x, w, groups):
    return (w.shape[2] >= MIN_QUANT_CH and w.shape[3] >= MIN_QUANT_CH
            and groups == 1)


def _conv2d_dispatch(x, w, b=None, stride=1, padding=0, dilation=1,
                     groups: int = 1, **kw):
    ctx = _CTX
    if ctx.mode is None or not _quantizable(x, w, groups):
        return _REAL_CONV2D(x, w, b, stride, padding, dilation, groups, **kw)
    i = ctx.idx
    ctx.idx += 1
    if ctx.mode == "calibrate":
        # PER-INPUT-CHANNEL absmax: dense-chain convs see concatenated
        # sources with wildly different ranges; per-tensor scales cost ~10
        # uint8 LSBs of cascade output error, per-channel ~0.5.
        amax = np.asarray(jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1))),
                          np.float32)
        prev = ctx.scales.get(i)
        ctx.scales[i] = amax if prev is None else np.maximum(prev, amax)
        return _REAL_CONV2D(x, w, b, stride, padding, dilation, groups, **kw)
    # int8 inference
    amax = ctx.scales.get(i)
    if amax is None:
        raise RuntimeError(
            f"int8 conv callsite {i} has no calibration scale — call "
            f"calibrate() with representative inputs first")
    s_x = jnp.asarray(np.maximum(amax, 1e-8) / 127.0)          # (Cin,)
    # fold the per-channel input scale into the weight: sum_c x[c] w[c,o]
    # = sum_c x_q[c] * (s_x[c] w[c,o]); then per-Cout weight scales.
    w_eff = w.astype(jnp.float32) * s_x.reshape(1, 1, -1, 1)
    s_w = jnp.max(jnp.abs(w_eff), axis=(0, 1, 2), keepdims=True) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127
                   ).astype(jnp.int8)
    w_q = jnp.clip(jnp.round(w_eff / s_w), -127, 127).astype(jnp.int8)
    sh, sw_ = _conv._pair(stride)
    ph, pw = _conv._pair(padding)
    dh, dw = _conv._pair(dilation)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(sh, sw_), padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s_w.reshape(1, 1, 1, -1)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


# -- fused RDB5 kernel dispatch ----------------------------------------------
#
# The per-conv int8 path above is accuracy-correct but slower than bf16 on
# XLA (docs/PERF.md).  For RDB5 blocks (the trunk's dominant FLOPs) the
# Pallas kernel ops/pallas/rdb5_kernel.py runs the whole block in VMEM.  A
# block-level dispatch replaces the block's five per-conv callsites with ONE
# callsite whose calibration record is the per-channel absmax of the full
# dense concat [x, x1..x4] (the same values conv5's input would record).
# The gate below depends only on shapes/platform so the calibrate and int8
# passes consume callsite indices identically.

PALLAS_RDB5 = True          # master switch for the fused serving kernel
FORCE_PALLAS_RDB5 = False   # tests: run the kernel interpreted off-TPU


def _rdb5_kernel_ok(x_shape, nf: int, gc: int) -> bool:
    from srcgan_tpu.ops.pallas import rdb5_kernel

    if not rdb5_kernel.supported(x_shape, nf, gc):
        return False
    if FORCE_PALLAS_RDB5:
        return True
    return PALLAS_RDB5 and jax.default_backend() == "tpu"


def rdb5_dispatch(block, p, x, train: bool):
    """Hook called from ResidualDenseBlock5.forward.  Returns the block's
    output when the quantized fused path handles it, else None (caller runs
    the regular schedule)."""
    ctx = _CTX
    if ctx.mode is None or train:
        return None
    if not _rdb5_kernel_ok(x.shape, block.nf, block.gc):
        return None
    from srcgan_tpu.ops.pallas import rdb5_kernel

    i = ctx.idx
    ctx.idx += 1
    if ctx.mode == "calibrate":
        # run the naive schedule with quantization off, record the concat's
        # per-channel absmax under this block's single callsite
        mode, ctx.mode = ctx.mode, None
        try:
            y, cat = block.forward_with_sources(p, x)
        finally:
            ctx.mode = mode
        amax = np.asarray(jnp.max(jnp.abs(cat), axis=tuple(range(cat.ndim - 1))),
                          np.float32)
        prev = ctx.scales.get(i)
        ctx.scales[i] = amax if prev is None else np.maximum(prev, amax)
        return y
    amax = ctx.scales.get(i)
    if amax is None:
        raise RuntimeError(
            f"int8 RDB5 callsite {i} has no calibration scale — calibrate "
            f"with inputs of the same (kernel-supported) spatial shape first")
    interp = jax.default_backend() != "tpu"
    return rdb5_kernel.rdb5_int8_fused(x, p, jnp.asarray(amax),
                                       interpret=interp)


# Exactly one quant_mode block may be active in the process: the conv2d
# dispatch install/restore is a process-global patch, so a second concurrent
# block (another serve thread calibrating, a test racing the Batcher) would
# have whichever block exits FIRST restore the real conv2d under the other
# one mid-trace — remaining convs silently bypass the dispatch and callsite
# indices desync.  The failure used to be silent-wrong-numbers with the
# guard living in a cli/serve.py comment; now concurrent entry raises.
_ACTIVE = threading.Lock()
_ACTIVE_OWNER: Optional[str] = None


class quant_mode:
    """Context manager installing the conv2d dispatch in the given mode.

    Resets the callsite counter on entry, so one ``with`` block must cover
    exactly one forward trace (or one eager forward during calibration).
    Process-exclusive: entering while ANY thread (including this one —
    nesting breaks the callsite counter) holds a block raises RuntimeError.
    """

    def __init__(self, mode: str, scales: Dict[int, float]):
        self.mode, self.scales = mode, scales

    def __enter__(self):
        global _ACTIVE_OWNER
        if not _ACTIVE.acquire(blocking=False):
            raise RuntimeError(
                f"quant_mode is already active on thread "
                f"{_ACTIVE_OWNER!r} (this thread: "
                f"{threading.current_thread().name!r}).  The conv2d "
                f"dispatch is a process-global patch — a concurrent "
                f"quantized trace would desync callsite indices.  "
                f"Serialize calibrate/int8 traces (the serve daemon runs "
                f"them on its Batcher thread for this reason).")
        _ACTIVE_OWNER = threading.current_thread().name
        _CTX.mode, _CTX.scales, _CTX.idx = self.mode, self.scales, 0
        _conv.conv2d = _conv2d_dispatch
        _ops.conv2d = _conv2d_dispatch
        # (calibrate mode: RRDB.forward consults is_calibrating() and skips
        # its jax.checkpoint wrap itself — remat is instance-scoped now, no
        # global to neutralize here.)
        return _CTX

    def __exit__(self, *exc):
        global _ACTIVE_OWNER
        _CTX.mode = None
        _conv.conv2d = _REAL_CONV2D
        _ops.conv2d = _REAL_CONV2D
        _ACTIVE_OWNER = None
        _ACTIVE.release()
        return False


def calibrate_fn(fn, batches: List) -> Dict[int, float]:
    """Run ``fn(batch)`` eagerly over calibration batches, recording per-
    callsite input absmax.  Returns the scale table for quant_mode('int8')."""
    scales: Dict[int, float] = {}
    for batch in batches:
        with quant_mode("calibrate", scales):
            with jax.disable_jit():
                fn(batch)
    return scales
