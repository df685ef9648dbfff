"""Weight-space tooling: checkpoint averaging (SWA) and ESRGAN-style
network interpolation.

The reference's headline generator is the ESRGAN RRDB net
(/root/reference/src/model/rddb.py:85-114); the ESRGAN recipe's deployment
trick — *network interpolation*, `W = (1-alpha)·W_PSNR + alpha·W_GAN`
(Wang et al. 2018, §3.4) — blends a PSNR-trained and an adversarially-trained
generator to trade fidelity against perceptual sharpness WITHOUT retraining.
The reference ships no such tool (its checkpoints are write-only state_dicts,
trainCas.py:221-225); this module closes that gap, and generalizes it to
N-way weighted averaging (SWA over the last K epoch checkpoints, or over the
`--ema` shadow saves the trainers write).

Everything operates on parameter pytrees in this framework's canonical form
(nested dicts of arrays, torch registration order — interop.py), so inputs
may come from our .npz saves OR reference .pth state_dicts interchangeably:
blending a torch-trained PSNR model with a TPU-trained GAN generator is the
intended migration story.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _assert_same_structure(flats) -> None:
    keys0 = set(flats[0])
    for i, f in enumerate(flats[1:], start=1):
        if set(f) != keys0:
            missing = sorted(keys0 - set(f))[:3]
            extra = sorted(set(f) - keys0)[:3]
            raise ValueError(
                f"input {i} has a different parameter tree than input 0 "
                f"(missing={missing} extra={extra}) — blend inputs must be "
                "checkpoints of the SAME architecture")
        for k in keys0:
            if f[k].shape != flats[0][k].shape:
                raise ValueError(
                    f"input {i} leaf {k!r} has shape {f[k].shape} vs "
                    f"{flats[0][k].shape} in input 0")


def blend_params(trees: Sequence, weights: Optional[Sequence[float]] = None):
    """Weighted average of parameter pytrees with identical structure.

    Float leaves are accumulated in float64 and cast back to input 0's leaf
    dtype (a bf16/fp32 mix of checkpoints blends without precision loss
    beyond the output dtype).  Integer/bool leaves (e.g. step counters in a
    BatchNorm state tree) must be IDENTICAL across inputs and pass through.

    weights default to uniform (plain SWA mean); they are normalized to
    sum to 1, so `[1, 1, 2]` means "the last checkpoint counts double".
    """
    from srcgan_tpu.train.state import _flatten

    if not trees:
        raise ValueError("blend_params needs at least one input tree")
    if weights is None:
        weights = [1.0] * len(trees)
    if len(weights) != len(trees):
        raise ValueError(f"{len(weights)} weights for {len(trees)} inputs")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("blend weights must sum to a positive value")
    w = [float(x) / total for x in weights]

    flats = [_flatten(t) for t in trees]
    _assert_same_structure(flats)

    out = {}
    for key, leaf0 in flats[0].items():
        if np.issubdtype(leaf0.dtype, np.floating):
            acc = np.zeros(leaf0.shape, np.float64)
            for wi, f in zip(w, flats):
                acc += wi * f[key].astype(np.float64)
            out[key] = acc.astype(leaf0.dtype)
        else:
            for i, f in enumerate(flats[1:], start=1):
                if not np.array_equal(f[key], leaf0):
                    raise ValueError(
                        f"non-float leaf {key!r} differs between input 0 and "
                        f"input {i}; refusing to average a counter/index")
            out[key] = leaf0
    return _unflatten(out)


def interpolate_params(a, b, alpha: float):
    """ESRGAN network interpolation: `(1-alpha)·a + alpha·b` per leaf.

    With ``a`` the PSNR-oriented generator and ``b`` the GAN generator,
    alpha sweeps fidelity (0) -> perceptual sharpness (1) — Wang et al.
    2018 §3.4.  Output leaf dtypes follow ``a``.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    return blend_params([a, b], [1.0 - alpha, alpha])


def _unflatten(flat):
    """Inverse of train.state._flatten for nested-dict trees (list/tuple
    nodes flatten to integer-string keys and come back as dicts — the
    parameter trees this module handles are pure nested dicts, so this
    round-trips exactly for every model in the zoo)."""
    tree = {}
    for key in flat:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def load_checkpoint_model(path: str):
    """Load ONE generator checkpoint (.npz ours / .pth reference), building
    the model from the reference's name-encoded config (testCas.py:41-53
    convention) so torch state_dicts can be imported without the caller
    naming the architecture.

    Returns (model, params, model_state, info-dict from
    parse_checkpoint_name).
    """
    from srcgan_tpu import models
    from srcgan_tpu.interop import load_params_any
    from srcgan_tpu.train.state import parse_checkpoint_name

    info = parse_checkpoint_name(path)
    lab = info["ver"] == "G2LAB"
    if info["role"] == "A2C":
        model = models.create(info["model"], 1, 1, info["up"])
    else:
        model = models.create(info["model"], 1, 2 if lab else 3)
    params, mstate = load_params_any(model, path)
    return model, params, mstate, info


def load_checkpoint_params(path: str):
    """load_checkpoint_model, returning just (params, info)."""
    _, params, _, info = load_checkpoint_model(path)
    return params, info
