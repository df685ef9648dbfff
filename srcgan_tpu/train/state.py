"""Train state + checkpointing.

The reference saves bare ``state_dict`` weights with a config-in-filename
convention ``<Model>[@G2LAB]_<A2C|C2B>_x<up>_<epoch%04d>.pth`` and re-derives the
architecture by parsing the name (trainCas.py:221-225, testCas.py:41-53).  We
keep the exact naming convention for workflow parity but save REAL train-state
checkpoints (params + optimizer state + step + RNG key), enabling mid-training
resume — which the reference cannot do (SURVEY.md §5.4).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Any  # int32 scalar (device)


# ---------------------------------------------------------------------------
# (de)serialization: pytree <-> npz with path-encoded keys
# ---------------------------------------------------------------------------

def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_params(path: str, params) -> None:
    """Save a parameter pytree (nested dicts of arrays) as .npz.

    Atomic: writes to a temp file in the same directory and os.replace()s
    it over ``path``, so concurrent readers (cli.serve --watch polling for
    new epochs, eval jobs on a shared filesystem) never see a partial file,
    and a SIGKILL mid-save never corrupts the previous checkpoint."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **_flatten(params))
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_params(path: str, like=None):
    """Load a .npz back into nested dicts; if ``like`` is given, validate the
    tree structure and restore leaf dtypes/ordering from it."""
    raw = np.load(path)
    tree: Dict[str, Any] = {}
    for key in raw.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = raw[key]
    if like is not None:
        flat_like = _flatten(like)
        flat_got = _flatten(tree)
        missing = set(flat_like) - set(flat_got)
        extra = set(flat_got) - set(flat_like)
        if missing or extra:
            raise ValueError(f"checkpoint mismatch: missing={sorted(missing)[:5]} "
                             f"extra={sorted(extra)[:5]}")
    return jax.tree_util.tree_map(lambda x: x, tree)


# ---------------------------------------------------------------------------
# reference checkpoint naming convention
# ---------------------------------------------------------------------------

_NAME_RE = re.compile(
    r"^(?P<model>[A-Za-z0-9]+)(?:@(?P<ver>G2LAB))?_(?P<role>A2C|C2B)"
    r"_x(?P<up>\d+)_(?P<epoch>\d{4})$")


def checkpoint_name(model: str, role: str, up: int, epoch: int,
                    ver: Optional[str] = None, ext: str = "npz") -> str:
    """'<Model>[@G2LAB]_<role>_x<up>_<epoch%04d>.<ext>' (trainCas.py:221-225)."""
    tag = f"{model}@{ver}" if ver == "G2LAB" else model
    return f"{tag}_{role}_x{up}_{epoch:04d}.{ext}"


def parse_checkpoint_name(path: str) -> Dict[str, Any]:
    """Inverse of checkpoint_name (testCas.py:41-53 / testCasLAB.py:63-67)."""
    base = os.path.basename(path)
    stem = base.rsplit(".", 1)[0]
    m = _NAME_RE.match(stem)
    if not m:
        raise ValueError(f"unrecognized checkpoint name: {base}")
    d = m.groupdict()
    return {"model": d["model"], "ver": d["ver"] or "G2RGB",
            "role": d["role"], "up": int(d["up"]), "epoch": int(d["epoch"])}


def _is_namedtuple(x) -> bool:
    return isinstance(x, tuple) and hasattr(x, "_fields")


def _unflatten_like(like, raw, prefix=""):
    if isinstance(like, dict):
        return {k: _unflatten_like(v, raw, f"{prefix}{k}/")
                for k, v in like.items()}
    if _is_namedtuple(like):
        return type(like)(*[_unflatten_like(v, raw, f"{prefix}{i}/")
                            for i, v in enumerate(like)])
    if isinstance(like, (list, tuple)):
        vals = [_unflatten_like(v, raw, f"{prefix}{i}/")
                for i, v in enumerate(like)]
        return type(like)(vals) if isinstance(like, list) else tuple(vals)
    if like is None:
        return None
    key = prefix.rstrip("/")
    arr = raw[key]
    return jnp.asarray(arr) if hasattr(like, "dtype") else type(like)(arr)


def save_train_state(path: str, state, extra: Optional[Dict[str, Any]] = None
                     ) -> None:
    """Save a FULL train state (params + optimizer moments + step + model
    state) for mid-training resume — a capability the reference lacks
    (SURVEY.md §5.4: weights-only saves, no optimizer state, no resume).

    ``extra`` holds scalar metadata (e.g. {'epoch': 7}).
    """
    flat = _flatten(state)
    for k, v in (extra or {}).items():
        flat[f"__extra__/{k}"] = np.asarray(v)
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # atomic for the same reasons as save_params: casstate_latest.npz is
    # overwritten every epoch AND on SIGTERM — a crash mid-write must not
    # destroy the only resume point
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_train_state(path: str, like) -> Tuple[Any, Dict[str, Any]]:
    """Restore a train state saved by save_train_state.  ``like`` provides the
    pytree structure (e.g. trainer.init(key)).  Returns (state, extra)."""
    raw = dict(np.load(path))
    extra = {k.split("/", 1)[1]: raw.pop(k).item()
             for k in list(raw) if k.startswith("__extra__/")}
    return _unflatten_like(like, raw), extra
