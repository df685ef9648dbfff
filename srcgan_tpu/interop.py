"""PyTorch checkpoint interop: load reference .pth state_dicts into our models.

A user of the reference framework can bring their trained ``torch.save(
net.state_dict())`` checkpoints (trainCas.py:221-225 naming) straight into the
TPU framework:

    model = models.create("RDDBNet", 1, 1, 2)
    params, state = interop.import_torch_state_dict(model, "RDDBNet_A2C_x2_0050.pth")

Mechanism: torch state_dicts preserve module-registration order, and every
model in this zoo was constructed so that our params-pytree insertion order
matches it (verified leaf-by-leaf by the parity test suite).  Tensors are
consumed in order with layout conversion per leaf kind:
  Conv2d           OIHW -> HWIO
  ConvTranspose2d  (in,out,kh,kw) -> HWIO
  Group/BatchNorm  weight/bias -> scale/bias; BN running stats -> model state
  PReLU            weight -> alpha
  MeanShift        frozen constants -> skipped (2 tensors consumed)
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from srcgan_tpu import nn


def _load_state_dict(path_or_dict):
    if isinstance(path_or_dict, (dict,)):
        items = list(path_or_dict.items())
    else:
        import torch

        sd = torch.load(path_or_dict, map_location="cpu", weights_only=True)
        items = list(sd.items())
    out = []
    for k, v in items:
        if k.endswith("num_batches_tracked"):
            continue
        out.append((k, np.asarray(v.numpy() if hasattr(v, "numpy") else v)))
    return out


def _slots_in_order(params) -> List[Tuple[dict, str]]:
    slots = []

    def walk(d):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v)
            else:
                slots.append((d, k))

    walk(params)
    return slots


def _state_slots_in_order(state) -> List[Tuple[dict, str]]:
    return _slots_in_order(state)


def import_torch_state_dict(model: nn.Module, path_or_dict, key=None
                            ) -> Tuple[Any, Any]:
    """Returns (params, model_state) with tensors from the torch checkpoint."""
    import jax

    params = model.init(key if key is not None else jax.random.PRNGKey(0))
    state = model.init_state()
    tensors = _load_state_dict(path_or_dict)
    ti = 0

    def take(expect_suffix: str):
        nonlocal ti
        if ti >= len(tensors):
            raise ValueError("torch checkpoint has fewer tensors than the model")
        k, v = tensors[ti]
        if not k.endswith(expect_suffix):
            raise ValueError(f"expected a '{expect_suffix}' tensor at position "
                             f"{ti}, found {k!r}")
        ti += 1
        return v

    pslots = _slots_in_order(params)
    sslots = _state_slots_in_order(state)
    pi, si = 0, 0

    def put_param(arr):
        nonlocal pi
        d, k = pslots[pi]
        if d[k].shape != arr.shape:
            raise ValueError(f"shape mismatch at slot {pi} ({k}): "
                             f"{d[k].shape} vs {arr.shape}")
        d[k] = jnp.asarray(arr)
        pi += 1

    def put_state(arr):
        nonlocal si
        d, k = sslots[si]
        d[k] = jnp.asarray(arr)
        si += 1

    from srcgan_tpu.models.edsr_zoo import MeanShift, PReLU

    for leaf in nn.iter_leaf_modules(model):
        if isinstance(leaf, MeanShift):
            take("weight")
            take("bias")
        elif isinstance(leaf, nn.Conv2d):
            put_param(take("weight").transpose(2, 3, 1, 0))
            if leaf.use_bias:
                put_param(take("bias"))
        elif isinstance(leaf, nn.ConvTranspose2d):
            put_param(take("weight").transpose(2, 3, 0, 1))
            if leaf.use_bias:
                put_param(take("bias"))
        elif isinstance(leaf, nn.GroupNorm):
            put_param(take("weight"))
            put_param(take("bias"))
        elif isinstance(leaf, nn.BatchNorm2d):
            put_param(take("weight"))
            put_param(take("bias"))
            put_state(take("running_mean"))
            put_state(take("running_var"))
        elif isinstance(leaf, nn.InstanceNorm2d):
            if leaf.affine:
                put_param(take("weight"))
                put_param(take("bias"))
        elif isinstance(leaf, PReLU):
            put_param(take("weight"))
        else:
            raise TypeError(f"unhandled leaf module {type(leaf).__name__}")

    if ti != len(tensors):
        raise ValueError(f"torch checkpoint has {len(tensors) - ti} unconsumed "
                         f"tensors (first: {tensors[ti][0]!r})")
    if pi != len(pslots):
        raise ValueError(f"{len(pslots) - pi} model params were not filled")
    return params, state


def _paths_in_order(params, prefix=""):
    out = []
    for k, v in params.items():
        if isinstance(v, dict):
            out.extend(_paths_in_order(v, f"{prefix}{k}."))
        else:
            out.append((f"{prefix}{k}", params, k))
    return out


# our params-tree path components -> reference torch module names, where they
# differ (most names were chosen to match already).
_TORCH_NAME_MAP = {
    "trunk": "RRDB_trunk",          # RDDBNet (rddb.py:90)
    "upscale": "upscale_layers",    # RDDBNet (rddb.py:97)
    "encoder": "RRDB_encoder",      # SRDN (srdn.py:59)
    "decoder": "RRDB_decoder",      # SRDN (srdn.py:61)
    "down_conv": "downsample.0",    # ResDeconv BasicBlock (resdeconv.py:158)
    "down_bn": "downsample.1",
    "w": "weight",
    "b": "bias",
    "scale": "weight",              # norm affine
}


def export_torch_state_dict(model: nn.Module, params, state=None
                            ) -> Dict[str, np.ndarray]:
    """Inverse of import: our params -> a REAL reference state_dict.

    Keys follow the torch reference's module names (verified loadable with
    strict=True for the exported zoo); tensors are converted back to torch
    layouts (conv OIHW, deconv IOHW).  BatchNorm running stats come from
    ``state`` when given.
    """
    import jax

    # JAX pytree ops (tree_map, grad, device_get) return dicts in SORTED key
    # order; the ordered walk below needs CONSTRUCTION order.  Reorder the
    # incoming trees against a freshly-initialized template.
    def _reorder(like, d):
        return {k: (_reorder(v, d[k]) if isinstance(v, dict) else d[k])
                for k, v in like.items()}

    params = _reorder(model.init(jax.random.PRNGKey(0)), params)
    if state:
        state = _reorder(model.init_state(), state)

    out: Dict[str, np.ndarray] = {}
    paths = _paths_in_order(params)
    state_paths = _paths_in_order(state) if state else []
    pi, si = 0, 0

    def grab():
        nonlocal pi
        path, d, k = paths[pi]
        pi += 1
        return path, np.asarray(d[k])

    def grab_state():
        nonlocal si
        path, d, k = state_paths[si]
        si += 1
        return path, np.asarray(d[k])

    def to_torch(path: str) -> str:
        return ".".join(_TORCH_NAME_MAP.get(part, part)
                        for part in path.split("."))

    for leaf in nn.iter_leaf_modules(model):
        from srcgan_tpu.models.edsr_zoo import MeanShift, PReLU

        if isinstance(leaf, MeanShift):
            # Frozen constants in the reference, but its state_dict still
            # carries them — synthesize the 1x1 conv weight/bias so torch
            # strict=True loads work.  Modules constructed without an
            # export_name (none in the zoo) are skipped.
            if getattr(leaf, "export_name", None):
                scale = np.asarray(leaf.scale, np.float32)
                shift = np.asarray(leaf.shift, np.float32)
                out[f"{leaf.export_name}.weight"] = (
                    np.diag(scale)[:, :, None, None].astype(np.float32))
                out[f"{leaf.export_name}.bias"] = shift
            continue
        if isinstance(leaf, nn.Conv2d):
            path, w = grab()
            out[to_torch(path)] = w.transpose(3, 2, 0, 1)
            if leaf.use_bias:
                path, b = grab()
                out[to_torch(path)] = b
        elif isinstance(leaf, nn.ConvTranspose2d):
            path, w = grab()
            out[to_torch(path)] = w.transpose(2, 3, 0, 1)
            if leaf.use_bias:
                path, b = grab()
                out[to_torch(path)] = b
        elif isinstance(leaf, (nn.GroupNorm, nn.BatchNorm2d)):
            for _ in range(2):
                path, v = grab()
                out[to_torch(path)] = v
            if isinstance(leaf, nn.BatchNorm2d) and state_paths:
                for stat in ("running_mean", "running_var"):
                    path, v = grab_state()
                    base = to_torch(path).rsplit(".", 1)[0]
                    out[f"{base}.{stat}"] = v
        elif isinstance(leaf, nn.InstanceNorm2d):
            if leaf.affine:
                for _ in range(2):
                    path, v = grab()
                    out[to_torch(path)] = v
        elif isinstance(leaf, PReLU):
            path, v = grab()
            out[to_torch(path).replace(".alpha", ".weight")] = v
        else:
            raise TypeError(f"unhandled leaf module {type(leaf).__name__}")
    return out


def load_params_any(model: nn.Module, path: str, key=None):
    """Load .npz (ours) or .pth (reference) into (params, model_state)."""
    if path.endswith(".pth"):
        return import_torch_state_dict(model, path, key=key)
    import jax

    from srcgan_tpu.train.state import load_params

    like = model.init(key if key is not None else jax.random.PRNGKey(0))
    return load_params(path, like=like), model.init_state()
