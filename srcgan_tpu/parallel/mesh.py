"""Device mesh construction and sharding helpers.

The reference is strictly single-device (SURVEY.md §2.9: one cuda:0, no
DDP/NCCL anywhere).  The TPU framework makes parallelism first-class instead:

  - 'data'  axis: batch sharding; gradients are psum'd over ICI (parallel.dp).
  - 'space' axis: spatial sharding of image H for tiles larger than one chip's
    HBM — the image-domain analog of sequence parallelism.  XLA GSPMD inserts
    the conv halo exchanges automatically when H carries a sharding.

All helpers work identically on a real TPU slice and on the CPU fake backend
(xla_force_host_platform_device_count) used by tests and the driver's
multichip dry-run.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("data",),
              devices=None) -> Mesh:
    """Build a Mesh.  Default: all devices on a 1-D 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard an NHWC batch along N."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    """Shard an NHWC image along H (halo exchange handled by GSPMD)."""
    return NamedSharding(mesh, P(None, axis))


def put_replicated(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def put_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard array leaves along their leading (batch) dim."""
    return jax.device_put(tree, batch_sharding(mesh, axis))


def pad_batch_to(batch: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad the leading dim up to a multiple (edge-repeat); returns (padded, n_real).

    Needed because batch dims must divide the 'data' axis size.
    """
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n
