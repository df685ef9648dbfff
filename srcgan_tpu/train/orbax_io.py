"""Orbax checkpointing backend: async, sharded, multi-host-safe saves.

The .npz path (train/state.py) gathers the whole state to one host and
writes synchronously — the right tool single-chip, and what the reference's
torch.save analog maps to (testCas.py:41-53 name-encoded weight files).  At
scale it is the wrong tool twice over: a GSPMD-sharded train state must be
device_get'd (all-gathered over ICI/DCN) into host-0 memory, and the step
loop stalls for the full serialize+write.

This module wraps orbax.checkpoint for the production path:
  - per-shard OCDBT writes: every host persists only the shards it owns,
    restore places shards according to the target's sharding annotations
    (no gather on save, no broadcast on load);
  - async: `save()` returns after snapshotting device buffers; the write
    happens on a background thread (`wait_until_finished()` to join, e.g.
    before exit or preemption);
  - atomic finalize + retention via CheckpointManager (step directories,
    `max_to_keep`).

Works identically on 1 CPU device and on an 8-device sharded mesh (tested
both ways in tests/test_orbax_io.py); on real multi-host TPU the same code
runs with `jax.distributed` initialized.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _manager(directory: str, max_to_keep: Optional[int] = None,
             async_save: bool = True):
    import orbax.checkpoint as ocp

    opts = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        enable_async_checkpointing=async_save,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=opts)


class OrbaxCheckpointer:
    """Step-indexed train-state checkpoints under one directory.

    >>> ck = OrbaxCheckpointer("ckpt", max_to_keep=3)
    >>> ck.save(epoch, state, {"epoch": epoch})   # returns immediately
    >>> state, extra = ck.restore(like=trainer.init(key))  # latest
    >>> ck.close()                                 # join pending writes
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 async_save: bool = True):
        self.directory = os.path.abspath(directory)
        self._mngr = _manager(directory, max_to_keep, async_save)

    def save(self, step: int, state: Any,
             extra: Optional[Dict[str, Any]] = None) -> None:
        import orbax.checkpoint as ocp

        self._mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                extra=ocp.args.JsonSave(dict(extra or {})),
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, like: Any, step: Optional[int] = None
                ) -> Tuple[Any, Dict[str, Any]]:
        """Restore ``step`` (default: latest) into ``like``'s structure.

        ``like`` supplies both the pytree structure and the target
        shardings: pass a state built under the current mesh (e.g.
        ``parallel.put_replicated(trainer.init(key), mesh)``) and the
        restored arrays land with those shardings — no host gather.
        """
        import orbax.checkpoint as ocp

        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no orbax checkpoints under {self.directory}")
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(like),
                extra=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], dict(restored["extra"] or {})

    def wait_until_finished(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_train_state_orbax(directory: str, step: int, state: Any,
                           extra: Optional[Dict[str, Any]] = None,
                           max_to_keep: Optional[int] = None) -> None:
    """One-shot synchronous convenience wrapper (blocks until durable)."""
    with OrbaxCheckpointer(directory, max_to_keep=max_to_keep,
                           async_save=False) as ck:
        ck.save(step, state, extra)


def load_train_state_orbax(directory: str, like: Any,
                           step: Optional[int] = None
                           ) -> Tuple[Any, Dict[str, Any]]:
    """One-shot convenience restore (latest step by default)."""
    with OrbaxCheckpointer(directory) as ck:
        return ck.restore(like, step)
