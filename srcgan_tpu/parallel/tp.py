"""Tensor (model) parallelism via GSPMD weight sharding.

The reference runs every net on one cuda:0 (SURVEY.md §2.9) and its
channel counts (nf=64, gc=32) fit any single chip, so TP is not a memory
necessity here — it is the framework recipe for models that outgrow a
chip: shard every conv kernel's output-channel dim (HWIO's O) over a
'model' mesh axis and let GSPMD propagate.  Each device then computes its
channel slice of every feature map and XLA inserts the all-gathers
exactly where a consumer needs full channels (residual adds, dense-block
concats, the final RGB conv) — no model code changes, the parallelism
lives entirely in parameter placement constraints.

``make_cas_tp_step`` composes this with batch sharding on a 2-D
(data x model) mesh: grads inherit the weight shardings, so the Adam
update itself runs channel-sharded (each device touches only its slice
of params AND moments — the compiler-derived cousin of the explicit
ZeRO-1 layout in `parallel.zero`), while the cross-data-axis gradient
psums are derived from the batch sharding.  Equivalence to the
single-device step is tested (tests/test_parallel.py::TestTensorParallel).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_shardings(tree, mesh: Mesh, axis: str = "model"):
    """Per-leaf NamedShardings: channel-shard what divides, replicate the rest.

    Rank >=2 leaves (conv kernels HWIO, deconv kernels) shard their LAST dim
    over ``axis``; rank-1 leaves (biases, norm scales — all per-channel
    vectors in this codebase) shard dim 0; anything not divisible by the
    axis size (e.g. a 3-channel output head) stays replicated.  Works on any
    pytree whose array leaves follow those conventions — params, grads, and
    optax moment trees alike (scalar counts fall through to replicated).
    """
    size = mesh.shape[axis]

    def spec(p):
        if p.ndim >= 2 and p.shape[-1] % size == 0 and p.shape[-1] >= size:
            return NamedSharding(mesh, P(*([None] * (p.ndim - 1) + [axis])))
        if p.ndim == 1 and p.shape[0] % size == 0 and p.shape[0] >= size:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def tp_shard_params(params, mesh: Mesh, axis: str = "model"):
    """Physically place a param tree channel-sharded over the mesh."""
    return jax.device_put(params, tp_param_shardings(params, mesh, axis))


def make_tp_infer(model, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel inference: channel-sharded weights, replicated I/O.

    Pass params through ``tp_shard_params`` (or let the constraint inside
    re-shard replicated ones).  The Pallas eval tail cannot be GSPMD-
    partitioned, so RDDB models trace under no_pallas_tail (same rule as
    make_spatial_infer).
    """
    rep = NamedSharding(mesh, P())

    @jax.jit
    def infer(params, x):
        from srcgan_tpu.models import rddb

        with rddb.no_pallas_tail():
            params = jax.lax.with_sharding_constraint(
                params, tp_param_shardings(params, mesh, axis))
            y = model.fwd(params, x)
            return jax.lax.with_sharding_constraint(y, rep)

    return infer


def make_cas_tp_step(trainer, mesh: Mesh, data_axis: str = "data",
                     model_axis: str = "model"):
    """2-D (data x model) hybrid-parallel CasSRC train step via GSPMD.

    Batch shards over ``data_axis``; params, grads and Adam moments shard
    channel-wise over ``model_axis`` (the whole TrainState goes through
    tp_param_shardings — optax moment trees mirror the param shapes, the
    scalar counts replicate).  XLA derives the forward all-gathers, the
    backward reduce-scatters, and the data-axis grad psums from the
    constraints alone; the optimizer update runs on 1/|model|-th of the
    state per device.
    """
    bsh = NamedSharding(mesh, P(data_axis))

    def constrain(tree):
        return jax.lax.with_sharding_constraint(
            tree, tp_param_shardings(tree, mesh, model_axis))

    @jax.jit
    def step(state, realA, realB, lr):
        from srcgan_tpu.models import rddb

        with rddb.no_pallas_tail():
            state = constrain(state)
            realA = jax.lax.with_sharding_constraint(realA, bsh)
            realB = jax.lax.with_sharding_constraint(realB, bsh)
            grads, mstates, metrics = trainer.grads(state, realA, realB)
            new_state = trainer.apply_grads(state, grads, mstates, lr)
            return constrain(new_state), metrics

    return step
