"""Data-parallel training over a device mesh.

Two equivalent mechanisms are provided:

  1. ``make_cas_dp_step`` — explicit SPMD via ``shard_map``: each shard of the
     'data' axis computes local gradients, ``jax.lax.pmean`` all-reduces them
     over ICI, and every device applies the identical update to its replicated
     params.  This is the canonical TPU recipe (grads ride the interconnect
     once per step; params never move).

  2. ``shard_inputs`` + the trainer's ordinary jitted step — GSPMD-style:
     shard the batch, replicate the state, and let XLA insert the collectives.
     Same program, compiler-derived.

Both run unchanged on the CPU fake backend for testing.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from srcgan_tpu.parallel import mesh as mesh_lib


def _dp_update(trainer, axis, state, realA, realB, lr):
    """One psum'd DP update (runs inside shard_map): per-shard grads,
    pmean over ``axis``, identical replicated apply.  Shared by the
    single-step and K-scanned DP paths so the pmean composition rules
    (incl. BN-stat averaging) live in exactly one place."""
    grads, mstates, metrics = trainer.grads(state, realA, realB)
    grads = jax.lax.pmean(grads, axis)
    metrics = jax.lax.pmean(metrics, axis)
    # model state (BN stats), if any, is batch-dependent: average it too.
    mstates = jax.lax.pmean(mstates, axis) if jax.tree_util.tree_leaves(
        mstates) else mstates
    return trainer.apply_grads(state, grads, mstates, lr), metrics


def make_cas_dp_step(trainer, mesh: Mesh, axis: str = "data"):
    """Explicit shard_map DP step for a CasTrainer.

    Returns step(state, realA, realB, lr) -> (state, metrics) where realA/realB
    are globally-sharded batch arrays (leading dim divisible by the axis size)
    and state is replicated.
    """

    def shard_fn(state, realA, realB, lr):
        return _dp_update(trainer, axis, state, realA, realB, lr)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)


def make_cas_dp_steps_u8(trainer, mesh: Mesh, axis: str = "data"):
    """DP x steps-per-dispatch: K scanned optimization steps, each a psum'd
    data-parallel update, in ONE compiled program.

    The composition of ``make_cas_dp_step`` (per-step gradient pmean over the
    'data' axis) with ``CasTrainer.train_steps_u8`` (K steps per dispatch via
    lax.scan on the uint8 fused-preprocessing input path) — the production
    multi-chip configuration: batches shard over ICI neighbours while the
    host pays one dispatch + one metrics sync per K steps.

    Returns steps(state, src_u8_k, tar_u8_k, lr) -> (state, metrics) where
    the uint8 blocks are (K, N, H, W, C) with N sharded over ``axis`` (N must
    divide the axis size) and state replicated; metrics come back stacked
    per step, shape (K,), already pmean'd across shards.
    """
    from srcgan_tpu.data import preprocess

    ver = "G2LAB" if trainer.lab else "G2RGB"

    def shard_fn(state, src_u8_k, tar_u8_k, lr):
        def body(st, batch):
            s, t = batch
            realA, realB = preprocess.convert_pair(s, t, ver)
            return _dp_update(trainer, axis, st, realA, realB, lr)

        return jax.lax.scan(body, state, (src_u8_k, tar_u8_k))

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)


def make_cyclegan_dp_steps(trainer, mesh: Mesh, axis: str = "data"):
    """GSPMD data-parallel wrappers for the CycleGAN trainer's two steps.

    The CycleGAN steps thread BatchNorm state and host-side pools, so instead
    of shard_map we shard operands and let GSPMD place collectives: callers
    device_put the batch with batch_sharding and the state replicated, then
    call these jitted steps as usual.
    """
    b_shard = mesh_lib.batch_sharding(mesh, axis)
    rep = mesh_lib.replicated(mesh)

    def g_step(state, realA, realB, lr):
        return trainer.g_step(state, jax.device_put(realA, b_shard),
                              jax.device_put(realB, b_shard), lr)

    def d_step(state, realA, realB, fake_A, fake_B, lr):
        return trainer.d_step(state, jax.device_put(realA, b_shard),
                              jax.device_put(realB, b_shard),
                              jax.device_put(fake_A, b_shard),
                              jax.device_put(fake_B, b_shard), lr)

    return g_step, d_step


def make_spatial_infer(model, mesh: Mesh, axis: str = "space"):
    """Spatially-sharded inference: shard H across the mesh so tiles larger
    than one device's HBM stream through conv stacks with GSPMD-inserted halo
    exchanges — the image analog of context parallelism."""
    sp = mesh_lib.spatial_sharding(mesh, axis)
    rep = mesh_lib.replicated(mesh)

    @jax.jit
    def infer(params, x):
        from srcgan_tpu.models import rddb

        # sharded program: XLA can't partition the eval-tail custom call
        with rddb.no_pallas_tail():
            x = jax.lax.with_sharding_constraint(x, sp)
            y = model.fwd(params, x)
            return jax.lax.with_sharding_constraint(y, sp)

    return infer


def make_cas_2d_step(trainer, mesh: Mesh, data_axis: str = "data",
                     space_axis: str = "space"):
    """2-D (data x space) sharded CasSRC train step via GSPMD.

    Batch is sharded over `data_axis` AND image height over `space_axis` —
    the combination of data parallelism with the image-domain analog of
    sequence/context parallelism, for per-sample resolutions that exceed one
    chip's HBM during training.  XLA inserts the gradient psums and the conv
    halo exchanges (forward and backward) from the sharding constraints alone.
    """
    bsh = jax.NamedSharding(mesh, P(data_axis, space_axis))

    @jax.jit
    def step(state, realA, realB, lr):
        realA = jax.lax.with_sharding_constraint(realA, bsh)
        realB = jax.lax.with_sharding_constraint(realB, bsh)
        grads, mstates, metrics = trainer.grads(state, realA, realB)
        return trainer.apply_grads(state, grads, mstates, lr), metrics

    return step
