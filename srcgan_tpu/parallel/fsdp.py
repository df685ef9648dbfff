"""ZeRO-3 / FSDP fully-sharded data parallelism.

ZeRO-1 (`parallel.zero`) shards only the Adam moments; the params stay
replicated (4 bytes/param of HBM on every chip) because the forward needs
them.  The FSDP recipe shards the PARAMS at rest too:

    stored layout: every param leaf flattened, zero-padded, viewed as
                   (D, chunk) with the leading dim sharded over the data
                   axis -> 4/D bytes/param at rest
    per step:      param rows --all_gather--> full params (fwd + bwd)
                   per-shard grads --psum_scatter--> summed grad rows
                   Adam on the local 1/D rows; store new rows (NO gather)

Per-step ICI volume is IDENTICAL to ZeRO-1 and to plain DP's all-reduce
(each param element crosses once, each grad element once) — only WHERE the
param gather sits moves (step start instead of step end).  At rest the full
train state costs 12/D bytes/param instead of ZeRO-1's 4 + 8/D: the lever
that matters when a model approaches chip HBM.  Transient peak during the
step still holds full params + full grads (this zoo's models are MBs, so
layer-by-layer gather/release is deliberately NOT done — it buys nothing
here and costs a collective per layer).

The update math is matched to ``optax.adam`` exactly as in `parallel.zero`
(shared helpers), and equivalence to plain DP + optax is tested
(tests/test_parallel.py::TestFSDP).  The reference is single-device
(SURVEY.md §2.9); this completes the ZeRO family next to ZeRO-1, TP, SP
and pipeline parallelism.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srcgan_tpu.parallel import mesh as mesh_lib
from srcgan_tpu.parallel.zero import (
    _adam_hparams,
    _chunk,
    _from_2d,
    _to_2d,
    zero1_opt_init,
)
from srcgan_tpu.train.cas import CasState
from srcgan_tpu.train.state import TrainState


def _leaf_shapes(params):
    return jax.tree_util.tree_map(
        lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params)


def fsdp_from_state(state: CasState, mesh: Mesh, axis: str = "data"):
    """Convert an initialized CasState to the FSDP layout.

    Returns (fsdp_state, shapes): params AND Adam moments stored as
    row-sharded (D, chunk) arrays (fresh zero moments); ``shapes`` is the
    {"sr", "c"} tree of original leaf ShapeDtypeStructs that the step
    wrapper and ``fsdp_full_params`` need to reassemble full tensors.
    """
    d = mesh.shape[axis]
    sh = NamedSharding(mesh, P(axis))
    shapes = {"sr": _leaf_shapes(state.sr.params),
              "c": _leaf_shapes(state.c.params)}

    def shard_ts(ts: TrainState) -> TrainState:
        rows = jax.tree_util.tree_map(
            lambda p: jax.device_put(_to_2d(jnp.asarray(p), d), sh),
            ts.params)
        return TrainState(rows, zero1_opt_init(ts.params, mesh, axis),
                          mesh_lib.put_replicated(ts.step, mesh))

    fstate = CasState(shard_ts(state.sr), shard_ts(state.c),
                      mesh_lib.put_replicated(state.sr_model_state, mesh),
                      mesh_lib.put_replicated(state.c_model_state, mesh))
    return fstate, shapes


def fsdp_init(trainer, key, mesh: Mesh, axis: str = "data"):
    """(CasState in FSDP layout, shapes tree) from a fresh init."""
    return fsdp_from_state(trainer.init(key), mesh, axis)


def fsdp_full_params(rows_tree, shapes_tree):
    """Reassemble full (host) param tensors from the at-rest sharded rows.

    Runs OUTSIDE shard_map: a row-sharded jax.Array is addressable as its
    global (D, chunk) value, so this is a host reshape — no collective.
    Use for epoch checkpoint saves and eval.
    """
    def leaf(rows, sds):
        flat = np.asarray(jax.device_get(rows)).reshape(-1)
        return flat[:int(np.prod(sds.shape))].reshape(sds.shape)

    return jax.tree_util.tree_map(leaf, rows_tree, shapes_tree)


def fsdp_put(state: CasState, mesh: Mesh, axis: str = "data") -> CasState:
    """Place a host-side FSDP CasState (e.g. a restored checkpoint) on the
    mesh: param rows AND (mu, nu) rows sharded, steps/model-state
    replicated."""
    sh = NamedSharding(mesh, P(axis))

    def place(ts: TrainState) -> TrainState:
        put = lambda t: jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh), t)
        return TrainState(put(ts.params),
                          (put(ts.opt_state[0]), put(ts.opt_state[1])),
                          mesh_lib.put_replicated(ts.step, mesh))

    return CasState(place(state.sr), place(state.c),
                    mesh_lib.put_replicated(state.sr_model_state, mesh),
                    mesh_lib.put_replicated(state.c_model_state, mesh))


def fsdp_state_bytes_per_device(params, mesh: Mesh, axis: str = "data") -> int:
    """At-rest HBM for params + both moments on ONE device (12/D-ish)."""
    d = mesh.shape[axis]
    return sum(3 * _chunk(p.size, d) * p.dtype.itemsize
               for p in jax.tree_util.tree_leaves(params))


def _make_fsdp_update(trainer, shapes, axis: str, d: int, b1: float,
                      b2: float, eps: float):
    """Per-step FSDP update body (runs inside shard_map).  Mirrors
    zero._make_zero1_update; the differences are the param gather at the
    step START and the absence of the end-of-step gather."""

    def gather_full(rows_tree, shape_tree):
        def leaf(rows, sds):
            full = jax.lax.all_gather(rows, axis, axis=0, tiled=True)
            return _from_2d(full, sds.shape, int(np.prod(sds.shape)))

        return jax.tree_util.tree_map(leaf, rows_tree, shape_tree)

    def update_ts(ts: TrainState, grads, lr) -> TrainState:
        count = ts.step + 1
        cf = count.astype(jnp.float32)
        c1 = 1.0 - jnp.float32(b1) ** cf
        c2 = 1.0 - jnp.float32(b2) ** cf
        mu, nu = ts.opt_state

        def leaf(rows, g, m, v):
            gs = jax.lax.psum_scatter(_to_2d(g, d), axis,
                                      scatter_dimension=0, tiled=True) / d
            m2 = b1 * m + (1.0 - b1) * gs
            v2 = b2 * v + (1.0 - b2) * jnp.square(gs)
            upd = (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)
            return rows - lr * upd, m2, v2

        flat_r, treedef = jax.tree_util.tree_flatten(ts.params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(mu)
        flat_v = treedef.flatten_up_to(nu)
        res = [leaf(r, g, m, v)
               for r, g, m, v in zip(flat_r, flat_g, flat_m, flat_v)]
        return TrainState(treedef.unflatten([r[0] for r in res]),
                          (treedef.unflatten([r[1] for r in res]),
                           treedef.unflatten([r[2] for r in res])),
                          count)

    def update_state(state: CasState, realA, realB, lr):
        # param rows -> full tensors for fwd+bwd (the step's only gather)
        full = CasState(
            TrainState(gather_full(state.sr.params, shapes["sr"]),
                       None, state.sr.step),
            TrainState(gather_full(state.c.params, shapes["c"]),
                       None, state.c.step),
            state.sr_model_state, state.c_model_state)
        grads, mstates, metrics = trainer.grads(full, realA, realB)
        metrics = jax.lax.pmean(metrics, axis)
        if jax.tree_util.tree_leaves(mstates):
            mstates = jax.lax.pmean(mstates, axis)
        return CasState(update_ts(state.sr, grads["sr"], lr),
                        update_ts(state.c, grads["c"], lr),
                        mstates["sr"], mstates["c"]), metrics

    return update_state


def _fsdp_specs(axis: str):
    ts_spec = TrainState(P(axis), (P(axis), P(axis)), P())
    return CasState(ts_spec, ts_spec, P(), P())


def make_cas_fsdp_step(trainer, mesh: Mesh, shapes, axis: str = "data",
                       b1: float | None = None, b2: float | None = None,
                       eps: float | None = None):
    """FSDP train step for a CasTrainer.

    step(state, realA, realB, lr) -> (state, metrics): batches sharded over
    ``axis``, params AND moments row-sharded per ``fsdp_init`` (which also
    returns the ``shapes`` tree this needs).  Same math as
    ``make_cas_dp_step`` + optax.adam; only the state layout and the
    collective schedule differ.
    """
    b1, b2, eps = _adam_hparams(trainer, b1, b2, eps)
    update_state = _make_fsdp_update(trainer, shapes, axis,
                                     mesh.shape[axis], b1, b2, eps)
    state_spec = _fsdp_specs(axis)
    sharded = shard_map(
        update_state, mesh=mesh,
        in_specs=(state_spec, P(axis), P(axis), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)


def make_cas_fsdp_steps_u8(trainer, mesh: Mesh, shapes, axis: str = "data",
                           b1: float | None = None, b2: float | None = None,
                           eps: float | None = None):
    """FSDP x steps-per-dispatch: K scanned fully-sharded updates per
    dispatch on the uint8 fused-preprocessing input path (the FSDP analog
    of ``zero.make_cas_zero1_steps_u8``)."""
    from srcgan_tpu.data import preprocess

    ver = "G2LAB" if trainer.lab else "G2RGB"
    b1, b2, eps = _adam_hparams(trainer, b1, b2, eps)
    update_state = _make_fsdp_update(trainer, shapes, axis,
                                     mesh.shape[axis], b1, b2, eps)

    def shard_fn(state, src_u8_k, tar_u8_k, lr):
        def body(st, batch):
            s, t = batch
            realA, realB = preprocess.convert_pair(s, t, ver)
            return update_state(st, realA, realB, lr)

        return jax.lax.scan(body, state, (src_u8_k, tar_u8_k))

    state_spec = _fsdp_specs(axis)
    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(state_spec, P(None, axis), P(None, axis), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)
