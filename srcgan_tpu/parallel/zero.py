"""ZeRO-1 sharded-optimizer data parallelism (reduce_scatter + all_gather).

Plain DP (`parallel.dp`) replicates the Adam moments on every device: each
chip spends 8 bytes/param of HBM on optimizer state of which it only ever
*needs* 1/D-th, because every device applies the identical update.  The
ZeRO-1 recipe shards the OPTIMIZER STATE over the data axis while keeping
the params replicated for the forward:

    per-shard grads --psum_scatter--> grad shard (1/D-th, already summed)
    Adam moment update + param delta on the local 1/D-th shard only
    updated param shard --all_gather--> full params for the next forward

Per step each gradient element crosses ICI exactly once (the
reduce-scatter) and each param element once (the all-gather) — the same
2x volume as plain DP's gradient all-reduce (an all-reduce IS a
reduce-scatter followed by an all-gather), so the communication cost is
unchanged while the moments and the Adam arithmetic shrink to 1/D per
chip.  On a 16 GB v5e that turns Adam's 8 bytes/param into 8/D.

The sharding layout is explicit: every param leaf is flattened, padded to
a multiple of the axis size D, and viewed as (D, chunk); moment arrays are
stored in exactly that (D, chunk) global shape with the leading dim
sharded over the axis, so device i physically holds only its own
(1, chunk) slice.  The update math is matched to ``optax.adam``
(scale_by_adam with eps_root=0, bias-corrected), and equivalence to the
plain-DP + optax step is tested (tests/test_parallel.py::TestZero1).

The reference (single cuda:0, SURVEY.md §2.9) has no analog; this is the
standard large-model TPU recipe expressed for the SR cascade.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srcgan_tpu.parallel import mesh as mesh_lib
from srcgan_tpu.train import optim
from srcgan_tpu.train.cas import CasState
from srcgan_tpu.train.state import TrainState


def _chunk(n: int, d: int) -> int:
    return -(-n // d)


def _to_2d(leaf, d: int):
    """Flatten a leaf and view it as (d, chunk), zero-padded at the end."""
    flat = leaf.reshape(-1)
    pad = _chunk(flat.size, d) * d - flat.size
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat.reshape(d, -1)


def _from_2d(x2d, shape, size: int):
    return x2d.reshape(-1)[:size].reshape(shape)


def zero1_opt_init(params, mesh: Mesh, axis: str = "data"):
    """Sharded Adam moments (mu, nu) for a params tree.

    Each leaf's moments are zeros of global shape (D, ceil(n/D)) with the
    leading dim sharded over ``axis`` — device i holds only row i.
    """
    d = mesh.shape[axis]
    sh = NamedSharding(mesh, P(axis))

    def zeros_like_sharded(p):
        return jax.device_put(jnp.zeros((d, _chunk(p.size, d)), p.dtype), sh)

    mu = jax.tree_util.tree_map(zeros_like_sharded, params)
    nu = jax.tree_util.tree_map(zeros_like_sharded, params)
    return (mu, nu)


def zero1_from_state(state: CasState, mesh: Mesh,
                     axis: str = "data") -> CasState:
    """Convert an already-initialized CasState to the ZeRO-1 layout:
    params replicated, the opt_state slot of each TrainState replaced by
    the sharded (mu, nu) pair (fresh zeros; only ``make_cas_zero1_step``
    understands this layout).  The existing optax state is discarded —
    use ``zero1_put`` to place a restored ZeRO-shaped checkpoint instead."""
    state = mesh_lib.put_replicated(state, mesh)

    def reopt(ts: TrainState) -> TrainState:
        return TrainState(ts.params, zero1_opt_init(ts.params, mesh, axis),
                          ts.step)

    return CasState(reopt(state.sr), reopt(state.c),
                    state.sr_model_state, state.c_model_state)


def zero1_init(trainer, key, mesh: Mesh, axis: str = "data") -> CasState:
    """CasState for the ZeRO-1 step: params replicated, moments sharded."""
    return zero1_from_state(trainer.init(key), mesh, axis)


def zero1_opt_bytes_per_device(params, mesh: Mesh, axis: str = "data") -> int:
    """HBM the sharded moments cost on ONE device (vs 2x params replicated)."""
    d = mesh.shape[axis]
    return sum(2 * _chunk(p.size, d) * p.dtype.itemsize
               for p in jax.tree_util.tree_leaves(params))


def zero1_put(state: CasState, mesh: Mesh, axis: str = "data") -> CasState:
    """Place a host-side ZeRO CasState (e.g. a restored checkpoint) on the
    mesh: params replicated, (mu, nu) moment arrays row-sharded."""
    sh = NamedSharding(mesh, P(axis))

    def place(ts: TrainState) -> TrainState:
        put = lambda t: jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh), t)
        return TrainState(mesh_lib.put_replicated(ts.params, mesh),
                          (put(ts.opt_state[0]), put(ts.opt_state[1])),
                          mesh_lib.put_replicated(ts.step, mesh))

    return CasState(place(state.sr), place(state.c),
                    mesh_lib.put_replicated(state.sr_model_state, mesh),
                    mesh_lib.put_replicated(state.c_model_state, mesh))


def _make_zero1_update(trainer, axis: str, d: int, b1: float, b2: float,
                       eps: float):
    """The shared per-step ZeRO-1 update body (runs inside shard_map):
    per-shard grads -> psum_scatter -> sharded Adam -> all_gather params.
    Shared by the single-step and K-scanned wrappers so the collective
    schedule lives in exactly one place (mirrors dp._dp_update)."""

    def update_ts(ts: TrainState, grads, lr) -> TrainState:
        count = ts.step + 1
        cf = count.astype(jnp.float32)
        # optax scale_by_adam bias correction (eps_root=0)
        c1 = 1.0 - jnp.float32(b1) ** cf
        c2 = 1.0 - jnp.float32(b2) ** cf
        idx = jax.lax.axis_index(axis)
        mu, nu = ts.opt_state

        def leaf(p, g, m, v):
            # reduce-scatter the summed grads; /d makes it the global mean
            gs = jax.lax.psum_scatter(_to_2d(g, d), axis,
                                      scatter_dimension=0, tiled=True) / d
            m2 = b1 * m + (1.0 - b1) * gs
            v2 = b2 * v + (1.0 - b2) * jnp.square(gs)
            upd = (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)
            p_shard = jax.lax.dynamic_slice_in_dim(_to_2d(p, d), idx, 1, 0)
            new_shard = p_shard - lr * upd
            full = jax.lax.all_gather(new_shard, axis, axis=0, tiled=True)
            return _from_2d(full, p.shape, p.size), m2, v2

        flat_p, treedef = jax.tree_util.tree_flatten(ts.params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(mu)
        flat_v = treedef.flatten_up_to(nu)
        res = [leaf(p, g, m, v)
               for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
        return TrainState(treedef.unflatten([r[0] for r in res]),
                          (treedef.unflatten([r[1] for r in res]),
                           treedef.unflatten([r[2] for r in res])),
                          count)

    def update_state(state: CasState, realA, realB, lr):
        grads, mstates, metrics = trainer.grads(state, realA, realB)
        metrics = jax.lax.pmean(metrics, axis)
        if jax.tree_util.tree_leaves(mstates):
            mstates = jax.lax.pmean(mstates, axis)
        return CasState(update_ts(state.sr, grads["sr"], lr),
                        update_ts(state.c, grads["c"], lr),
                        mstates["sr"], mstates["c"]), metrics

    return update_state


def _zero1_specs(axis: str):
    ts_spec = TrainState(P(), (P(axis), P(axis)), P())
    return CasState(ts_spec, ts_spec, P(), P())


def _adam_hparams(trainer, b1, b2, eps):
    """Resolve (b1, b2, eps): explicit args win, else the trainer's own
    optimizer hyperparameters (CasTrainer.adam_hparams) — so 'same math as
    plain DP' stays true even if the trainer's Adam config ever changes."""
    tb1, tb2, teps = getattr(trainer, "adam_hparams", optim.ADAM_HPARAMS)
    return (tb1 if b1 is None else b1, tb2 if b2 is None else b2,
            teps if eps is None else eps)


def make_cas_zero1_step(trainer, mesh: Mesh, axis: str = "data",
                        b1: float | None = None, b2: float | None = None,
                        eps: float | None = None):
    """ZeRO-1 DP train step for a CasTrainer.

    Returns step(state, realA, realB, lr) -> (state, metrics): batches are
    sharded over ``axis`` (leading dim divisible by the axis size), params
    replicated, Adam moments sharded per ``zero1_init``.  Equivalent math
    to ``make_cas_dp_step`` + optax.adam; only the state layout and the
    collective schedule differ.  Adam hyperparameters default to the
    trainer's own (``adam_hparams``).
    """
    b1, b2, eps = _adam_hparams(trainer, b1, b2, eps)
    update_state = _make_zero1_update(trainer, axis, mesh.shape[axis],
                                      b1, b2, eps)
    state_spec = _zero1_specs(axis)
    sharded = shard_map(
        update_state, mesh=mesh,
        in_specs=(state_spec, P(axis), P(axis), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)


def zero1_gd_from_state(state, mesh: Mesh, axis: str = "data"):
    """Convert an initialized CycleState to the ZeRO-1 layout: G and D
    params replicated, each opt_state slot replaced by the row-sharded
    (mu, nu) pair (fresh zeros) — the GAN analog of ``zero1_from_state``."""
    from srcgan_tpu.train.cyclegan import CycleState

    state = mesh_lib.put_replicated(state, mesh)

    def reopt(ts: TrainState) -> TrainState:
        return TrainState(ts.params, zero1_opt_init(ts.params, mesh, axis),
                          ts.step)

    return CycleState(reopt(state.g), reopt(state.d), state.d_model_state)


def zero1_gd_put(state, mesh: Mesh, axis: str = "data"):
    """Place a host-side ZeRO CycleState (e.g. a restored checkpoint) on
    the mesh: params replicated, (mu, nu) rows sharded — the GAN analog of
    ``zero1_put``."""
    from srcgan_tpu.train.cyclegan import CycleState

    sh = NamedSharding(mesh, P(axis))

    def place(ts: TrainState) -> TrainState:
        put = lambda t: jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh), t)
        return TrainState(mesh_lib.put_replicated(ts.params, mesh),
                          (put(ts.opt_state[0]), put(ts.opt_state[1])),
                          mesh_lib.put_replicated(ts.step, mesh))

    return CycleState(place(state.g), place(state.d),
                      mesh_lib.put_replicated(state.d_model_state, mesh))


def make_gd_zero1_step(trainer, mesh: Mesh, axis: str = "data",
                       b1: float | None = None, b2: float | None = None,
                       eps: float | None = None):
    """ZeRO-1 fused G+D iteration for a CycleGANTrainer (pool-pass-through
    protocol, mirroring ``CycleGANTrainer.gd_step``).

    Unlike the CasTrainer ZeRO step this runs under GSPMD, not shard_map:
    the discriminators carry BatchNorm whose batch statistics must span the
    GLOBAL batch (the property the DP equivalence test pins,
    tests/test_parallel.py::TestCycleGANDP) — inside shard_map each shard
    would normalize with its own sub-batch stats and mean-of-shard
    variances is not the global variance.  Under GSPMD the moment arrays
    keep their (D, chunk) row sharding via with_sharding_constraint, grads
    arrive replicated (XLA's all-reduce), the Adam arithmetic runs on the
    local rows, and the param delta's unflatten is the all-gather.  Memory
    is the point: 8/D bytes/param of Adam state at rest for BOTH networks
    (``zero1_opt_bytes_per_device``), same as ``--zero-opt`` on the
    cascade trainer.

    step(state, realA, realB, g_lr, d_lr) -> (state, aux): state from
    ``zero1_gd_from_state``, batches device_put sharded over ``axis``
    internally.
    """
    import jax.numpy as _jnp

    from srcgan_tpu.train.cyclegan import CycleState

    b1, b2, eps = _adam_hparams(trainer, b1, b2, eps)
    d = mesh.shape[axis]
    sh = NamedSharding(mesh, P(axis))
    b_shard = mesh_lib.batch_sharding(mesh, axis)
    con = lambda t: jax.lax.with_sharding_constraint(t, sh)

    def update_ts(ts: TrainState, grads, lr) -> TrainState:
        count = ts.step + 1
        cf = count.astype(_jnp.float32)
        c1 = 1.0 - _jnp.float32(b1) ** cf
        c2 = 1.0 - _jnp.float32(b2) ** cf
        mu, nu = ts.opt_state

        def leaf(p, g, m, v):
            g2 = _to_2d(g, d)
            m2 = con(b1 * m + (1.0 - b1) * g2)
            v2 = con(b2 * v + (1.0 - b2) * _jnp.square(g2))
            upd = (m2 / c1) / (_jnp.sqrt(v2 / c2) + eps)
            return p - lr * _from_2d(upd, p.shape, p.size), m2, v2

        flat_p, treedef = jax.tree_util.tree_flatten(ts.params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(mu)
        flat_v = treedef.flatten_up_to(nu)
        res = [leaf(p, g, m, v)
               for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
        return TrainState(treedef.unflatten([r[0] for r in res]),
                          (treedef.unflatten([r[1] for r in res]),
                           treedef.unflatten([r[2] for r in res])),
                          count)

    def step_fn(state, realA, realB, g_lr, d_lr):
        grads_g, aux = trainer.g_grads(state, realA, realB)
        new_g = update_ts(state.g, grads_g, g_lr)
        # D grads at the pre-G-update D params on THIS step's fakes — the
        # same schedule as CycleGANTrainer.gd_step (pool_size=0 protocol)
        grads_d, (l_da, l_db, d_mstate) = trainer.d_grads(
            state, realA, realB,
            jax.lax.stop_gradient(aux["fake_A"]),
            jax.lax.stop_gradient(aux["fake_B"]))
        new_d = update_ts(state.d, grads_d, d_lr)
        aux.update({"loss_D_A": l_da, "loss_D_B": l_db})
        return CycleState(new_g, new_d, d_mstate), aux

    jitted = jax.jit(step_fn, donate_argnums=0)

    def step(state, realA, realB, g_lr, d_lr):
        return jitted(state, jax.device_put(realA, b_shard),
                      jax.device_put(realB, b_shard), g_lr, d_lr)

    return step


def make_cas_zero1_steps_u8(trainer, mesh: Mesh, axis: str = "data",
                            b1: float | None = None, b2: float | None = None,
                            eps: float | None = None):
    """ZeRO-1 x steps-per-dispatch: K scanned sharded-optimizer updates per
    dispatch, on the uint8 fused-preprocessing input path — the ZeRO analog
    of ``dp.make_cas_dp_steps_u8`` (same (K, N, ...) uint8 blocks, N sharded
    over ``axis``, metrics stacked per step)."""
    from srcgan_tpu.data import preprocess

    ver = "G2LAB" if trainer.lab else "G2RGB"
    b1, b2, eps = _adam_hparams(trainer, b1, b2, eps)
    update_state = _make_zero1_update(trainer, axis, mesh.shape[axis],
                                      b1, b2, eps)

    def shard_fn(state, src_u8_k, tar_u8_k, lr):
        def body(st, batch):
            s, t = batch
            realA, realB = preprocess.convert_pair(s, t, ver)
            return update_state(st, realA, realB, lr)

        return jax.lax.scan(body, state, (src_u8_k, tar_u8_k))

    state_spec = _zero1_specs(axis)
    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(state_spec, P(None, axis), P(None, axis), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)
