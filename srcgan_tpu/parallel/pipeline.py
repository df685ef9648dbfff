"""Pipeline parallelism for the SR -> colorize cascade (GPipe-style).

The reference's eval cascade is strictly sequential per batch: SR the
gray input, then colorize the SR output (testCas.py:92-103,
trainCas.py:103-109).  On a multi-chip TPU that serialization idles half
the machine, because the two nets are independent programs chained only
by one activation.  This module expresses the classic 2-stage SPMD
pipeline instead:

    tick t:  device 0 runs SR on microbatch t
             device 1 colorizes microbatch t-1
             the inter-stage activation rides ICI via ppermute

T microbatches drain in T+1 ticks, so the fill/drain bubble is 1/(T+1)
and both stages' MXUs stay busy in steady state.  Both devices run the
SAME compiled program — the stage split is a runtime branch on
``lax.axis_index`` (compiler-friendly: one trace, static shapes, the
branch shapes unified by zero-padding the non-resident stage's output).

This is the homogeneous SPMD formulation of pipeline parallelism (scan
over ticks + ppermute ring), scaled down to the cascade's natural 2
stages; it generalizes to deeper cascades by widening the mesh axis and
rotating every stage's activation each tick.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_cascade_pipeline_infer(stage0_fn, stage1_fn, mesh: Mesh,
                                axis: str = "pipe"):
    """Build the 2-stage pipelined cascade.

    stage0_fn(p0, x)  -> y1   (e.g. the SR net:      (m,H,W,1) -> (m,uH,uW,1))
    stage1_fn(p1, y1) -> out  (e.g. the colorizer:   (m,uH,uW,1) -> (m,uH,uW,3))

    Returns infer(p0, p1, xq) where xq is a (T, m, H, W, C) microbatch
    queue (replicated input); the result is (T, m, ...) — identical to
    running stage1_fn(stage0_fn(.)) per microbatch (equivalence tested).
    The mesh's ``axis`` must have size 2 (stage per device).
    """
    if mesh.shape[axis] != 2:
        raise ValueError(f"2-stage pipeline needs axis '{axis}' of size 2, "
                         f"got {mesh.shape[axis]}")

    def shard_fn(p0, p1, xq):
        t_total = xq.shape[0]
        stage = jax.lax.axis_index(axis)
        y1_sd = jax.eval_shape(stage0_fn, p0, xq[0])
        out_sd = jax.eval_shape(stage1_fn, p1,
                                jax.ShapeDtypeStruct(y1_sd.shape, y1_sd.dtype))

        def tick(buf, t):
            def s0(buf):
                # drain tick t == T re-runs the last microbatch; its result
                # is ppermuted into stage 1's buffer after the final consume
                # and discarded with it.
                xb = jax.lax.dynamic_index_in_dim(
                    xq, jnp.minimum(t, t_total - 1), 0, keepdims=False)
                return stage0_fn(p0, xb), jnp.zeros(out_sd.shape, out_sd.dtype)

            def s1(buf):
                # fill tick t == 0 colorizes the zero init; row 0 of the
                # output stack is sliced off below.
                return (jnp.zeros(y1_sd.shape, y1_sd.dtype),
                        stage1_fn(p1, buf))

            y1, out = jax.lax.cond(stage == 0, s0, s1, buf)
            buf = jax.lax.ppermute(y1, axis, perm=[(0, 1)])
            return buf, out

        buf0 = jnp.zeros(y1_sd.shape, y1_sd.dtype)
        _, outs = jax.lax.scan(tick, buf0, jnp.arange(t_total + 1))
        return outs[None]  # leading device axis for out_specs

    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(), P(), P()),
                        out_specs=P(axis),
                        check_vma=False)

    @jax.jit
    def infer(p0, p1, xq):
        outs = sharded(p0, p1, xq)  # (2, T+1, m, ...)
        # stage 1's rows, skipping the fill tick
        return outs[1, 1:]

    return infer


def stack_trunk_params(trunk_params):
    """Stack a Sequential-of-identical-blocks param tree ({'0': t, '1': t,
    ...}) into one tree with a leading stage axis — the layout pipeline
    stages shard over."""
    blocks = [trunk_params[str(i)] for i in range(len(trunk_params))]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def place_trunk_pipeline_params(params, mesh: Mesh, axis: str = "pipe"):
    """Physically place an RDDB param tree for the trunk pipeline: returns
    (head_tail replicated, trunk stacked and row-sharded over ``axis``) —
    after this, each device HOLDS only its own block's weights (the true
    1/S residency; passing the plain tree to infer instead keeps a
    replicated copy alive as the jit input)."""
    from jax.sharding import NamedSharding

    stacked = jax.device_put(stack_trunk_params(params["trunk"]),
                             NamedSharding(mesh, P(axis)))
    head_tail = jax.device_put(
        {k: v for k, v in params.items() if k != "trunk"},
        NamedSharding(mesh, P()))
    return head_tail, stacked


def _trunk_tick_scan(model, rrdb, axis, s_stages, head_tail_params, p_mine,
                     xq):
    """Per-device pipelined tick loop (shared by the infer and train forms):
    returns THIS device's (T+S-1, m, ...) per-tick output rows — zeros
    everywhere except on stage S-1, whose rows S-1.. are the finished
    microbatches.  Fully differentiable: reverse-mode through the scan
    transposes every ppermute (inverted ring), which IS the backward
    pipeline — cotangents drain stage S-1 -> 0 exactly as GPipe schedules
    them."""
    t_total = xq.shape[0]
    stage = jax.lax.axis_index(axis)
    fea_sd = jax.eval_shape(model.head, head_tail_params, xq[0])
    out_sd = jax.eval_shape(
        lambda p, f, t: model.tail(p, f, t), head_tail_params,
        jax.ShapeDtypeStruct(fea_sd.shape, fea_sd.dtype),
        jax.ShapeDtypeStruct(fea_sd.shape, fea_sd.dtype))
    perm = [(i, i + 1) for i in range(s_stages - 1)]

    def tick(carry, t):
        fea_c, h_c = carry
        x_t = jax.lax.dynamic_index_in_dim(
            xq, jnp.minimum(t, t_total - 1), 0, keepdims=False)
        fea0 = model.head(head_tail_params, x_t)
        fea = jnp.where(stage == 0, fea0, fea_c)
        h = rrdb.fwd(p_mine, jnp.where(stage == 0, fea0, h_c))

        def finish(_):
            return model.tail(head_tail_params, fea, h)

        out = jax.lax.cond(
            stage == s_stages - 1, finish,
            lambda _: jnp.zeros(out_sd.shape, out_sd.dtype), None)
        fea_n = jax.lax.ppermute(fea, axis, perm)
        h_n = jax.lax.ppermute(h, axis, perm)
        return (fea_n, h_n), out

    zero = jnp.zeros(fea_sd.shape, fea_sd.dtype)
    _, outs = jax.lax.scan(tick, (zero, zero),
                           jnp.arange(t_total + s_stages - 1))
    return outs


def make_rddb_trunk_pipeline_infer(model, mesh: Mesh, axis: str = "pipe"):
    """Pipeline the RDDB trunk itself: RRDB block s lives on mesh position s.

    The homogeneous-stage formulation of pipeline parallelism (the one that
    scales: every stage runs the SAME block function on ITS slice of a
    stacked parameter tree, so the per-device program is stage-independent
    except for the edge work):

        tick t:  every stage applies its RRDB to its current activation;
                 stage 0 additionally stems microbatch t (conv_first);
                 stage S-1 additionally finishes microbatch t-S+1
                 (trunk_conv + global residual + upscale tail);
                 (fea, h) ride the ppermute chain one stage forward.

    T microbatches drain in T + S - 1 ticks (bubble (S-1)/(T+S-1)).  The
    mesh's ``axis`` size must equal the trunk depth (model nb).  Stage
    params ride sharded P(axis) over ``stack_trunk_params``' leading dim,
    so each stage reads only its own block; for the capacity story — a
    trunk deeper than one chip's HBM streaming through S chips — pre-place
    with ``place_trunk_pipeline_params`` so no replicated copy stays live.

    Returns infer(params, xq): params the model's ordinary tree (the
    stacked/sharded split happens inside), xq a (T, m, H, W, C) microbatch
    queue; output (T, m, uH, uW, C_out) — equal to model.fwd per
    microbatch (tested).  Wasted work per tick: one conv_first everywhere
    (selected by stage, ~1/15th of an RRDB) and the drain ticks' clamped
    re-stem — both documented costs of the branch-free SPMD formulation.
    """
    s_stages = mesh.shape[axis]
    nb = len(model.mods.layers["trunk"].layers)
    if s_stages != nb:
        raise ValueError(f"trunk pipeline needs axis '{axis}' of size equal "
                         f"to the trunk depth (nb={nb}), got {s_stages}")
    rrdb = model.mods.layers["trunk"].layers[0]
    p_axis = P(axis)
    rep = P()

    def shard_fn(head_tail_params, stage_params, xq):
        p_mine = jax.tree_util.tree_map(lambda a: a[0], stage_params)
        outs = _trunk_tick_scan(model, rrdb, axis, s_stages,
                                head_tail_params, p_mine, xq)
        return outs[None]

    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(rep, p_axis, rep),
                        out_specs=P(axis),
                        check_vma=False)

    @jax.jit
    def _run(head_tail, stacked, xq):
        from srcgan_tpu.models import rddb as rddb_mod

        with rddb_mod.no_pallas_tail():
            outs = sharded(head_tail, stacked, xq)  # (S, T+S-1, m, ...)
        # the last stage's rows, skipping its S-1 fill ticks
        return outs[s_stages - 1, s_stages - 1:]

    def infer(params, xq):
        """params: the model's plain tree (stacked/split inside — the
        replicated jit input keeps a full copy alive), OR the
        (head_tail, stacked) pair from place_trunk_pipeline_params for
        true 1/S per-device trunk residency."""
        if isinstance(params, tuple):
            head_tail, stacked = params
        else:
            stacked = stack_trunk_params(params["trunk"])
            head_tail = {k: v for k, v in params.items() if k != "trunk"}
        return _run(head_tail, stacked, xq)

    return infer


def make_trunk_pipeline_train(model, mesh: Mesh, axis: str = "pipe",
                              data_axis: str | None = None):
    """GPipe training for the trunk pipeline: microbatch-accumulated L1
    loss, backward through the ring, per-stage grad + Adam residency.

    The backward pass is NOT hand-scheduled: reverse-mode through
    ``_trunk_tick_scan`` transposes each ``ppermute`` into the inverted
    ring, so cotangents flow stage S-1 -> 0 tick-reversed — the textbook
    GPipe backward schedule, derived by autodiff (the reference's
    trainCas.py:133-153 backward is single-device; this is its
    pipeline-parallel form).  Stage s's RRDB gradient is produced and
    CONSUMED on device s: grads and Adam moments for the stacked trunk
    stay sharded P(axis) end-to-end (1/S optimizer residency, the PP
    cousin of ZeRO-1); head/tail grads are psum'd over the ring and
    updated replicated.

    Returns (init_opt, step, grads):
      init_opt(pair) -> opt_state            (moments placed like params)
      step(pair, opt_state, xq, yq, lr) -> (pair, opt_state, loss)
      grads(pair, xq, yq) -> (loss, g_head_tail, g_stacked)   (jitted; the
        raw ring gradients, exposed so equivalence can be asserted on the
        grads themselves — Adam's eps-normalization amplifies ~1e-7
        reduction-order noise on near-zero grads into 1e-3-relative param
        deltas, so updated-param comparisons are the wrong test surface)
    with pair = place_trunk_pipeline_params(params, mesh), xq the
    (T, m, H, W, C) microbatch queue and yq the matching (T, m, uH, uW, C)
    targets (both replicated); loss = mean |pred - y| over all microbatches,
    equal to the unsharded loss (equivalence-tested incl. gradients).

    ``data_axis`` composes data parallelism INTO the ring (PP x DP on a
    2-D mesh): the microbatch sample dim m shards over ``data_axis``, each
    data replica of the ring trains on its slice, and grads/loss pmean
    across ``data_axis`` — so the two classic scale-out directions (deeper
    trunk -> more 'pipe', bigger batch -> more 'data') compose in one
    program.  The data-axis size must divide the microbatch sample dim m
    (shard_map shards m over ``data_axis``).
    """
    import optax

    s_stages = mesh.shape[axis]
    nb = len(model.mods.layers["trunk"].layers)
    if s_stages != nb:
        raise ValueError(f"trunk pipeline needs axis '{axis}' of size equal "
                         f"to the trunk depth (nb={nb}), got {s_stages}")
    rrdb = model.mods.layers["trunk"].layers[0]

    def shard_fn(head_tail, stage_params, xq, yq):
        stage = jax.lax.axis_index(axis)

        def local_loss(ht, sp):
            p_mine = jax.tree_util.tree_map(lambda a: a[0], sp)
            outs = _trunk_tick_scan(model, rrdb, axis, s_stages, ht,
                                    p_mine, xq)
            # rows S-1.. of the last stage are microbatches 0..T-1; other
            # stages' rows are zeros — mask their (meaningless) loss out.
            # UNREDUCED on purpose: psum-ing here would be differentiated
            # too, and psum's transpose is psum — the cotangent would
            # arrive as S instead of 1, scaling every gradient by the
            # stage count (measured 3x at S=3).  The cross-stage reverse
            # flow needs no collective help: the mask zero-seeds every
            # stage but S-1, and the transposed ppermutes carry S-1's
            # cotangents backward around the ring.
            l = jnp.mean(jnp.abs(outs[s_stages - 1:] - yq))
            return jnp.where(stage == s_stages - 1, l, 0.0)

        loss, (g_ht, g_sp) = jax.value_and_grad(
            local_loss, argnums=(0, 1))(head_tail, stage_params)
        # head/tail params act on every stage's program: total grad is the
        # sum of each device's path contributions.  Stage grads are already
        # complete locally (their cotangents arrived via the transposed
        # ring).  The loss psum just replicates stage S-1's value.
        loss = jax.lax.psum(loss, axis)
        g_ht = jax.lax.psum(g_ht, axis)
        if data_axis is not None:
            # PP x DP: each data replica saw 1/D of the samples — average
            # its per-sample-mean loss and grads across the replicas.
            loss = jax.lax.pmean(loss, data_axis)
            g_ht = jax.lax.pmean(g_ht, data_axis)
            g_sp = jax.lax.pmean(g_sp, data_axis)
        return loss, g_ht, g_sp

    batch_spec = P() if data_axis is None else P(None, data_axis)
    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(), P(axis), batch_spec, batch_spec),
                        out_specs=(P(), P(), P(axis)),
                        check_vma=False)

    adam = optax.scale_by_adam()

    @jax.jit
    def grads(pair, xq, yq):
        from srcgan_tpu.models import rddb as rddb_mod

        head_tail, stacked = pair
        with rddb_mod.no_pallas_tail():
            return sharded(head_tail, stacked, xq, yq)

    def init_opt(pair):
        head_tail, stacked = pair
        # zeros_like preserves each leaf's sharding: trunk moments land
        # P(axis) (1/S per device), head/tail moments replicated.
        return adam.init({"ht": head_tail, "tr": stacked})

    # NOT donated: device_put-to-replicated shares the already-resident
    # device-0 buffer with the caller's original tree, so donating the pair
    # would delete the user's params out from under them on the first call.
    @jax.jit
    def step(pair, opt_state, xq, yq, lr):
        from srcgan_tpu.models import rddb as rddb_mod

        head_tail, stacked = pair
        with rddb_mod.no_pallas_tail():
            loss, g_ht, g_sp = sharded(head_tail, stacked, xq, yq)
        updates, opt_state = adam.update({"ht": g_ht, "tr": g_sp}, opt_state)
        head_tail = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, head_tail, updates["ht"])
        stacked = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, stacked, updates["tr"])
        return (head_tail, stacked), opt_state, loss

    return init_opt, step, grads
