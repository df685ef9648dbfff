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
