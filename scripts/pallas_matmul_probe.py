"""Microbenchmark: Pallas matmul rates at RDB5 trunk-conv shapes, bf16 vs int8.

Grounds the fused-RDB5 Pallas kernel design (docs/PERF.md "Trunk revisit"):
a 3x3 conv expressed as tap matmuls has contraction K = taps*Cin, so the
schedule choice is K=64 (per-tap loop), K=192 (width-only im2col, 3 dy taps)
or K=576 (full im2col).  The MXU is 128x128; K<128 caps utilization at K/128.
This probe measures, through the axon relay (scan-slope method, see bench.py):

    (M, K) @ (K, N) -> f32/int32 accum -> cast out

for M = one 128x128 image plane, K in {64, 192, 576}, N in {64, 128, 192},
dtype in {bf16, int8}.  Prints achieved TFLOP/s (TOP/s for int8) per shape.

Usage: python scripts/pallas_matmul_probe.py  (runs on the default backend —
the real TPU on this host).
"""
from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_matmul(M, K, N, dtype, TM=2048):
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=acc_t).astype(o_ref.dtype)

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kernel,
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), dtype),
        )(x, w)

    return f


def timed_chain(fn, x, w, K_iters):
    """Dependency-chained scan timing (relay-safe); returns seconds/call."""

    @jax.jit
    def chain(x, w, seed):
        def body(c, _):
            y = fn(c, w)
            # The carry must depend on y in a way XLA cannot const-fold:
            # 0*y IS folded to 0 for integer dtypes, which makes the
            # pallas_call loop-invariant and hoists it out of the scan.
            if jnp.issubdtype(c.dtype, jnp.integer):
                bump = (y[0, 0] & 1).astype(c.dtype)
            else:
                bump = (0.0 * y[0, 0]).astype(c.dtype)
            return c + bump, y[0, 0]
        c, ys = jax.lax.scan(body, x + seed, None, length=K_iters)
        return jnp.sum(ys.astype(jnp.float32))

    one = jnp.asarray(np.array(1, dtype=x.dtype))
    float(chain(x, w, 0 * one))  # compile
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(chain(x, w, (i % 2) * one))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform}")
    M = 16384  # one 128x128 plane
    rng = np.random.default_rng(0)
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        for K in (64, 192, 576):
            for N in (64, 128, 192):
                if dtype == jnp.int8:
                    x = jnp.asarray(rng.integers(-100, 100, (M, K)), jnp.int8)
                    w = jnp.asarray(rng.integers(-100, 100, (K, N)), jnp.int8)
                else:
                    x = jnp.asarray(rng.uniform(-1, 1, (M, K)), dtype)
                    w = jnp.asarray(rng.uniform(-1, 1, (K, N)), dtype)
                f = make_matmul(M, K, N, dtype)
                reps = 2048  # ~20 ms of device work: clears the relay's ~ms jitter
                t1 = timed_chain(f, x, w, 1)
                tk = timed_chain(f, x, w, 1 + reps)
                per = (tk - t1) / reps
                flops = 2 * M * K * N
                print(f"{name} M={M} K={K:4d} N={N:4d}: {per * 1e6:8.1f} us  "
                      f"{flops / per / 1e12:7.1f} T{'OP' if name == 'int8' else 'FLOP'}/s")


if __name__ == "__main__":
    main()
