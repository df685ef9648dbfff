"""In-VMEM Pallas MXU rates at RDB5 shapes (bf16 / int8).

Unlike scripts/pallas_matmul_probe.py (HBM-fed single dots, which measure
the memory system as much as the MXU), each kernel call here runs 16
back-to-back DEPENDENT dots on VMEM-resident operands, so the slope isolates
the matmul engine.  The dependency is real (a data-dependent select/add of
the previous result) — 0*y-style perturbations get const-folded and the
dots CSE'd, which is how this probe once reported 9.9 POP/s.

Measured v5e (M=8320): bf16 126-162 TFLOP/s, int8 196-268 TOP/s at
K in {192,288,576}, N in {128,192} — the rates the fused RDB5 kernel design
(ops/pallas/rdb5_kernel.py, docs/PERF.md) is judged against.
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make(M, K, N, dtype, B):
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
    def kernel(x_ref, x2_ref, w_ref, o_ref):
        x = x_ref[:]
        acc = jnp.zeros((M, N), acc_t)
        for b in range(B):
            y = jax.lax.dot_general(x, w_ref[:], (((1,),(0,)),((),())),
                                    preferred_element_type=acc_t)
            acc = acc + y
            # REAL data dependency on y so the dots can't be CSE'd: select
            # the next operand based on y (int8 vector adds don't lower)
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = jnp.where((y[0, 0] & 1) == 0, x_ref[:], x2_ref[:])
            else:
                x = x + (y[0, 0] * jnp.float32(1e-36)).astype(x.dtype)
        o_ref[:] = acc
    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), acc_t),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(x, jnp.clip(x.astype(jnp.int32) + 1, -127, 127).astype(x.dtype)
          if jnp.issubdtype(x.dtype, jnp.integer) else x, w)
    return f

def timed(f, x, w, reps):
    @jax.jit
    def chain(x, w, s):
        def body(c, _):
            y = f(c, w)
            if jnp.issubdtype(c.dtype, jnp.integer):
                bump = (y[0, 0] & 1).astype(c.dtype)
            else:
                bump = (0.0 * y[0, 0]).astype(c.dtype)
            return c + bump, y[0, 0]
        c, ys = jax.lax.scan(body, x + s, None, length=reps)
        return jnp.sum(ys.astype(jnp.float32))
    one = jnp.asarray(np.array(1, x.dtype))
    float(chain(x, w, 0 * one))
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        float(chain(x, w, (i % 2) * one))
        ts.append(time.perf_counter() - t0)
    return min(ts)

rng = np.random.default_rng(0)
M, B = 8320, 16   # 64-row tile flat M; 16 dots back to back
for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
    for K, N in ((576, 128), (576, 192), (192, 128), (288, 128)):
        if dtype == jnp.int8:
            x = jnp.asarray(rng.integers(-100, 100, (M, K)), jnp.int8)
            w = jnp.asarray(rng.integers(-100, 100, (K, N)), jnp.int8)
        else:
            x = jnp.asarray(rng.uniform(-1, 1, (M, K)), dtype)
            w = jnp.asarray(rng.uniform(-1, 1, (K, N)), dtype)
        f = make(M, K, N, dtype, B)
        reps = 256
        t1 = timed(f, x, w, 1); tk = timed(f, x, w, 1 + reps)
        per = (tk - t1) / reps / B
        fl = 2 * M * K * N
        print(f"{name} K={K:4d} N={N:4d}: {per*1e6:7.2f} us/dot  "
              f"{fl/per/1e12:6.1f} T{'OP' if name=='int8' else 'FLOP'}/s")
