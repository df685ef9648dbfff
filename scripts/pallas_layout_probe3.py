"""Round-3 Mosaic probes for a whole-RDB5 bf16 kernel design decision.

The round-2 kernels lost to relayout copies at C-minor=64 (docs/PERF.md
"Fused RDB5 Pallas kernels").  The candidate round-3 design stores
activations as (H*W, C) 2-D tiles (C in lanes, pixels in sublanes) so conv
taps become SUBLANE shifts (jnp.roll on axis 0), which Mosaic handles
without the lane-rotate/lane-concat failures.  Open questions, probed here
on real v5e hardware:

  A. in-VMEM dot rate at the shallow K this layout implies (K=32/64/128 vs
     the 126-162 TFLOP/s measured at K>=192) — is a 9-dot tap decomposition
     MXU-viable at all?
  B. tap-pair K-stacking: lane-concat two (M,64) bf16 tiles -> (M,128) then
     one K=128 dot, vs two K=64 dots — does Mosaic lane-concat aligned
     64-lane halves cheaply for bf16?
  C. sublane roll cost: jnp.roll((M,64), +-1 and +-W, axis=0) — the tap
     shift primitive.
  D. stage-1 end-to-end candidate: build the (M, 9*64) im2col buffer by 9
     sublane-rolled lane-slice stores, then one K=576 dot -> (M,192); vs
     XLA's measured 195 us for the same 64->192 conv at this size.

Run on TPU: python scripts/pallas_layout_probe3.py
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM = 100 * 1024 * 1024


def timed(jitted, *args, reps=64):
    """Scan-slope timing of `reps` dependent kernel calls inside one jit."""
    @jax.jit
    def chain(s, *a):
        def body(c, _):
            y = jitted(c, *a[1:]) if a else jitted(c)
            return c + (0.0 * y.reshape(-1)[0]).astype(c.dtype), y.reshape(-1)[0]
        c, ys = jax.lax.scan(body, a[0] + s, None, length=reps)
        return jnp.sum(ys.astype(jnp.float32))

    one = jnp.asarray(np.array(1e-3, args[0].dtype))
    float(chain(0 * one, *args))
    ts = []
    # every timed call at a FRESH seed: identical argument bytes may be
    # result-cached by the axon relay (a ~30 ms dispatch, no execution)
    for i in range(3):
        t0 = time.perf_counter()
        float(chain((i + 1) * one, *args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope(make_fn, args1, argsk, reps=64):
    t1 = timed(make_fn, *args1, reps=1)
    tk = timed(make_fn, *argsk, reps=1 + reps)
    return (tk - t1) / reps


# -- A: dot rates at shallow K -------------------------------------------------

def probe_dots(M=16384):
    rng = np.random.default_rng(0)
    print(f"A. in-VMEM bf16 dot rates, M={M} (16 dependent dots per call)")
    B = 16
    for K, N in ((32, 192), (64, 192), (64, 64), (128, 192), (128, 128),
                 (576, 192)):
        x = jnp.asarray(rng.uniform(-1, 1, (M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.uniform(-1, 1, (K, N)), jnp.bfloat16)

        def kernel(x_ref, w_ref, o_ref):
            xx = x_ref[:]
            acc = jnp.zeros((M, N), jnp.float32)
            for _ in range(B):
                y = jax.lax.dot_general(xx, w_ref[:], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = acc + y
                xx = xx + (y[0, 0] * jnp.float32(1e-36)).astype(xx.dtype)
            o_ref[:] = acc

        @jax.jit
        def f(x, w):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
            )(x, w)

        per = slope(f, (x, w), (x, w), reps=64) / B
        fl = 2 * M * K * N
        print(f"  K={K:4d} N={N:4d}: {per*1e6:7.2f} us/dot "
              f"{fl/per/1e12:6.1f} TFLOP/s")


# -- B: lane-concat + K=128 dot vs two K=64 dots -------------------------------

def probe_concat_dot(M=16384, N=192):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-1, 1, (M, 64)), jnp.bfloat16)
    w128 = jnp.asarray(rng.uniform(-1, 1, (128, N)), jnp.bfloat16)
    B = 8
    print(f"B. tap-pair stacking, M={M} N={N} ({B} dependent pairs per call)")

    def k_concat(a_ref, w_ref, o_ref):
        aa = a_ref[:]
        acc = jnp.zeros((M, N), jnp.float32)
        for _ in range(B):
            cat = jnp.concatenate([aa, aa * 0.5], axis=1)
            y = jax.lax.dot_general(cat, w_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = acc + y
            aa = aa + (y[0, 0] * jnp.float32(1e-36)).astype(aa.dtype)
        o_ref[:] = acc

    def k_twodots(a_ref, w_ref, o_ref):
        aa = a_ref[:]
        acc = jnp.zeros((M, N), jnp.float32)
        for _ in range(B):
            y = jax.lax.dot_general(aa, w_ref[:64], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = y + jax.lax.dot_general(aa * 0.5, w_ref[64:],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            acc = acc + y
            aa = aa + (y[0, 0] * jnp.float32(1e-36)).astype(aa.dtype)
        o_ref[:] = acc

    for name, kern in (("concat+K128 dot", k_concat), ("two K=64 dots", k_twodots)):
        @jax.jit
        def f(a, w, kern=kern):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
            )(a, w)
        try:
            per = slope(f, (a, w128), (a, w128), reps=64) / B
            fl = 2 * M * 128 * N
            print(f"  {name:18s}: {per*1e6:7.2f} us  {fl/per/1e12:6.1f} TFLOP/s")
        except Exception as e:
            print(f"  {name:18s}: FAILS — {str(e).splitlines()[0][:100]}")


# -- C: sublane roll cost ------------------------------------------------------

def probe_roll(M=16384, C=64):
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(-1, 1, (M, C)), jnp.bfloat16)
    B = 16
    print(f"C. sublane jnp.roll on ({M},{C}) bf16 ({B} dependent rolls per call)")
    for shift in (1, 128):
        def kernel(a_ref, o_ref, shift=shift):
            aa = a_ref[:]
            for _ in range(B):
                aa = jnp.roll(aa, shift, axis=0)
                aa = aa + jnp.bfloat16(1e-8)  # dependency
            o_ref[:] = aa

        @jax.jit
        def f(a):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
            )(a)
        try:
            per = slope(f, (a,), (a,), reps=64) / B
            gbs = M * C * 2 / per / 1e9
            print(f"  roll {shift:4d}: {per*1e6:7.2f} us  {gbs:6.0f} GB/s")
        except Exception as e:
            print(f"  roll {shift:4d}: FAILS — {str(e).splitlines()[0][:100]}")


# -- D: stage-1 candidate: im2col via 9 rolled lane-slice stores + K=576 dot ---

def probe_stage1(M=16384):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (M, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.uniform(-1, 1, (576, 192)), jnp.bfloat16)
    W = 128  # row stride of the dy taps
    B = 4
    print(f"D. stage-1 candidate (im2col scratch + K=576 dot), M={M} "
          f"({B} dependent stages per call) — XLA conv reference: 195 us at "
          f"batch 8 = ~24 us per image (M=16384)")

    def kernel(x_ref, w_ref, o_ref, col_ref):
        xx = x_ref[:]
        acc = jnp.zeros((M, 192), jnp.float32)
        for _ in range(B):
            t = 0
            for dy in (-W, 0, W):
                for dx in (-1, 0, 1):
                    s = dy + dx
                    col_ref[:, 64 * t:64 * (t + 1)] = (
                        xx if s == 0 else jnp.roll(xx, s, axis=0))
                    t += 1
            y = jax.lax.dot_general(col_ref[:], w_ref[:],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = acc + y
            xx = xx + (y[0, 0] * jnp.float32(1e-36)).astype(xx.dtype)
        o_ref[:] = acc

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, 192), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, 576), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
        )(x, w)

    try:
        per = slope(f, (x, w), (x, w), reps=16) / B
        fl = 2 * M * 576 * 192
        print(f"  im2col+dot: {per*1e6:7.2f} us  {fl/per/1e12:6.1f} TFLOP/s "
              f"(XLA-parity bar: 24 us)")
    except Exception as e:
        print(f"  im2col+dot: FAILS — {str(e).splitlines()[0][:150]}")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    which = sys.argv[1] if len(sys.argv) > 1 else "abcd"
    if "a" in which:
        probe_dots()
    if "b" in which:
        probe_concat_dot()
    if "c" in which:
        probe_roll()
    if "d" in which:
        probe_stage1()
