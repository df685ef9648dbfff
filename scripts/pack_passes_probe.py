"""Probe: pass-packed vs sequential generator forwards in the GAN G step.

The reference's G update runs six generator passes (train.py:228-260) —
fake/recl/iden in both directions — each at the protocol's batch size 1,
where a single pass underfills the MXU.  The passes form a 3-level
dependency DAG, so same-net independent inputs batch together:

    g_b([realB ; A2RGB])            -> [fake_A ; iden_B]   (batch 2N)
    g_a([realA ; B2Gry ; fake_A])   -> [fake_B ; iden_A ; recl_B]  (3N)
    g_b(fake_B)                     -> recl_A              (N)

Exact per-sample math (all CycleGAN generators are conv-only — no
batch-coupled ops; equivalence-tested in tests/test_train.py).  This probe
measures the fused gd_step on the bench_gan flagship config (net='1' x4,
bs=1 @256^2 target, bf16 acts, remat off, pool_size=0) with packing on and
off, scan-slope timed.  Run on TPU from the repo root:

    python scripts/pack_passes_probe.py

MEASURED (v5e, 2026-08-18, docs/PERF.md "Pass-packed GAN generator step"):
NEGATIVE — packing is ~7% SLOWER at the protocol shapes:
    gd_step   unpacked 167.2 -> packed 179.1 ms/iter
    gd_pooled unpacked 166.9 -> packed 181.5 ms/iter
At bs=1 @256^2 each pass already feeds the MXU ~65k pixel rows (convs
im2col over N*H*W), so batching the batch axis adds nothing — while
collapsing six independent pass chains into three strictly-dependent ones
removes the scheduler's inter-pass overlap.  pack_passes therefore
defaults to False and remains an equivalence-tested option.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from srcgan_tpu import config
from srcgan_tpu.config import enable_compilation_cache
from srcgan_tpu.train.cyclegan import CycleGANTrainer


def timed_chain(tr, st0, realA, realB, K):
    @jax.jit
    def chain(st, a, bb, seed):
        def body(carry, _):
            stc, _ = tr.gd_step(carry, a + seed * 1e-6, bb, 1e-4, 1e-5)
            return stc, 0.0
        st, _ = jax.lax.scan(body, st, jnp.arange(K))
        return jnp.mean(st.d.params["D_A"]["0"]["w"])

    float(chain(st0, realA, realB, jnp.float32(0)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chain(st0, realA, realB, jnp.float32(i + 1)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed_chain_pooled(tr, st0, pools0, realA, realB, K):
    @jax.jit
    def chain(st, pools, a, bb, seed):
        def body(carry, _):
            stc, pc = carry
            stc, pc, _ = tr.gd_step_pooled(stc, pc, a + seed * 1e-6,
                                           bb, 1e-4, 1e-5)
            return (stc, pc), 0.0
        (st, _), _ = jax.lax.scan(body, (st, pools), jnp.arange(K))
        return jnp.mean(st.d.params["D_A"]["0"]["w"])

    float(chain(st0, pools0, realA, realB, jnp.float32(0)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chain(st0, pools0, realA, realB, jnp.float32(i + 1)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    enable_compilation_cache()
    config.set_conv_precision("default")
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    b, s = 1, 256
    realB = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    realA = jnp.asarray(rng.uniform(0, 1, (b, s // 4, s // 4, 3)
                                    ).astype(np.float32))

    for pack in (False, True):
        tr = CycleGANTrainer(net="1", mode="x4", act_dtype=jnp.bfloat16,
                             pool_size=0, remat=False, pack_passes=pack)
        st0 = tr.init(jax.random.PRNGKey(0))
        t1 = timed_chain(tr, st0, realA, realB, 1)
        t4 = timed_chain(tr, st0, realA, realB, 4)
        per = (t4 - t1) / 3
        print(f"gd_step   pack_passes={pack!s:5s}: {per * 1000:6.1f} ms/iter")

    for pack in (False, True):
        tr = CycleGANTrainer(net="1", mode="x4", act_dtype=jnp.bfloat16,
                             pool_size=4, remat=False, pack_passes=pack)
        st0 = tr.init(jax.random.PRNGKey(0))
        pools0 = tr.device_pool_init(st0, realA, realB, seed=0)
        p1 = timed_chain_pooled(tr, st0, pools0, realA, realB, 1)
        p4 = timed_chain_pooled(tr, st0, pools0, realA, realB, 4)
        per = (p4 - p1) / 3
        print(f"gd_pooled pack_passes={pack!s:5s}: {per * 1000:6.1f} ms/iter")


if __name__ == "__main__":
    main()
