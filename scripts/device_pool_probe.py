"""Probe: host-pool split iteration vs the fused device-pool iteration.

The reference's default adversarial protocol keeps an ImagePool of 4
(train.py:352) — with the pool on host, each iteration is a g_step
dispatch, a fake-image D2H -> pool -> H2D hop, and a d_step dispatch.
CycleGANTrainer.gd_step_pooled moves the pool into the jit carry
(jax.random 50% replace) so the whole iteration is ONE program, like the
pool_size=0 fused path but with true pool semantics.

Measures bs=1 @256^2-target, net='1' x4 (bench_gan's flagship config),
bf16 acts, real host loop with per-iteration loss sync.  Run on TPU from
the repo root:
    python scripts/device_pool_probe.py

MEASURED (v5e, 2026-08, docs/PERF.md "Device-side ImagePool"):
host-pool split 284.4 / device-pool fused 184.5 ms per iteration (1.54x) —
the fused path lands within ~16 ms of the pool_size=0 gd_step (168 ms,
bench.py), i.e. the pool itself is nearly free once it rides the carry.
A later run: 261.0 / 189.9 (relay-load dependent; same ordering).

The --device-pool x --steps-per-dispatch composition (gd_steps_pooled_u8)
synthesizes realA at the reference's fixed 0.5x (train.py:380-382), so it
is measured at the x2 protocol against the per-iteration device-pool loop
on the SAME config: K=1 199.4 -> K=8 159.3 ms/iter (1.25x; the ~40 ms of
per-iteration dispatch + loss-sync overhead amortizes over the block).
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

B, S, ITERS = 1, 256, 12


def batches(seed, k):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (k, B, S, S, 3)).astype(np.float32)


def host_pool_loop(tr, st0, seed):
    st = jax.device_put(jax.tree_util.tree_map(np.asarray, st0))
    tars = batches(seed, ITERS + 1)
    down = 1.0 / tr.scale

    def prep(t):
        from srcgan_tpu import ops
        rB = jnp.asarray(t)
        rA = ops.interpolate(rB, scale_factor=down, mode="nearest")
        return rA, rB

    rA, rB = prep(tars[-1])
    st, aux = tr.optimize_parameters(st, rA, rB, 1e-4, 1e-5)
    float(aux["loss_G"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        rA, rB = prep(tars[i])
        st, aux = tr.optimize_parameters(st, rA, rB, 1e-4, 1e-5)
        float(aux["loss_G"])
    return (time.perf_counter() - t0) / ITERS * 1000


def device_pool_loop(tr, st0, seed):
    st = jax.device_put(jax.tree_util.tree_map(np.asarray, st0))
    tars = batches(seed, ITERS + 1)
    down = 1.0 / tr.scale

    def prep(t):
        from srcgan_tpu import ops
        rB = jnp.asarray(t)
        rA = ops.interpolate(rB, scale_factor=down, mode="nearest")
        return rA, rB

    rA, rB = prep(tars[-1])
    pools = tr.device_pool_init(st, rA, rB, seed=seed)
    st, pools, aux = tr.gd_step_pooled(st, pools, rA, rB, 1e-4, 1e-5)
    float(aux["loss_G"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        rA, rB = prep(tars[i])
        st, pools, aux = tr.gd_step_pooled(st, pools, rA, rB, 1e-4, 1e-5)
        float(aux["loss_G"])
    return (time.perf_counter() - t0) / ITERS * 1000


def pooled_spd_loop(tr, st0, seed, k=8, blocks=2):
    """--device-pool x --steps-per-dispatch: gd_steps_pooled_u8 blocks of K
    stateful-pool iterations per dispatch, uint8 batches crossing H2D as
    one stacked block (the production CLI composition)."""
    from srcgan_tpu import ops
    from srcgan_tpu.data import preprocess

    st = jax.device_put(jax.tree_util.tree_map(np.asarray, st0))
    rng = np.random.default_rng(seed)
    s_lr = S // tr.scale

    def block():
        s = rng.integers(0, 256, (k, B, s_lr, s_lr, 3), dtype=np.uint8)
        t = rng.integers(0, 256, (k, B, S, S, 3), dtype=np.uint8)
        return jnp.asarray(s), jnp.asarray(t)

    s0, t0_ = block()
    _, rB0 = preprocess.convert_pair(s0[0], t0_[0], "G2RGB")
    rA0 = ops.interpolate(rB0, scale_factor=1.0 / tr.scale, mode="nearest")
    pools = tr.device_pool_init(st, rA0, rB0, seed=seed)
    st, pools, _, rows = tr.gd_steps_pooled_u8(st, pools, s0, t0_,
                                               1e-4, 1e-5)
    float(np.asarray(rows["loss_G"])[-1])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(blocks):
        s, t = block()
        st, pools, _, rows = tr.gd_steps_pooled_u8(st, pools, s, t,
                                                   1e-4, 1e-5)
        float(np.asarray(rows["loss_G"])[-1])
    return (time.perf_counter() - t0) / (blocks * k) * 1000


def main():
    enable_compilation_cache()
    config.set_conv_precision("default")
    print(f"devices: {jax.devices()}")
    tr = CycleGANTrainer(net="1", mode="x4", act_dtype=jnp.bfloat16,
                         pool_size=4, remat=False)
    st0 = jax.device_get(tr.init(jax.random.PRNGKey(0)))
    for name, loop in (("host-pool split", host_pool_loop),
                       ("device-pool fused", device_pool_loop)):
        ts = [loop(tr, st0, seed) for seed in (1, 2)]
        print(f"{name:18s}: {min(ts):6.1f} ms/iter (runs: "
              + ", ".join(f"{t:.1f}" for t in ts)
              + f"; bs={B}, {S}^2 tar, x4 net='1', {ITERS} iters/run)")

    # --device-pool x --steps-per-dispatch: gd_steps_pooled_u8 synthesizes
    # realA at the reference's fixed 0.5x (train.py:380-382), so the
    # composition is exact at the x2 protocol — measure it there against
    # the per-iteration device-pool loop on the SAME x2 config.
    tr2 = CycleGANTrainer(net="1", mode="x2", act_dtype=jnp.bfloat16,
                          pool_size=4, remat=False)
    st2 = jax.device_get(tr2.init(jax.random.PRNGKey(0)))
    for name, loop in (("x2 device-pool K=1", device_pool_loop),
                       ("x2 device-pool K=8", pooled_spd_loop)):
        ts = [loop(tr2, st2, seed) for seed in (1, 2)]
        print(f"{name:18s}: {min(ts):6.1f} ms/iter (runs: "
              + ", ".join(f"{t:.1f}" for t in ts)
              + f"; bs={B}, {S}^2 tar, x2 net='1')")


if __name__ == "__main__":
    main()
