"""Measure the --steps-per-dispatch win: K train steps per device dispatch.

The reference trains at batch 1 (trainCas.py:187), where the per-call
dispatch + host sync overhead (~30 ms through the axon relay) rivals the
step's device time.  CasTrainer.train_steps_u8 scans K steps inside ONE
jit program, so a host training loop pays one dispatch + one metrics sync
per K steps.  This probe times the REAL host loop (H2D of fresh uint8
batches, dispatch, float() metrics sync — exactly what cli.train_cas does)
at K=1 vs K=8 and reports ms per optimization step.

Honest-through-the-relay: every call carries fresh batch bytes (no result
caching possible), each dispatch consumes the previous dispatch's donated
state (dependency chain), and the float() sync per dispatch forces
materialization.

Run on TPU from the repo root: python scripts/steps_per_dispatch_probe.py
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
from srcgan_tpu.train import CasTrainer

B, S, STEPS = 1, 256, 16  # the reference protocol: batch 1 @ 256^2


def batches(seed, n):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, (n, B, S, S, 3), dtype=np.uint8)
    tar = rng.integers(0, 256, (n, B, S, S, 3), dtype=np.uint8)
    return src, tar


def loop(tr, st0, k, seed):
    """STEPS optimization steps, k per dispatch; returns ms/step."""
    st = jax.device_put(jax.tree_util.tree_map(np.asarray, st0))
    src, tar = batches(seed, STEPS)
    # warm the compile at this K outside the timed region
    wsrc, wtar = batches(seed + 999, k)
    if k == 1:
        wst, m = tr.train_step_u8(st, jnp.asarray(wsrc[0]),
                                  jnp.asarray(wtar[0]), 1e-4)
        float(m["loss_SR"])
    else:
        wst, m = tr.train_steps_u8(st, jnp.asarray(wsrc), jnp.asarray(wtar),
                                   1e-4)
        float(np.asarray(m["loss_SR"]).sum())
    st = wst
    t0 = time.perf_counter()
    for i in range(0, STEPS, k):
        if k == 1:
            st, m = tr.train_step_u8(st, jnp.asarray(src[i]),
                                     jnp.asarray(tar[i]), 1e-4)
            float(m["loss_SR"])  # per-step sync, as cli.train_cas does
        else:
            st, m = tr.train_steps_u8(st, jnp.asarray(src[i:i + k]),
                                      jnp.asarray(tar[i:i + k]), 1e-4)
            float(np.asarray(m["loss_SR"]).sum())  # one sync per K steps
    total = time.perf_counter() - t0
    return total / STEPS * 1000


def gan_loop(tr, st0, k, seed):
    """STEPS fused G+D iterations, k per dispatch; returns ms/iteration.

    k=1 reproduces cli.train_cyclegan's per-iteration path (device
    convert_pair + net='1' realA synthesis + gd_step + loss sync — 2-3
    dispatches/iter); k>1 is the gd_steps_u8 block path."""
    from srcgan_tpu import ops
    from srcgan_tpu.data import preprocess

    st = jax.device_put(jax.tree_util.tree_map(np.asarray, st0))
    src, tar = batches(seed, STEPS)
    wsrc, wtar = batches(seed + 999, max(k, 1))
    if k == 1:
        _, rB = preprocess.convert_pair(jnp.asarray(wsrc[0]),
                                        jnp.asarray(wtar[0]), "G2RGB")
        rA = ops.interpolate(rB, scale_factor=0.5, mode="nearest")
        wst, aux = tr.gd_step(st, rA, rB, 1e-4, 1e-5)
        float(aux["loss_G"])
    else:
        wst, _, rows = tr.gd_steps_u8(st, jnp.asarray(wsrc),
                                      jnp.asarray(wtar), 1e-4, 1e-5)
        float(np.asarray(rows["loss_G"]).sum())
    st = wst
    t0 = time.perf_counter()
    for i in range(0, STEPS, k):
        if k == 1:
            _, rB = preprocess.convert_pair(jnp.asarray(src[i]),
                                            jnp.asarray(tar[i]), "G2RGB")
            rA = ops.interpolate(rB, scale_factor=0.5, mode="nearest")
            st, aux = tr.gd_step(st, rA, rB, 1e-4, 1e-5)
            float(aux["loss_G"])
        else:
            st, _, rows = tr.gd_steps_u8(st, jnp.asarray(src[i:i + k]),
                                         jnp.asarray(tar[i:i + k]), 1e-4, 1e-5)
            float(np.asarray(rows["loss_G"]).sum())
    total = time.perf_counter() - t0
    return total / STEPS * 1000


def main():
    enable_compilation_cache()
    config.set_conv_precision("default")
    print(f"devices: {jax.devices()}")
    tr = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2,
                    act_dtype=jnp.bfloat16)
    st0 = jax.device_get(tr.init(jax.random.PRNGKey(0)))
    for k in (1, 8):
        ts = [loop(tr, st0, k, seed) for seed in (1, 2)]
        print(f"cas K={k}: {min(ts):.1f} ms/step (runs: "
              + ", ".join(f"{t:.1f}" for t in ts)
              + f"; bs={B}, {S}x{S}, bf16 acts, {STEPS} steps/run)")

    if "--gan" in sys.argv[1:]:
        from srcgan_tpu.train.cyclegan import CycleGANTrainer

        gan = CycleGANTrainer(net="1", mode="x2", act_dtype=jnp.bfloat16,
                              pool_size=0, remat=False)
        gst0 = jax.device_get(gan.init(jax.random.PRNGKey(0)))
        for k in (1, 8):
            ts = [gan_loop(gan, gst0, k, seed) for seed in (1, 2)]
            print(f"gan K={k}: {min(ts):.1f} ms/iter (runs: "
                  + ", ".join(f"{t:.1f}" for t in ts)
                  + f"; bs={B}, {S}x{S} tar, x2 net='1', {STEPS} iters/run)")


if __name__ == "__main__":
    main()
