"""Probe: can policy-based rematerialization speed up the BANDWIDTH-limited
cascaded train step?

docs/PERF.md's cost model says the fused Cas step is HBM-bound (82 GB of
cost-model bytes/step at 36% MFU with bf16 acts), i.e. the MXU idles while
stored residuals stream.  Rematerialization normally trades FLOPs for
memory CAPACITY, but on a bandwidth-bound program it can also trade FLOPs
for memory TRAFFIC: a `jax.checkpoint` policy that saves only conv outputs
(`conv_general_dilated` results) lets AD recompute every elementwise /
concat / resize value in the backward instead of round-tripping it through
HBM.

Measures the flagship config (RDDBNet+ResDeconv x2 cascade, bs=8 @256²,
bf16 acts) with:
  none    — the production step (no remat)
  full    — jax.checkpoint, default save-nothing policy (the --remat path)
  convs   — jax.checkpoint, save-only-conv-results policy
Scan-slope timed (CLAUDE.md methodology).  Run on TPU from the repo root:
    python scripts/remat_policy_probe.py

MEASURED (v5e, 2026-08, docs/PERF.md "Remat-as-bandwidth-saver"): negative.
none 35.7 / convs 43.4 / full 44.8 ms per step — the elementwise glue AD
would re-derive is already fused into XLA's conv backward kernels (it never
round-tripped through HBM), so the policy only recovers 1.4 of full
remat's 9.1 ms penalty.  No-remat stays the production default.
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

B, S = 8, 256


def save_conv_results(prim, *_, **__):
    return prim.name == "conv_general_dilated"


def make_step(mode):
    tr = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2,
                    act_dtype=jnp.bfloat16, remat=(mode == "full"))
    if mode == "convs":
        tr.remat = True
        orig_checkpoint = jax.checkpoint

        # CasTrainer._apply calls jax.checkpoint(f); give it the policy by
        # running the trace under a patched alias (probe-only hack — if this
        # wins, the trainer grows a remat_policy argument).
        def step(st, a, b, lr):
            import srcgan_tpu.train.cas as cas_mod
            cas_mod.jax.checkpoint = lambda f: orig_checkpoint(
                f, policy=save_conv_results)
            try:
                return tr.train_step.__wrapped__(tr, st, a, b, lr)
            finally:
                cas_mod.jax.checkpoint = orig_checkpoint
    else:
        def step(st, a, b, lr):
            return tr.train_step.__wrapped__(tr, st, a, b, lr)
    return tr, step


def measure(mode):
    tr, step = make_step(mode)
    st0 = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tar = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    src = jnp.asarray((np.asarray(tar) @ np.array(
        [0.2125, 0.7154, 0.0721], np.float32))[..., None])

    def timed_chain(K):
        @jax.jit
        def chain(st, a, t, seed):
            def body(carry, _):
                stc, _ = step(carry, a + seed * 1e-6, t, 1e-4)
                return stc, 0.0
            st, _ = jax.lax.scan(body, st, jnp.arange(K))
            return jnp.mean(st.sr.params["conv_first"]["w"])

        float(chain(st0, src, tar, jnp.float32(0)))
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            float(chain(st0, src, tar, jnp.float32(i + 1)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t5 = timed_chain(1), timed_chain(5)
    return (t5 - t1) / 4 * 1000


def main():
    enable_compilation_cache()
    config.set_conv_precision("default")
    print(f"devices: {jax.devices()}")
    for mode in ("none", "convs", "full"):
        ms = measure(mode)
        print(f"remat={mode:6s}: {ms:6.1f} ms/step "
              f"({B / ms * 1000:.0f} samples/s)")


if __name__ == "__main__":
    main()
