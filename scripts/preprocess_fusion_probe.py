"""Wire-or-retire probe for the fused Pallas preprocess kernel (VERDICT r4
item 2): measure CasTrainer.train_steps_u8 with fused_input on/off on TPU.

The kernel (ops/pallas/preprocess_kernel.py) does uint8 decode + luma +
MXU bilinear degrade in one VMEM pass; the default path is the XLA
convert+luma+interpolate chain, which XLA fuses into the step's first
convs.  This probe answers whether the hand fusion beats the compiler
fusion INSIDE the production K-steps-per-dispatch program (scan-slope
timing, bench.py methodology).

Usage: python scripts/preprocess_fusion_probe.py [batch [size [K]]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from srcgan_tpu import config
    from srcgan_tpu.train import CasTrainer

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} bs={bs} size={size} K={k}")

    config.set_conv_precision("default")
    results = {}
    for fused in (False, True):
        tr = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2,
                        act_dtype=jnp.bfloat16, fused_input=fused)
        st = tr.init(jax.random.PRNGKey(0))

        def run(kk, st):
            src = jnp.asarray(rng.integers(0, 256, (kk, bs, size, size, 3),
                                           dtype=np.uint8))
            tar = jnp.asarray(rng.integers(0, 256, (kk, bs, size, size, 3),
                                           dtype=np.uint8))
            st2, met = tr.train_steps_u8(
                jax.tree_util.tree_map(jnp.array, st), src, tar, 1e-4)
            # scalar materialization forces execution through the relay
            return float(np.asarray(met["loss_SR"])[-1])

        run(1, st)  # compile K=1
        run(1 + k, st)  # compile K=1+k
        ts1, tsk = [], []
        for i in range(3):
            t0 = time.perf_counter()
            run(1, st)
            ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(1 + k, st)
            tsk.append(time.perf_counter() - t0)
        per = (min(tsk) - min(ts1)) / k
        results[fused] = per
        print(f"fused_input={fused}: {per * 1000:.2f} ms/step "
              f"(t1={min(ts1):.3f}s tk={min(tsk):.3f}s)")

    delta = (results[False] - results[True]) / results[False] * 100
    print(f"kernel vs XLA: {delta:+.1f}% "
          f"({'kernel wins' if delta > 0 else 'XLA fusion wins'})")


if __name__ == "__main__":
    main()
