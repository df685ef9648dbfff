"""GAN iteration batch-scaling probe: where does the 10% MFU come from?

bench.py's gan_mfu_pct (~10%, round 4) judges the fused gd_step at the
REFERENCE protocol — batch 1 (train.py hardcodes batch_size=1,
train.py:350) — against the MXU.  This probe measures the same fused
iteration at growing batch sizes to separate "the framework wastes the
machine" from "bs=1 work is too small to fill the MXU": if samples/s
scales near-linearly while ms/iter grows sublinearly, the step is
latency/occupancy-bound at bs=1 and the framework has the headroom the
protocol chooses not to use.

remat ON for bs >= 2: measured here, the six-pass no-remat backward at
bs=2 @256² already wants 18.9 GB of HBM temp (15.75 available) — bs=1 is
the only no-remat point.

Run on TPU from the repo root: python scripts/gan_batch_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import slope  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from srcgan_tpu import config
from srcgan_tpu.config import enable_compilation_cache
from srcgan_tpu.train.cyclegan import CycleGANTrainer


def make_data(b):
    rng = np.random.default_rng(0)
    s = 256
    realB = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    realA = jnp.asarray(rng.uniform(0, 1, (b, s // 4, s // 4, 3)
                                    ).astype(np.float32))
    return realA, realB


def measure(b, remat):
    tr = CycleGANTrainer(net="1", mode="x4", act_dtype=jnp.bfloat16,
                         pool_size=0, remat=remat)
    st0 = tr.init(jax.random.PRNGKey(0))
    realA, realB = make_data(b)

    def make(K):
        @jax.jit
        def chain(st, a, bb, seed):
            def body(carry, _):
                stc, _ = tr.gd_step(carry, a + seed * 1e-6, bb, 1e-4, 1e-5)
                return stc, 0.0
            st, _ = jax.lax.scan(body, st, jnp.arange(K))
            return jnp.mean(st.d.params["D_A"]["0"]["w"])
        return lambda seed: float(chain(st0, realA, realB,
                                        jnp.float32(seed)))

    return slope(make, 1, 4)


def main():
    enable_compilation_cache()
    config.set_conv_precision("default")
    print(f"{'batch':>5} {'remat':>5} {'ms/iter':>9} {'samples/s':>10}")
    base = None
    for b, remat in ((1, False), (2, True), (4, True), (8, True)):
        t = measure(b, remat)
        if base is None:
            base = t
        print(f"{b:>5} {str(remat):>5} {t*1e3:9.1f} {b/t:10.1f}"
              f"   ({t/base:.2f}x the bs=1 iter time for {b}x the work)")


if __name__ == "__main__":
    main()
