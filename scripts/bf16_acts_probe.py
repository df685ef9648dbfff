"""Measure the act_dtype=bf16 train step vs the fp32-activation step.

Scan-slope (bench.py methodology) of the fused CasTrainer step
(RDDBNet+ResDeconv x2, bs=8, 256^2, conv precision "default") with and
without bf16 stored activations.  Run on TPU from the repo root:
    python scripts/bf16_acts_probe.py
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
from srcgan_tpu.train import CasTrainer


def main():
    enable_compilation_cache()
    config.set_conv_precision("default")
    rng = np.random.default_rng(0)
    b, s = 8, 256
    tar = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    src = jnp.asarray((np.asarray(tar) @ np.array(
        [0.2125, 0.7154, 0.0721], np.float32))[..., None])

    print("platform:", jax.devices()[0].platform)
    for name, act in (("fp32 acts", None), ("bf16 acts", jnp.bfloat16)):
        tr = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2,
                        act_dtype=act)
        st0 = tr.init(jax.random.PRNGKey(0))

        def make(K):
            @jax.jit
            def chain(st, a, t, seed):
                def body(carry, i):
                    stc, _ = tr.train_step(carry, a + seed * 1e-6, t, 1e-4)
                    return stc, 0.0
                st, _ = jax.lax.scan(body, st, jnp.arange(K))
                return jnp.mean(st.sr.params["conv_first"]["w"])
            return lambda seed: float(chain(st0, src, tar,
                                           jnp.float32(seed)))

        t = slope(make)
        print(f"{name}: {t*1e3:6.1f} ms/step "
              f"({b / t:.0f} samples/s)")


if __name__ == "__main__":
    main()
