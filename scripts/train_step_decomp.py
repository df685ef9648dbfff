"""Decompose the cascaded train step's 56 ms (v5e, bs=8, 256^2, bf16).

Scan-slope times (bench.py methodology) for: the full fused CasTrainer step,
the SR-stage-only update, the colorizer-only update, and forward-only
variants — to locate the wall before optimizing it.

Run on TPU from the repo root: python scripts/train_step_decomp.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import slope  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp
import optax

from srcgan_tpu import config, losses
from srcgan_tpu.config import enable_compilation_cache
from srcgan_tpu.data import preprocess
from srcgan_tpu.train import CasTrainer, optim


def main():
    enable_compilation_cache()
    config.set_conv_precision("default")
    tr = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2)
    st0 = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, s = 8, 256
    tar = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    src = jnp.asarray((np.asarray(tar) @ np.array(
        [0.2125, 0.7154, 0.0721], np.float32))[..., None])
    real_BC = preprocess.luma(tar)
    real_BA = preprocess.degrade_bilinear(real_BC, 2)

    def full(K):
        @jax.jit
        def chain(st, a, t, seed):
            def body(carry, i):
                stc, _ = tr.train_step(carry, a + seed * 1e-6, t, 1e-4)
                return stc, 0.0
            st, _ = jax.lax.scan(body, st, jnp.arange(K))
            return jnp.mean(st.sr.params["conv_first"]["w"])
        return lambda seed: float(chain(st0, src, tar,
                                        jnp.float32(seed)))

    def stage(which):  # 'sr' | 'c' single-net update only
        net = tr.netG_A2C if which == "sr" else tr.netG_C2B
        ts0 = st0.sr if which == "sr" else st0.c
        x_in = real_BA if which == "sr" else real_BC
        tgt = real_BC if which == "sr" else tar

        def make(K):
            @jax.jit
            def chain(ts, x, t, seed):
                def body(carry, i):
                    def loss(p):
                        y, _ = net.apply(p, x + seed * 1e-6, state={},
                                         train=True)
                        return losses.l1(y, t)
                    g = jax.grad(loss)(carry.params)
                    o = optim.set_lr(carry.opt_state, 1e-4)
                    up, o = tr.opt.update(g, o, carry.params)
                    return carry._replace(
                        params=optax.apply_updates(carry.params, up),
                        opt_state=o), 0.0
                ts, _ = jax.lax.scan(body, ts, jnp.arange(K))
                return jnp.mean(jax.tree_util.tree_leaves(ts.params)[0])
            return lambda seed: float(chain(ts0, x_in, tgt,
                                            jnp.float32(seed)))
        return make

    def fwd_only(which):
        net = tr.netG_A2C if which == "sr" else tr.netG_C2B
        p0 = (st0.sr if which == "sr" else st0.c).params
        x_in = real_BA if which == "sr" else real_BC

        def make(K):
            @jax.jit
            def chain(p, x, seed):
                def body(c, _):
                    y, _ = net.apply(p, c, state={}, train=True)
                    return c + (0.0 * jnp.mean(y)).astype(c.dtype), jnp.mean(y)
                _, ys = jax.lax.scan(body, x + seed, None, length=K)
                return jnp.sum(ys)
            return lambda seed: float(chain(p0, x_in,
                                            jnp.float32(seed * 1e-6)))
        return make

    print("platform:", jax.devices()[0].platform)
    t_full = slope(full)
    print(f"full train step:        {t_full*1e3:6.1f} ms")
    t_sr = slope(stage("sr"))
    print(f"SR-stage update only:   {t_sr*1e3:6.1f} ms  (RDDBNet x2 fwd+bwd+adam)")
    t_c = slope(stage("c"))
    print(f"colorizer update only:  {t_c*1e3:6.1f} ms  (ResDeconv fwd+bwd+adam)")
    t_srf = slope(fwd_only("sr"))
    print(f"SR fwd only:            {t_srf*1e3:6.1f} ms")
    t_cf = slope(fwd_only("c"))
    print(f"colorizer fwd only:     {t_cf*1e3:6.1f} ms")
    print(f"sum of stages vs full:  {(t_sr+t_c)*1e3:6.1f} vs {t_full*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
