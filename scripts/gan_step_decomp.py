"""Decompose the fused GAN iteration's ~168 ms (v5e, flagship bench config).

bench.py's gan_step_ms times one fused gd_step: G update (6 generator
passes + 2 frozen-D forwards, joint backward, Adam) + D update (4 D
forwards + backward, Adam) at the reference protocol (train.py:325-340,
bs=1, 256^2 target, net='1' x4, bf16 generator acts, remat off,
pool_size=0).  This probe scan-slope times the parts to locate the wall,
plus one what-if: discriminators in bf16 (today D runs fp32 regardless of
--bf16-acts; train/cyclegan.py:235-238).

Run on TPU from the repo root: python scripts/gan_step_decomp.py
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


def make_data():
    rng = np.random.default_rng(0)
    b, s = 1, 256
    realB = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    realA = jnp.asarray(rng.uniform(0, 1, (b, s // 4, s // 4, 3)
                                    ).astype(np.float32))
    return realA, realB


def chain_step(tr, st0, realA, realB, fn, result):
    """make_chain for slope(): K dependency-chained fn(state, ...) calls."""
    def make(K):
        @jax.jit
        def chain(st, a, bb, seed):
            def body(carry, _):
                return fn(carry, a + seed * 1e-6, bb), 0.0
            st, _ = jax.lax.scan(body, st, jnp.arange(K))
            return result(st)
        return lambda seed: float(chain(st0, realA, realB,
                                        jnp.float32(seed)))
    return make


def main():
    enable_compilation_cache()
    config.set_conv_precision("default")
    realA, realB = make_data()

    def build(d_bf16=False):
        tr = CycleGANTrainer(net="1", mode="x4", act_dtype=jnp.bfloat16,
                             pool_size=0, remat=False)
        if d_bf16:
            for net in (tr.netD_A, tr.netD_B):
                orig = net.apply

                def apply(p, x, state=None, train=False, _orig=orig):
                    p16 = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16), p)
                    y, st = _orig(p16, x.astype(jnp.bfloat16), state=state,
                                  train=train)
                    st = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.float32), st)
                    return y.astype(jnp.float32), st

                net.apply = apply
        return tr, tr.init(jax.random.PRNGKey(0))

    tr, st0 = build()

    # 1. full fused iteration (the bench_gan number)
    full = chain_step(tr, st0, realA, realB,
                      lambda st, a, b: tr.gd_step(st, a, b, 1e-4, 1e-5)[0],
                      lambda st: jnp.mean(st.d.params["D_A"]["0"]["w"]))
    t_full = slope(full, 1, 4)
    print(f"gd_step full:            {t_full*1e3:8.1f} ms")

    # 2. G update only (frozen Ds; returns fakes we drop)
    g_only = chain_step(tr, st0, realA, realB,
                        lambda st, a, b: tr.g_step(st, a, b, 1e-4)[0],
                        lambda st: jnp.mean(st.g.params["G_A"]
                                            ["conv_first"]["w"]))
    t_g = slope(g_only, 1, 4)
    print(f"g_step only:             {t_g*1e3:8.1f} ms")

    # 3. D update only (pool_size=0: fakes = fresh generator outputs;
    #    feed fixed fakes so only the D fwd+bwd+Adam is timed)
    fake_B = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, realB.shape).astype(np.float32))
    fake_A = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, realA.shape).astype(np.float32))

    def d_fn(st, a, b):
        return tr.d_step(st, a, b, fake_A, fake_B, 1e-5)[0]

    d_only = chain_step(tr, st0, realA, realB, d_fn,
                        lambda st: jnp.mean(st.d.params["D_A"]["0"]["w"]))
    t_d = slope(d_only, 1, 4)
    print(f"d_step only:             {t_d*1e3:8.1f} ms")

    # 4. the 6 generator passes forward-only (no D, no grad): bounds the
    #    irreducible G forward work inside the G update
    def g_fwd(st, a, b):
        gp = st.g.params
        cast = lambda p: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), p)
        ga = lambda v: tr.netG_A.fwd(cast(gp["G_A"]), v, train=True)
        gb = lambda v: tr.netG_B.fwd(cast(gp["G_B"]), v, train=True)
        a16, b16 = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        gray, argb = tr._identity_inputs(a16, b16)
        fB = ga(a16)
        rA = gb(fB)
        fA = gb(b16)
        rB = ga(fA)
        iA = ga(gray)
        iB = gb(argb)
        s = sum(jnp.mean(v.astype(jnp.float32))
                for v in (fB, rA, fA, rB, iA, iB))
        # fold the scalar into the carried params so the scan chains
        g2 = jax.tree_util.tree_map(lambda x: x, st.g)
        g2 = g2._replace(step=st.g.step + (s * 0).astype(jnp.int32))
        return st._replace(g=g2)

    gf = chain_step(tr, st0, realA, realB, g_fwd,
                    lambda st: jnp.sum(st.g.step).astype(jnp.float32))
    t_gf = slope(gf, 1, 4)
    print(f"6 G passes fwd only:     {t_gf*1e3:8.1f} ms")

    # 5. what-if: discriminators in bf16 everywhere (G-step frozen forwards
    #    AND the D update) — perf bound only, numerics not studied here
    tr16, st16 = build(d_bf16=True)
    full16 = chain_step(tr16, st16, realA, realB,
                        lambda st, a, b: tr16.gd_step(st, a, b, 1e-4, 1e-5)[0],
                        lambda st: jnp.mean(st.d.params["D_A"]["0"]["w"]))
    t_full16 = slope(full16, 1, 4)
    print(f"gd_step, D in bf16:      {t_full16*1e3:8.1f} ms")

    print(f"\nsum g+d: {(t_g+t_d)*1e3:.1f} ms vs fused {t_full*1e3:.1f} ms; "
          f"G bwd+Adam overhead vs fwd: {(t_g-t_gf)*1e3:.1f} ms; "
          f"D-bf16 saves {(t_full-t_full16)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
