"""Probe: XLA compiler options on the flagship programs.

The kernel-level campaigns (docs/PERF.md rounds 1-3) all ended at "the XLA
conv emitter is the wall"; this probe turns the remaining stone — the
compiler's own knobs.  Per-jit ``compiler_options`` ride the PJRT compile
request (they work through the axon relay, unlike XLA_FLAGS env vars which
only reach a local compiler), so every combo compiles in-process.

Programs measured (scan-slope, bench.py methodology):
  fwd    flagship RDDBNet(1,1,4) bf16 forward, bs=8 @128^2 (bench_jax config)
  train  fused cascaded train step, bf16 acts (bench_train config)

Options probed:
  scoped-VMEM limit (bigger fusion buffers; docs/PERF.md measured the chip
  accepts ~100 MB scoped kernels vs the 16 MB default), the latency-hiding
  scheduler, and flag combos thereof.  Unknown/rejected options are recorded
  as such, not skipped silently.

Usage: python scripts/xla_flags_probe.py [fwd|train|all]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

COMBOS = {
    "baseline": None,
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "vmem_64m+lhs": {"xla_tpu_scoped_vmem_limit_kib": "65536",
                     "xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def probe_fwd() -> dict:
    import jax
    import jax.numpy as jnp

    from scripts._bench_util import slope
    from srcgan_tpu import config, models

    config.set_conv_precision("default")
    model = models.RDDBNet(1, 1, 4)
    params = model.init(jax.random.PRNGKey(0))
    p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (8, 128, 128, 1)).astype(np.float32)).astype(jnp.bfloat16)

    out = {}
    for name, opts in COMBOS.items():
        def make_chain(K, _opts=opts):
            def chain(p_, v, seed):
                def body(c, _):
                    y = model.fwd(p_, c)
                    return c + (0.0 * jnp.mean(y)).astype(c.dtype), jnp.mean(y)
                _, ys = jax.lax.scan(body, v + seed.astype(v.dtype), None,
                                     length=K)
                return jnp.sum(ys)

            jitted = jax.jit(chain, compiler_options=_opts)
            return lambda seed: float(jitted(p, x, jnp.float32(seed * 1e-3)))

        try:
            per = slope(make_chain, k1=1, k2=9, tries=3)
            out[name] = round(per * 1000, 2)
            print(f"fwd {name:14s} {per * 1000:7.2f} ms "
                  f"({8 * 512 * 512 / 1e6 / per:.0f} MP/s)", flush=True)
        except Exception as e:  # noqa: BLE001 — record rejected combos
            out[name] = f"rejected: {str(e)[:120]}"
            print(f"fwd {name:14s} {out[name]}", flush=True)
    config.set_conv_precision("highest")
    return out


def probe_train() -> dict:
    import jax
    import jax.numpy as jnp

    from scripts._bench_util import slope
    from srcgan_tpu import config
    from srcgan_tpu.train import CasTrainer

    config.set_conv_precision("default")
    rng = np.random.default_rng(0)
    b, s = 8, 256
    tar = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    src = jnp.asarray((np.asarray(tar) @ np.array(
        [0.2125, 0.7154, 0.0721], np.float32))[..., None])
    tr = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2,
                    act_dtype=jnp.bfloat16)
    st0 = tr.init(jax.random.PRNGKey(0))

    out = {}
    for name, opts in COMBOS.items():
        def make_chain(K, _opts=opts):
            def chain(st, a, t, seed):
                def body(carry, _):
                    stc, _ = tr.train_step(carry, a + seed * 1e-6, t, 1e-4)
                    return stc, 0.0
                st, _ = jax.lax.scan(body, st, None, length=K)
                return jnp.mean(st.sr.params["conv_first"]["w"])

            jitted = jax.jit(chain, compiler_options=_opts)
            return lambda seed: float(jitted(st0, src, tar,
                                             jnp.float32(seed)))

        try:
            per = slope(make_chain, k1=1, k2=5, tries=3)
            out[name] = round(per * 1000, 2)
            print(f"train {name:14s} {per * 1000:7.2f} ms/step "
                  f"({b / per:.0f} samples/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            out[name] = f"rejected: {str(e)[:120]}"
            print(f"train {name:14s} {out[name]}", flush=True)
    config.set_conv_precision("highest")
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if which in ("fwd", "all"):
        res["fwd_ms"] = probe_fwd()
    if which in ("train", "all"):
        res["train_ms"] = probe_train()
    import jax
    res["platform"] = jax.devices()[0].platform
    print(json.dumps(res))


if __name__ == "__main__":
    main()
