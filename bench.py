"""Benchmark: RDDBNet x4 SR throughput (megapixels/sec/chip) vs torch-CPU.

Protocol (BASELINE.md): output megapixels/sec of the flagship RDDBNet
(1->1ch, x4, nf=64, nb=3) generator forward — the hot kernel of every
reference pipeline (SURVEY.md §3.4).  vs_baseline is the ratio against the
same network implemented in plain PyTorch on CPU (the reference's only
published execution mode besides a single CUDA GPU); target is >=5x.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

IN_SIZE = 128          # LR input; x4 -> 512x512 output
BATCH = 8              # per-chip batch for the TPU run
WARMUP = 2
ITERS = 10
TORCH_ITERS = 2
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_torch_baseline.json")

# v5e per-chip MXU peak (bf16).  MFU lines are judged against the machine,
# not the torch-CPU strawman; assumed peak is emitted alongside so the
# number stays interpretable on other chips.
PEAK_BF16_TFLOPS = 197.0


def _cost_flops(fn, *args) -> float | None:
    """Model-FLOP count of jit(fn)(*args) via XLA's compiled cost analysis.

    Returns None when the backend exposes no analysis.  Programs are lowered
    without Pallas custom calls (callers gate) so every FLOP is visible to
    the analysis."""
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _mfu_pct(flops, seconds) -> float:
    return round(100.0 * flops / seconds / (PEAK_BF16_TFLOPS * 1e12), 1)


def bench_jax() -> dict:
    import jax
    import jax.numpy as jnp

    from srcgan_tpu import config, models

    dev = jax.devices()[0]
    model = models.RDDBNet(1, 1, 4)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (BATCH, IN_SIZE, IN_SIZE, 1)).astype(np.float32))

    results = {}
    for mode, precision, dtype in (("fp32", "highest", jnp.float32),
                                   ("bf16", "default", jnp.bfloat16)):
        config.set_conv_precision(precision)
        p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        xx = x.astype(dtype)

        # Measurement method: time a dependency-chained scan of K forwards
        # inside one jit call and take the slope between K=1 and K=CHAIN.
        # This isolates steady-state device throughput from the axon relay's
        # ~30 ms per-call dispatch overhead (which also defeats naive
        # block_until_ready timing).  float() materialization of a scalar
        # forces real execution; varying `seed` defeats result caching.
        def timed_chain(K):
            @jax.jit
            def chain(p, v, seed):
                def body(c, _):
                    y = model.fwd(p, c)
                    return c + (0.0 * jnp.mean(y)).astype(c.dtype), jnp.mean(y)
                _, ys = jax.lax.scan(body, v + seed, None, length=K)
                return jnp.sum(ys)

            float(chain(p, xx, dtype(0)))  # compile + warm
            ts = []
            for i in range(WARMUP + 3):
                t0 = time.perf_counter()
                float(chain(p, xx, dtype(1e-2 * (i + 1))))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        # fp32-highest compiles slowly through the remote-compile relay; a
        # shorter chain keeps total bench wall-clock bounded without hurting
        # the slope estimate.
        iters = ITERS if mode == "bf16" else 4
        t1, tk = timed_chain(1), timed_chain(1 + iters)
        per_forward = (tk - t1) / iters
        out_mp = BATCH * (IN_SIZE * 4) ** 2 / 1e6
        results[mode] = out_mp / per_forward
        if mode == "bf16":
            # MFU of the flagship forward: model FLOPs from XLA's cost
            # analysis of the SAME computation lowered with the pure-XLA
            # folded tail (the Pallas tail's custom call hides its FLOPs
            # from the analysis; its share of the program is ~8%).
            import jax.numpy as _jnp

            from srcgan_tpu.models import rddb as _rddb

            with _rddb.no_pallas_tail():
                fl = _cost_flops(lambda p_, v_: _jnp.mean(model.fwd(p_, v_)),
                                 p, xx)
            if fl:
                results["fwd_mfu_pct"] = _mfu_pct(fl, per_forward)
    config.set_conv_precision("highest")
    results["platform"] = dev.platform
    return results


def bench_train() -> dict:
    """Fused cascaded train-step throughput (RDDBNet+ResDeconv x2, bf16)."""
    import jax
    import jax.numpy as jnp

    from srcgan_tpu import config
    from srcgan_tpu.train import CasTrainer

    config.set_conv_precision("default")
    rng = np.random.default_rng(0)
    b, s = 8, 256
    tar = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    src = jnp.asarray((np.asarray(tar) @ np.array(
        [0.2125, 0.7154, 0.0721], np.float32))[..., None])

    def measure(act_dtype):
        tr = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2,
                        act_dtype=act_dtype)
        st0 = tr.init(jax.random.PRNGKey(0))

        def timed_chain(K):
            @jax.jit
            def chain(st, a, t, seed):
                def body(carry, i):
                    stc, _ = tr.train_step(carry, a + seed * 1e-6, t, 1e-4)
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
        return (t5 - t1) / 4, tr, st0

    # fp32 stored activations (bf16 MXU convs) — the historical round-1/2
    # configuration, kept under an explicit key
    per_fp32, tr, st0 = measure(None)
    # --bf16-acts: bf16 stored residuals, fp32 masters.  This is the
    # production training mode (CLI-wired on all three trainers; numerics
    # within seed variance: scripts/bf16_study.py "bf16acts" mode,
    # docs/PERF.md), so it carries the headline train_step_ms.
    per_bf16, tr16, st16 = measure(jnp.bfloat16)
    out = {"train_step_ms": round(per_bf16 * 1000, 1),
           "train_samples_per_s": round(b / per_bf16, 1),
           "train_target_mps": round(b * s * s / 1e6 / per_bf16, 2),
           "train_fp32_acts_step_ms": round(per_fp32 * 1000, 1),
           "train_fp32_acts_samples_per_s": round(b / per_fp32, 1)}
    # return the FULL new state + metrics so XLA cannot dead-code any of the
    # step (returning a scalar DCEs the whole update: measured flops == 1)
    fl = _cost_flops(lambda st, a, t: tr.train_step(st, a, t, 1e-4),
                     st0, src, tar)
    if fl:
        out["train_fp32_acts_mfu_pct"] = _mfu_pct(fl, per_fp32)
    fl16 = _cost_flops(lambda st, a, t: tr16.train_step(st, a, t, 1e-4),
                       st16, src, tar)
    if fl16:
        out["train_mfu_pct"] = _mfu_pct(fl16, per_bf16)
    config.set_conv_precision("highest")
    return out


def bench_gan() -> dict:
    """x4 adversarial iteration (RDDB-family G + PatchGAN D, bf16 acts).

    BASELINE.json config "x4 RGB adversarial training".  One iteration =
    the fused gd_step: G update (six generator passes + 2 D forwards, joint
    Adam) + D update (4 D forwards, Adam) in ONE program — exactly
    train.py:325-340 with pool_size=0 (the pool is then the identity).
    remat=False is the right bs=1 config: the six-pass backward fits HBM
    without rematerialization below batch ~3, and recompute costs ~1.6x
    (measured 262 -> 168 ms/iter on v5e).
    """
    import jax
    import jax.numpy as jnp

    from srcgan_tpu import config
    from srcgan_tpu.train.cyclegan import CycleGANTrainer

    config.set_conv_precision("default")
    tr = CycleGANTrainer(net="1", mode="x4", act_dtype=jnp.bfloat16,
                         pool_size=0, remat=False)
    st0 = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, s = 1, 256
    realB = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    realA = jnp.asarray(rng.uniform(0, 1, (b, s // 4, s // 4, 3)
                                    ).astype(np.float32))

    def timed_chain(K):
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

    t1, t4 = timed_chain(1), timed_chain(4)
    per = (t4 - t1) / 3

    # the reference's DEFAULT protocol keeps an ImagePool of 4
    # (train.py:352): gd_step_pooled fuses G + device pool + D into one
    # program (CLI --device-pool; measured 1.54x over the host-pool split,
    # docs/PERF.md "Device-side ImagePool")
    tr4 = CycleGANTrainer(net="1", mode="x4", act_dtype=jnp.bfloat16,
                          pool_size=4, remat=False)
    st4 = tr4.init(jax.random.PRNGKey(0))
    pools0 = tr4.device_pool_init(st4, realA, realB, seed=0)

    def timed_chain_pooled(K):
        @jax.jit
        def chain(st, pools, a, bb, seed):
            def body(carry, _):
                stc, pc = carry
                stc, pc, _ = tr4.gd_step_pooled(stc, pc, a + seed * 1e-6,
                                                bb, 1e-4, 1e-5)
                return (stc, pc), 0.0
            (st, pools), _ = jax.lax.scan(body, (st, pools), jnp.arange(K))
            return jnp.mean(st.d.params["D_A"]["0"]["w"])

        float(chain(st4, pools0, realA, realB, jnp.float32(0)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(chain(st4, pools0, realA, realB, jnp.float32(i + 1)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    p1, p4 = timed_chain_pooled(1), timed_chain_pooled(4)
    per_pooled = (p4 - p1) / 3
    config.set_conv_precision("highest")
    return {"gan_step_ms": round(per * 1000, 1),
            "gan_iters_per_s": round(1.0 / per, 2),
            "gan_pooled_step_ms": round(per_pooled * 1000, 1)}


def bench_lab() -> dict:
    """LAB cascade train step with ON-DEVICE uint8->RGB->LAB conversion
    (BASELINE.json config "LAB pipeline with on-device RGB<->LAB";
    reference dataset.py:148-159 + trainCasLAB.py protocol)."""
    import jax
    import jax.numpy as jnp

    from srcgan_tpu import config
    from srcgan_tpu.train import CasTrainer

    config.set_conv_precision("default")
    rng = np.random.default_rng(0)
    b, s = 8, 256
    src_u8 = jnp.asarray(rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8))
    tar_u8 = jnp.asarray(rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8))

    def measure(act_dtype):
        tr = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2,
                        lab=True, act_dtype=act_dtype)
        st0 = tr.init(jax.random.PRNGKey(0))

        def timed_chain(K):
            @jax.jit
            def chain(st, a, t, seed):
                def body(carry, i):
                    stc, _ = tr.train_step_u8(
                        carry, a + (seed * 0 + i % 2).astype(jnp.uint8),
                        t, 1e-4)
                    return stc, 0.0
                st, _ = jax.lax.scan(body, st, jnp.arange(K))
                return jnp.mean(st.sr.params["conv_first"]["w"])

            float(chain(st0, src_u8, tar_u8, jnp.uint8(0)))
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                float(chain(st0, src_u8, tar_u8, jnp.uint8(i % 2)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, t5 = timed_chain(1), timed_chain(5)
        return (t5 - t1) / 4

    # bf16 stored activations are the production mode (headline key), with
    # the historical fp32-acts configuration under an explicit key
    per_fp32 = measure(None)
    per16 = measure(jnp.bfloat16)
    config.set_conv_precision("highest")
    return {"lab_step_ms": round(per16 * 1000, 1),
            "lab_mps": round(b * s * s / 1e6 / per16, 2),
            "lab_fp32_acts_step_ms": round(per_fp32 * 1000, 1),
            "lab_fp32_acts_mps": round(b * s * s / 1e6 / per_fp32, 2)}


def bench_int8() -> dict:
    """int8 serving forward of the flagship x4 RDDB generator.

    Calibrated per-channel PTQ (srcgan_tpu.quant); on TPU the RDB5 blocks run
    the fused Pallas kernel (ops/pallas/rdb5_kernel.py).  Honest status:
    int8 still trails bf16 end-to-end on this hardware (docs/PERF.md) — this
    line records the measured gap rather than hiding the mode.
    """
    import jax
    import jax.numpy as jnp

    from srcgan_tpu import models, quant

    model = models.RDDBNet(1, 1, 4)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, IN_SIZE, IN_SIZE, 1)
                                ).astype(np.float32))
    cal = jnp.asarray(rng.uniform(0, 1, (2, IN_SIZE, IN_SIZE, 1)
                                  ).astype(np.float32))
    scales = quant.calibrate_fn(lambda b: model.fwd(params, b), [cal])

    def timed_chain(K):
        @jax.jit
        def chain(p, v, seed):
            def body(c, _):
                y = model.fwd(p, c)
                return c + (0.0 * jnp.mean(y)).astype(c.dtype), jnp.mean(y)
            _, ys = jax.lax.scan(body, v + seed, None, length=K)
            return jnp.sum(ys)

        # trace once per quant_mode block (the dispatch contract); later
        # timing calls replay the compiled program
        with quant.quant_mode("int8", scales):
            float(chain(params, x, jnp.float32(0)))
        ts = []
        for i in range(WARMUP + 3):
            t0 = time.perf_counter()
            float(chain(params, x, jnp.float32(1e-2 * (i + 1))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tk = timed_chain(1), timed_chain(1 + 6)
    per = (tk - t1) / 6
    out_mp = BATCH * (IN_SIZE * 4) ** 2 / 1e6
    return {"int8_mps": round(out_mp / per, 2),
            "int8_fwd_ms": round(per * 1000, 2)}


def torch_rddb_mps() -> float:
    """Torch-CPU baseline: an equivalent RDDBNet built with torch.nn.

    Cached to disk after first measurement (the torch number is a property of
    the host CPU, not of our code).
    """
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                return float(json.load(f)["mps"])
        except Exception:
            pass

    import torch
    import torch.nn as tnn

    class RDB5(tnn.Module):
        def __init__(self, nf=64, gc=32):
            super().__init__()
            self.convs = tnn.ModuleList(
                [tnn.Conv2d(nf + i * gc, gc if i < 4 else nf, 3, 1, 1)
                 for i in range(5)])
            self.act = tnn.LeakyReLU(0.2, True)

        def forward(self, x):
            feats = [x]
            for i, c in enumerate(self.convs):
                y = c(torch.cat(feats, 1))
                if i < 4:
                    y = self.act(y)
                    feats.append(y)
            return y * 0.2 + x

    class RRDB(tnn.Module):
        def __init__(self, nf=64, gc=32):
            super().__init__()
            self.b = tnn.Sequential(RDB5(nf, gc), RDB5(nf, gc), RDB5(nf, gc))

        def forward(self, x):
            return self.b(x) * 0.2 + x

    class TorchRDDB(tnn.Module):
        def __init__(self, nf=64, nb=3):
            super().__init__()
            self.first = tnn.Conv2d(1, nf, 3, 1, 1)
            self.trunk = tnn.Sequential(*[RRDB(nf) for _ in range(nb)])
            self.tc = tnn.Conv2d(nf, nf, 3, 1, 1)
            ups = []
            for _ in range(2):  # x4 = two x2 deconvs
                ups += [tnn.ConvTranspose2d(nf, nf, 2, 2, 0, bias=False),
                        tnn.LeakyReLU(0.2, True)]
            self.up = tnn.Sequential(*ups)
            self.last = tnn.Conv2d(nf, 1, 3, 1, 1, bias=False)

        def forward(self, x):
            fea = self.first(x)
            fea = fea + self.tc(self.trunk(fea))
            return self.last(self.up(fea))

    net = TorchRDDB().eval()
    x = torch.randn(1, 1, IN_SIZE, IN_SIZE)
    # best-of-3: a single 2-iter average once read 2x slow (transient host
    # load / cpufreq), which inflates vs_baseline; the best repeat is the
    # honest machine capability
    with torch.no_grad():
        net(x)  # warm
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(TORCH_ITERS):
                net(x)
            dts.append((time.perf_counter() - t0) / TORCH_ITERS)
        dt = min(dts)
    mps = (IN_SIZE * 4) ** 2 / 1e6 / dt
    try:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"mps": mps, "in_size": IN_SIZE}, f)
    except OSError:
        pass
    return mps


RETRY_ENV = "SRCGAN_BENCH_ATTEMPT"
MAX_ATTEMPTS = 3
# Transient axon-relay failure modes observed on this image (CLAUDE.md):
# the run dies with "TPU backend error (FailedPrecondition)" or the client
# wedges after a relay drop.  An in-process retry cannot recover a dead
# backend client, so on a transient-looking failure the bench re-execs
# itself (the persistent compilation cache makes the retry cheap) after a
# cool-down for the relay to come back.
# NOTE: "Unable to initialize backend" is deliberately NOT here — that is
# the deterministic PYTHONPATH-misconfiguration symptom (CLAUDE.md), and
# retrying it would just delay the real error by minutes.
_TRANSIENT_MARKERS = ("FailedPrecondition", "DEADLINE_EXCEEDED", "UNAVAILABLE",
                      "backend error", "Connection reset", "Socket closed")


def _retry_or_raise(exc: BaseException) -> None:
    attempt = int(os.environ.get(RETRY_ENV, "0"))
    msg = f"{type(exc).__name__}: {exc}"
    transient = any(m.lower() in msg.lower() for m in _TRANSIENT_MARKERS)
    if not transient or attempt + 1 >= MAX_ATTEMPTS:
        raise exc
    print(f"bench: transient backend failure (attempt {attempt + 1}/"
          f"{MAX_ATTEMPTS}), re-exec after cool-down: {msg}",
          file=sys.stderr, flush=True)
    time.sleep(90 * (attempt + 1))
    env = dict(os.environ, **{RETRY_ENV: str(attempt + 1)})
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def main():
    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    jax_res = bench_jax()
    train_res = bench_train()
    train_res.update(bench_gan())
    train_res.update(bench_lab())
    train_res.update(bench_int8())
    torch_mps = torch_rddb_mps()
    value = jax_res["bf16"] if jax_res["platform"] != "cpu" else jax_res["fp32"]
    print(json.dumps({
        "metric": "rddbnet_x4_sr_throughput",
        "value": round(value, 2),
        "unit": "MP/s",
        "vs_baseline": round(value / torch_mps, 2),
        "detail": {
            "fp32_mps": round(jax_res["fp32"], 2),
            "bf16_mps": round(jax_res["bf16"], 2),
            "torch_cpu_mps": round(torch_mps, 3),
            "platform": jax_res["platform"],
            "batch": BATCH, "in_size": IN_SIZE, "scale": 4,
            **({"fwd_mfu_pct": jax_res["fwd_mfu_pct"]}
               if "fwd_mfu_pct" in jax_res else {}),
            "peak_bf16_tflops_assumed": PEAK_BF16_TFLOPS,
            **train_res,
        },
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — transient-relay gate re-raises
        _retry_or_raise(e)
