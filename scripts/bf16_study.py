"""bf16-vs-fp32 training numerics study (ROADMAP item 7 / VERDICT item 9).

Trains the cascade on a reproducible synthetic dataset for the reference's
50-epoch schedule in both precisions and reports final held-out PSNR/SSIM.
"""
import os
import sys
import time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srcgan_tpu import config, metrics
from srcgan_tpu.train import CasTrainer

config.enable_compilation_cache()


def synth_images(n, size, seed):
    """Smooth random RGB fields (Gaussian-mixture bumps) — SR-learnable."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.zeros((n, size, size, 3), np.float32)
    for i in range(n):
        for _ in range(6):
            cx, cy = rng.uniform(0, 1, 2)
            s = rng.uniform(0.05, 0.3)
            a = rng.uniform(-1, 1, 3)
            g = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
            imgs[i] += g[..., None] * a
    lo, hi = imgs.min(axis=(1, 2, 3), keepdims=True), imgs.max(axis=(1, 2, 3), keepdims=True)
    return (imgs - lo) / (hi - lo + 1e-6)


def run(sr_model, precision, epochs=50, n_train=64, n_val=16, size=64, bs=8,
        key=0, act_dtype=None):
    config.set_conv_precision(precision)
    tr = CasTrainer(sr_model=sr_model, c_model="ResDeconv", up=2,
                    act_dtype=act_dtype)
    state = tr.init(jax.random.PRNGKey(key))
    train = synth_images(n_train, size, 1)
    val = synth_images(n_val, size, 2)
    dummyA = jnp.zeros((bs, size, size, 1), jnp.float32)
    order = np.arange(n_train)
    rng = np.random.default_rng(0)
    for ep in range(1, epochs + 1):
        lr = tr.lr_at_epoch(ep)
        rng.shuffle(order)
        for i in range(0, n_train, bs):
            tar = jnp.asarray(train[order[i:i + bs]])
            state, m = tr.train_step(state, dummyA, tar, lr)
    # eval in fp32-highest regardless of training precision
    config.set_conv_precision("highest")
    psnr_m, ssim_m = metrics.PSNR(), metrics.SSIM()
    ps, ss, ps_sr, ss_sr = [], [], [], []
    for i in range(0, n_val, bs):
        tar = jnp.asarray(val[i:i + bs])
        snap = tr.snapshot(state, jnp.zeros((tar.shape[0], size, size, 1)), tar)
        fake_BB = snap["fake_BB"].astype(jnp.float32)
        ps.append(np.mean(np.asarray(psnr_m(fake_BB, tar))))
        ss.append(np.mean(np.asarray(ssim_m(fake_BB, tar))))
        fake_BC = snap["fake_BC"].astype(jnp.float32)
        real_BC = snap["real_BC"].astype(jnp.float32)
        ps_sr.append(np.mean(np.asarray(psnr_m(fake_BC, real_BC))))
        ss_sr.append(np.mean(np.asarray(ssim_m(fake_BC, real_BC))))
    return (float(np.mean(ps)), float(np.mean(ss)),
            float(np.mean(ps_sr)), float(np.mean(ss_sr)))


def main():
    import sys
    key = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    names = (sys.argv[2],) if len(sys.argv) > 2 else ("ESPCN", "RDDBNet")
    # three precision modes: fp32-HIGHEST, bf16-MXU convs (fp32 storage),
    # and bf16 stored activations with fp32 masters (--bf16-acts)
    modes = (("fp32", "highest", None), ("bf16", "default", None),
             ("bf16acts", "default", jnp.bfloat16))
    for sr_model in names:
        res = {}
        for label, prec, act in modes:
            t0 = time.time()
            p, s, psr, ssr = run(sr_model, prec, key=key, act_dtype=act)
            res[label] = (p, s, psr, ssr)
            print(f"{sr_model:8s} {label:8s}: "
                  f"color PSNR {p:7.3f} SSIM {s:.5f} | SR PSNR {psr:7.3f} "
                  f"SSIM {ssr:.5f}  ({time.time()-t0:.0f}s)")
        for label in ("bf16", "bf16acts"):
            d = [res[label][i] - res["fp32"][i] for i in range(4)]
            print(f"{sr_model:8s} {label} delta: color {d[0]:+.3f} dB / "
                  f"{d[1]:+.5f} | SR {d[2]:+.3f} dB / {d[3]:+.5f}  "
                  f"(bars 0.1 dB / 0.002)")


if __name__ == "__main__":
    main()
