"""--augment effectiveness study: D4 augmentation vs none on a small set.

Trains the cascade on a deliberately SMALL synthetic training set (where
overfitting is visible) for the reference's 50-epoch schedule, with and
without the per-sample D4 augmentation the train CLIs apply via
``data.batches(augment=True)``, and reports held-out PSNR/SSIM for both
stages.  Ops are drawn exactly like the data layer draws them (per
seed/epoch/original-index), applied to the uint8-free in-memory arrays.

Usage: python scripts/augment_study.py [key] [model ...]
"""
import os
import sys
import time

import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srcgan_tpu import config, metrics
from srcgan_tpu.data.dataset import dihedral
from srcgan_tpu.train import CasTrainer

config.enable_compilation_cache()


def synth_images(n, size, seed):
    """Smooth random RGB fields (same generator as scripts/bf16_study.py)."""
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
    lo = imgs.min(axis=(1, 2, 3), keepdims=True)
    hi = imgs.max(axis=(1, 2, 3), keepdims=True)
    return (imgs - lo) / (hi - lo + 1e-6)


def run(sr_model, augment, epochs=50, n_train=16, n_val=16, size=64, bs=8,
        key=0):
    config.set_conv_precision("default")  # bf16 MXU (production train mode)
    tr = CasTrainer(sr_model=sr_model, c_model="ResDeconv", up=2,
                    num_epochs=epochs)  # cosine schedule spans the full run
    state = tr.init(jax.random.PRNGKey(key))
    train = synth_images(n_train, size, 1)
    val = synth_images(n_val, size, 2)
    dummyA = jnp.zeros((bs, size, size, 1), jnp.float32)
    order = np.arange(n_train)
    rng = np.random.default_rng(0)
    for ep in range(1, epochs + 1):
        lr = tr.lr_at_epoch(ep)
        rng.shuffle(order)
        ops = (np.random.default_rng(np.random.SeedSequence([key, ep, 0xD4]))
               .integers(0, 8, size=n_train) if augment else None)
        for i in range(0, n_train, bs):
            idxs = order[i:i + bs]
            tar = train[idxs]
            if ops is not None:  # same draw scheme as data.batches(augment=)
                tar = np.stack([dihedral(a, int(ops[j]))
                                for a, j in zip(tar, idxs)])
            state, _ = tr.train_step(state, dummyA, jnp.asarray(tar), lr)
    config.set_conv_precision("highest")  # eval in fp32 regardless
    psnr_m, ssim_m = metrics.PSNR(), metrics.SSIM()
    out = {"color_psnr": [], "color_ssim": [], "sr_psnr": [], "sr_ssim": []}
    for split, data_ in (("val", val), ("train", train)):
        ps, ss, psr, ssr = [], [], [], []
        for i in range(0, len(data_), bs):
            tar = jnp.asarray(data_[i:i + bs])
            snap = tr.snapshot(state,
                               jnp.zeros((tar.shape[0], size, size, 1)), tar)
            fb = snap["fake_BB"].astype(jnp.float32)
            ps.append(np.mean(np.asarray(psnr_m(fb, tar))))
            ss.append(np.mean(np.asarray(ssim_m(fb, tar))))
            fc = snap["fake_BC"].astype(jnp.float32)
            rc = snap["real_BC"].astype(jnp.float32)
            psr.append(np.mean(np.asarray(psnr_m(fc, rc))))
            ssr.append(np.mean(np.asarray(ssim_m(fc, rc))))
        out[split] = (float(np.mean(ps)), float(np.mean(ss)),
                      float(np.mean(psr)), float(np.mean(ssr)))
    return out


def main():
    key = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    names = tuple(sys.argv[2:]) or ("ESPCN", "RDDBNet")
    epochs = int(os.environ.get("AUG_EPOCHS", "50"))
    for sr_model in names:
        res = {}
        for label, aug in (("plain", False), ("augment", True)):
            t0 = time.time()
            res[label] = run(sr_model, aug, key=key, epochs=epochs)
            v, t = res[label]["val"], res[label]["train"]
            print(f"{sr_model:8s} {label:8s}: val color PSNR {v[0]:6.2f} "
                  f"SSIM {v[1]:.4f} | val SR PSNR {v[2]:6.2f} SSIM {v[3]:.4f}"
                  f" | train SR PSNR {t[2]:6.2f}  ({time.time()-t0:.0f}s)")
        dv = [res["augment"]["val"][i] - res["plain"]["val"][i]
              for i in range(4)]
        print(f"{sr_model:8s} augment val delta: color {dv[0]:+.2f} dB / "
              f"{dv[1]:+.4f} | SR {dv[2]:+.2f} dB / {dv[3]:+.4f}")


if __name__ == "__main__":
    main()
