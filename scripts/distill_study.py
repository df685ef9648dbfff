"""Measured knowledge-distillation study (train.DistillTrainer).

Protocol (same synthetic 64-image corpus and 50-epoch reference schedule as
scripts/bf16_study.py):

  1. teacher  : RDDBNet+ResDeconv x2 cascade, plain 50-epoch training
  2. student  : ESPCN+ResDeconv, plain 50-epoch training (alpha=1 control)
  3. distilled: ESPCN+ResDeconv, 50 epochs of DistillTrainer on the trained
                teacher at --alpha (default 0.5)

Reports held-out SR-stage and cascade PSNR/SSIM for all three, i.e. whether
blending the teacher's outputs into the student's loss beats pure
ground-truth supervision at equal student cost.  Run per seed:

    python scripts/distill_study.py [seed] [alpha]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bf16_study import synth_images  # noqa: E402  (same corpus generator)

from srcgan_tpu import config, metrics  # noqa: E402
from srcgan_tpu.train import CasTrainer, DistillTrainer  # noqa: E402

config.enable_compilation_cache()

EPOCHS, N_TRAIN, N_VAL, SIZE, BS = 50, 64, 16, 64, 8


def train_one(trainer, key, train_set):
    state = trainer.init(jax.random.PRNGKey(key))
    dummyA = jnp.zeros((BS, SIZE, SIZE, 1), jnp.float32)
    order = np.arange(N_TRAIN)
    rng = np.random.default_rng(0)
    for ep in range(1, EPOCHS + 1):
        lr = trainer.lr_at_epoch(ep)
        rng.shuffle(order)
        for i in range(0, N_TRAIN, BS):
            tar = jnp.asarray(train_set[order[i:i + BS]])
            state, _ = trainer.train_step(state, dummyA, tar, lr)
    return state


def evaluate(trainer, state, val_set):
    """fp32-highest held-out metrics: (cascade PSNR/SSIM, SR PSNR/SSIM)."""
    with config.matmul_precision("highest"):
        psnr_m, ssim_m = metrics.PSNR(), metrics.SSIM()
        ps, ss, ps_sr, ss_sr = [], [], [], []
        for i in range(0, N_VAL, BS):
            tar = jnp.asarray(val_set[i:i + BS])
            snap = trainer.snapshot(
                state, jnp.zeros((tar.shape[0], SIZE, SIZE, 1)), tar)
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
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    alpha = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    config.set_conv_precision("default")  # bf16 MXU training (prod mode)
    train_set = synth_images(N_TRAIN, SIZE, 1)
    val_set = synth_images(N_VAL, SIZE, 2)

    rows = {}
    teacher = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2)
    t_state = train_one(teacher, seed, train_set)
    rows["teacher RDDBNet"] = evaluate(teacher, t_state, val_set)

    student = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
    s_state = train_one(student, seed + 100, train_set)
    rows["student ESPCN (plain)"] = evaluate(student, s_state, val_set)

    t_params = jax.device_get(t_state)
    distilled = DistillTrainer(
        teacher.netG_A2C, t_params.sr.params,
        teacher.netG_C2B, t_params.c.params, alpha=alpha,
        teacher_sr_state=t_params.sr_model_state,
        teacher_c_state=t_params.c_model_state,
        sr_model="ESPCN", c_model="ResDeconv", up=2)
    d_state = train_one(distilled, seed + 100, train_set)
    rows[f"student ESPCN (distilled a={alpha})"] = evaluate(
        distilled, d_state, val_set)

    print(f"\nseed {seed}, alpha {alpha}, {EPOCHS} epochs, "
          f"{N_TRAIN} train / {N_VAL} val @ {SIZE}px, bf16 convs")
    print(f"{'config':36s} {'casPSNR':>8s} {'casSSIM':>8s} "
          f"{'srPSNR':>8s} {'srSSIM':>8s}")
    for k, (p, s, psr, ssr) in rows.items():
        print(f"{k:36s} {p:8.2f} {s:8.4f} {psr:8.2f} {ssr:8.4f}")


if __name__ == "__main__":
    main()
