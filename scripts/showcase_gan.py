"""Converged adversarial showcase: CycleGAN train -> eval -> panels.

Round-4 VERDICT item 1: the adversarial pipeline family (reference
train.py:145-340) had step-time and single-step-parity evidence but no
demonstration that GAN training converges to quality.  This script runs the
reference's net='1' protocol (train.py:360: RGB<->RGB cycle where realA is a
nearest downsample of the target, train.py:380-382) end-to-end through this
framework's CLIs on TPU:

  train   cli.train_cyclegan --net 1 --mode x2, reference hyperparameters
          (bs=1, Adam G 1e-4 / D 1e-5, beta1 0.5, lambda 10, pool_size 4,
          cosine LR — train.py:344-361,191-192) at a converged epoch count;
          the ImagePool runs ON DEVICE (--device-pool: same 50%-replace
          sampling distribution, jax.random stream).  Rematerialization
          stays ON: net='1' is the RGB<->RGB pair — all six generator
          passes carry 3-channel 256^2 activations, and the fused
          G+pool+D program OOMs a 16 GB chip without remat (unlike the
          gray<->RGB net of the bs-scaling probe, docs/PERF.md).
  eval    cli.test_cyclegan: fake_B/fake_A PNGs per test sample
          (test.py:80-88) + the testCas.py metric protocol on fake_B vs
          realB appended to result/Performs.csv.
  panels  [realA (nearest x2 up) | fake_B | realB] framed panels for every
          test sample whose fake_B PSNR clears the reference's 22.5 dB bar
          (vis.sh:13 / visCas.py:132 — the cascade's quality gate, applied
          to the adversarial family).

Loss trajectories land in $GAN_DIR/run/losses.jsonl (G total, GAN, cycle,
identity, D) — the stable-equilibrium evidence for docs/EXAMPLE_RESULTS.md.

Usage:  python scripts/showcase_gan.py                 (the committed
        docs/EXAMPLE_RESULTS.md run: 60 epochs, ~20 min on v5e-1)
        GAN_EPOCHS=2 python scripts/showcase_gan.py    (smoke)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srcgan_tpu import data
from srcgan_tpu.cli import test_cyclegan, train_cyclegan

WORK = os.environ.get("GAN_DIR", os.path.join("runs", "showcase_gan"))
EPOCHS = int(os.environ.get("GAN_EPOCHS", "60"))
# net='1' (reference default) or 'SRdens' (the reference's only
# shape-consistent committed pair: SRDenseNetA up / SRDenseNetB down,
# gray->RGB — realA comes from the dataset's LR gray src)
NET = os.environ.get("GAN_NET", "1")
THRESHOLD = 22.5  # vis.sh:13


def main():
    data_dir = os.path.join(WORK, "dataset")
    ck = os.path.join(WORK, "checkpoints")
    res = os.path.join(WORK, "result")
    run_dir = os.path.join(WORK, "run")
    # Same data regime as the cascade showcase (scripts/showcase_flagship.py):
    # 256x256 colorizable tiles, the luma-determined-color regime real aerial
    # RGB lives in.  Sat2Aerx2 layout; net='1' synthesizes realA from the
    # target on the fly, so src/ is only read by non-'1' nets.
    root = data.make_synthetic_dataset(
        os.path.join(data_dir, "Sat2Aerx2"), n_train=16, n_val=4, n_test=8,
        size=256, seed=7, scale=2, colorizable=True)

    train_cyclegan.main([
        "--net", NET, "--mode", "x2",
        "--num-epochs", str(EPOCHS), "--batch-size", "1",
        "--pool-size", "4", "--device-pool",
        # NOT --steps-per-dispatch: the K=16-fused G+pool+D scanned program
        # (16 remat'd six-pass iterations in one HLO) took >15 min to
        # compile through the relay — the per-iteration program compiles in
        # ~2 min and the ~1 s/iter wall is dominated by device time anyway
        "--save-every", str(max(EPOCHS // 6, 1)),
        "--root", root, "--data-dir", data_dir, "--checkpoints", ck,
        "--run-dir", run_dir,
        "--log-every", "4", "--seed", "0"])

    ga = os.path.join(ck, f"netG_A2B_SRtask_x2_{EPOCHS:04d}.npz")
    gb = os.path.join(ck, f"netG_B2A_SRtask_x2_{EPOCHS:04d}.npz")
    test_cyclegan.main(["--netGA", ga, "--netGB", gb, "--net", NET,
                        "--root", root, "--data-dir", data_dir,
                        "--result-dir", res])

    _panels(ga, gb, root, data_dir, res)

    with open(os.path.join(res, "Performs.csv")) as f:
        print("\nPerforms.csv:\n" + f.read())
    _loss_summary(os.path.join(run_dir, "losses.jsonl"))


def _panels(ga, gb, root, data_dir, res):
    """PSNR-gated [realA-up | fake_B | realB] panels (visCas.py protocol
    applied to the adversarial eval surface)."""
    import jax
    import numpy as np

    from srcgan_tpu import data as data_mod
    from srcgan_tpu import metrics, ops
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.train import CycleGANTrainer
    from srcgan_tpu.train.state import load_params
    from srcgan_tpu.utils import vis

    trainer = CycleGANTrainer(net=NET, mode="x2")
    pA = load_params(ga)
    psnr = metrics.PSNR()

    @jax.jit
    def run(srcA, realB):
        if NET == "1":
            # realA synthesized from the target (train.py:380-382)
            realA = ops.interpolate(realB, scale_factor=1.0 / trainer.scale,
                                    mode="nearest")
        else:
            # gray->RGB nets consume the dataset's LR gray src
            realA = srcA
        fake_B = trainer.netG_A.fwd(pA, realA)
        return realA, fake_B, psnr(fake_B, realB)

    testset = data_mod.FileListDataset(root, "test", "G2RGB", data_dir)
    tag = os.path.basename(ga).rsplit(".", 1)[0]
    out_dir = os.path.join(res, "vis_" + tag)
    os.makedirs(out_dir, exist_ok=True)
    n_saved = 0
    for idx in range(len(testset)):
        import jax.numpy as jnp
        src_u8, tar_u8 = testset.raw(idx)
        srcA, realB = preprocess.convert_pair(
            jnp.asarray(src_u8[None]), jnp.asarray(tar_u8[None]), "G2RGB")
        realA, fake_B, p = run(srcA, realB)
        name = testset.datalist[idx]
        print(f"  {name}: fake_B PSNR {float(p):.2f} dB"
              + ("" if float(p) > THRESHOLD else "  (below bar, not saved)"))
        if float(p) > THRESHOLD:
            panel = vis.patch2vis(
                vis.tensor2img(np.asarray(realA), "RGB"),
                vis.tensor2img(np.asarray(fake_B), "RGB"),
                vis.tensor2img(np.asarray(realB), "RGB"))
            vis.save_png(os.path.join(out_dir, name), panel)
            n_saved += 1
    print(f"panels clearing the {THRESHOLD} dB bar: {n_saved} -> {out_dir}")


def _loss_summary(path):
    """Print a compact equilibrium table from the run's loss history."""
    if not os.path.exists(path):
        return
    rows = [json.loads(ln) for ln in open(path)]
    if not rows:
        return
    epochs = sorted({r["epoch"] for r in rows})
    picks = sorted({epochs[0], epochs[len(epochs) // 4],
                    epochs[len(epochs) // 2], epochs[3 * len(epochs) // 4],
                    epochs[-1]})
    print("\nloss trajectory (per-epoch means):")
    keys = ["loss_G", "loss_G_GAN", "loss_G_cycle", "loss_G_identity",
            "loss_D"]
    print("  epoch  " + "  ".join(f"{k:>15s}" for k in keys))
    for e in picks:
        sel = [r["losses"] for r in rows if r["epoch"] == e]
        means = {k: sum(s[k] for s in sel) / len(sel) for k in keys}
        print(f"  {e:5d}  " + "  ".join(f"{means[k]:15.3f}" for k in keys))


if __name__ == "__main__":
    main()
