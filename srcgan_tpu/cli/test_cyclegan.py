"""CycleGAN eval driver — test.py parity.

  python -m srcgan_tpu.cli.test_cyclegan --netGA checkpoints/netG_A2B_SRtask_x2_0025.npz \
                                         --netGB checkpoints/netG_B2A_SRtask_x2_0025.npz

Loads the generator pair, picks the Sat2Aerx2/x4 dataset by mode substring in
the checkpoint name (test.py:72-75), and writes fake_B / fake_A PNGs for every
test sample (test.py:80-88).  Unlike the reference, the checkpoint paths are
honoured as given (test.py:57-58 hardcodes them over argparse).

Beyond the reference (whose test.py only saves images), this driver also
scores fake_B against realB with the testCas.py eval protocol — the
[MSE, PSNR, AE, SSIM] evaluator list averaged over the test split and
appended to result/Performs.csv (testCas.py:63,92-103 schema) — so
adversarial runs produce the same quantitative artifact as cascade runs.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(description="CycleGAN eval")
    p.add_argument("--netGA", type=str, required=True)
    p.add_argument("--netGB", type=str, required=True)
    p.add_argument("--net", type=str, default="1")
    p.add_argument("--root", type=str, default=None)
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--result-dir", type=str, default="./result")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from srcgan_tpu import data, ops
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.metrics import per_sample_evaluators
    from srcgan_tpu.train import CycleGANTrainer
    from srcgan_tpu.train.state import load_params
    from srcgan_tpu.utils import vis

    base = os.path.basename(args.netGA)
    mode = "x4" if "x4" in base else "x2"
    root = args.root or f"Sat2Aer{mode}"
    trainer = CycleGANTrainer(net=args.net, mode=mode)
    pA = load_params(args.netGA)
    pB = load_params(args.netGB)

    testset = data.FileListDataset(root, "test", "G2RGB", args.data_dir)
    tag = base.rsplit(".", 1)[0]
    dirA = os.path.join(args.result_dir, "cyc_fakeB_" + tag)
    dirB = os.path.join(args.result_dir, "cyc_fakeA_" + tag)
    os.makedirs(dirA, exist_ok=True)
    os.makedirs(dirB, exist_ok=True)

    @jax.jit
    def run(realA, realB):
        fake_B = trainer.netG_A.fwd(pA, realA)
        fake_A = trainer.netG_B.fwd(pB, realB)
        return fake_B, fake_A

    ps_evals = per_sample_evaluators()
    performs = [[] for _ in ps_evals]
    for idx in range(len(testset)):
        src_u8, tar_u8 = testset.raw(idx)
        srcA, realB = preprocess.convert_pair(
            jnp.asarray(src_u8[None]), jnp.asarray(tar_u8[None]), "G2RGB")
        if args.net == "1":
            # realA synthesized at the generator's scale (matches the
            # trainers; the reference's fixed 0.5x is x2-only,
            # train.py:380-382)
            realA = ops.interpolate(realB, scale_factor=1.0 / trainer.scale,
                                    mode="nearest")
        else:
            realA = srcA
        fake_B, fake_A = run(realA, realB)
        acc = ""
        if fake_B.shape == realB.shape:
            for i, (ev_name, fn) in enumerate(ps_evals):
                val = float(np.asarray(fn(fake_B, realB))[0])
                performs[i].append(val)
                acc += " {}:{:0.2f};".format(ev_name, val)
        name = testset.datalist[idx]
        vis.save_png(os.path.join(dirA, name),
                     vis.tensor2image_u8(np.clip(np.asarray(fake_B), 0, 1)))
        vis.save_png(os.path.join(dirB, name),
                     vis.tensor2image_u8(np.clip(np.asarray(fake_A), 0, 1)))
        sys.stdout.write("\rGenerated %s (%04d / %04d) >> %s" %
                         (name, idx, len(testset), acc))
    sys.stdout.write("\n")

    # Performs.csv append in the testCas.py:92-103 schema so adversarial
    # evals land in the same artifact as cascade evals.  Skipped when
    # fake_B and realB shapes differ (a generator/dataset pairing where
    # the SR output has no same-size target — the reference's test.py
    # computes no metrics at all there either, test.py:80-88).
    if not performs[0]:
        print("fake_B/realB shapes differ — no metric rows (PNGs only)")
        return None
    import pandas as pd

    row = [[time.strftime("%h_%d"), tag] +
           [sum(p) / len(p) for p in performs]]
    df = pd.DataFrame(row, columns=["time", "checkpoint"] +
                      [n for n, _ in ps_evals])
    log_path = os.path.join(args.result_dir, "Performs.csv")
    if os.path.exists(log_path):
        df = pd.concat([pd.read_csv(log_path), df], ignore_index=True)
    df.to_csv(log_path, index=False, float_format="%.3f")
    print(df.tail(1).to_string(index=False))
    return df


if __name__ == "__main__":
    main()
