"""Qualitative panel visualization driver — visCas.py parity.

  python -m srcgan_tpu.cli.vis_cas --netGA ... --netGB ... --threshold 22.5

Side-by-side framed panels [input | SR | colorized | target], saved only when
the sample's colorization PSNR exceeds --threshold (visCas.py:113-141;
threshold 22.5 dB is the reference's bar for a "good" sample, vis.sh:13).
"""
from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description="qualitative panels")
    p.add_argument("--netGA", type=str, required=True)
    p.add_argument("--netGB", type=str, required=True)
    p.add_argument("--threshold", type=float, default=22.5)
    p.add_argument("--const", action="store_true")
    p.add_argument("--root", type=str, default="Sat2Aerx1")
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

    from srcgan_tpu import data, metrics, models
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.interop import load_params_any
    from srcgan_tpu.train.state import parse_checkpoint_name
    from srcgan_tpu.utils import vis

    infoA = parse_checkpoint_name(args.netGA)
    infoB = parse_checkpoint_name(args.netGB)
    lab = infoA["ver"] == "G2LAB"
    sf = infoA["up"]
    netG_A2C = models.create(infoA["model"], 1, 1, sf)
    netG_C2B = models.create(infoB["model"], 1, 2 if lab else 3)
    pA, stA = load_params_any(netG_A2C, args.netGA)
    pB, stB = load_params_any(netG_C2B, args.netGB)

    testset = data.FileListDataset(args.root, "test", infoA["ver"], args.data_dir)
    out_dir = os.path.join(
        args.result_dir,
        "vis_" + "_".join([infoA["model"], f"x{sf}", f"{infoA['epoch']:04d}"]))
    os.makedirs(out_dir, exist_ok=True)

    psnr = metrics.PSNR()

    @jax.jit
    def run(realA, realB):
        realBC = realB[..., :1] if lab else preprocess.luma(realB)
        degrade = (preprocess.degrade_const_nearest if args.const
                   else preprocess.degrade_nearest)
        realBA = degrade(realBC, sf)
        fake_BC, _ = netG_A2C.apply(pA, realBA, state=stA, train=False)
        fake_BB, _ = netG_C2B.apply(pB, fake_BC, state=stB, train=False)
        if lab:
            pred = jnp.concatenate([fake_BC, fake_BB], -1)
        else:
            pred = fake_BB
        return realBA, fake_BC, pred, psnr(pred, realB)

    n_saved = 0
    for idx in range(len(testset)):
        src_u8, tar_u8 = testset.raw(idx)
        realA, realB = preprocess.convert_pair(
            jnp.asarray(src_u8[None]), jnp.asarray(tar_u8[None]), infoA["ver"])
        realBA, fake_BC, pred, p = run(realA, realB)
        if float(p) > args.threshold:
            mode = "LAB" if lab else "RGB"
            panel = vis.patch2vis(
                vis.tensor2img(np.asarray(realBA), "RGB"),
                vis.tensor2img(np.asarray(fake_BC), "RGB"),
                vis.tensor2img(np.asarray(pred), mode),
                vis.tensor2img(np.asarray(realB), mode),
            )
            vis.save_png(os.path.join(out_dir, testset.datalist[idx]), panel)
            n_saved += 1
        sys.stdout.write("\r%04d / %04d (saved %d)" %
                         (idx, len(testset), n_saved))
    sys.stdout.write("\n")
    return n_saved


if __name__ == "__main__":
    main()
