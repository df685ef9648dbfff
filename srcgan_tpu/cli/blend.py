"""Blend generator checkpoints in weight space.

Two modes (srcgan_tpu.weightspace):

  ESRGAN network interpolation (Wang et al. 2018 §3.4) — blend a
  PSNR-trained and a GAN-trained generator without retraining::

    python -m srcgan_tpu.cli.blend --alpha 0.8 \
        checkpoints/RDDBNet_A2C_x4_0050.npz gan/RDDBNet_A2C_x4_0025.npz \
        --out interp/RDDBNet_A2C_x4_0050.npz

  Checkpoint averaging (SWA over the last K epoch saves, or over the
  trainers' --ema shadow saves)::

    python -m srcgan_tpu.cli.blend checkpoints/RDDBNet_A2C_x4_00{30,40,50}.npz \
        --out swa/RDDBNet_A2C_x4_0050.npz

Inputs may be our .npz saves or reference .pth state_dicts interchangeably
(architecture is rebuilt from the name-encoded config, testCas.py:41-53, so
keep the reference filename convention on --out too: the eval/serve drivers
parse it).  The output is a params-only .npz loadable by cli.test_cas,
cli.serve, and cli.export.
"""
from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description="weight-space checkpoint blending")
    p.add_argument("inputs", nargs="+",
                   help="2+ checkpoints of the SAME architecture "
                        "(.npz or reference .pth)")
    p.add_argument("--out", required=True,
                   help="output .npz path (keep the <Model>_<role>_x<up>_"
                        "<epoch>.npz convention so eval drivers can parse it)")
    p.add_argument("--alpha", type=float, default=None,
                   help="ESRGAN network interpolation: exactly 2 inputs, "
                        "out = (1-alpha)*first + alpha*second")
    p.add_argument("--weights", type=float, nargs="+", default=None,
                   help="per-input averaging weights (default: uniform SWA "
                        "mean; normalized to sum to 1)")
    p.add_argument("--force", action="store_true",
                   help="overwrite an existing --out")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.alpha is not None and args.weights is not None:
        sys.exit("--alpha and --weights are mutually exclusive")
    if args.alpha is not None and len(args.inputs) != 2:
        sys.exit("--alpha interpolates exactly 2 checkpoints "
                 f"(got {len(args.inputs)})")
    if len(args.inputs) < 2:
        sys.exit("need at least 2 input checkpoints to blend")
    if os.path.exists(args.out) and not args.force:
        sys.exit(f"{args.out} already exists; pass --force to overwrite")

    from srcgan_tpu import weightspace
    from srcgan_tpu.train.state import save_params

    trees, infos = [], []
    for path in args.inputs:
        params, info = weightspace.load_checkpoint_params(path)
        trees.append(params)
        infos.append(info)
    arch0 = {k: infos[0][k] for k in ("model", "ver", "role", "up")}
    for path, info in zip(args.inputs[1:], infos[1:]):
        arch = {k: info[k] for k in arch0}
        if arch != arch0:
            sys.exit(f"{path} is a {arch} checkpoint; expected {arch0} "
                     "(all blend inputs must share the architecture)")

    if args.alpha is not None:
        out = weightspace.interpolate_params(trees[0], trees[1], args.alpha)
        how = f"alpha={args.alpha} interpolation"
    else:
        if args.weights is not None and len(args.weights) != len(trees):
            sys.exit(f"{len(args.weights)} weights for {len(trees)} inputs")
        out = weightspace.blend_params(trees, args.weights)
        how = f"weights={args.weights}" if args.weights else "uniform mean"
    save_params(args.out, out)
    print(f"{args.out}: {arch0['model']} {arch0['role']} x{arch0['up']} "
          f"<- {how} of {len(trees)} checkpoint(s)")


if __name__ == "__main__":
    main()
