"""Export a trained cascade as a self-contained StableHLO artifact.

  python -m srcgan_tpu.cli.export \
      --netGA checkpoints/RDDBNet_A2C_x4_0050.npz \
      --netGB checkpoints/ResDeconv_C2B_x4_0050.npz \
      --size 128x128 --out cascade_x4.shlo [--batch 8] [--bf16] \
      [--platforms tpu,cpu]

The artifact embeds the weights and the whole uint8->uint8 program
(srcgan_tpu.deploy.export_cascade); `deploy.load_exported` runs it without
this package's model code or the checkpoints.  Default exports a symbolic
batch dimension (one artifact, every batch size).
"""
from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="StableHLO cascade export")
    p.add_argument("--netGA", type=str, required=True)
    p.add_argument("--netGB", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--size", type=str, default="128x128",
                   help="input HxW the artifact is compiled for")
    p.add_argument("--channels", type=int, default=1, choices=(1, 3),
                   help="input channels (3 = RGB, luma taken on device)")
    p.add_argument("--batch", type=int, default=0,
                   help="concrete batch size; 0 = symbolic (any batch)")
    p.add_argument("--bf16", action="store_true",
                   help="bake bf16 weights/compute into the artifact")
    p.add_argument("--platforms", type=str, default="tpu,cpu",
                   help="comma-separated lowering targets")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from srcgan_tpu.deploy import export_cascade
    from srcgan_tpu.serving import CascadePredictor

    pred = CascadePredictor.from_checkpoints(args.netGA, args.netGB,
                                             bf16=args.bf16)
    h, w = (int(v) for v in args.size.lower().split("x"))
    platforms = tuple(p.strip().lower()
                      for p in args.platforms.split(",") if p.strip())
    blob = export_cascade(pred, h=h, w=w, c=args.channels,
                          batch=args.batch or None, platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob) / 1e6:.2f} MB, input "
          f"({args.batch or 'b'}, {h}, {w}, {args.channels}) uint8, "
          f"platforms {args.platforms}")


if __name__ == "__main__":
    main()
