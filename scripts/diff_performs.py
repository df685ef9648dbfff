"""Diff two Performs.csv files against the BASELINE.md parity bars.

The reference eval protocol appends one row per checkpoint to
result/Performs.csv (testCas.py:92-103) with columns
``time,checkpoint,MSE,PSNR,AE,SSIM``; our cli.test_cas writes the identical
schema.  This tool matches rows by checkpoint name (ignoring .pth/.npz
extensions in the name) and enforces:

  |dPSNR| <= 0.1 dB     |dSSIM| <= 0.002      (BASELINE.md targets)

MSE / AE deltas are reported but not gated (the bars are defined on
PSNR/SSIM).  Exit 0 when every matched checkpoint is within bars, 1
otherwise, 2 when no checkpoint matches.

Usage: python scripts/diff_performs.py REF.csv OURS.csv [--psnr 0.1]
       [--ssim 0.002]
"""
import argparse
import csv
import sys


def read_rows(path):
    with open(path) as f:
        return {row["checkpoint"].strip(): row
                for row in csv.DictReader(f) if row.get("checkpoint")}


def compare(ref_rows, our_rows, psnr_bar=0.1, ssim_bar=0.002):
    """[(checkpoint, dPSNR, dSSIM, within_bars), ...] for matched rows."""
    out = []
    for name, ref in ref_rows.items():
        ours = our_rows.get(name)
        if ours is None:
            continue
        d_psnr = abs(float(ours["PSNR"]) - float(ref["PSNR"]))
        d_ssim = abs(float(ours["SSIM"]) - float(ref["SSIM"]))
        out.append((name, d_psnr, d_ssim,
                    d_psnr <= psnr_bar and d_ssim <= ssim_bar))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ref_csv")
    p.add_argument("our_csv")
    p.add_argument("--psnr", type=float, default=0.1,
                   help="PSNR parity bar in dB (BASELINE.md)")
    p.add_argument("--ssim", type=float, default=0.002)
    args = p.parse_args(argv)

    matched = compare(read_rows(args.ref_csv), read_rows(args.our_csv),
                      args.psnr, args.ssim)
    if not matched:
        print("diff_performs: no common checkpoint rows", file=sys.stderr)
        return 2
    ok = True
    for name, d_psnr, d_ssim, within in matched:
        verdict = "OK " if within else "FAIL"
        print(f"{verdict} {name}: |dPSNR|={d_psnr:.4f} dB "
              f"(bar {args.psnr}), |dSSIM|={d_ssim:.5f} (bar {args.ssim})")
        ok &= within
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
