"""Converged-flagship showcase: train -> eval -> PSNR-gated panels.

Runs the reference's core workflow (run.sh -> trainCas.py -> testCas.py ->
visCas.py) end-to-end through this framework's CLIs on the flagship
RDDBNet+ResDeconv x2 cascade, at the 400-epoch D4-augmented schedule where
the cascade converges (docs/PERF.md "D4 augmentation study"), on a
colorizable synthetic Sat2Aer-layout dataset (no real imagery ships in this
image; `make_synthetic_dataset(colorizable=True)` puts color in the
luma-determined regime real aerial RGB lives in).

Outputs (under $SHOWCASE_DIR, default runs/showcase):
  result/Performs.csv                      — testCas.py:92-103 schema rows
  result/vis_RDDBNet_x2_NNNN/*.png         — ONLY samples whose cascade PSNR
                                             clears the reference's 22.5 dB
                                             bar (vis.sh:13, visCas.py:132)

Usage:  python scripts/showcase_flagship.py
        SHOWCASE_EPOCHS=2 python scripts/showcase_flagship.py   (smoke)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srcgan_tpu import data
from srcgan_tpu.cli import test_cas, train_cas, vis_cas
from srcgan_tpu.train import checkpoint_name

WORK = os.environ.get("SHOWCASE_DIR", os.path.join("runs", "showcase"))
EPOCHS = int(os.environ.get("SHOWCASE_EPOCHS", "400"))


def main():
    data_dir = os.path.join(WORK, "dataset")
    ck = os.path.join(WORK, "checkpoints")
    res = os.path.join(WORK, "result")
    # 256x256 tiles — the reference's actual patch size (example PNGs,
    # SURVEY §1).  Size matters beyond fidelity: ResDeconv's stride-32
    # encoder bottleneck is 8x8 at 256² (vs 4x4 at 128²), which is what
    # lets the skip-less colorizer represent the field frequencies at all.
    root = data.make_synthetic_dataset(
        os.path.join(data_dir, "Sat2Aerx1"), n_train=16, n_val=4, n_test=8,
        size=256, seed=7, colorizable=True)

    train_cas.main([
        "--SRModel", "RDDBNet", "--CModel", "ResDeconv", "--up", "2",
        "--num-epochs", str(EPOCHS), "--batch-size", "8",
        "--bf16-acts", "--augment", "--cache",
        # mid-run save for the val-PSNR trace when it divides EPOCHS,
        # else a single final-epoch save (odd/short smoke values)
        "--save-every", str(EPOCHS // 2 if EPOCHS % 2 == 0 and EPOCHS >= 2
                            else EPOCHS),
        "--root", root, "--data-dir", data_dir, "--checkpoints", ck,
        "--log-every", "100", "--seed", "0"])

    ga = os.path.join(ck, checkpoint_name("RDDBNet", "A2C", 2, EPOCHS))
    gb = os.path.join(ck, checkpoint_name("ResDeconv", "C2B", 2, EPOCHS))
    common = ["--netGA", ga, "--netGB", gb, "--root", root,
              "--data-dir", data_dir, "--result-dir", res]
    test_cas.main(common + ["--batch-size", "4"])
    vis_cas.main(common + ["--threshold", "22.5"])

    with open(os.path.join(res, "Performs.csv")) as f:
        print("\nPerforms.csv:\n" + f.read())
    vis_dir = os.path.join(res, f"vis_RDDBNet_x2_{EPOCHS:04d}")
    panels = sorted(os.listdir(vis_dir)) if os.path.isdir(vis_dir) else []
    print(f"panels clearing the 22.5 dB bar: {len(panels)}")
    for p in panels:
        print(" ", os.path.join(vis_dir, p))


if __name__ == "__main__":
    main()
