"""Real-data reproduction kit (VERDICT r3 item 9).

Real Sat2Aer imagery can't ship in this image, so scripts/realdata_repro.sh
stages the round-N real-data parity run: split lists via cli.prepare_data,
seeded reference train+eval (runpy of the untouched checkout), our
train+eval with the same protocol, a cross-eval of the reference-trained
.pth through our stack, and Performs.csv diffs against the BASELINE.md bars
(0.1 dB PSNR / 0.002 SSIM).  These tests dry-run the machinery on the
synthetic layout and pin the diff tool's comparison logic.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import diff_performs  # noqa: E402  (scripts/ module)


class TestDiffPerforms:
    REF = {"RDDBNet_A2C_x2_0050": {"PSNR": "24.500", "SSIM": "0.810"}}

    def test_within_bars(self):
        ours = {"RDDBNet_A2C_x2_0050": {"PSNR": "24.420", "SSIM": "0.8115"}}
        [(name, dp, ds, ok)] = diff_performs.compare(self.REF, ours)
        assert ok and abs(dp - 0.08) < 1e-9 and abs(ds - 0.0015) < 1e-12

    def test_psnr_violation(self):
        ours = {"RDDBNet_A2C_x2_0050": {"PSNR": "24.350", "SSIM": "0.810"}}
        [(_, _, _, ok)] = diff_performs.compare(self.REF, ours)
        assert not ok

    def test_ssim_violation(self):
        ours = {"RDDBNet_A2C_x2_0050": {"PSNR": "24.500", "SSIM": "0.807"}}
        [(_, _, _, ok)] = diff_performs.compare(self.REF, ours)
        assert not ok

    def test_unmatched_rows_skipped(self):
        assert diff_performs.compare(self.REF, {"other": {}}) == []

    def test_cli_exit_codes(self, tmp_path):
        ref = tmp_path / "ref.csv"
        ours = tmp_path / "ours.csv"
        hdr = "time,checkpoint,MSE,PSNR,AE,SSIM\n"
        ref.write_text(hdr + "Aug_20,ESPCN_A2C_x2_0025,0.01,24.5,5.0,0.810\n")
        ours.write_text(hdr + "Aug_20,ESPCN_A2C_x2_0025,0.01,24.45,5.0,0.811\n")
        assert diff_performs.main([str(ref), str(ours)]) == 0
        ours.write_text(hdr + "Aug_20,ESPCN_A2C_x2_0025,0.01,23.0,5.0,0.811\n")
        assert diff_performs.main([str(ref), str(ours)]) == 1
        ours.write_text(hdr + "Aug_20,OTHER_A2C_x2_0025,0.01,24.5,5.0,0.810\n")
        assert diff_performs.main([str(ref), str(ours)]) == 2


def test_realdata_repro_dry_run(tmp_path):
    """The staged script runs end-to-end on the synthetic layout: builds
    split lists, trains + evals our stack (CPU platform pin), and — since
    the reference's deps (skimage/cv2) are absent in this image — records
    the reference stages as skipped instead of failing.  On a machine with
    the imagery + deps the same script runs all five stages."""
    from srcgan_tpu import data

    data.make_synthetic_dataset(str(tmp_path / "ds" / "Sat2Aerx1"),
                                n_train=4, n_val=1, n_test=2, size=32,
                                seed=3, colorizable=True)
    # drop the lists: the script must build them via cli.prepare_data
    for split in ("train", "val", "test"):
        os.remove(tmp_path / "ds" / "Sat2Aerx1" / f"{split}.txt")

    env = dict(os.environ)
    env.update({"SAT2AER_DIR": str(tmp_path / "ds"), "DRY_RUN": "1",
                "PLATFORM": "cpu", "EPOCHS": "25", "SR_MODEL": "ESPCN",
                "SEED": "0"})
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "realdata_repro.sh"),
         str(tmp_path / "work")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # lists were built
    assert (tmp_path / "ds" / "Sat2Aerx1" / "train.txt").exists()
    # our stack produced the protocol CSV
    csv_path = tmp_path / "work" / "ours" / "result" / "Performs.csv"
    assert csv_path.exists()
    body = csv_path.read_text()
    assert "ESPCN_A2C_x2_0025" in body
    # reference stages were skipped, not failed
    assert "SKIPPED (dry run)" in proc.stdout
