"""End-to-end eval PROTOCOL parity vs the torch reference.

The strongest quality-parity evidence available without the real Sat2Aer
dataset: run the reference's testCas.py evaluation loop (re-derived in torch,
using the actual reference model implementations and their weights) and our
`cli.test_cas` on the SAME .pth weights over the SAME synthetic test split,
then require the Performs.csv means to agree (PSNR within 0.01 dB, SSIM
within 1e-4 — well inside the 0.1 dB / 0.002 BASELINE.md bars).
"""
import math
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from srcgan_tpu import data

from tests.ref_import import HAS_REF, ref_module
from tests.test_metrics_losses import torch_ssim


def torch_eval_protocol(netA, netB, dataset, sf=2):
    """Re-derivation of testCas.py:61-92 with the torch reference nets."""
    netA.eval()
    netB.eval()
    sums = {"MSE": [], "PSNR": [], "AE": [], "SSIM": []}
    for idx in range(len(dataset)):
        src_u8, tar_u8 = dataset.raw(idx)
        # dataset conversion (dataset.py:114-134): skimage-gray + /255
        tar = torch.from_numpy(tar_u8.astype(np.float32) / 255.0
                               ).permute(2, 0, 1)[None]
        lum = torch.tensor([0.2125, 0.7154, 0.0721]).view(1, 3, 1, 1)
        realBC = (tar * lum).sum(1, keepdim=True)
        realBA = F.interpolate(realBC, scale_factor=1.0 / sf)  # nearest default
        with torch.no_grad():
            fake_BB = netB(netA(realBA))
        pred, tgt = fake_BB, tar
        mse = torch.mean((pred - tgt) ** 2)
        sums["MSE"].append(float(mse))
        sums["PSNR"].append(float(10 * torch.log10(1 / mse)))
        dot = torch.sum(pred * tgt, dim=1)
        npred = torch.sqrt(torch.sum(pred * pred, dim=1))
        ntgt = torch.sqrt(torch.sum(tgt * tgt, dim=1))
        ae = 180 / math.pi * torch.acos(
            torch.clamp(dot / (npred * ntgt + 1e-6), -1, 1))
        sums["AE"].append(float(ae.mean()))
        sums["SSIM"].append(float(torch_ssim(pred, tgt)))
    return {k: sum(v) / len(v) for k, v in sums.items()}


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_eval_protocol_matches_reference(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data.make_synthetic_dataset(str(tmp_path / "Sat2Aerx1"), n_train=2,
                                n_val=1, n_test=4, size=32, seed=9)
    ds = data.FileListDataset("Sat2Aerx1", "test", "G2RGB", str(tmp_path))

    ref_espcn = ref_module("model.espcn")
    ref_rd = ref_module("model.resdeconv")
    netA = ref_espcn.ESPCN(1, 1, 2)
    netB = ref_rd.ResDeconv(src_ch=1, tar_ch=3)
    pthA = str(tmp_path / "ESPCN_A2C_x2_0025.pth")
    pthB = str(tmp_path / "ResDeconv_C2B_x2_0025.pth")
    torch.save(netA.state_dict(), pthA)
    torch.save(netB.state_dict(), pthB)

    # reference protocol, in torch, with the reference implementations
    ref_means = torch_eval_protocol(netA, netB, ds, sf=2)

    # our framework's eval driver on the same .pth weights
    from srcgan_tpu.cli import test_cas

    df = test_cas.main([
        "--netGA", pthA, "--netGB", pthB,
        "--root", "Sat2Aerx1", "--data-dir", str(tmp_path),
        "--result-dir", str(tmp_path / "result"), "--batch-size", "2",
    ])
    row = df.iloc[-1]

    assert abs(float(row["PSNR"]) - ref_means["PSNR"]) < 0.01, (
        row["PSNR"], ref_means["PSNR"])
    assert abs(float(row["SSIM"]) - ref_means["SSIM"]) < 1e-4
    assert abs(float(row["MSE"]) - ref_means["MSE"]) < 1e-5
    assert abs(float(row["AE"]) - ref_means["AE"]) < 0.05

    # the fast eval mode (3-pass bf16 convs) must stay inside the parity bars
    df2 = test_cas.main([
        "--netGA", pthA, "--netGB", pthB,
        "--root", "Sat2Aerx1", "--data-dir", str(tmp_path),
        "--result-dir", str(tmp_path / "result_fast"), "--batch-size", "4",
        "--precision", "high",
    ])
    row2 = df2.iloc[-1]
    assert abs(float(row2["PSNR"]) - ref_means["PSNR"]) < 0.1
    assert abs(float(row2["SSIM"]) - ref_means["SSIM"]) < 0.002

    from srcgan_tpu import config
    config.set_conv_precision("highest")


def torch_train_cascade(netA, netB, dataset, sf=2, iters=40, lr=1e-4,
                        batch=2, seed=0):
    """Re-derivation of trainCas.py:134-153 (CasSRC.optimize_parameters):
    two independent Adam steps per iteration — SR on L1(fake_BC, real_BC),
    colorizer on L1(fake_BB, real_B) — with both nets in train mode, so
    ResDeconv's BatchNorm running stats actually move (the part of a trained
    checkpoint that init-weight transfer tests can never exercise)."""
    g = torch.Generator().manual_seed(seed)
    optA = torch.optim.Adam(netA.parameters(), lr=lr)
    optB = torch.optim.Adam(netB.parameters(), lr=lr)
    crit = torch.nn.L1Loss()  # losses.L1Loss wraps nn.L1Loss (losses.py:95-98)
    lum = torch.tensor([0.2125, 0.7154, 0.0721]).view(1, 3, 1, 1)
    n = len(dataset)
    netA.train(), netB.train()
    for _ in range(iters):
        idxs = torch.randint(0, n, (batch,), generator=g).tolist()
        tars = np.stack([dataset.raw(i)[1] for i in idxs])
        real_B = torch.from_numpy(tars.astype(np.float32) / 255.0
                                  ).permute(0, 3, 1, 2)
        real_BC = (real_B * lum).sum(1, keepdim=True)
        # trainCas.py:88-89 degrades with bilinear (eval uses nearest)
        real_BA = F.interpolate(real_BC, scale_factor=1.0 / sf,
                                mode="bilinear")
        optA.zero_grad()
        loss_sr = crit(netA(real_BA), real_BC)
        loss_sr.backward()
        optA.step()
        optB.zero_grad()
        loss_c = crit(netB(real_BC), real_B)
        loss_c.backward()
        optB.step()
    return float(loss_sr.detach()), float(loss_c.detach())


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_trained_checkpoint_parity(tmp_path, monkeypatch):
    """The VERDICT round-2 gap: parity on *trained* checkpoints, not
    init-time weight transfer.  Train the reference cascade in torch-CPU on
    the synthetic Sat2Aer layout, save real .pth files, and require the two
    stacks' Performs.csv means to agree on them — same bars as the
    init-weights test, now with moved BatchNorm running stats and a
    partially converged loss surface (near-zero residuals are exactly where
    fp32 disagreements would surface)."""
    monkeypatch.chdir(tmp_path)
    data.make_synthetic_dataset(str(tmp_path / "Sat2Aerx1"), n_train=6,
                                n_val=1, n_test=4, size=32, seed=11)
    train_ds = data.FileListDataset("Sat2Aerx1", "train", "G2RGB",
                                    str(tmp_path))
    test_ds = data.FileListDataset("Sat2Aerx1", "test", "G2RGB",
                                   str(tmp_path))

    ref_espcn = ref_module("model.espcn")
    ref_rd = ref_module("model.resdeconv")
    torch.manual_seed(7)
    netA = ref_espcn.ESPCN(1, 1, 2)
    netB = ref_rd.ResDeconv(src_ch=1, tar_ch=3)
    loss_sr, loss_c = torch_train_cascade(netA, netB, train_ds, sf=2,
                                          iters=40)
    assert loss_sr < 0.25 and loss_c < 0.25, (loss_sr, loss_c)

    pthA = str(tmp_path / "ESPCN_A2C_x2_0040.pth")
    pthB = str(tmp_path / "ResDeconv_C2B_x2_0040.pth")
    torch.save(netA.state_dict(), pthA)
    torch.save(netB.state_dict(), pthB)

    ref_means = torch_eval_protocol(netA, netB, test_ds, sf=2)

    from srcgan_tpu.cli import test_cas

    df = test_cas.main([
        "--netGA", pthA, "--netGB", pthB,
        "--root", "Sat2Aerx1", "--data-dir", str(tmp_path),
        "--result-dir", str(tmp_path / "result_trained"), "--batch-size", "2",
    ])
    row = df.iloc[-1]
    assert abs(float(row["PSNR"]) - ref_means["PSNR"]) < 0.01, (
        float(row["PSNR"]), ref_means["PSNR"])
    assert abs(float(row["SSIM"]) - ref_means["SSIM"]) < 1e-4
    assert abs(float(row["MSE"]) - ref_means["MSE"]) < 1e-5
    assert abs(float(row["AE"]) - ref_means["AE"]) < 0.05
