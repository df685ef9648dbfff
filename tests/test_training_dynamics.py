"""Training-DYNAMICS parity: our fused train step vs the reference's loop.

Start both frameworks from IDENTICAL weights (via interop), feed IDENTICAL
batches, run the reference's CasSRC optimization (torch Adam, L1, bilinear
degradation — trainCas.py:133-153) against our jit-fused CasTrainer step, and
require the per-step loss trajectories to match.  This pins the entire
training math — degradation replay, losses, gradients, Adam with torch
defaults — not just the forward pass.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from srcgan_tpu import interop, models
from srcgan_tpu.train import CasTrainer

from tests.ref_import import HAS_REF, ref_module

N_STEPS = 12
LR = 1e-3  # larger than the reference default to make drift visible


def torch_cas_steps(netA, netB, batches, up=2):
    """The reference CasSRC optimization loop (trainCas.py:82-153)."""
    optG = torch.optim.Adam(netA.parameters(), lr=LR)
    optD = torch.optim.Adam(netB.parameters(), lr=LR)
    losses = []
    for tar in batches:
        real_B = torch.from_numpy(tar.transpose(0, 3, 1, 2)).float()
        lum = torch.tensor([0.2125, 0.7154, 0.0721]).view(1, 3, 1, 1)
        real_BC = (real_B * lum).sum(1, keepdim=True)
        real_BA = F.interpolate(real_BC, scale_factor=1.0 / up, mode="bilinear")
        netA.train(); netB.train()
        fake_BC = netA(real_BA)
        loss_SR = torch.mean(torch.abs(fake_BC - real_BC))
        optG.zero_grad(); loss_SR.backward(); optG.step()
        fake_BB = netB(real_BC)
        loss_C = torch.mean(torch.abs(fake_BB - real_B))
        optD.zero_grad(); loss_C.backward(); optD.step()
        losses.append((float(loss_SR), float(loss_C)))
    return losses


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_training_trajectories_match():
    ref_espcn = ref_module("model.espcn")
    ref_rd = ref_module("model.resdeconv")
    netA = ref_espcn.ESPCN(1, 1, 2)
    netB = ref_rd.ResDeconv(src_ch=1, tar_ch=3)
    sdA = {k: v.clone() for k, v in netA.state_dict().items()}
    sdB = {k: v.clone() for k, v in netB.state_dict().items()}

    rng = np.random.default_rng(0)
    batches = [rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
               for _ in range(N_STEPS)]

    ref_losses = torch_cas_steps(netA, netB, [b.copy() for b in batches])

    # our side: identical initial weights via interop
    tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2, lr=LR)
    state = tr.init(jax.random.PRNGKey(0))
    sr_params, _ = interop.import_torch_state_dict(tr.netG_A2C, sdA)
    c_params, _ = interop.import_torch_state_dict(tr.netG_C2B, sdB)
    state = state._replace(sr=state.sr._replace(params=sr_params),
                           c=state.c._replace(params=c_params))

    ours = []
    for tar in batches:
        realB = jnp.asarray(tar)
        realA = jnp.zeros((2, 32, 32, 1), jnp.float32)  # transfer input unused
        state, m = tr.train_step(state, realA, realB, LR)
        ours.append((float(m["loss_SR"]), float(m["loss_C"])))

    ref_arr, our_arr = np.array(ref_losses), np.array(ours)
    # step 1 is pre-update: forward + loss must match to fp32 precision
    np.testing.assert_allclose(our_arr[0], ref_arr[0], rtol=2e-6)
    # subsequent steps drift by L1's non-smooth gradient: sign(pred-target)
    # flips on near-zero pixels under fp reduction-order noise (measured
    # per-layer grad agreement is 2e-5 relative), compounding through Adam.
    # The SR column stays ~1e-6; the deeper GN colorizer drifts up to ~1%.
    np.testing.assert_allclose(our_arr[:, 0], ref_arr[:, 0], rtol=1e-3)
    np.testing.assert_allclose(our_arr, ref_arr, rtol=1.5e-2)
    # and the trajectory actually descends
    assert our_arr[-1, 0] < our_arr[0, 0]
