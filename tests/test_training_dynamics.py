"""Training-DYNAMICS parity: our fused train step vs the reference's loop.

Start both frameworks from IDENTICAL weights (via interop), feed IDENTICAL
batches, run the reference's CasSRC optimization (torch Adam, L1, bilinear
degradation — trainCas.py:133-153) against our jit-fused CasTrainer step.

What is asserted, and why (the drift model):

L1's gradient is sign(pred - target)/N — non-smooth.  At *matched* parameter
points both frameworks produce per-layer gradients agreeing to ~2e-5 relative
L2 (fp32 reduction-order noise; measured on this host: max 2.1e-5 across all
layers x 4 checkpoints).  But once trajectories are advanced independently,
each step's ~1e-6 forward noise flips the L1 sign on near-zero-residual
pixels; Adam's per-parameter normalization amplifies those flips into O(lr)
parameter divergence, and the LOSS difference between the two trajectories
becomes chaotic — observed up to ~1.7e-2 relative on the deeper GN colorizer
by step 7, non-monotonic, host-dependent (the round-1 test bounded this at
1.5e-2 and failed at 2.8% on another host).

So the parity weight is carried by the matched-point checks, which a math bug
CANNOT pass, and the trajectory gets only the loose envelope the chaos model
predicts:

1. Matched-point gradients: at steps {0,3,7,11} along OUR trajectory, export
   our params to torch, compute the reference's gradients there, and require
   per-layer relative-L2 agreement <= 5e-4 (25x the measured noise floor,
   ~100x below any real numerics bug) plus loss agreement <= 2e-5.
2. Step 0 (identical params, pre-update): losses match to fp32 precision.
3. Steps 0-2 (before sign-flip compounding): rtol 1e-3.
4. Full trajectory: 6e-2 envelope (measured max 1.7e-2; headroom for
   host-to-host reduction-order variance) + both columns actually descend.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from srcgan_tpu import interop, models
from srcgan_tpu.train import CasTrainer

from tests.ref_import import HAS_REF, ref_module

N_STEPS = 12
LR = 1e-3  # larger than the reference default to make drift visible
GRAD_CHECK_STEPS = (0, 3, 7, 11)


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
        losses.append((float(loss_SR.detach()), float(loss_C.detach())))
    return losses


def torch_grads_at(tr, ref_espcn, ref_rd, state, tar, up=2):
    """Reference gradients evaluated AT our current parameters.

    Loads our params into fresh torch nets (via interop export), runs the
    reference's two loss computations on the same batch, and maps the torch
    gradients back into our pytree layout with the same importer that maps
    weights (a gradient transforms identically to its parameter under the
    OIHW->HWIO transpose).
    """
    nA = ref_espcn.ESPCN(1, 1, up)
    nB = ref_rd.ResDeconv(src_ch=1, tar_ch=3)
    nA.load_state_dict({k: torch.tensor(np.asarray(v)) for k, v in
                        interop.export_torch_state_dict(
                            tr.netG_A2C, state.sr.params).items()})
    nB.load_state_dict({k: torch.tensor(np.asarray(v)) for k, v in
                        interop.export_torch_state_dict(
                            tr.netG_C2B, state.c.params).items()})
    real_B = torch.from_numpy(tar.transpose(0, 3, 1, 2)).float()
    lum = torch.tensor([0.2125, 0.7154, 0.0721]).view(1, 3, 1, 1)
    real_BC = (real_B * lum).sum(1, keepdim=True)
    real_BA = F.interpolate(real_BC, scale_factor=1.0 / up, mode="bilinear")
    nA.train(); nB.train()
    lossA = torch.mean(torch.abs(nA(real_BA) - real_BC)); lossA.backward()
    lossB = torch.mean(torch.abs(nB(real_BC) - real_B)); lossB.backward()
    gA, _ = interop.import_torch_state_dict(
        tr.netG_A2C, {k: p.grad for k, p in nA.named_parameters()})
    gB, _ = interop.import_torch_state_dict(
        tr.netG_C2B, {k: p.grad for k, p in nB.named_parameters()})
    return gA, gB, float(lossA.detach()), float(lossB.detach())


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


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
    for step, tar in enumerate(batches):
        realB = jnp.asarray(tar)
        realA = jnp.zeros((2, 32, 32, 1), jnp.float32)  # transfer input unused

        if step in GRAD_CHECK_STEPS:
            # 1. matched-point check: reference grads AT our params must agree
            # per-layer — this is what a gradient/loss/degradation bug breaks.
            g, _, m = tr.grads(state, realA, realB)
            gA_t, gB_t, lA, lB = torch_grads_at(tr, ref_espcn, ref_rd,
                                                state, tar)
            for name, (g_ours, g_ref) in (("sr", (g["sr"], gA_t)),
                                          ("c", (g["c"], gB_t))):
                errs = jtu.tree_leaves(jtu.tree_map(_rel_l2, g_ours, g_ref))
                assert max(errs) <= 5e-4, (step, name, max(errs))
            assert abs(float(m["loss_SR"]) - lA) <= 2e-5, (step, lA)
            assert abs(float(m["loss_C"]) - lB) <= 2e-5, (step, lB)

        state, m = tr.train_step(state, realA, realB, LR)
        ours.append((float(m["loss_SR"]), float(m["loss_C"])))

    ref_arr, our_arr = np.array(ref_losses), np.array(ours)
    # 2. step 0 is pre-update: forward + loss must match to fp32 precision
    np.testing.assert_allclose(our_arr[0], ref_arr[0], rtol=2e-6)
    # 3. before sign-flip compounding becomes visible
    np.testing.assert_allclose(our_arr[:3], ref_arr[:3], rtol=1e-3)
    # 4. chaotic-drift envelope (see module docstring for the model)
    np.testing.assert_allclose(our_arr, ref_arr, rtol=6e-2)
    # and the trajectories actually descend, in both frameworks
    assert our_arr[-1, 0] < our_arr[0, 0]
    assert our_arr[-1, 1] < our_arr[0, 1]
    assert ref_arr[-1, 0] > 0 and ref_arr[-1, 1] > 0
