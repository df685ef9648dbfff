"""Training-DYNAMICS parity: our fused train step vs the reference's loop.

Start both frameworks from IDENTICAL weights (via interop), feed IDENTICAL
batches, run the reference's CasSRC optimization (torch Adam, L1, bilinear
degradation — trainCas.py:133-153) against our jit-fused CasTrainer step.

What is asserted, and why (the drift model):

Two mechanisms make fp32 gradients disagree between frameworks at IDENTICAL
parameters, neither of which is a math bug:
(a) L1's gradient is sign(pred - target)/N — non-smooth; wherever the
    residual is within forward noise of zero the two frameworks can disagree
    on the SIGN of that pixel's contribution.
(b) Backprop conditioning: each framework sums reductions in a different
    order (BLAS kernel choice, thread partitioning — the 8-virtual-device
    CPU backend the suite pins changes it too).  The resulting ~1e-7
    relative forward differences are amplified through the deep
    conv+BatchNorm backward; measured amplification reaches ~1e4-1e5 a few
    optimization steps into the trajectory (per-layer full-gradient rel-L2
    7e-3 at step 3 on this host in fp32 — with 99.95% of pixels residual-
    masked IN, so (a) alone does not explain it).
Both mechanisms are artifacts of finite precision, so the tight check runs
in float64, where the same amplification acts on 1e-16 noise (measured
per-layer rel-L2: 1.3e-8 SR / 8.6e-7 colorizer at the fp32-worst
checkpoint) and a genuine math bug — wrong transpose, padding, stride, BN
semantics — still produces O(1) error:

1. Matched-point FLOAT64 masked gradients at steps {0,3,7,11} along OUR
   trajectory: export our params to torch, and in BOTH frameworks
   differentiate the residual-masked L1  sum(mask*|pred-tgt|)/sum(mask)
   with one shared mask `|residual| > 1e-4` (masking keeps the comparison
   well-defined at L1's kink; computed once from our fp32 forward, applied
   as a constant on both sides) with float64 params/inputs.  Per-layer
   relative-L2 must agree <= 3e-5 (~35x the measured 8.6e-7 floor).
2. Matched-point FULL fp32 gradients (the trainer's real grads path) get
   only the loose envelope mechanism (b) predicts: per-layer rel-L2 <= 5e-2
   (measured up to 7e-3 at step 3 on this host/backend).
3. Matched-point plain-L1 loss values agree <= 2e-5.
4. Step 0 (identical params, pre-update): losses match to fp32 precision.
5. Steps 0-2 (before amplification compounds): rtol 1e-3.
6. Full trajectory: 6e-2 envelope (measured max 1.7e-2; headroom for
   host-to-host reduction-order variance) + both columns actually descend.

The torch init RNG is pinned (manual_seed(0)): the fp32 envelopes above are
trajectory-dependent, and an unpinned init made this test's outcome depend
on which tests ran before it (red in full-suite order, green alone).
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
# Residual-mask threshold: pixels with |pred-target| below this are excluded
# from the tight matched-point gradient comparison.  1e-4 is ~100x the fp32
# cross-framework forward noise, so the shared mask is stable and no surviving
# pixel can flip its L1 gradient sign between frameworks.
MASK_TAU = 1e-4


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


def residual_masks(tr, state, realB, tau=MASK_TAU):
    """The shared matched-point masks: 1.0 where OUR forward's residual is
    safely away from the L1 kink, 0.0 where the sign is framework-noise-
    dependent.  NHWC float numpy, applied as a constant on both sides."""
    real_BC, tgt_B = tr._split_targets(realB)
    real_BA = tr._degrade(real_BC)
    fake_BC, _ = tr.netG_A2C.apply(state.sr.params, real_BA,
                                   state=state.sr_model_state, train=True)
    fake_BB, _ = tr.netG_C2B.apply(state.c.params, real_BC,
                                   state=state.c_model_state, train=True)
    maskA = (np.abs(np.asarray(fake_BC - real_BC)) > tau).astype(np.float32)
    maskB = (np.abs(np.asarray(fake_BB - tgt_B)) > tau).astype(np.float32)
    assert maskA.sum() > 0 and maskB.sum() > 0
    return maskA, maskB


def our_masked_grads_f64(tr, state, realB, maskA, maskB):
    """float64 gradients of the residual-masked L1 losses through OUR
    forward path (same nets, same _split_targets/_degrade helpers
    CasTrainer.grads uses).  Requires jax_enable_x64."""
    real_BC, tgt_B = tr._split_targets(jnp.asarray(realB, jnp.float64))
    real_BA = tr._degrade(real_BC)
    mA = jnp.asarray(maskA, jnp.float64)
    mB = jnp.asarray(maskB, jnp.float64)
    to64 = lambda t: jtu.tree_map(lambda a: jnp.asarray(a, jnp.float64), t)

    def lossA(p):
        y, _ = tr.netG_A2C.apply(p, real_BA, state=state.sr_model_state,
                                 train=True)
        return jnp.sum(mA * jnp.abs(y - real_BC)) / jnp.sum(mA)

    def lossB(p):
        y, _ = tr.netG_C2B.apply(p, real_BC, state=state.c_model_state,
                                 train=True)
        return jnp.sum(mB * jnp.abs(y - tgt_B)) / jnp.sum(mB)

    return (jax.grad(lossA)(to64(state.sr.params)),
            jax.grad(lossB)(to64(state.c.params)))


def torch_grads_at(tr, ref_espcn, ref_rd, state, tar, maskA, maskB, up=2):
    """Reference gradients evaluated AT our current parameters.

    Loads our params into fresh torch nets (via interop export), runs the
    reference's two loss computations on the same batch, and maps the torch
    gradients back into our pytree layout with the same importer that maps
    weights (a gradient transforms identically to its parameter under the
    OIHW->HWIO transpose).  Returns the fp32 FULL-L1 grads (loose check),
    the float64 residual-MASKED grads (tight check; double nets/inputs),
    and the fp32 plain loss values.
    """
    def build(double):
        nA = ref_espcn.ESPCN(1, 1, up)
        nB = ref_rd.ResDeconv(src_ch=1, tar_ch=3)
        dt = torch.float64 if double else torch.float32
        if double:
            nA.double(); nB.double()
        nA.load_state_dict({k: torch.tensor(np.asarray(v), dtype=dt)
                            for k, v in interop.export_torch_state_dict(
                                tr.netG_A2C, state.sr.params).items()})
        nB.load_state_dict({k: torch.tensor(np.asarray(v), dtype=dt)
                            for k, v in interop.export_torch_state_dict(
                                tr.netG_C2B, state.c.params).items()})
        real_B = torch.from_numpy(tar.transpose(0, 3, 1, 2)).to(dt)
        lum = torch.tensor([0.2125, 0.7154, 0.0721],
                           dtype=dt).view(1, 3, 1, 1)
        real_BC = (real_B * lum).sum(1, keepdim=True)
        real_BA = F.interpolate(real_BC, scale_factor=1.0 / up,
                                mode="bilinear")
        nA.train(); nB.train()
        return nA, nB, real_B, real_BC, real_BA

    def grab(net):
        return {k: p.grad.clone() for k, p in net.named_parameters()}

    def to_ours(net, g):
        return interop.import_torch_state_dict(net, g)[0]

    # fp32 side: the trainer's real (full-L1) grads + plain losses
    nA, nB, real_B, real_BC, real_BA = build(double=False)
    outA, outB = nA(real_BA), nB(real_BC)
    lossA = torch.mean(torch.abs(outA - real_BC))
    lossB = torch.mean(torch.abs(outB - real_B))
    lossA.backward(); lossB.backward()
    gA_full, gB_full = grab(nA), grab(nB)

    # float64 side: the residual-masked tight comparison
    nA, nB, real_B, real_BC, real_BA = build(double=True)
    mA = torch.from_numpy(maskA.transpose(0, 3, 1, 2)).double()
    mB = torch.from_numpy(maskB.transpose(0, 3, 1, 2)).double()
    outA, outB = nA(real_BA), nB(real_BC)
    ((mA * (outA - real_BC).abs()).sum() / mA.sum()).backward()
    ((mB * (outB - real_B).abs()).sum() / mB.sum()).backward()
    gA_mask, gB_mask = grab(nA), grab(nB)

    return ((to_ours(tr.netG_A2C, gA_full), to_ours(tr.netG_C2B, gB_full)),
            (to_ours(tr.netG_A2C, gA_mask), to_ours(tr.netG_C2B, gB_mask)),
            float(lossA.detach()), float(lossB.detach()))


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


def _max_err(ours, ref):
    return max(jtu.tree_leaves(jtu.tree_map(_rel_l2, ours, ref)))


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_training_trajectories_match():
    ref_espcn = ref_module("model.espcn")
    ref_rd = ref_module("model.resdeconv")
    # The drift bounds below were measured at THIS init; torch inits draw
    # from the global RNG, so pin it or any earlier test that consumes torch
    # randomness changes the trajectory (and the suite goes red only in
    # full-suite order — exactly what happened in rounds 1-3).
    torch.manual_seed(0)
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
            # matched-point checks: reference grads AT our params.
            g, _, m = tr.grads(state, realA, realB)
            maskA, maskB = residual_masks(tr, state, realB)
            jax.config.update("jax_enable_x64", True)
            try:
                gA_m, gB_m = our_masked_grads_f64(tr, state, realB,
                                                  maskA, maskB)
                (full_t, mask_t, lA, lB) = torch_grads_at(
                    tr, ref_espcn, ref_rd, state, tar, maskA, maskB)
            finally:
                jax.config.update("jax_enable_x64", False)
            # 1. tight (float64): a math bug CANNOT pass this, and finite-
            # precision amplification cannot fail it (see module docstring).
            for name, g_ours, g_ref in (("sr", gA_m, mask_t[0]),
                                        ("c", gB_m, mask_t[1])):
                err = _max_err(g_ours, g_ref)
                assert err <= 3e-5, ("masked64", step, name, err)
            # 2. loose: the trainer's full-L1 grads under the sign-flip
            # envelope (see module docstring).
            for name, g_ours, g_ref in (("sr", g["sr"], full_t[0]),
                                        ("c", g["c"], full_t[1])):
                err = _max_err(g_ours, g_ref)
                assert err <= 5e-2, ("full", step, name, err)
            # 3. plain loss agreement
            assert abs(float(m["loss_SR"]) - lA) <= 2e-5, (step, lA)
            assert abs(float(m["loss_C"]) - lB) <= 2e-5, (step, lB)

        state, m = tr.train_step(state, realA, realB, LR)
        ours.append((float(m["loss_SR"]), float(m["loss_C"])))

    ref_arr, our_arr = np.array(ref_losses), np.array(ours)
    # 4. step 0 is pre-update: forward + loss must match to fp32 precision
    np.testing.assert_allclose(our_arr[0], ref_arr[0], rtol=2e-6)
    # 5. before sign-flip compounding becomes visible
    np.testing.assert_allclose(our_arr[:3], ref_arr[:3], rtol=1e-3)
    # 6. chaotic-drift envelope (see module docstring for the model)
    np.testing.assert_allclose(our_arr, ref_arr, rtol=6e-2)
    # and the trajectories actually descend, in both frameworks
    assert our_arr[-1, 0] < our_arr[0, 0]
    assert our_arr[-1, 1] < our_arr[0, 1]
    assert ref_arr[-1, 0] > 0 and ref_arr[-1, 1] > 0
