"""Model zoo tests: shapes/jit + weight-transfer output parity vs the reference.

The parity tests import the torch reference models read-only from
/root/reference (guarded — they skip if the reference isn't mounted), copy the
torch weights into our HWIO pytrees by registration order, and require the
outputs to match.  This pins down every kernel size, padding, activation,
residual connection and weight-sharing quirk without copying any code.
"""
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from srcgan_tpu import models

from tests.ref_import import HAS_REF, ref_module

if HAS_REF:
    ref_rddb = ref_module("model.rddb")
    ref_srdn = ref_module("model.srdn")
    ref_espcn = ref_module("model.espcn")
    ref_srcnn = ref_module("model.srcnn")
    ref_edsr = ref_module("model.edsr")
    ref_resdeconv = ref_module("model.resdeconv")
    ref_legacy = ref_module("model.model")


# ---------------------------------------------------------------------------
# ordered weight transfer torch -> jax
# ---------------------------------------------------------------------------

def torch_leaves(model):
    """Parameter arrays in module-registration order, converted to our layouts."""
    out = []
    for mod in model.modules():
        if isinstance(mod, torch.nn.Conv2d):
            out.append(mod.weight.detach().numpy().transpose(2, 3, 1, 0))  # OIHW->HWIO
            if mod.bias is not None:
                out.append(mod.bias.detach().numpy())
        elif isinstance(mod, torch.nn.ConvTranspose2d):
            out.append(mod.weight.detach().numpy().transpose(2, 3, 0, 1))  # IOHW->HWIO
            if mod.bias is not None:
                out.append(mod.bias.detach().numpy())
        elif isinstance(mod, (torch.nn.GroupNorm, torch.nn.BatchNorm2d)):
            out.append(mod.weight.detach().numpy())
            out.append(mod.bias.detach().numpy())
        elif isinstance(mod, torch.nn.InstanceNorm2d) and mod.affine:
            out.append(mod.weight.detach().numpy())
            out.append(mod.bias.detach().numpy())
    return out


def jax_leaf_slots(params):
    """(container, key) slots in insertion order (python dicts preserve it)."""
    slots = []

    def walk(d):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v)
            else:
                slots.append((d, k))

    walk(params)
    return slots


def transfer(torch_model, jax_params):
    leaves = torch_leaves(torch_model)
    slots = jax_leaf_slots(jax_params)
    assert len(leaves) == len(slots), (
        f"param count mismatch: torch {len(leaves)} vs jax {len(slots)}")
    for (container, key), arr in zip(slots, leaves):
        assert container[key].shape == arr.shape, (
            f"shape mismatch at {key}: {container[key].shape} vs {arr.shape}")
        container[key] = jnp.asarray(arr)
    return jax_params


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def nchw(a):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(a).transpose(0, 3, 1, 2)))


def check_parity(torch_model, jax_model, x_np, atol=5e-4, train=False):
    torch_model.eval() if not train else torch_model.train()
    params = transfer(torch_model, jax_model.init(jax.random.PRNGKey(0)))
    with torch.no_grad():
        ref = torch_model(nchw(x_np))
    got, _ = jax_model.apply(params, jnp.asarray(x_np), train=train)
    assert got.shape == nhwc(ref).shape
    np.testing.assert_allclose(np.asarray(got), nhwc(ref), atol=atol, rtol=1e-3)


RNG = np.random.default_rng(7)


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


# ---------------------------------------------------------------------------
# standalone shape/jit tests (no reference needed)
# ---------------------------------------------------------------------------

class TestShapes:
    @pytest.mark.parametrize("up", [1, 2, 4, 8])
    def test_rddbnet_scales(self, up):
        m = models.RDDBNet(1, 1, up, nf=32, nb=1)
        p = m.init(jax.random.PRNGKey(0))
        y = m.fwd(p, jnp.zeros((1, 8, 8, 1)))
        assert y.shape == (1, 8 * up, 8 * up, 1)

    def test_espcn(self):
        m = models.ESPCN(1, 1, 2)
        p = m.init(jax.random.PRNGKey(0))
        assert m.fwd(p, jnp.zeros((1, 8, 8, 1))).shape == (1, 16, 16, 1)

    def test_srcnn_preserves(self):
        m = models.SRCNN(1, 1, 2)
        p = m.init(jax.random.PRNGKey(0))
        assert m.fwd(p, jnp.zeros((1, 8, 8, 1))).shape == (1, 8, 8, 1)

    def test_srdn_preserves(self):
        m = models.SRDN(1, 1, 2, nf=32, nb=1)
        p = m.init(jax.random.PRNGKey(0))
        assert m.fwd(p, jnp.zeros((1, 8, 8, 1))).shape == (1, 8, 8, 1)

    def test_resdeconv(self):
        m = models.ResDeconv(1, 3)
        p = m.init(jax.random.PRNGKey(0))
        y, _ = m.apply(p, jnp.zeros((1, 32, 32, 1)))
        assert y.shape == (1, 32, 32, 3)

    def test_discriminator_patch_map(self):
        m = models.NLayerDiscriminator(3, 64, 2)
        p = m.init(jax.random.PRNGKey(0))
        y, _ = m.apply(p, jnp.zeros((2, 32, 32, 3)), train=True)
        assert y.shape[0] == 2 and y.shape[-1] == 1

    def test_discriminator_rejects_degenerate_input(self):
        """Inputs too small for the k4 pyramid raise like torch does
        (reference model.py:595-639) instead of emitting an empty
        prediction map that silently NaNs the GAN loss (PARITY.md §2.2)."""
        m = models.NLayerDiscriminator(3, 16, 2)
        p = m.init(jax.random.PRNGKey(0))
        for size in (4, 8):  # 8x8: 8->4->2, then padded 4-conv on 1x1 map
            with pytest.raises(ValueError, match="too small"):
                m.apply(p, jnp.zeros((1, size, size, 3)), train=True)
        # 12x12 is the smallest even size that survives every conv
        y, _ = m.apply(p, jnp.zeros((1, 12, 12, 3)), train=True)
        assert y.shape == (1, 1, 1, 1)

    def test_jit_compiles(self):
        m = models.RDDBNet(1, 1, 2, nf=32, nb=1)
        p = m.init(jax.random.PRNGKey(0))
        f = jax.jit(lambda p, x: m.fwd(p, x))
        y = f(p, jnp.ones((1, 8, 8, 1)))
        assert np.isfinite(np.asarray(y)).all()

    def test_registry(self):
        m = models.create("RDDBNet", 1, 1, 2, nf=32, nb=1)
        assert isinstance(m, models.RDDBNet)
        with pytest.raises(KeyError):
            models.create("NoSuchNet")


# ---------------------------------------------------------------------------
# weight-transfer parity vs the torch reference
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestReferenceParity:
    def test_rddbnet(self):
        t = ref_rddb.RDDBNet(1, 1, 2, nf=32, nb=1)
        j = models.RDDBNet(1, 1, 2, nf=32, nb=1)
        check_parity(t, j, rand(1, 8, 8, 1))

    def test_rddbnet_x4(self):
        t = ref_rddb.RDDBNet(1, 3, 4, nf=32, nb=1)
        j = models.RDDBNet(1, 3, 4, nf=32, nb=1)
        check_parity(t, j, rand(1, 8, 8, 1))

    def test_srdn(self):
        t = ref_srdn.SRDN(1, 3, 2, nf=32, nb=1)
        j = models.SRDN(1, 3, 2, nf=32, nb=1)
        check_parity(t, j, rand(1, 8, 8, 1))

    def test_espcn(self):
        t = ref_espcn.ESPCN(1, 3, 2)
        j = models.ESPCN(1, 3, 2)
        check_parity(t, j, rand(1, 8, 8, 1))

    def test_srcnn(self):
        t = ref_srcnn.SRCNN(3, 3, 2)
        j = models.SRCNN(3, 3, 2)
        check_parity(t, j, rand(1, 8, 8, 3))

    def test_edsr(self):
        t = ref_edsr.EDSR(1, 3, 2, base_channel=32, num_residuals=2)
        j = models.EDSR(1, 3, 2, base_channel=32, num_residuals=2)
        check_parity(t, j, rand(1, 8, 8, 1))

    def test_resdeconv_gn(self):
        t = ref_resdeconv.ResDeconv(src_ch=1, tar_ch=3)
        j = models.ResDeconv(1, 3)
        check_parity(t, j, rand(1, 32, 32, 1), atol=1e-3)

    def test_discriminator_train_mode(self):
        t = ref_legacy.NLayerDiscriminator(3, 16, 2)
        j = models.NLayerDiscriminator(3, 16, 2)
        check_parity(t, j, rand(2, 16, 16, 3), train=True)

    def test_discriminator_degenerate_raise_matches_torch(self):
        """torch raises on an 8x8 input to the k4 pyramid; so do we (shape
        guard in NLayerDiscriminator.apply — PARITY.md §2.2)."""
        torch.manual_seed(0)
        t = ref_legacy.NLayerDiscriminator(3, 16, 2)
        # batch 2 so train-mode BatchNorm survives the 1x1 map and the
        # failure is the conv's (batch 1 dies one layer earlier with
        # BN's ValueError — also a raise, just a different layer's)
        with pytest.raises(RuntimeError):
            with torch.no_grad():
                t(torch.zeros(2, 3, 8, 8))
        j = models.NLayerDiscriminator(3, 16, 2)
        p = j.init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="too small"):
            j.apply(p, jnp.zeros((2, 8, 8, 3)), train=True)

    def test_rddbneta_mode_based(self):
        for mode in ["x1", "x2", "x4"]:
            t = ref_legacy.RDDBNet(1, 3, 32, 1, mode=mode)
            j = models.RDDBNetA(1, 3, 32, 1, mode=mode)
            check_parity(t, j, rand(1, 8, 8, 1))

    def test_rddbnetb(self):
        for mode in ["x2", "x4"]:
            t = ref_legacy.RDDBNetB(3, 3, 32, 1, mode=mode)
            j = models.RDDBNetB(3, 3, 32, 1, mode=mode)
            check_parity(t, j, rand(1, 8, 8, 3))

    def test_srdensenet_a(self):
        t = ref_legacy.SRDenseNetA(1, 3, num_blocks=2, num_layers=2, mode="x2")
        j = models.SRDenseNetA(1, 3, num_blocks=2, num_layers=2, mode="x2")
        check_parity(t, j, rand(1, 8, 8, 1))

    def test_srdensenet_b(self):
        t = ref_legacy.SRDenseNetB(3, 1, num_blocks=2, num_layers=2, mode="x2")
        j = models.SRDenseNetB(3, 1, num_blocks=2, num_layers=2, mode="x2")
        check_parity(t, j, rand(1, 16, 16, 3))


class TestRDB5Schedules:
    """The three RDB5 forward schedules are the same function."""

    def test_all_forms_match(self):
        from srcgan_tpu.models.blocks import ResidualDenseBlock5
        m = ResidualDenseBlock5(64, 32)
        p = m.init(jax.random.PRNGKey(3))
        x = jnp.asarray(rand(2, 12, 12, 64))
        a = m._forward_naive(p, x)
        b = m._forward_grouped(p, x)
        c = m._forward_paired(p, x)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-6)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=5e-6)

    def test_no_bias_variant(self):
        from srcgan_tpu.models.blocks import ResidualDenseBlock5
        m = ResidualDenseBlock5(32, 16, bias=False)
        p = m.init(jax.random.PRNGKey(4))
        x = jnp.asarray(rand(1, 8, 8, 32))
        a = m._forward_naive(p, x)
        c = m._forward_paired(p, x)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=5e-6)

    def test_schedule_context(self):
        """rdb5_schedule() scopes the forward schedule like matmul_precision
        scopes conv precision: nested overrides restore on exit, and every
        schedule routes through forward() to the same values."""
        from srcgan_tpu.models import blocks
        from srcgan_tpu.models.blocks import ResidualDenseBlock5
        m = ResidualDenseBlock5(32, 16)
        p = m.init(jax.random.PRNGKey(5))
        x = jnp.asarray(rand(1, 8, 8, 32))
        assert blocks.current_rdb5_schedule() == blocks.DEFAULT_RDB5_SCHEDULE
        outs = {}
        for sched in ("naive", "grouped", "paired"):
            with blocks.rdb5_schedule(sched):
                assert blocks.current_rdb5_schedule() == sched
                outs[sched] = np.asarray(m.forward(p, x, train=False))
        assert blocks.current_rdb5_schedule() == blocks.DEFAULT_RDB5_SCHEDULE
        np.testing.assert_allclose(outs["grouped"], outs["naive"], atol=5e-6)
        np.testing.assert_allclose(outs["paired"], outs["naive"], atol=5e-6)
        with pytest.raises(ValueError):
            with blocks.rdb5_schedule("bogus"):
                pass
