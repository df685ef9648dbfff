"""Tests for exact algebraic fusions and Pallas preprocessing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcgan_tpu import ops
from srcgan_tpu.ops.fused import nearest_up2_conv3x3

RNG = np.random.default_rng(11)


class TestNearestUpConv:
    @pytest.mark.parametrize("cin,cout,bias", [(8, 16, True), (16, 8, False)])
    def test_matches_composite(self, cin, cout, bias):
        x = jnp.asarray(RNG.standard_normal((2, 12, 10, cin)).astype(np.float32))
        w = jnp.asarray(RNG.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1)
        b = jnp.asarray(RNG.standard_normal(cout).astype(np.float32)) if bias else None
        up = ops.interpolate(x, scale_factor=2, mode="nearest")
        ref = ops.conv2d(up, w, b, 1, 1)
        got = nearest_up2_conv3x3(x, w, b)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


class TestFusedPreprocess:
    @pytest.mark.parametrize("up", [2, 4])
    def test_matches_xla_path(self, up):
        from srcgan_tpu.data import preprocess
        from srcgan_tpu.ops.pallas.preprocess_kernel import fused_gray_degrade
        tar_u8 = jnp.asarray(RNG.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
        _, tar = preprocess.convert_pair(tar_u8, tar_u8, "G2RGB")
        real_bc = preprocess.luma(tar)
        real_ba = preprocess.degrade_bilinear(real_bc, up)
        g, low = fused_gray_degrade(tar_u8, up, interpret=True)
        np.testing.assert_allclose(np.asarray(g), np.asarray(real_bc), atol=1e-6)
        np.testing.assert_allclose(np.asarray(low), np.asarray(real_ba), atol=1e-6)

    def test_fused_input_step_matches_xla_step(self):
        """CasTrainer(fused_input=True): the uint8 train step routed through
        the Pallas preprocess kernel equals the XLA-preprocessing step —
        same losses, same updated params (the kernel is exact, so only
        float-noise tolerance)."""
        from srcgan_tpu.train import CasTrainer

        tr_x = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        tr_f = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2,
                          fused_input=True)
        st_x = tr_x.init(jax.random.PRNGKey(0))
        st_f = jax.tree_util.tree_map(jnp.array, st_x)
        src = jnp.asarray(RNG.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
        tar = jnp.asarray(RNG.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
        st_x, m_x = tr_x.train_step_u8(st_x, src, tar, 1e-4)
        st_f, m_f = tr_f.train_step_u8(st_f, src, tar, 1e-4)
        np.testing.assert_allclose(float(m_x["loss_SR"]),
                                   float(m_f["loss_SR"]), rtol=1e-6)
        np.testing.assert_allclose(float(m_x["loss_C"]),
                                   float(m_f["loss_C"]), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(st_x.sr.params),
                        jax.tree_util.tree_leaves(st_f.sr.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)

    def test_fused_input_rejects_lab_const(self):
        from srcgan_tpu.train import CasTrainer

        with pytest.raises(ValueError):
            CasTrainer(lab=True, fused_input=True)
        with pytest.raises(ValueError):
            CasTrainer(sr_model="SRCNN", const=True, fused_input=True)


class TestPhasefoldTail:
    """phasefold_deconv_tail == materialized deconv tail (reference
    rddb.py:93-98 semantics), values AND gradients, all scales."""

    @pytest.mark.parametrize("n_up,ou,fold_last",
                             [(1, 1, True), (1, 3, True), (2, 1, True),
                              (2, 3, True), (2, 1, False), (3, 1, False)])
    def test_matches_materialized(self, n_up, ou, fold_last):
        from srcgan_tpu.ops.fused import phasefold_deconv_tail
        nf = 16
        x = jnp.asarray(RNG.standard_normal((2, 6, 6, nf)).astype(np.float32))
        dws = [jnp.asarray(RNG.standard_normal((2, 2, nf, nf)).astype(np.float32) * .2)
               for _ in range(n_up)]
        lw = jnp.asarray(RNG.standard_normal((3, 3, nf, ou)).astype(np.float32) * .2)

        def materialized(x, dws, lw):
            t = x
            for w in dws:
                t = jax.nn.leaky_relu(ops.conv_transpose2d(t, w, None, 2, 0, 0), 0.2)
            return ops.conv2d(t, lw, None, 1, 1)

        def folded(x, dws, lw):
            return phasefold_deconv_tail(x, dws, lw, fold_last=fold_last)

        ref = materialized(x, dws, lw)
        got = folded(x, dws, lw)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

        # gradients (training runs through this path)
        loss_m = lambda *a: jnp.sum(materialized(*a) ** 2)
        loss_f = lambda *a: jnp.sum(folded(*a) ** 2)
        gm = jax.grad(loss_m, argnums=(0, 1, 2))(x, dws, lw)
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, dws, lw)
        for a, b in zip(jax.tree_util.tree_leaves(gm),
                        jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-4, rtol=2e-4)

    def test_rddbnet_fold_flag_equivalence(self):
        """RDDBNet forward identical with the tail fold on and off."""
        from srcgan_tpu.models import rddb
        x = jnp.asarray(RNG.standard_normal((1, 8, 8, 1)).astype(np.float32))
        for up in (2, 4, 8):
            model = rddb.RDDBNet(1, 1, up, nf=16, nb=1)
            params = model.init(jax.random.PRNGKey(up))
            old = rddb.PHASEFOLD_TAIL
            try:
                rddb.PHASEFOLD_TAIL = True
                y1 = model.fwd(params, x)
                rddb.PHASEFOLD_TAIL = False
                y0 = model.fwd(params, x)
            finally:
                rddb.PHASEFOLD_TAIL = old
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                       atol=1e-5, rtol=1e-5)


class TestPallasTailKernel:
    """tail_x4_fused (interpret mode) == XLA phasefold, bf16-rounding level."""

    @pytest.mark.parametrize("ou", [1, 3])
    def test_matches_xla_fold(self, ou):
        from srcgan_tpu.ops.fused import phasefold_deconv_tail
        from srcgan_tpu.ops.pallas.tail_kernel import tail_x4_fused
        nf = 16
        x = jnp.asarray(RNG.standard_normal((2, 16, 16, nf)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        d1 = jnp.asarray(RNG.standard_normal((2, 2, nf, nf)).astype(np.float32) * .2)
        d2 = jnp.asarray(RNG.standard_normal((2, 2, nf, nf)).astype(np.float32) * .2)
        lw = jnp.asarray(RNG.standard_normal((3, 3, nf, ou)).astype(np.float32) * .2)
        lb = jnp.asarray(RNG.standard_normal(ou).astype(np.float32))
        ref = np.asarray(phasefold_deconv_tail(x, [d1, d2], lw, lb), np.float32)
        got = np.asarray(tail_x4_fused(x, d1, d2, lw, lb, interpret=True),
                         np.float32)
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() <= 0.02 * max(scale, 1.0), \
            (np.abs(got - ref).max(), scale)
