"""Geometric self-ensemble (x8 dihedral TTA) — ops.ensemble + serving wiring.

The reference has no test-time augmentation (its eval loop is one forward per
sample, testCas.py:78-79); these tests pin the beyond-reference ensemble's
exact semantics: device dihedral ops equal the host-side augmentation ops,
inversion is exact, and the batched-ensemble program equals the literal
transform -> forward -> invert -> average loop.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcgan_tpu import models
from srcgan_tpu.data.dataset import dihedral as host_dihedral
from srcgan_tpu.ops import ensemble


class TestDihedralOps:
    def test_matches_host_dihedral(self):
        """dihedral_nhwc(op) == the host-side augmentation op, per sample."""
        x = np.random.default_rng(0).integers(
            0, 256, (2, 6, 6, 3), dtype=np.uint8)
        for op in ensemble.ALL_OPS:
            dev = np.asarray(ensemble.dihedral_nhwc(jnp.asarray(x), op))
            host = np.stack([host_dihedral(img, op) for img in x])
            np.testing.assert_array_equal(dev, host, err_msg=f"op {op}")

    def test_inverse_exact(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 5, 5, 2)))
        for op in ensemble.ALL_OPS:
            back = ensemble.dihedral_nhwc(
                ensemble.dihedral_nhwc(x, op), ensemble.DIHEDRAL_INVERSE[op])
            np.testing.assert_array_equal(np.asarray(back), np.asarray(x),
                                          err_msg=f"op {op}")

    def test_nonsquare_ops_preserve_shape(self):
        x = jnp.zeros((1, 4, 6, 1))
        assert ensemble.ensemble_ops(4, 6) == ensemble.SHAPE_PRESERVING_OPS
        assert ensemble.ensemble_ops(4, 4) == ensemble.ALL_OPS
        for op in ensemble.SHAPE_PRESERVING_OPS:
            assert ensemble.dihedral_nhwc(x, op).shape == x.shape


class TestSelfEnsembleApply:
    def test_equals_literal_loop(self):
        """One batched ensemble call == transform/forward/invert/average."""
        sr = models.ESPCN(1, 1, 2)
        p = sr.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(2).uniform(
            0, 1, (2, 8, 8, 1)).astype(np.float32))

        fn = lambda v: sr.fwd(p, v)
        got = np.asarray(ensemble.self_ensemble_apply(fn, x))

        parts = [np.asarray(ensemble.dihedral_nhwc(
            fn(ensemble.dihedral_nhwc(x, op)), ensemble.DIHEDRAL_INVERSE[op]))
            for op in ensemble.ALL_OPS]
        np.testing.assert_allclose(got, np.mean(parts, axis=0),
                                   rtol=0, atol=1e-6)

    def test_pytree_outputs_and_scale(self):
        """Multi-output fn (the cascade shape): each leaf averaged, SR scale
        handled (D4 inverts on the upscaled grid)."""
        sr = models.ESPCN(1, 1, 2)
        p = sr.init(jax.random.PRNGKey(1))
        x = jnp.asarray(np.random.default_rng(3).uniform(
            0, 1, (1, 6, 6, 1)).astype(np.float32))

        def fn(v):
            y = sr.fwd(p, v)
            return {"sr": y, "ident": v}

        out = ensemble.self_ensemble_apply(fn, x)
        assert out["sr"].shape == (1, 12, 12, 1)
        # identity is exactly D4-equivariant -> ensemble returns the input
        np.testing.assert_allclose(np.asarray(out["ident"]), np.asarray(x),
                                   rtol=0, atol=1e-7)

    def test_nonsquare_input_uses_four_ops(self):
        sr = models.SRCNN(1, 1)  # resolution-preserving
        p = sr.init(jax.random.PRNGKey(2))
        x = jnp.asarray(np.random.default_rng(4).uniform(
            0, 1, (1, 4, 8, 1)).astype(np.float32))
        got = np.asarray(ensemble.self_ensemble_apply(
            lambda v: sr.fwd(p, v), x))
        parts = [np.asarray(ensemble.dihedral_nhwc(
            sr.fwd(p, ensemble.dihedral_nhwc(x, op)),
            ensemble.DIHEDRAL_INVERSE[op]))
            for op in ensemble.SHAPE_PRESERVING_OPS]
        np.testing.assert_allclose(got, np.mean(parts, axis=0),
                                   rtol=0, atol=1e-6)


class TestPredictorSelfEnsemble:
    @pytest.fixture(scope="class")
    def nets(self):
        sr = models.ESPCN(1, 1, 2)
        c = models.ResDeconv(1, 3)
        return (sr, sr.init(jax.random.PRNGKey(0)),
                c, c.init(jax.random.PRNGKey(1)))

    def test_matches_manual_rgb_average(self, nets):
        from srcgan_tpu import serving

        sr, pA, c, pB = nets
        pred = serving.CascadePredictor(sr, pA, c, pB, up=2,
                                        self_ensemble=True)
        x = np.random.default_rng(5).integers(
            0, 256, (2, 16, 16, 1), dtype=np.uint8)

        def rgb_of(v):
            fc, _ = sr.apply(pA, v, state=pred.sr_state, train=False)
            out, _ = c.apply(pB, fc, state=pred.c_state, train=False)
            return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

        xin = jnp.asarray(x).astype(jnp.float32) / 255.0
        want = np.asarray(jnp.round(jnp.clip(
            ensemble.self_ensemble_apply(rgb_of, xin), 0.0, 1.0
        ) * 255.0).astype(jnp.uint8))
        got = pred.predict(x)
        assert got.shape == (2, 32, 32, 3)
        # two different compiled programs of the same math: allow the
        # round-boundary 1-step flips reassociation can cause
        assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1

    def test_tiled_self_ensemble_runs(self, nets):
        from srcgan_tpu import serving

        sr, pA, c, pB = nets
        tiled = serving.TiledPredictor(sr, pA, c, pB, up=2,
                                       self_ensemble=True,
                                       tile=16, overlap=4, max_batch=4)
        scene = np.random.default_rng(6).integers(
            0, 256, (24, 40, 1), dtype=np.uint8)
        out = tiled.predict_scene(scene)
        assert out.shape == (48, 80, 3)
