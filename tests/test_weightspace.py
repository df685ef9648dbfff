"""Weight-space tooling: checkpoint averaging + ESRGAN network interpolation.

Covers srcgan_tpu.weightspace (exact arithmetic, structure/dtype guards) and
the cli.blend driver end-to-end on both .npz and reference .pth inputs —
the reference has no weight-space tooling at all (its checkpoints are
write-only state_dicts, trainCas.py:221-225).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcgan_tpu import models, weightspace
from srcgan_tpu.train.state import _flatten, save_params

from tests.ref_import import HAS_REF, ref_module


def small_espcn():
    return models.create("ESPCN", 1, 1, 2, base_kernel=8)


def init_params(seed):
    return jax.device_get(small_espcn().init(jax.random.PRNGKey(seed)))


class TestBlendParams:
    def test_identity(self):
        p = init_params(0)
        out = weightspace.blend_params([p, p, p])
        for k, v in _flatten(out).items():
            np.testing.assert_array_equal(v, _flatten(p)[k])

    def test_weighted_mean_matches_numpy(self):
        a, b = init_params(0), init_params(1)
        out = weightspace.blend_params([a, b], weights=[1.0, 3.0])
        fa, fb, fo = _flatten(a), _flatten(b), _flatten(out)
        for k in fa:
            # mirror the documented arithmetic (normalized weights, f64
            # accumulation) so the check is bit-exact
            want = (0.25 * fa[k].astype(np.float64)
                    + 0.75 * fb[k].astype(np.float64))
            np.testing.assert_allclose(fo[k], want.astype(fa[k].dtype),
                                       rtol=0, atol=0)

    def test_interpolate_endpoints_exact(self):
        a, b = init_params(0), init_params(1)
        fa, fb = _flatten(a), _flatten(b)
        for alpha, ref in ((0.0, fa), (1.0, fb)):
            got = _flatten(weightspace.interpolate_params(a, b, alpha))
            for k in ref:
                np.testing.assert_array_equal(got[k], ref[k])

    def test_interpolated_model_runs(self):
        m = small_espcn()
        a = m.init(jax.random.PRNGKey(0))
        b = m.init(jax.random.PRNGKey(1))
        mid = weightspace.interpolate_params(a, b, 0.5)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 8, 8, 1)).astype(np.float32))
        y, _ = m.apply(mid, x, state=None, train=False)
        assert y.shape == (1, 16, 16, 1)
        assert np.isfinite(np.asarray(y)).all()

    def test_structure_mismatch_raises(self):
        a = init_params(0)
        b = jax.device_get(models.create("ESPCN", 1, 1, 2, base_kernel=16)
                           .init(jax.random.PRNGKey(0)))
        with pytest.raises(ValueError, match="shape"):
            weightspace.blend_params([a, b])
        with pytest.raises(ValueError, match="different parameter tree"):
            weightspace.blend_params([a, {"only": np.zeros(3, np.float32)}])

    def test_dtype_preserved_and_alpha_range(self):
        a, b = init_params(0), init_params(1)
        cast = jax.tree_util.tree_map(lambda x: x.astype(np.float16), a)
        out = weightspace.blend_params([cast, cast])
        assert all(v.dtype == np.float16 for v in _flatten(out).values())
        with pytest.raises(ValueError, match="alpha"):
            weightspace.interpolate_params(a, b, 1.5)

    def test_non_float_leaves(self):
        a = {"w": np.ones((2,), np.float32), "n": np.int32(3)}
        b = {"w": np.zeros((2,), np.float32), "n": np.int32(3)}
        out = weightspace.blend_params([a, b])
        np.testing.assert_allclose(out["w"], [0.5, 0.5])
        assert out["n"] == 3  # identical counters pass through
        b["n"] = np.int32(4)
        with pytest.raises(ValueError, match="non-float"):
            weightspace.blend_params([a, b])

    def test_weight_validation(self):
        a = init_params(0)
        with pytest.raises(ValueError, match="weights"):
            weightspace.blend_params([a, a], weights=[1.0])
        with pytest.raises(ValueError, match="positive"):
            weightspace.blend_params([a, a], weights=[1.0, -1.0])
        with pytest.raises(ValueError, match="at least one"):
            weightspace.blend_params([])


class TestBlendCLI:
    def _save(self, tmp_path, seed, name="ESPCN_A2C_x2_%04d.npz"):
        path = str(tmp_path / (name % seed))
        save_params(path, init_params(seed))
        return path

    def test_interpolation_roundtrip(self, tmp_path):
        from srcgan_tpu.cli import blend
        from srcgan_tpu.interop import load_params_any

        pa = self._save(tmp_path, 0)
        pb = self._save(tmp_path, 1)
        out = str(tmp_path / "ESPCN_A2C_x2_0099.npz")
        blend.main([pa, pb, "--alpha", "0.5", "--out", out])
        # blend rebuilds from the name-encoded config (default base_kernel),
        # so reload structurally (structure check happens against the saved
        # tree itself here)
        got = _flatten(weightspace.load_checkpoint_params(out)[0])
        fa, fb = _flatten(init_params(0)), _flatten(init_params(1))
        for k in fa:
            want = ((fa[k].astype(np.float64) + fb[k]) / 2).astype(fa[k].dtype)
            np.testing.assert_allclose(got[k], want, rtol=0, atol=0)
        # the output is a params-only .npz the standard loaders accept
        m = small_espcn()
        params, _ = load_params_any(m, out)
        assert set(_flatten(params)) == set(fa)

    def test_swa_mean(self, tmp_path):
        from srcgan_tpu.cli import blend

        paths = [self._save(tmp_path, s) for s in range(3)]
        out = str(tmp_path / "ESPCN_A2C_x2_0050.npz")
        blend.main(paths + ["--out", out])
        got = _flatten(weightspace.load_checkpoint_params(out)[0])
        flats = [_flatten(init_params(s)) for s in range(3)]
        for k in flats[0]:
            want = (sum(f[k].astype(np.float64) for f in flats) / 3
                    ).astype(flats[0][k].dtype)
            np.testing.assert_allclose(got[k], want, rtol=0, atol=1e-7)

    def test_guards(self, tmp_path):
        from srcgan_tpu.cli import blend

        pa = self._save(tmp_path, 0)
        pb = self._save(tmp_path, 1)
        px = self._save(tmp_path, 2, name="ESPCN_A2C_x4_%04d.npz")
        out = str(tmp_path / "ESPCN_A2C_x2_0099.npz")
        with pytest.raises(SystemExit, match="at least 2"):
            blend.main([pa, "--out", out])
        with pytest.raises(SystemExit, match="exactly 2"):
            blend.main([pa, pb, pb, "--alpha", "0.5", "--out", out])
        with pytest.raises(SystemExit, match="mutually exclusive"):
            blend.main([pa, pb, "--alpha", "0.5", "--weights", "1", "2",
                        "--out", out])
        with pytest.raises(SystemExit, match="architecture"):
            blend.main([pa, px, "--out", out])
        blend.main([pa, pb, "--out", out])
        with pytest.raises(SystemExit, match="--force"):
            blend.main([pa, pb, "--out", out])
        blend.main([pa, pb, "--out", out, "--force"])  # succeeds

    @pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
    def test_pth_input(self, tmp_path):
        """Blend a reference torch .pth with our .npz — the migration story:
        alpha=0 must reproduce the imported torch weights exactly."""
        import torch

        from srcgan_tpu.cli import blend
        from srcgan_tpu.interop import import_torch_state_dict

        torch.manual_seed(0)
        ref = ref_module("model.espcn").ESPCN(1, 1, 2)
        pth = str(tmp_path / "ESPCN_A2C_x2_0001.pth")
        torch.save(ref.state_dict(), pth)

        ours = models.create("ESPCN", 1, 1, 2)
        npz = str(tmp_path / "ESPCN_A2C_x2_0002.npz")
        save_params(npz, jax.device_get(ours.init(jax.random.PRNGKey(0))))

        out = str(tmp_path / "ESPCN_A2C_x2_0003.npz")
        blend.main([pth, npz, "--alpha", "0.0", "--out", out])
        got = _flatten(weightspace.load_checkpoint_params(out)[0])
        want, _ = import_torch_state_dict(ours, pth)
        for k, v in _flatten(jax.device_get(want)).items():
            np.testing.assert_array_equal(got[k], v)
