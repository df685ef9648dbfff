"""Serving API tests: fused predictor from npz and pth checkpoints."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcgan_tpu import models, serving
from srcgan_tpu.train.state import save_params


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    sr = models.ESPCN(1, 1, 2)
    c = models.ResDeconv(1, 3)
    pA = sr.init(jax.random.PRNGKey(0))
    pB = c.init(jax.random.PRNGKey(1))
    netGA = str(d / "ESPCN_A2C_x2_0050.npz")
    netGB = str(d / "ResDeconv_C2B_x2_0050.npz")
    save_params(netGA, pA)
    save_params(netGB, pB)
    return netGA, netGB


class TestPredictor:
    def test_predict_shapes_and_range(self, ckpts):
        pred = serving.CascadePredictor.from_checkpoints(*ckpts)
        x = np.random.default_rng(0).integers(
            0, 256, (2, 16, 16, 1), dtype=np.uint8)
        y = pred.predict(x)
        assert y.shape == (2, 32, 32, 3) and y.dtype == np.uint8

    def test_rgb_input_luma(self, ckpts):
        pred = serving.CascadePredictor.from_checkpoints(*ckpts)
        x = np.random.default_rng(1).integers(
            0, 256, (1, 16, 16, 3), dtype=np.uint8)
        assert pred.predict(x).shape == (1, 32, 32, 3)

    def test_batch_padding(self, ckpts):
        pred = serving.CascadePredictor.from_checkpoints(*ckpts, pad_batch_to=4)
        x = np.random.default_rng(2).integers(
            0, 256, (3, 16, 16, 1), dtype=np.uint8)
        y = pred.predict(x)
        assert y.shape[0] == 3  # padding stripped

    def test_from_torch_pth(self, tmp_path):
        torch = pytest.importorskip("torch")
        from tests.ref_import import HAS_REF, ref_module
        if not HAS_REF:
            pytest.skip("reference not mounted")
        ref = ref_module("model.espcn")
        t_sr = ref.ESPCN(1, 1, 2)
        ref_rd = ref_module("model.resdeconv")
        t_c = ref_rd.ResDeconv(src_ch=1, tar_ch=3)
        pthA = str(tmp_path / "ESPCN_A2C_x2_0025.pth")
        pthB = str(tmp_path / "ResDeconv_C2B_x2_0025.pth")
        torch.save(t_sr.state_dict(), pthA)
        torch.save(t_c.state_dict(), pthB)
        pred = serving.CascadePredictor.from_checkpoints(pthA, pthB)
        x = np.random.default_rng(3).integers(
            0, 256, (1, 16, 16, 1), dtype=np.uint8)
        y = pred.predict(x)
        # cross-check against the torch cascade
        t_sr.eval(); t_c.eval()
        with torch.no_grad():
            g = torch.from_numpy(
                (x.astype(np.float32) / 255.0).transpose(0, 3, 1, 2))
            out = t_c(t_sr(g))
        ref_u8 = np.round(np.clip(
            out.numpy().transpose(0, 2, 3, 1), 0, 1) * 255).astype(np.uint8)
        diff = np.abs(y.astype(int) - ref_u8.astype(int))
        assert diff.max() <= 1  # quantization-boundary wiggle only


class TestSpatialSharded:
    def test_matches_unsharded_within_quantization(self):
        sr = models.ESPCN(1, 1, 2)
        c = models.ResDeconv(1, 3)
        pA = sr.init(jax.random.PRNGKey(0))
        pB = c.init(jax.random.PRNGKey(1))
        base = serving.CascadePredictor(sr, pA, c, pB, up=2)
        sp = serving.SpatialShardedPredictor(sr, pA, c, pB, up=2)
        x = np.random.default_rng(0).integers(
            0, 256, (1, 64, 16, 1), dtype=np.uint8)
        y0 = base.predict(x).astype(int)
        y1 = sp.predict(x).astype(int)
        # sharded conv reduction order can flip the uint8 rounding boundary
        assert np.abs(y0 - y1).max() <= 1
