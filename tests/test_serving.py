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


class TestInt8Serving:
    """Post-training int8 quantization (srcgan_tpu.quant): accuracy bounds on
    a briefly-trained cascade, calibration contract, per-stage error."""

    def _trained_cascade(self):
        from srcgan_tpu.train import CasTrainer
        rng = np.random.default_rng(0)
        # smooth synthetic targets (SR-learnable)
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32
        imgs = np.zeros((8, 32, 32, 3), np.float32)
        for i in range(8):
            for _ in range(5):
                cx, cy = rng.uniform(0, 1, 2)
                s = rng.uniform(0.1, 0.3)
                imgs[i] += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                                  / (2 * s * s))[..., None] * rng.uniform(-1, 1, 3)
        lo = imgs.min(axis=(1, 2, 3), keepdims=True)
        hi = imgs.max(axis=(1, 2, 3), keepdims=True)
        imgs = (imgs - lo) / (hi - lo + 1e-6)
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st = tr.init(jax.random.PRNGKey(0))
        for _ in range(15):
            st, _ = tr.train_step(st, jnp.zeros((8, 32, 32, 1)),
                                  jnp.asarray(imgs), 1e-3)
        return tr, st, imgs

    def test_int8_quality_delta(self):
        from srcgan_tpu.serving import CascadePredictor
        tr, st, imgs = self._trained_cascade()
        fp = CascadePredictor(tr.netG_A2C, st.sr.params, tr.netG_C2B,
                              st.c.params, up=2)
        q = CascadePredictor(tr.netG_A2C, st.sr.params, tr.netG_C2B,
                             st.c.params, up=2, int8=True)
        lum = imgs @ np.array([0.2125, 0.7154, 0.0721], np.float32)
        gray = (lum.reshape(8, 16, 2, 16, 2).mean(axis=(2, 4))[..., None]
                * 255).astype(np.uint8)
        q.calibrate([gray[:4], gray[4:]])
        a = fp.predict(gray).astype(np.float32)
        b = q.predict(gray).astype(np.float32)
        t = imgs * 255

        def psnr(x, y):
            return 10 * np.log10(255 ** 2 / max(((x - y) ** 2).mean(), 1e-9))

        # end-metric delta (the claim that matters): int8 costs < 0.3 dB
        assert abs(psnr(b, t) - psnr(a, t)) < 0.3, (psnr(a, t), psnr(b, t))
        # mutual agreement sanity
        assert psnr(a, b) > 25, psnr(a, b)
        # determinism of the compiled int8 program
        np.testing.assert_array_equal(q.predict(gray), q.predict(gray))

    def test_int8_requires_calibration(self):
        from srcgan_tpu.serving import CascadePredictor
        from srcgan_tpu import models
        sr = models.create("ESPCN", 1, 1, 2)
        c = models.create("ResDeconv", 1, 3)
        q = CascadePredictor(sr, sr.init(jax.random.PRNGKey(0)),
                             c, c.init(jax.random.PRNGKey(1)), up=2, int8=True)
        with pytest.raises(RuntimeError, match="calibrate"):
            q.predict(np.zeros((1, 16, 16, 1), np.uint8))

    def test_quant_dispatch_exactness_bound(self):
        """Single quantized conv: error bounded by int8 resolution."""
        from srcgan_tpu import quant
        from srcgan_tpu.ops import conv as C
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 32, 32)).astype(np.float32) * .1)
        ref = C.conv2d(x, w, None, 1, 1)
        scales = quant.calibrate_fn(lambda v: C.conv2d(v, w, None, 1, 1), [x])
        with quant.quant_mode("int8", scales):
            with jax.disable_jit():
                got = C.conv2d(x, w, None, 1, 1)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel  # ~1/127 per-operand resolution, averaged


class TestPredictStream:
    def test_stream_matches_predict(self):
        from srcgan_tpu import models
        from srcgan_tpu.serving import CascadePredictor
        sr = models.create("ESPCN", 1, 1, 2)
        c = models.create("ResDeconv", 1, 3)
        pred = CascadePredictor(sr, sr.init(jax.random.PRNGKey(0)),
                                c, c.init(jax.random.PRNGKey(1)), up=2,
                                pad_batch_to=4)
        rng = np.random.default_rng(0)
        batches = [rng.integers(0, 256, (n, 16, 16, 1), dtype=np.uint8)
                   for n in (4, 3, 4, 1)]  # ragged sizes exercise padding
        streamed = list(pred.predict_stream(iter(batches), lookahead=2))
        direct = [pred.predict(b) for b in batches]
        assert len(streamed) == len(direct)
        for s, d in zip(streamed, direct):
            np.testing.assert_array_equal(s, d)


class TestModelStateRebind:
    def test_run_sees_rebound_model_state(self):
        """A checkpoint hot-reload installs by rebinding sr_state/c_state
        (serving.reload_checkpoints install()); with ``self`` a static jit
        argument, anything read off it inside _run is a trace-time constant
        — so the BatchNorm running stats must ride as jit ARGUMENTS or the
        cached executable silently keeps serving the OLD stats for every
        already-compiled shape (regression)."""
        sr = models.create("ESPCN", 1, 1, 2)
        c = models.ResDeconv(1, 3, layers=(1, 1, 1, 1), BN="BN")
        pred = serving.CascadePredictor(
            sr, sr.init(jax.random.PRNGKey(0)),
            c, c.init(jax.random.PRNGKey(1)), up=2,
            c_state=c.init_state())
        x = np.random.default_rng(0).integers(
            0, 256, (1, 16, 16, 1), dtype=np.uint8)
        before = pred.predict(x)
        # what installing a trained-BN checkpoint does: same arch, same
        # compiled shape, different running stats
        pred.c_state = jax.tree_util.tree_map_with_path(
            lambda p, a: a + 0.5 if p[-1].key == "mean" else a, pred.c_state)
        after = pred.predict(x)
        assert not np.array_equal(before, after), (
            "rebound model state was ignored by the cached executable")


class TestTiledPredictor:
    """Whole-scene tiled inference (serving.TiledPredictor)."""

    @staticmethod
    def _local_cascade():
        """ESPCN x2 SR + SRCNN colorizer: both purely local, small receptive
        field, so overlap >= RF radius makes tiling bit-exact."""
        from srcgan_tpu import models
        sr = models.create("ESPCN", 1, 1, 2)
        c = models.create("SRCNN", 1, 3, 1)
        return (sr, sr.init(jax.random.PRNGKey(0)),
                c, c.init(jax.random.PRNGKey(1)))

    def test_scene_bit_exact_vs_full_forward(self):
        """Odd-size scene, overlap >= RF: stitched == one full-image program,
        bit-for-bit (zero scene-border padding == conv SAME semantics)."""
        sr, pA, c, pB = self._local_cascade()
        full = serving.CascadePredictor(sr, pA, c, pB, up=2)
        # ESPCN LR RF radius 5 + (conv5 + SRCNN) HR radius 7 -> LR RF 9;
        # overlap 10 > 9 makes tiling bit-exact.
        tiled = serving.TiledPredictor(sr, pA, c, pB, up=2,
                                       tile=28, overlap=10, max_batch=4)
        scene = np.random.default_rng(0).integers(
            0, 256, (37, 45), dtype=np.uint8)
        want = full.predict(scene[None, ..., None])[0]
        got = tiled.predict_scene(scene)
        assert got.shape == (74, 90, 3)
        np.testing.assert_array_equal(got, want)

    def test_rgb_scene_and_channel_input(self):
        sr, pA, c, pB = self._local_cascade()
        tiled = serving.TiledPredictor(sr, pA, c, pB, up=2,
                                       tile=24, overlap=8, max_batch=4)
        scene = np.random.default_rng(1).integers(
            0, 256, (30, 26, 3), dtype=np.uint8)
        out = tiled.predict_scene(scene)
        assert out.shape == (60, 52, 3) and out.dtype == np.uint8

    def test_resolution_preserving_scale_inferred(self):
        """Const-style cascade (scale 1): stitcher infers scale from the
        output tile rather than trusting `up`."""
        from srcgan_tpu import models
        sr = models.create("SRCNN", 1, 1, 2)   # resolution-preserving
        c = models.create("SRCNN", 1, 3, 1)
        tiled = serving.TiledPredictor(
            sr, sr.init(jax.random.PRNGKey(2)),
            c, c.init(jax.random.PRNGKey(3)), up=2,
            tile=24, overlap=8, max_batch=4)
        scene = np.random.default_rng(2).integers(
            0, 256, (30, 53), dtype=np.uint8)
        out = tiled.predict_scene(scene)
        assert out.shape == (30, 53, 3)

    def test_subtile_scene_falls_back_to_full_program(self):
        sr, pA, c, pB = self._local_cascade()
        tiled = serving.TiledPredictor(sr, pA, c, pB, up=2,
                                       tile=28, overlap=10, max_batch=4)
        scene = np.random.default_rng(3).integers(
            0, 256, (20, 40), dtype=np.uint8)  # H < tile
        out = tiled.predict_scene(scene)
        assert out.shape == (40, 80, 3)

    def test_tile_overlap_validation(self):
        sr, pA, c, pB = self._local_cascade()
        with pytest.raises(ValueError):
            serving.TiledPredictor(sr, pA, c, pB, up=2, tile=16, overlap=8)

    def test_subtile_fallback_does_not_pad_to_max_batch(self):
        """The sub-tile fallback dispatches a batch of 1, not max_batch
        copies of the whole scene (regression: self.pad was applied)."""
        sr, pA, c, pB = self._local_cascade()
        tiled = serving.TiledPredictor(sr, pA, c, pB, up=2,
                                       tile=28, overlap=10, max_batch=8)
        seen = []
        orig = tiled._run

        def spy(sp, cp, ss, cs, g):
            seen.append(g.shape[0])
            return orig(sp, cp, ss, cs, g)

        tiled._run = spy
        out = tiled.predict_scene(np.zeros((20, 24), np.uint8))
        assert out.shape == (40, 48, 3)
        assert seen == [1], seen
