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
