"""Golden-parity tests: srcgan_tpu.ops vs torch/torch.nn.functional.

The reference framework is pure PyTorch; bit-close parity of these primitives is
what PSNR/SSIM parity rests on (SURVEY.md §7 "hard parts").  torch (CPU build) is
available in the image, so we test directly against it.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from srcgan_tpu import ops


def nhwc(t):  # torch NCHW tensor -> np NHWC
    return t.detach().numpy().transpose(0, 2, 3, 1)


def nchw(a):  # np NHWC -> torch NCHW
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.standard_normal(shape, dtype=np.float32)


class TestConv2d:
    @pytest.mark.parametrize("k,s,p,cin,cout", [
        (3, 1, 1, 4, 8), (5, 1, 2, 3, 6), (1, 1, 0, 8, 4),
        (4, 2, 1, 3, 8), (9, 1, 4, 1, 4), (7, 2, 3, 3, 8),
    ])
    def test_vs_torch(self, k, s, p, cin, cout):
        x = rand(2, 16, 16, cin)
        w = rand(k, k, cin, cout) * 0.1
        b = rand(cout)
        y = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), s, p)
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # HWIO -> OIHW
        yt = F.conv2d(nchw(x), wt, torch.from_numpy(b), stride=s, padding=p)
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=2e-5, rtol=1e-5)

    def test_grouped(self):
        x = rand(1, 8, 8, 6)
        w = rand(3, 3, 3, 4) * 0.1  # groups=2: each group 3 in, 2 out
        y = ops.conv2d(jnp.asarray(x), jnp.asarray(w), None, 1, 1, groups=2)
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
        yt = F.conv2d(nchw(x), wt, stride=1, padding=1, groups=2)
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=2e-5, rtol=1e-5)


class TestConvTranspose2d:
    # The reference's deconv triples: x2->(2,2,0), x4->(2,4,2), x8->(4,8,4)
    # (/root/reference/src/model/rddb.py:9-25) plus SRDenseNet's (3,2,p=1,op=1).
    @pytest.mark.parametrize("k,s,p,op", [
        (2, 2, 0, 0), (2, 4, 0, 2), (4, 8, 0, 4), (3, 2, 1, 1),
    ])
    def test_vs_torch(self, k, s, p, op):
        cin, cout = 5, 7
        x = rand(2, 9, 9, cin)
        w = rand(k, k, cin, cout) * 0.1
        y = ops.conv_transpose2d(jnp.asarray(x), jnp.asarray(w), None, s, p, op)
        wt = torch.from_numpy(w.transpose(2, 3, 0, 1))  # HWIO -> (in, out, kh, kw)
        yt = F.conv_transpose2d(nchw(x), wt, stride=s, padding=p, output_padding=op)
        assert y.shape == nhwc(yt).shape
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=2e-5, rtol=1e-5)

    def test_output_sizes(self):
        # H_out = (H-1)*s - 2p + k + op: x2 doubles, x4 quadruples, x8 x8.
        for up, (k, s, op) in {2: (2, 2, 0), 4: (2, 4, 2), 8: (4, 8, 4)}.items():
            x = jnp.zeros((1, 6, 6, 3))
            w = jnp.zeros((k, k, 3, 3))
            y = ops.conv_transpose2d(x, w, None, s, 0, op)
            assert y.shape == (1, 6 * up, 6 * up, 3)


class TestPixelShuffle:
    def test_vs_torch(self):
        x = rand(2, 4, 4, 18)  # r=3 -> 2 out channels
        y = ops.pixel_shuffle(jnp.asarray(x), 3)
        yt = F.pixel_shuffle(nchw(x), 3)
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=1e-6)

    def test_roundtrip(self):
        x = jnp.asarray(rand(1, 8, 8, 4))
        assert jnp.allclose(ops.pixel_unshuffle(ops.pixel_shuffle(x, 2), 2), x)


class TestResize:
    @pytest.mark.parametrize("scale", [0.5, 0.25, 0.125, 2.0, 4.0])
    def test_bilinear_vs_torch(self, scale):
        x = rand(2, 16, 16, 3)
        y = ops.interpolate(jnp.asarray(x), scale_factor=scale, mode="bilinear")
        yt = F.interpolate(nchw(x), scale_factor=scale, mode="bilinear",
                           align_corners=False)
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=2e-6, rtol=1e-5)

    @pytest.mark.parametrize("scale", [0.5, 0.25, 2.0, 3.0])
    def test_nearest_vs_torch(self, scale):
        x = rand(1, 12, 12, 2)
        y = ops.interpolate(jnp.asarray(x), scale_factor=scale, mode="nearest")
        yt = F.interpolate(nchw(x), scale_factor=scale, mode="nearest")
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=1e-6)

    def test_nonsquare_size(self):
        x = rand(1, 10, 14, 3)
        y = ops.resize_bilinear(jnp.asarray(x), (7, 21))
        yt = F.interpolate(nchw(x), size=(7, 21), mode="bilinear",
                           align_corners=False)
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=2e-6, rtol=1e-5)


class TestNorms:
    def test_group_norm_vs_torch(self):
        x = rand(2, 8, 8, 64)
        scale, bias = rand(64), rand(64)
        y = ops.group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32)
        m = torch.nn.GroupNorm(32, 64)
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(scale))
            m.bias.copy_(torch.from_numpy(bias))
        np.testing.assert_allclose(np.asarray(y), nhwc(m(nchw(x))), atol=1e-5, rtol=1e-4)

    def test_instance_norm_vs_torch(self):
        x = rand(2, 8, 8, 5)
        y = ops.instance_norm(jnp.asarray(x))
        yt = F.instance_norm(nchw(x))
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=1e-5, rtol=1e-4)

    def test_batch_norm_train_vs_torch(self):
        x = rand(4, 6, 6, 3)
        m = torch.nn.BatchNorm2d(3)
        yt = m(nchw(x))
        y, nm, nv = ops.batch_norm(
            jnp.asarray(x), jnp.ones(3), jnp.zeros(3), jnp.zeros(3), jnp.ones(3),
            train=True)
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(nm), m.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(nv), m.running_var.numpy(), atol=1e-5)


class TestColor:
    def test_gray_luma(self):
        x = np.abs(rand(1, 4, 4, 3))
        y = ops.rgb_to_gray(jnp.asarray(x))
        ref = (x * np.array([0.2125, 0.7154, 0.0721])).sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-6)

    def test_lab_known_values(self):
        # Golden values from skimage.color.rgb2lab (D65, 2-degree observer).
        rgb = jnp.array([[[[1.0, 0.0, 0.0],
                           [0.0, 1.0, 0.0],
                           [0.0, 0.0, 1.0],
                           [1.0, 1.0, 1.0],
                           [0.0, 0.0, 0.0],
                           [0.5, 0.5, 0.5]]]])
        lab = ops.rgb_to_lab(rgb)
        golden = np.array([[53.2406, 80.0942, 67.2015],
                           [87.7351, -86.1813, 83.1775],
                           [32.2957, 79.1875, -107.8602],
                           [100.0, 0.0, 0.0],
                           [0.0, 0.0, 0.0],
                           [53.3890, 0.0, 0.0]])
        np.testing.assert_allclose(np.asarray(lab)[0, 0], golden, atol=0.02)

    def test_lab_roundtrip(self):
        rgb = jnp.asarray(np.abs(rand(1, 8, 8, 3)) % 1.0)
        back = ops.lab_to_rgb(ops.rgb_to_lab(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-3)

    def test_lab_norm_roundtrip(self):
        rgb = jnp.asarray(np.abs(rand(1, 8, 8, 3)) % 1.0)
        back = ops.lab_norm_to_rgb(ops.rgb_to_lab_norm(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-3)
