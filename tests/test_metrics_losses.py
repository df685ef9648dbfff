"""Parity tests for metrics/losses vs independently-written torch golden impls.

The torch references here re-derive the reference formulas (metrics.py /
losses.py / train.py GANLoss) directly in torch for comparison.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from srcgan_tpu import losses, metrics
from srcgan_tpu import losses_vgg

RNG = np.random.default_rng(1)


def rand(*shape, positive=False):
    a = RNG.standard_normal(shape).astype(np.float32)
    return np.abs(a) % 1.0 if positive else a


def nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def torch_ssim(y_pred, y_true, w_size=11):
    """Golden SSIM re-derived from reference metrics.py:71-144."""
    max_val = 255 if torch.max(y_pred) > 128 else 1
    min_val = -1 if torch.min(y_pred) < -0.5 else 0
    L = max_val - min_val
    ch = y_pred.size(1)
    g = torch.tensor([math.exp(-((x - w_size // 2) ** 2) / (2 * 1.5 ** 2))
                      for x in range(w_size)])
    g = (g / g.sum()).unsqueeze(1)
    win = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0).expand(ch, 1, w_size, w_size).contiguous()
    mu1 = F.conv2d(y_pred, win, padding=0, groups=ch)
    mu2 = F.conv2d(y_true, win, padding=0, groups=ch)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(y_pred * y_pred, win, padding=0, groups=ch) - mu1_sq
    s2 = F.conv2d(y_true * y_true, win, padding=0, groups=ch) - mu2_sq
    s12 = F.conv2d(y_pred * y_true, win, padding=0, groups=ch) - mu1_mu2
    C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    v1, v2 = 2.0 * s12 + C2, s1 + s2 + C2
    return (((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)).mean()


class TestMetrics:
    def test_mse_psnr(self):
        a, b = rand(2, 8, 8, 3, positive=True), rand(2, 8, 8, 3, positive=True)
        np.testing.assert_allclose(
            float(metrics.mse(jnp.asarray(a), jnp.asarray(b))),
            float(torch.mean((nchw(a) - nchw(b)) ** 2)), rtol=1e-5)
        np.testing.assert_allclose(
            float(metrics.psnr(jnp.asarray(a), jnp.asarray(b))),
            float(10 * torch.log10(1 / torch.mean((nchw(a) - nchw(b)) ** 2))),
            rtol=1e-5)

    def test_angular_error(self):
        a, b = rand(3, 6, 6, 3, positive=True) + 0.1, rand(3, 6, 6, 3, positive=True) + 0.1
        got = metrics.angular_error(jnp.asarray(a), jnp.asarray(b))
        ta, tb = nchw(a), nchw(b)
        dot = torch.sum(ta * tb, dim=1)
        na = torch.sqrt(torch.sum(ta * ta, dim=1))
        nb = torch.sqrt(torch.sum(tb * tb, dim=1))
        ae = 180 / math.pi * torch.acos(dot / (na * nb + 1e-6))
        ref = ae.mean(1).mean(1)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("scale", [1.0, 255.0])
    def test_ssim(self, scale):
        a = rand(2, 16, 16, 3, positive=True) * scale
        b = rand(2, 16, 16, 3, positive=True) * scale
        got = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = float(torch_ssim(nchw(a), nchw(b)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_ssim_identical_is_one(self):
        a = rand(1, 16, 16, 1, positive=True)
        assert float(metrics.ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


class TestLosses:
    def test_l1_mse_psnr(self):
        a, b = rand(2, 8, 8, 3), rand(2, 8, 8, 3)
        np.testing.assert_allclose(float(losses.l1(jnp.asarray(a), jnp.asarray(b))),
                                   float(F.l1_loss(nchw(a), nchw(b))), rtol=1e-5)

    def test_bce(self):
        o = rand(2, 4, 4, 1, positive=True) * 0.98 + 0.01
        t = (rand(2, 4, 4, 1, positive=True) > 0.5).astype(np.float32)
        got = float(losses.ce(jnp.asarray(o), jnp.asarray(t)))
        ref = float(F.binary_cross_entropy(nchw(o), nchw(t)))
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    def test_multiclass_ce(self):
        o = np.abs(rand(2, 4, 4, 5)) + 0.1
        o = o / o.sum(-1, keepdims=True)
        t = np.eye(5, dtype=np.float32)[RNG.integers(0, 5, (2, 4, 4))]
        got = float(losses.ce(jnp.asarray(o), jnp.asarray(t)))
        to, tt = nchw(o), nchw(t)
        ref = float(F.nll_loss(torch.log(to), torch.argmax(tt, dim=1)))
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    def test_focal_binary(self):
        o = rand(2, 4, 4, 1, positive=True) * 0.9 + 0.05
        t = (rand(2, 4, 4, 1, positive=True) > 0.5).astype(np.float32)
        got = float(losses.focal(jnp.asarray(o), jnp.asarray(t)))
        ot, tt = nchw(o).clamp(1e-6, 1 - 1e-6), nchw(t)
        ref = (-(0.9) * ((1 - ot) ** 2) * (tt * torch.log(ot))
               - 0.1 * (ot ** 2) * ((1 - tt) * torch.log(1 - ot))).mean()
        np.testing.assert_allclose(got, float(ref), rtol=1e-4)

    def test_con_cross(self):
        f = rand(4, 3, 3, 2)
        got = float(losses.con(jnp.asarray(f)))
        tf = nchw(f)
        ref = float(F.mse_loss(torch.abs(tf.max(0).values - tf.min(0).values),
                               torch.zeros_like(tf[0])))
        np.testing.assert_allclose(got, ref, rtol=1e-5)
        a, b = rand(4, 3, 3, 2), rand(4, 3, 3, 2)
        got = float(losses.cross(jnp.asarray(a), jnp.asarray(b)))
        ref = float(F.l1_loss(nchw(a)[:3], nchw(b)[1:]))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    @pytest.mark.parametrize("mode", ["lsgan", "vanilla", "wgangp"])
    @pytest.mark.parametrize("real", [True, False])
    def test_gan_loss(self, mode, real):
        pred = rand(2, 6, 6, 1)
        got = float(losses.gan_loss(jnp.asarray(pred), real, mode))
        tp = nchw(pred)
        label = torch.full_like(tp, 1.0 if real else 0.0)
        if mode == "lsgan":
            ref = F.mse_loss(tp, label)
        elif mode == "vanilla":
            ref = F.binary_cross_entropy_with_logits(tp, label)
        else:
            ref = -tp.mean() if real else tp.mean()
        np.testing.assert_allclose(got, float(ref), rtol=1e-4, atol=1e-6)

    def test_multi_task(self):
        lv = np.array([0.5, 1.5, 0.25], dtype=np.float32)
        sigma = np.array([1.0, 2.0, 0.5], dtype=np.float32)
        got = float(losses.multi_task(jnp.asarray(lv), jnp.asarray(sigma)))
        ref = float((0.5 * torch.tensor(lv) / torch.tensor(sigma) ** 2).sum()
                    + torch.log(torch.tensor(sigma).prod()))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_nearest_select_aligns(self):
        # target is output shifted by (+1, -1): selector should find it.
        base = rand(2, 12, 12, 3, positive=True)
        out = jnp.asarray(base)
        tgt = jnp.asarray(np.roll(np.roll(base, 1, axis=1), -1, axis=2))
        oc, tc = losses.nearest_select(out, tgt, shift=2, stride=1)
        assert oc.shape == (2, 8, 8, 3)
        np.testing.assert_allclose(float(jnp.mean(jnp.abs(oc - tc))), 0.0, atol=1e-6)

    def test_nearest_select_grad_flows(self):
        a = jnp.asarray(rand(1, 10, 10, 1))
        b = jnp.asarray(rand(1, 10, 10, 1))

        def f(x):
            oc, tc = losses.nearest_select(x, b)
            return jnp.mean(jnp.abs(oc - tc))
        g = jax.grad(f)(a)
        assert np.isfinite(np.asarray(g)).all()
        # border pixels (cropped out) get zero grad
        assert float(jnp.abs(g[0, 0]).sum()) == 0.0


class TestVGG:
    def test_vgg16_matches_torch_arch(self):
        """Random-weight VGG16 slices must match a torchvision-layout torch net."""
        import torch.nn as nn
        params = losses_vgg.init_vgg_params(jax.random.PRNGKey(0))
        # build the same net in torch
        layers, cin = [], 3
        for v in losses_vgg.VGG16_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, v, 3, padding=1))
                layers.append(nn.ReLU())
                cin = v
        net = nn.Sequential(*layers)
        with torch.no_grad():
            for idx, p in params.items():
                net[int(idx)].weight.copy_(
                    torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1)))
                net[int(idx)].bias.copy_(torch.from_numpy(np.asarray(p["b"])))
        x = rand(1, 32, 32, 3, positive=True)
        outs = losses_vgg.vgg_features(params, jnp.asarray(x))
        for cut, o in zip((4, 9, 16, 23), outs):
            ref = net[:cut](nchw(x))
            np.testing.assert_allclose(
                np.asarray(o), ref.detach().numpy().transpose(0, 2, 3, 1),
                atol=1e-4, rtol=1e-3)

    def test_vgg16_loss_1ch_replicates(self):
        params = losses_vgg.init_vgg_params(jax.random.PRNGKey(1))
        a = jnp.asarray(rand(1, 16, 16, 1, positive=True))
        b = jnp.asarray(rand(1, 16, 16, 1, positive=True))
        v = float(losses_vgg.vgg16_loss(params, a, b))
        assert np.isfinite(v) and v > 0


class TestPallasSSIM:
    """Fused Pallas SSIM kernel vs the XLA depthwise-conv form (interpret
    mode on the CPU backend; the compiled path is exercised on TPU)."""

    @pytest.mark.parametrize("shape", [(2, 32, 32, 3), (1, 24, 40, 1)])
    def test_matches_xla(self, shape):
        from srcgan_tpu.metrics import ssim_xla
        from srcgan_tpu.ops.pallas.ssim_kernel import ssim_pallas
        a = jnp.asarray(rand(*shape, positive=True))
        b = jnp.asarray(rand(*shape, positive=True))
        ref = float(ssim_xla(a, b))
        got = float(ssim_pallas(a, b, interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-5)

    def test_255_range_and_full(self):
        from srcgan_tpu.metrics import ssim_xla
        from srcgan_tpu.ops.pallas.ssim_kernel import ssim_pallas
        a = jnp.asarray(rand(1, 32, 32, 3, positive=True)) * 255.0
        b = jnp.asarray(rand(1, 32, 32, 3, positive=True)) * 255.0
        r1, c1 = ssim_xla(a, b, full=True)
        r2, c2 = ssim_pallas(a, b, full=True, interpret=True)
        np.testing.assert_allclose(float(r2), float(r1), atol=1e-6)
        np.testing.assert_allclose(float(c2), float(c1), atol=1e-6)

    def test_per_sample(self):
        from srcgan_tpu.metrics import ssim_xla
        from srcgan_tpu.ops.pallas.ssim_kernel import ssim_pallas
        a = jnp.asarray(rand(3, 24, 24, 3, positive=True))
        b = jnp.asarray(rand(3, 24, 24, 3, positive=True))
        ref = ssim_xla(a, b, size_average=False)
        got = ssim_pallas(a, b, size_average=False, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_per_sample_range_interpret(self):
        """Pallas per-sample dynamic range == bs=1 replay (mixed ranges)."""
        from srcgan_tpu.metrics import ssim_xla
        from srcgan_tpu.ops.pallas.ssim_kernel import ssim_pallas
        a0 = rand(1, 24, 24, 3, positive=True)
        a1 = rand(1, 24, 24, 3, positive=True) * 255.0
        b = rand(2, 24, 24, 3, positive=True)
        a = jnp.asarray(np.concatenate([a0, a1]))
        got = ssim_pallas(a, jnp.asarray(b), size_average=False,
                          per_sample_range=True, interpret=True)
        ref = np.array([float(ssim_xla(a[i:i + 1], jnp.asarray(b[i:i + 1])))
                        for i in range(2)])
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


class TestVGGConversion:
    def _fake_vgg16_sd(self):
        """Synthetic torchvision-format VGG16 features state_dict."""
        import torch
        from srcgan_tpu.losses_vgg import VGG16_CFG, _features_plan
        g = torch.Generator().manual_seed(0)
        sd, cin = {}, 3
        for idx, kind, cout in _features_plan(VGG16_CFG):
            if kind == "conv":
                sd[f"features.{idx}.weight"] = torch.randn(
                    (cout, cin, 3, 3), generator=g) * 0.05
                sd[f"features.{idx}.bias"] = torch.randn((cout,), generator=g)
                cin = cout
        return sd

    def test_convert_roundtrip(self, tmp_path):
        """convert_vgg CLI: .pth -> .npz loads identically to the .pth."""
        import torch
        from srcgan_tpu.cli import convert_vgg
        from srcgan_tpu.losses_vgg import load_vgg_params
        sd = self._fake_vgg16_sd()
        pth = str(tmp_path / "vgg16.pth")
        npz = str(tmp_path / "vgg16.npz")
        torch.save(sd, pth)
        convert_vgg.main([pth, npz, "--arch", "vgg16"])
        a = load_vgg_params(pth)
        b = load_vgg_params(npz)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]["w"]),
                                          np.asarray(b[k]["w"]))
            np.testing.assert_array_equal(np.asarray(a[k]["b"]),
                                          np.asarray(b[k]["b"]))

    def test_convert_wrong_arch_fails(self, tmp_path):
        import torch
        from srcgan_tpu.cli import convert_vgg
        sd = self._fake_vgg16_sd()
        pth = str(tmp_path / "vgg16.pth")
        torch.save(sd, pth)
        with pytest.raises((ValueError, KeyError)):
            convert_vgg.convert(pth, str(tmp_path / "x.npz"), "vgg19")

    def test_perceptual_train_step(self):
        """CasTrainer with a perceptual term: loss finite, differs from plain
        L1, and the step updates params (random VGG — weights-path agnostic)."""
        from srcgan_tpu import losses_vgg
        from srcgan_tpu.train import CasTrainer
        vp = losses_vgg.init_vgg_params(jax.random.PRNGKey(0))
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2,
                        perceptual_params=vp, perceptual_weight=0.1)
        tr0 = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st = tr.init(jax.random.PRNGKey(1))
        st0 = jax.tree_util.tree_map(jnp.array, st)
        rng = np.random.default_rng(0)
        tar = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        src = jnp.zeros((1, 32, 32, 1), jnp.float32)
        stp, m = tr.train_step(st, src, tar, 1e-4)
        _, m0 = tr0.train_step(st0, src, tar, 1e-4)
        assert np.isfinite(float(m["loss_SR"]))
        assert float(m["loss_SR"]) > float(m0["loss_SR"])  # +VGG term
        assert float(m["loss_C"]) > float(m0["loss_C"])

    def test_perceptual_rejects_lab(self):
        from srcgan_tpu import losses_vgg
        from srcgan_tpu.train import CasTrainer
        vp = losses_vgg.init_vgg_params(jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            CasTrainer(lab=True, perceptual_params=vp)
