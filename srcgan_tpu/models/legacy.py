"""Legacy CycleGAN-era nets (reference src/model/model.py).

These are the generators the CycleGAN drivers import (train.py:11).  Note the
reference's import inconsistency (SURVEY.md §2.2): ``RDDBNetA`` is imported but
never defined — the closest symbol is the mode-based ``RDDBNet``
(model.py:347-392) with an identical call signature.  This module provides
``RDDBNetA`` as exactly that network, fixing the wiring.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from srcgan_tpu import nn, ops
from srcgan_tpu.models.blocks import rrdb_trunk
from srcgan_tpu.ops.fused import nearest_up2_conv3x3


class RDDBNetA(nn.Module):
    """Mode-based RDDB net (model.py:347-392).

    conv_first -> RRDB trunk -> trunk_conv, then the quirky tail replicated
    faithfully:
      - the global residual is computed but the tail upscales ``fea`` (the
        conv_first features), NOT fea+trunk — model.py:380-388 never adds trunk;
      - x2/x4: nearest-upsample + the SAME ``upconv`` weights at each scale;
      - two applications of the SAME ``HRconv`` weights (:390-391).
    """

    def __init__(self, in_nc: int, out_nc: int, nf: int = 64, nb: int = 3,
                 gc: int = 32, mode: str = "x2"):
        self.mode = mode
        self.mods = nn.named({
            "conv_first": nn.Conv2d(in_nc, nf, 3, 1, 1, bias=True),
            "trunk": rrdb_trunk(nf, nb, gc),
            "trunk_conv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "upconv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "HRconv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "conv_last": nn.Conv2d(nf, out_nc, 3, 1, 1, bias=True),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        fea = m["conv_first"].fwd(p["conv_first"], x)
        # trunk output is computed in the reference but unused by the tail
        # (model.py:381 assigns `trunk` and never adds it) — XLA DCEs it here.
        # nearest-up + conv fused into one phase conv (ops.fused) — exact
        upconv = lambda v: nearest_up2_conv3x3(v, p["upconv"]["w"],
                                               p["upconv"].get("b"))
        if self.mode == "x4":
            fea = lrelu(upconv(fea))
            fea = lrelu(upconv(fea))
        elif self.mode == "x2":
            fea = lrelu(upconv(fea))
        elif self.mode == "x1":
            fea = lrelu(m["upconv"].fwd(p["upconv"], fea))
        fea = lrelu(m["HRconv"].fwd(p["HRconv"], fea))
        out = m["conv_last"].fwd(p["conv_last"],
                                 lrelu(m["HRconv"].fwd(p["HRconv"], fea)))
        return out


class RDDBNetB(nn.Module):
    """model.py:396-440: like RDDBNetA but WITH the global residual, separate
    upconv1/upconv2, and the tail applying the same HRconv 8 times (:431-439).
    x2 mode applies upconv1 twice — once after upsample, once at-size (:429-430).
    """

    def __init__(self, in_nc: int, out_nc: int, nf: int = 64, nb: int = 3,
                 gc: int = 32, mode: str = "x2"):
        self.mode = mode
        self.mods = nn.named({
            "conv_first": nn.Conv2d(in_nc, nf, 3, 1, 1, bias=True),
            "trunk": rrdb_trunk(nf, nb, gc),
            "trunk_conv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "upconv1": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "upconv2": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "HRconv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "conv_last": nn.Conv2d(nf, out_nc, 3, 1, 1, bias=True),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        fea = m["conv_first"].fwd(p["conv_first"], x)
        trunk = m["trunk_conv"].fwd(p["trunk_conv"],
                                    m["trunk"].fwd(p["trunk"], fea, train))
        fea = fea + trunk
        upc = lambda name, v: nearest_up2_conv3x3(v, p[name]["w"],
                                                  p[name].get("b"))
        if self.mode == "x4":
            fea = lrelu(upc("upconv1", fea))
            fea = lrelu(upc("upconv2", fea))
        elif self.mode == "x2":
            fea = lrelu(upc("upconv1", fea))
            fea = lrelu(m["upconv1"].fwd(p["upconv1"], fea))
        for _ in range(7):
            fea = lrelu(m["HRconv"].fwd(p["HRconv"], fea))
        return m["conv_last"].fwd(p["conv_last"],
                                  lrelu(m["HRconv"].fwd(p["HRconv"], fea)))


class _DenseBlock(nn.Module):
    """SRDenseNet dense block (model.py:663-672): ConvLayer then num_layers-1
    DenseLayers, output concat([x, block(x)])."""

    def __init__(self, in_channels: int, growth_rate: int, num_layers: int):
        ki = _SRDenseNetBase._kaiming_fan_in
        mods = {"conv0": nn.Conv2d(in_channels, growth_rate, 3, 1, 1,
                                   weight_init=ki, bias_init="zeros")}
        for i in range(num_layers - 1):
            mods[f"dense{i}"] = nn.Conv2d(growth_rate * (i + 1), growth_rate, 3, 1, 1,
                                          weight_init=ki, bias_init="zeros")
        self.num_layers = num_layers
        self.mods = nn.named(mods)

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        h = jax.nn.relu(m["conv0"].fwd(p["conv0"], x))
        for i in range(self.num_layers - 1):
            h = jnp.concatenate(
                [h, jax.nn.relu(m[f"dense{i}"].fwd(p[f"dense{i}"], h))], -1)
        return jnp.concatenate([x, h], -1)


class _SRDenseNetBase(nn.Module):
    """Common SRDenseNetA/B body (model.py:675-786); subclasses pick the
    up/down 'deconv' stage.  Init: kaiming_normal fan_in/relu + zero bias
    (model.py:710-715)."""

    def __init__(self, in_nc: int, out_nc: int, nb_channel: int = 1,
                 growth_rate: int = 16, num_blocks: int = 8, num_layers: int = 8,
                 mode: str = "x2"):
        self.mode = mode
        self.num_blocks = num_blocks
        gl = growth_rate * num_layers
        ki = lambda cin, cout, k, s=1, pad=None, bias=True: nn.Conv2d(
            cin, cout, k, s, k // 2 if pad is None else pad, bias=bias,
            weight_init=self._kaiming_fan_in, bias_init="zeros")
        mods = {
            "conv_first": ki(in_nc, 1, 3),
            "conv_low": ki(nb_channel, gl, 3),
        }
        for i in range(num_blocks):
            mods[f"block{i}"] = _DenseBlock(gl * (i + 1), growth_rate, num_layers)
        mods["bottleneck"] = ki(gl + gl * num_blocks, 256, 1, 1, 0)
        self._add_resample(mods)
        mods["reconstruction"] = ki(256, nb_channel, 3)
        mods["conv_last"] = ki(1, out_nc, 3)
        self.mods = nn.named(mods)

    @staticmethod
    def _kaiming_fan_in(key, shape):
        from srcgan_tpu.ops import initializers
        return initializers.kaiming_normal(key, shape, mode="fan_in",
                                           nonlinearity="relu")

    def _resample(self, p, x):
        raise NotImplementedError

    def _add_resample(self, mods):
        raise NotImplementedError

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        relu = jax.nn.relu
        x = m["conv_first"].fwd(p["conv_first"], x)
        x = relu(m["conv_low"].fwd(p["conv_low"], x))
        for i in range(self.num_blocks):
            x = m[f"block{i}"].fwd(p[f"block{i}"], x, train)
        x = relu(m["bottleneck"].fwd(p["bottleneck"], x))
        if self.mode == "x2":
            x = self._resample(p, x)
        elif self.mode == "x4":
            x = self._resample(p, x)
            x = self._resample(p, x)
        x = m["reconstruction"].fwd(p["reconstruction"], x)
        return m["conv_last"].fwd(p["conv_last"], x)


class SRDenseNetA(_SRDenseNetBase):
    """Upsampling variant: ConvTranspose2d(256,256,k3,s2,p1,op1) + ReLU
    (model.py:698-701); the same deconv weights are reused for x4."""

    def _add_resample(self, mods):
        mods["deconv"] = nn.ConvTranspose2d(256, 256, 3, 2, 1, 1,
                                            weight_init=self._kaiming_fan_in,
                                            bias_init="zeros")

    def _resample(self, p, x):
        return jax.nn.relu(self.mods.layers["deconv"].fwd(p["deconv"], x))


class SRDenseNetB(_SRDenseNetBase):
    """Downsampling variant: stride-2 conv (model.py:755-758)."""

    def _add_resample(self, mods):
        mods["deconv"] = nn.Conv2d(256, 256, 3, 2, 1,
                                   weight_init=self._kaiming_fan_in,
                                   bias_init="zeros")

    def _resample(self, p, x):
        return jax.nn.relu(self.mods.layers["deconv"].fwd(p["deconv"], x))


class RDDBNetD(nn.Module):
    """Downscaling counterpart to RDDBNetA — a reconstruction, not a port.

    The reference's CycleGAN drivers import an ``RDDBNetA`` for the B->A
    (downscale) generator that is defined nowhere (train.py:11; SURVEY.md §2.2),
    and the only mode-based RDDB net (model.py:347) *upscales*, which would
    break the cycle-consistency shapes.  The one shape-consistent pairing the
    reference ships is SRDenseNetA (deconv up) / SRDenseNetB (stride-2 down)
    (model.py:698-701 vs :755-758).  RDDBNetD mirrors RDDBNetA's structure with
    that same up->down substitution: stride-2 convs (shared weights per scale,
    like RDDBNetA's reused ``upconv``) in place of nearest-upsample+conv.
    """

    def __init__(self, in_nc: int, out_nc: int, nf: int = 64, nb: int = 3,
                 gc: int = 32, mode: str = "x2"):
        self.mode = mode
        self.mods = nn.named({
            "conv_first": nn.Conv2d(in_nc, nf, 3, 1, 1, bias=True),
            "trunk": rrdb_trunk(nf, nb, gc),
            "trunk_conv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "downconv": nn.Conv2d(nf, nf, 3, 2, 1, bias=True),
            "HRconv": nn.Conv2d(nf, nf, 3, 1, 1, bias=True),
            "conv_last": nn.Conv2d(nf, out_nc, 3, 1, 1, bias=True),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        fea = m["conv_first"].fwd(p["conv_first"], x)
        trunk = m["trunk_conv"].fwd(p["trunk_conv"],
                                    m["trunk"].fwd(p["trunk"], fea, train))
        fea = fea + trunk
        n_down = {"x1": 0, "x2": 1, "x4": 2}[self.mode]
        for _ in range(n_down):
            fea = lrelu(m["downconv"].fwd(p["downconv"], fea))
        fea = lrelu(m["HRconv"].fwd(p["HRconv"], fea))
        return m["conv_last"].fwd(p["conv_last"],
                                  lrelu(m["HRconv"].fwd(p["HRconv"], fea)))


class Decoder(nn.Module):
    """Legacy conv downsampling tower (model.py:236-289): 6x [conv-BN-
    LeakyReLU(0.1)], two stride-2 stages, 64->128->256->128->64 channels.
    Unreachable from any driver in the reference; kept for completeness."""

    def __init__(self):
        chans = [(64, 64, 1), (64, 128, 1), (128, 128, 2), (128, 256, 2),
                 (256, 128, 1), (128, 64, 1)]
        mods = {}
        for i, (cin, cout, s) in enumerate(chans, start=1):
            mods[f"conv{i}"] = nn.Conv2d(cin, cout, 3, s, 1, bias=False,
                                         weight_init="torch")
            mods[f"bn{i}"] = nn.BatchNorm2d(cout)
        self.mods = nn.named(mods)

    def init(self, key):
        return self.mods.init(key)

    def init_state(self):
        return self.mods.init_state()

    def apply(self, p, x, state=None, train=False):
        m = self.mods.layers
        state = dict(state) if state else {}
        for i in range(1, 7):
            x = m[f"conv{i}"].fwd(p[f"conv{i}"], x)
            x, ns = m[f"bn{i}"].apply(p[f"bn{i}"], x,
                                      state=state.get(f"bn{i}"), train=train)
            state[f"bn{i}"] = ns
            x = jax.nn.leaky_relu(x, 0.1)
        return x, state


class Encoder(nn.Module):
    """Legacy deconv upsampling tower (model.py:291-343): 6x [deconv-BN-ReLU],
    two stride-2 k3p1op1 stages.  Unreachable in the reference; kept for
    completeness."""

    def __init__(self):
        chans = [(64, 64, 1, 0), (64, 128, 1, 0), (128, 128, 2, 1),
                 (128, 256, 2, 1), (256, 128, 1, 0), (128, 64, 1, 0)]
        mods = {}
        for i, (cin, cout, s, op) in enumerate(chans, start=1):
            mods[f"decon{i}"] = nn.ConvTranspose2d(cin, cout, 3, s, 1, op,
                                                   bias=False,
                                                   weight_init="torch")
            mods[f"bn{i}"] = nn.BatchNorm2d(cout)
        self.mods = nn.named(mods)

    def init(self, key):
        return self.mods.init(key)

    def init_state(self):
        return self.mods.init_state()

    def apply(self, p, x, state=None, train=False):
        m = self.mods.layers
        state = dict(state) if state else {}
        for i in range(1, 7):
            x = m[f"decon{i}"].fwd(p[f"decon{i}"], x)
            x, ns = m[f"bn{i}"].apply(p[f"bn{i}"], x,
                                      state=state.get(f"bn{i}"), train=train)
            state[f"bn{i}"] = ns
            x = jax.nn.relu(x)
        return x, state
