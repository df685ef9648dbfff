"""EDSR-family extended zoo: VDSR, MDSR, RDN, RCAN, DDBPN + common helpers.

TPU-native re-creations of the non-exported EDSR-PyTorch-derived models
(/root/reference/src/model/{common,vdsr,mdsr,rdn,rcan,ddbpn}.py).  These take
an ``args`` namespace in the reference; here they are keyword-constructed with
the same parameter names.  All use torch-default init (the reference never
re-initializes them).
"""
from __future__ import annotations

import math
from types import SimpleNamespace
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from srcgan_tpu import nn


def args_namespace(**kw) -> SimpleNamespace:
    """Reference-style args object with EDSR-PyTorch defaults."""
    defaults = dict(n_resblocks=16, n_feats=64, scale=[2], rgb_range=255,
                    n_colors=3, res_scale=1.0, n_resgroups=10, reduction=16,
                    G0=64, RDNkSize=3, RDNconfig="B")
    defaults.update(kw)
    return SimpleNamespace(**defaults)


def _conv(in_ch, out_ch, k, bias=True, weight_init="torch"):
    """common.default_conv (common.py:6-9): same-padding conv, torch init."""
    return nn.Conv2d(in_ch, out_ch, k, 1, k // 2, bias=bias,
                     weight_init=weight_init)


class MeanShift(nn.Module):
    """Frozen 1x1 channel-wise shift (common.py:11-21): y = x/std + sign*range*mean/std.

    Parameters are frozen constants in the reference (requires_grad=False), so
    here they are hyperparameters — not part of the param pytree at all.
    (_torch_leaf marks it as consuming two state_dict tensors on import;
    export_name lets the exporter synthesize them under the right key so
    torch-side strict=True loads work.)
    """

    _torch_leaf = True

    def __init__(self, rgb_range, rgb_mean=(0.4488, 0.4371, 0.4040),
                 rgb_std=(1.0, 1.0, 1.0), sign=-1, export_name=None):
        self.scale = jnp.asarray(1.0 / np.array(rgb_std, np.float32))
        self.shift = jnp.asarray(
            sign * rgb_range * np.array(rgb_mean, np.float32)
            / np.array(rgb_std, np.float32))
        self.export_name = export_name

    def forward(self, params, x, train):
        return x * self.scale + self.shift


class PReLU(nn.Module):
    """torch.nn.PReLU: per-channel learnable negative slope, init 0.25."""

    def __init__(self, num_parameters: int = 1):
        self.n = num_parameters

    def init(self, key):
        return {"alpha": jnp.full((self.n,), 0.25)}

    def forward(self, params, x, train):
        a = params["alpha"]
        return jnp.where(x >= 0, x, a * x)


class ResBlock(nn.Module):
    """common.ResBlock (common.py:36-57): conv-act-conv (+BN opt), scaled residual."""

    def __init__(self, n_feats: int, kernel_size: int, bias=True, bn=False,
                 act: str = "relu", res_scale: float = 1.0,
                 weight_init: str = "torch"):
        assert not bn, "bn variant unused by the reference models"
        self.res_scale = res_scale
        self.act = act
        # registered as torch does (body = Sequential(conv, act, conv),
        # common.py:40-50) so exported param paths == reference names
        self.mods = nn.named({
            "body": nn.Sequential(
                _conv(n_feats, n_feats, kernel_size, bias, weight_init),
                nn.ReLU(),
                _conv(n_feats, n_feats, kernel_size, bias, weight_init)),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        res = self.mods.layers["body"].fwd(p["body"], x, train)
        return res * self.res_scale + x


class Upsampler(nn.Sequential):
    """common.Upsampler (common.py:59-86): [conv 4x + PixelShuffle(2)] x log2(r),
    or conv 9x + PixelShuffle(3)."""

    def __init__(self, scale: int, n_feats: int, act=False, bias=True,
                 weight_init: str = "torch"):
        layers = []
        if (scale & (scale - 1)) == 0:
            for _ in range(int(math.log2(scale))):
                layers += [_conv(n_feats, 4 * n_feats, 3, bias, weight_init),
                           nn.PixelShuffle(2)]
                if act == "relu":
                    layers.append(nn.ReLU())
        elif scale == 3:
            layers += [_conv(n_feats, 9 * n_feats, 3, bias, weight_init),
                       nn.PixelShuffle(3)]
            if act == "relu":
                layers.append(nn.ReLU())
        else:
            raise NotImplementedError(scale)
        super().__init__(*layers)


class VDSR(nn.Module):
    """vdsr.py:13-45: MeanShift-wrapped 20-conv residual-in-image-space net."""

    def __init__(self, args: Optional[SimpleNamespace] = None, **kw):
        a = args or args_namespace(n_resblocks=20, n_feats=64, **kw)
        body = [nn.Sequential(_conv(a.n_colors, a.n_feats, 3), nn.ReLU())]
        for _ in range(a.n_resblocks - 2):
            body.append(nn.Sequential(_conv(a.n_feats, a.n_feats, 3), nn.ReLU()))
        # the final conv is ALSO a BasicBlock(act=None) in the reference
        # (vdsr.py:35) -> state_dict key body.<last>.0.*
        body.append(nn.Sequential(_conv(a.n_feats, a.n_colors, 3)))
        self.mods = nn.named({
            "sub_mean": MeanShift(a.rgb_range, export_name="sub_mean"),
            "add_mean": MeanShift(a.rgb_range, sign=1, export_name="add_mean"),
            "body": nn.Sequential(*body),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        x = m["sub_mean"].fwd({}, x)
        res = m["body"].fwd(p["body"], x, train) + x
        return m["add_mean"].fwd({}, res)


class MDSR(nn.Module):
    """mdsr.py:13-67: multi-scale EDSR with per-scale pre_process/upsample
    ModuleLists and set_scale selection (static here: scale_idx at call time)."""

    def __init__(self, args: Optional[SimpleNamespace] = None, **kw):
        a = args or args_namespace(**kw)
        self.scales = list(a.scale)
        self.scale_idx = 0
        body = [ResBlock(a.n_feats, 3) for _ in range(a.n_resblocks)]
        body.append(_conv(a.n_feats, a.n_feats, 3))
        # dict order mirrors the reference's module-registration order
        # (mdsr.py: pre_process :27, upsample :41, then head/body/tail :47-49)
        # so ordered weight transfer from torch lines up.
        self.mods = nn.named({
            "sub_mean": MeanShift(a.rgb_range, export_name="sub_mean"),
            "add_mean": MeanShift(a.rgb_range, sign=1, export_name="add_mean"),
            "pre_process": nn.named({
                str(i): nn.Sequential(ResBlock(a.n_feats, 5),
                                      ResBlock(a.n_feats, 5))
                for i in range(len(self.scales))}),
            "upsample": nn.named({
                str(i): Upsampler(s, a.n_feats)
                for i, s in enumerate(self.scales)}),
            "head": nn.Sequential(_conv(a.n_colors, a.n_feats, 3)),
            "body": nn.Sequential(*body),
            "tail": nn.Sequential(_conv(a.n_feats, a.n_colors, 3)),
        })

    def init(self, key):
        return self.mods.init(key)

    def set_scale(self, scale_idx: int):
        self.scale_idx = scale_idx

    def forward(self, p, x, train):
        m = self.mods.layers
        i = str(self.scale_idx)
        x = m["sub_mean"].fwd({}, x)
        x = m["head"].fwd(p["head"], x, train)
        x = m["pre_process"].layers[i].fwd(p["pre_process"][i], x, train)
        res = m["body"].fwd(p["body"], x, train) + x
        x = m["upsample"].layers[i].fwd(p["upsample"][i], res, train)
        x = m["tail"].fwd(p["tail"], x, train)
        return m["add_mean"].fwd({}, x)


class _RDB(nn.Module):
    """rdn.py:27-43: C dense convs + 1x1 local feature fusion + residual.

    Registered as torch does — convs = Sequential(RDB_Conv...), each
    RDB_Conv holding conv = Sequential(conv, relu) (rdn.py:13-25) — so
    exported param paths (convs.<j>.conv.0.*) == reference names."""

    def __init__(self, g0: int, g: int, c: int, k: int = 3):
        self.c = c
        self.mods = nn.named({
            "convs": nn.named({
                str(i): nn.named({"conv": nn.Sequential(
                    _conv(g0 + i * g, g, k), nn.ReLU())})
                for i in range(c)}),
            "LFF": nn.Conv2d(g0 + c * g, g0, 1, 1, 0, weight_init="torch"),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        h = x
        for i in range(self.c):
            blk = m["convs"].layers[str(i)].layers["conv"]
            y = blk.fwd(p["convs"][str(i)]["conv"], h, train)
            h = jnp.concatenate([h, y], -1)
        return m["LFF"].fwd(p["LFF"], h) + x


class RDN(nn.Module):
    """rdn.py:45-105: shallow features + D RDBs + global fusion + PixelShuffle."""

    def __init__(self, args: Optional[SimpleNamespace] = None, **kw):
        a = args or args_namespace(**kw)
        r = a.scale[0]
        g0, k = a.G0, a.RDNkSize
        self.d, c, g = {"A": (20, 6, 32), "B": (16, 8, 64)}[a.RDNconfig]
        self.r = r
        mods = {
            "SFENet1": _conv(a.n_colors, g0, k),
            "SFENet2": _conv(g0, g0, k),
            "RDBs": nn.named({str(i): _RDB(g0, g, c, k)
                              for i in range(self.d)}),
        }
        mods["GFF"] = nn.Sequential(
            nn.Conv2d(self.d * g0, g0, 1, 1, 0, weight_init="torch"),
            _conv(g0, g0, k))
        if r in (2, 3):
            mods["UPNet"] = nn.Sequential(
                _conv(g0, g * r * r, k), nn.PixelShuffle(r),
                _conv(g, a.n_colors, k))
        elif r == 4:
            mods["UPNet"] = nn.Sequential(
                _conv(g0, g * 4, k), nn.PixelShuffle(2),
                _conv(g, g * 4, k), nn.PixelShuffle(2),
                _conv(g, a.n_colors, k))
        else:
            raise ValueError("scale must be 2 or 3 or 4.")
        self.mods = nn.named(mods)

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        f1 = m["SFENet1"].fwd(p["SFENet1"], x)
        x = m["SFENet2"].fwd(p["SFENet2"], f1)
        outs = []
        for i in range(self.d):
            x = m["RDBs"].layers[str(i)].fwd(p["RDBs"][str(i)], x, train)
            outs.append(x)
        x = m["GFF"].fwd(p["GFF"], jnp.concatenate(outs, -1), train) + f1
        return m["UPNet"].fwd(p["UPNet"], x, train)


class CALayer(nn.Module):
    """rcan.py:11-27: squeeze-excite channel attention."""

    def __init__(self, channel: int, reduction: int = 16):
        # torch: conv_du = Sequential(conv, relu, conv, sigmoid)
        # (rcan.py:17-23) -> param keys conv_du.0 / conv_du.2
        self.mods = nn.named({
            "conv_du": nn.named({
                "0": nn.Conv2d(channel, channel // reduction, 1, 1, 0,
                               weight_init="torch"),
                "2": nn.Conv2d(channel // reduction, channel, 1, 1, 0,
                               weight_init="torch"),
            }),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        du = self.mods.layers["conv_du"].layers
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = jax.nn.relu(du["0"].fwd(p["conv_du"]["0"], y))
        y = jax.nn.sigmoid(du["2"].fwd(p["conv_du"]["2"], y))
        return x * y


class RCAB(nn.Module):
    """rcan.py:30-49: conv-relu-conv + channel attention + residual."""

    def __init__(self, n_feat: int, kernel_size: int, reduction: int):
        # torch: body = Sequential(conv, relu, conv, CALayer) (rcan.py:33-42)
        self.mods = nn.named({
            "body": nn.Sequential(_conv(n_feat, n_feat, kernel_size),
                                  nn.ReLU(),
                                  _conv(n_feat, n_feat, kernel_size),
                                  CALayer(n_feat, reduction)),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        return self.mods.layers["body"].fwd(p["body"], x, train) + x


class RCAN(nn.Module):
    """rcan.py:69-116: residual groups of RCABs + Upsampler tail, MeanShift wrap."""

    def __init__(self, args: Optional[SimpleNamespace] = None, **kw):
        a = args or args_namespace(**kw)

        def group():
            layers = [RCAB(a.n_feats, 3, a.reduction)
                      for _ in range(a.n_resblocks)]
            layers.append(_conv(a.n_feats, a.n_feats, 3))
            return _ResGroup(nn.Sequential(*layers))

        # ordered to match torch registration (rcan.py: sub_mean :82,
        # head/body/tail, add_mean :100) for checkpoint interop
        self.mods = nn.named({
            "sub_mean": MeanShift(a.rgb_range, export_name="sub_mean"),
            "head": nn.Sequential(_conv(a.n_colors, a.n_feats, 3)),
            "body": nn.Sequential(*[group() for _ in range(a.n_resgroups)],
                                  _conv(a.n_feats, a.n_feats, 3)),
            "tail": nn.Sequential(Upsampler(a.scale[0], a.n_feats),
                                  _conv(a.n_feats, a.n_colors, 3)),
            "add_mean": MeanShift(a.rgb_range, sign=1,
                                  export_name="add_mean"),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        x = m["sub_mean"].fwd({}, x)
        x = m["head"].fwd(p["head"], x, train)
        res = m["body"].fwd(p["body"], x, train) + x
        x = m["tail"].fwd(p["tail"], res, train)
        return m["add_mean"].fwd({}, x)


class _ResGroup(nn.Module):
    """rcan.py:52-66: wraps a body with a residual connection.  The params
    nest under "body" like torch's ResidualGroup.body Sequential."""

    def __init__(self, body: nn.Module):
        self.body = body

    def init(self, key):
        return {"body": self.body.init(key)}

    def forward(self, p, x, train):
        return self.body.fwd(p["body"], x, train) + x


# ---------------------------------------------------------------------------
# DDBPN (ddbpn.py)
# ---------------------------------------------------------------------------

def _projection(in_ch, out_ch, scale, up: bool):
    """ddbpn.py:13-27: (k, s, p) = {2:(6,2,2), 4:(8,4,2), 8:(12,8,2)}."""
    k, s, pad = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}[scale]
    if up:
        return nn.ConvTranspose2d(in_ch, out_ch, k, s, pad, weight_init="torch")
    return nn.Conv2d(in_ch, out_ch, k, s, pad, weight_init="torch")


class DenseProjection(nn.Module):
    """ddbpn.py:29-66: back-projection unit a0 + conv3(conv2(a0) - x)."""

    def __init__(self, in_ch: int, nr: int, scale: int, up: bool = True,
                 bottleneck: bool = True):
        self.has_bottleneck = bottleneck
        inter = nr if bottleneck else in_ch
        mods = {}
        if bottleneck:
            mods["bottleneck"] = nn.Conv2d(in_ch, nr, 1, 1, 0, weight_init="torch")
            mods["bottleneck_act"] = PReLU(nr)
        mods["conv_1"] = _projection(inter, nr, scale, up)
        mods["act_1"] = PReLU(nr)
        mods["conv_2"] = _projection(nr, inter, scale, not up)
        mods["act_2"] = PReLU(inter)
        mods["conv_3"] = _projection(inter, nr, scale, up)
        mods["act_3"] = PReLU(nr)
        self.mods = nn.named(mods)

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        if self.has_bottleneck:
            x = m["bottleneck_act"].fwd(
                p["bottleneck_act"], m["bottleneck"].fwd(p["bottleneck"], x))
        a0 = m["act_1"].fwd(p["act_1"], m["conv_1"].fwd(p["conv_1"], x))
        b0 = m["act_2"].fwd(p["act_2"], m["conv_2"].fwd(p["conv_2"], a0))
        e = b0 - x
        a1 = m["act_3"].fwd(p["act_3"], m["conv_3"].fwd(p["conv_3"], e))
        return a0 + a1


class DDBPN(nn.Module):
    """ddbpn.py:68-130: iterative up/down dense back-projection, depth 6."""

    def __init__(self, args: Optional[SimpleNamespace] = None, **kw):
        a = args or args_namespace(**kw)
        scale = a.scale[0]
        n0, nr = 128, 32
        self.depth = 6
        rgb_mean = (0.4488, 0.4371, 0.4040)
        # ordered to match torch registration (ddbpn.py: sub_mean :79,
        # initial/up/down/reconstruction, add_mean :110)
        mods = {
            "sub_mean": MeanShift(a.rgb_range, rgb_mean,
                                  export_name="sub_mean"),
            "init_conv1": nn.Conv2d(a.n_colors, n0, 3, 1, 1, weight_init="torch"),
            "init_act1": PReLU(n0),
            "init_conv2": nn.Conv2d(n0, nr, 1, 1, 0, weight_init="torch"),
            "init_act2": PReLU(nr),
        }
        ch = nr
        for i in range(self.depth):
            mods[f"up{i}"] = DenseProjection(ch, nr, scale, True, i > 1)
            if i != 0:
                ch += nr
        ch = nr
        for i in range(self.depth - 1):
            mods[f"down{i}"] = DenseProjection(ch, nr, scale, False, i != 0)
            ch += nr
        mods["reconstruction"] = nn.Conv2d(self.depth * nr, a.n_colors, 3, 1, 1,
                                           weight_init="torch")
        mods["add_mean"] = MeanShift(a.rgb_range, rgb_mean, sign=1,
                                     export_name="add_mean")
        self.mods = nn.named(mods)

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        x = m["sub_mean"].fwd({}, x)
        x = m["init_act1"].fwd(p["init_act1"],
                               m["init_conv1"].fwd(p["init_conv1"], x))
        x = m["init_act2"].fwd(p["init_act2"],
                               m["init_conv2"].fwd(p["init_conv2"], x))
        h_list, l_list = [], []
        for i in range(self.depth - 1):
            l = x if i == 0 else jnp.concatenate(l_list, -1)
            h_list.append(m[f"up{i}"].fwd(p[f"up{i}"], l, train))
            l_list.append(m[f"down{i}"].fwd(
                p[f"down{i}"], jnp.concatenate(h_list, -1), train))
        h_list.append(m[f"up{self.depth - 1}"].fwd(
            p[f"up{self.depth - 1}"], jnp.concatenate(l_list, -1), train))
        out = m["reconstruction"].fwd(p["reconstruction"],
                                      jnp.concatenate(h_list, -1))
        return m["add_mean"].fwd({}, out)


class EDSRWeb(nn.Module):
    """Classic EDSR baseline r16f64 with the ±0.5 input/output shift —
    reference model/edsr-web.py:14-75.  (The dash in that filename makes it
    unimportable dead code in the reference; ported for a complete zoo.)

    head conv -> n_resblocks x ResBlock(res_scale=1) + body conv (+ global
    residual) -> Upsampler + tail conv; kaiming fan_out/relu init on every
    conv (edsr-web.py:60-63 overrides the EDSR-PyTorch defaults).
    """

    def __init__(self, in_ch: int, ou_ch: int, upscale_factor: int,
                 n_resblocks: int = 16, n_feats: int = 64):
        k, wi = 3, "kaiming"
        self.mods = nn.named({
            "head": nn.Sequential(_conv(in_ch, n_feats, k, weight_init=wi)),
            "body": nn.Sequential(
                *[ResBlock(n_feats, k, res_scale=1.0, weight_init=wi)
                  for _ in range(n_resblocks)],
                _conv(n_feats, n_feats, k, weight_init=wi)),
            "tail": nn.Sequential(Upsampler(upscale_factor, n_feats,
                                            weight_init=wi),
                                  _conv(n_feats, ou_ch, k, weight_init=wi)),
        })

    def init(self, key):
        return self.mods.init(key)

    def forward(self, p, x, train):
        m = self.mods.layers
        x = x - 0.5
        x = m["head"].fwd(p["head"], x, train)
        res = m["body"].fwd(p["body"], x, train) + x
        return m["tail"].fwd(p["tail"], res, train) + 0.5
