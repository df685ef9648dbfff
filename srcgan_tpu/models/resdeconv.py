"""ResDeconv — the ResNet-encoder / deconv-decoder colorizer
(reference resdeconv.py:99-195)."""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from srcgan_tpu import nn
from srcgan_tpu.models.blocks import deconv


def make_norm(kind: str, ch: int) -> nn.Module:
    """BN/IN/GN selection (resdeconv.py:59-75)."""
    if kind == "BN":
        return nn.BatchNorm2d(ch)
    if kind == "IN":
        return nn.InstanceNorm2d(ch)
    if kind == "GN":
        return nn.GroupNorm(32, ch)
    raise ValueError(kind)


class BasicBlock(nn.Module):
    """ResNet BasicBlock with selectable norm (resdeconv.py:56-95).
    conv3x3(s) -> norm -> relu -> conv3x3 -> norm -> (+downsample(x)) -> relu."""

    expansion = 1

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: bool = False, BN: str = "GN"):
        mods = {
            "conv1": nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False),
            "bn1": make_norm(BN, planes),
            "conv2": nn.Conv2d(planes, planes, 3, 1, 1, bias=False),
            "bn2": make_norm(BN, planes),
        }
        if downsample:
            mods["down_conv"] = nn.Conv2d(inplanes, planes, 1, stride, 0, bias=False)
            mods["down_bn"] = make_norm(BN, planes)
        self.has_down = downsample
        self.mods = nn.named(mods)

    def init(self, key):
        return self.mods.init(key)

    def init_state(self):
        return self.mods.init_state()

    def apply(self, p, x, state=None, train=False):
        m = self.mods.layers
        state = dict(state) if state else {}

        def run(name, v):
            y, ns = m[name].apply(p[name], v, state=state.get(name), train=train)
            if ns:
                state[name] = ns
            return y

        identity = x
        out = run("bn1", run("conv1", x))
        out = jax.nn.relu(out)
        out = run("bn2", run("conv2", out))
        if self.has_down:
            identity = run("down_bn", run("down_conv", x))
        return jax.nn.relu(out + identity), state


def _stage(inplanes: int, planes: int, blocks: int, stride: int, BN: str
           ) -> nn.Sequential:
    """_make_layer equivalent (resdeconv.py:149-169)."""
    downsample = stride != 1 or inplanes != planes
    layers: List[nn.Module] = [BasicBlock(inplanes, planes, stride, downsample, BN)]
    for _ in range(1, blocks):
        layers.append(BasicBlock(planes, planes, 1, False, BN))
    return nn.Sequential(*layers)


class ResDeconv(nn.Module):
    """ResNet-18-shape encoder + 4x [deconv x2 + residual stage] decoder ->
    3x3 pred conv.  Gray input is replicated to 3 channels (resdeconv.py:172-173).
    Matches /root/reference/src/model/resdeconv.py:99-195 (no skip connections —
    they are commented out in the reference forward)."""

    def __init__(self, src_ch: int = 1, tar_ch=3, block=BasicBlock,
                 layers=(2, 2, 2, 2), BN: str = "GN"):
        if isinstance(tar_ch, (list, tuple)):
            tar_ch = sum(tar_ch)
        self.src_ch = src_ch
        self.mods = nn.named({
            "conv1": nn.Conv2d(3, 64, 7, 2, 3, bias=False),
            "bn1": make_norm(BN, 64),
            "layer1": _stage(64, 64, layers[0], 1, BN),
            "layer2": _stage(64, 128, layers[1], 2, BN),
            "layer3": _stage(128, 256, layers[2], 2, BN),
            "layer4": _stage(256, 512, layers[3], 2, BN),
            "deconv10": deconv(512, 256, 2),
            "upRes1": _stage(256, 256, layers[2], 1, BN),
            "deconv11": deconv(256, 128, 2),
            "upRes2": _stage(128, 128, layers[1], 1, BN),
            "deconv12": deconv(128, 64, 2),
            "upRes3": _stage(64, 64, layers[0], 1, BN),
            "deconv13": deconv(64, 64, 2),
            "pred": nn.Conv2d(64, tar_ch, 3, 1, 1, bias=False),
        })

    def init(self, key):
        return self.mods.init(key)

    def init_state(self):
        return self.mods.init_state()

    def apply(self, p, x, state=None, train=False):
        m = self.mods.layers
        state = dict(state) if state else {}

        def run(name, v):
            y, ns = m[name].apply(p[name], v, state=state.get(name), train=train)
            if ns:
                state[name] = ns
            return y

        if self.src_ch == 1:
            x = jnp.concatenate([x, x, x], axis=-1)
        x = jax.nn.relu(run("bn1", run("conv1", x)))
        x = run("layer1", x)
        x = run("layer2", x)
        x = run("layer3", x)
        x = run("layer4", x)
        x = run("upRes1", run("deconv10", x))
        x = run("upRes2", run("deconv11", x))
        x = run("upRes3", run("deconv12", x))
        x = run("deconv13", x)
        return run("pred", x), state
