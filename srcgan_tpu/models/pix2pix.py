"""pix2pix/CycleGAN generator kit (reference src/model/basicModel.py).

ResnetGenerator (reflect-padded, 9/6 blocks), UnetGenerator (recursive skip
blocks), the norm-layer selector and the define_G factory — re-created
NHWC/functional.  Used by the reference's multi-task driver (multi-task.py:12,
:176-183).

Notes:
  - torch's ReflectionPad2d == jnp.pad mode='reflect'.
  - dropout is OFF by default in define_G (basicModel.py:105) and the reference
    drivers never enable it; the Dropout module here is identity in eval mode
    and, in train mode, threads its RNG key through the module-state channel
    (see Dropout docstring) so use_dropout=True generators actually train.
  - init_weights 'normal' (std=0.02) is the pix2pix default; norm affine
    params keep their standard init (scale=1, bias=0), a negligible divergence
    from pix2pix's N(1, 0.02) BN-scale init.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from srcgan_tpu import nn


class ReflectionPad2d(nn.Module):
    def __init__(self, pad: int):
        self.pad = pad

    def forward(self, params, x, train):
        p = self.pad
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class Dropout(nn.Module):
    """Inverted dropout (torch.nn.Dropout semantics: zero w.p. p, survivors
    scaled by 1/(1-p); basicModel.py:230-236) with the RNG key threaded
    through the module-STATE channel, exactly like BatchNorm's running stats:
    each train-mode apply splits the stored key, draws the mask from one half
    and stores the other.  Deterministic given the initial state,
    checkpointable, and requires no signature change anywhere.

    Caveat: the stateless ``fwd`` sugar re-derives init-state per call and
    discards updates, so it would reuse one mask across steps — trainers that
    enable dropout must thread state via ``apply`` (they do for BatchNorm
    already).  Reseed by replacing state["key"].
    """

    def __init__(self, p: float = 0.5):
        self.p = p

    def init_state(self):
        return {"key": jax.random.PRNGKey(0)}

    def apply(self, params, x, state=None, train=False):
        state = state if state else self.init_state()
        if not train or self.p <= 0.0:
            return x, state
        key, next_key = jax.random.split(state["key"])
        keep = jax.random.bernoulli(key, 1.0 - self.p, x.shape)
        y = jnp.where(keep, x / (1.0 - self.p), 0).astype(x.dtype)
        return y, {"key": next_key}

    def forward(self, params, x, train):
        if train:
            raise RuntimeError("stochastic Dropout must be called via apply() "
                               "so the RNG state threads through")
        return x


def _norm(norm_type: str, ch: int) -> nn.Module:
    """get_norm_layer (basicModel.py:15-30): batch | instance | none."""
    if norm_type == "batch":
        return nn.BatchNorm2d(ch)
    if norm_type == "instance":
        return nn.InstanceNorm2d(ch)
    if norm_type == "none":
        return nn.Identity()
    raise NotImplementedError(f"normalization layer [{norm_type}] is not found")


class Pix2PixResnetBlock(nn.Module):
    """basicModel.py:200-254: [pad conv norm relu (dropout) pad conv norm] + x."""

    def __init__(self, dim: int, padding_type: str = "reflect",
                 norm: str = "batch", use_dropout: bool = False,
                 use_bias: bool = False):
        layers = []
        for i in range(2):
            if padding_type in ("reflect",):
                layers.append(ReflectionPad2d(1))
                p = 0
            elif padding_type == "zero":
                p = 1
            else:
                raise NotImplementedError(padding_type)
            layers.append(nn.Conv2d(dim, dim, 3, 1, p, bias=use_bias,
                                    weight_init="normal"))
            layers.append(_norm(norm, dim))
            if i == 0:
                layers.append(nn.ReLU())
                if use_dropout:
                    layers.append(Dropout(0.5))
        self.block = nn.Sequential(*layers)

    def init(self, key):
        return self.block.init(key)

    def init_state(self):
        return self.block.init_state()

    def apply(self, p, x, state=None, train=False):
        y, st = self.block.apply(p, x, state=state, train=train)
        return x + y, st


class ResnetGenerator(nn.Module):
    """basicModel.py:141-197: reflect-pad 7x7 stem, 2 stride-2 downs, n_blocks
    resnet blocks, 2 deconv ups (k3 s2 p1 op1), 7x7 tanh head."""

    def __init__(self, input_nc: int, output_nc: int, ngf: int = 64,
                 norm: str = "batch", use_dropout: bool = False,
                 n_blocks: int = 6, padding_type: str = "reflect"):
        use_bias = norm == "instance"
        layers = [ReflectionPad2d(3),
                  nn.Conv2d(input_nc, ngf, 7, 1, 0, bias=use_bias,
                            weight_init="normal"),
                  _norm(norm, ngf), nn.ReLU()]
        for i in range(2):
            mult = 2 ** i
            layers += [nn.Conv2d(ngf * mult, ngf * mult * 2, 3, 2, 1,
                                 bias=use_bias, weight_init="normal"),
                       _norm(norm, ngf * mult * 2), nn.ReLU()]
        for _ in range(n_blocks):
            layers.append(Pix2PixResnetBlock(ngf * 4, padding_type, norm,
                                             use_dropout, use_bias))
        for i in range(2):
            mult = 2 ** (2 - i)
            layers += [nn.ConvTranspose2d(ngf * mult, ngf * mult // 2, 3, 2,
                                          padding=1, output_padding=1,
                                          bias=use_bias, weight_init="normal"),
                       _norm(norm, ngf * mult // 2), nn.ReLU()]
        layers += [ReflectionPad2d(3),
                   nn.Conv2d(ngf, output_nc, 7, 1, 0, weight_init="normal"),
                   nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def init(self, key):
        return self.model.init(key)

    def init_state(self):
        return self.model.init_state()

    def apply(self, p, x, state=None, train=False):
        return self.model.apply(p, x, state=state, train=train)


class UnetSkipConnectionBlock(nn.Module):
    """basicModel.py:288-354, recursive; non-outermost blocks concat input."""

    def __init__(self, outer_nc: int, inner_nc: int, input_nc: Optional[int] = None,
                 submodule: Optional[nn.Module] = None, outermost: bool = False,
                 innermost: bool = False, norm: str = "batch",
                 use_dropout: bool = False):
        self.outermost = outermost
        use_bias = norm == "instance"
        if input_nc is None:
            input_nc = outer_nc
        downconv = nn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=use_bias,
                             weight_init="normal")
        if outermost:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                        weight_init="normal")
            layers = [downconv, submodule, nn.ReLU(), upconv, nn.Tanh()]
        elif innermost:
            upconv = nn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1,
                                        bias=use_bias, weight_init="normal")
            layers = [nn.LeakyReLU(0.2), downconv, nn.ReLU(), upconv,
                      _norm(norm, outer_nc)]
        else:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                        bias=use_bias, weight_init="normal")
            layers = [nn.LeakyReLU(0.2), downconv, _norm(norm, inner_nc),
                      submodule, nn.ReLU(), upconv, _norm(norm, outer_nc)]
            if use_dropout:
                layers.append(Dropout(0.5))
        self.model = nn.Sequential(*layers)

    def init(self, key):
        return self.model.init(key)

    def init_state(self):
        return self.model.init_state()

    def apply(self, p, x, state=None, train=False):
        y, st = self.model.apply(p, x, state=state, train=train)
        if self.outermost:
            return y, st
        return jnp.concatenate([x, y], axis=-1), st


class UnetGenerator(nn.Module):
    """basicModel.py:257-285: built innermost-out; unet_256 = 8 downs."""

    def __init__(self, input_nc: int, output_nc: int, num_downs: int,
                 ngf: int = 64, norm: str = "batch", use_dropout: bool = False):
        block = UnetSkipConnectionBlock(ngf * 8, ngf * 8, norm=norm,
                                        innermost=True)
        for _ in range(num_downs - 5):
            block = UnetSkipConnectionBlock(ngf * 8, ngf * 8, submodule=block,
                                            norm=norm, use_dropout=use_dropout)
        block = UnetSkipConnectionBlock(ngf * 4, ngf * 8, submodule=block,
                                        norm=norm)
        block = UnetSkipConnectionBlock(ngf * 2, ngf * 4, submodule=block,
                                        norm=norm)
        block = UnetSkipConnectionBlock(ngf, ngf * 2, submodule=block, norm=norm)
        self.model = UnetSkipConnectionBlock(output_nc, ngf, input_nc=input_nc,
                                             submodule=block, outermost=True,
                                             norm=norm)

    def init(self, key):
        return self.model.init(key)

    def init_state(self):
        return self.model.init_state()

    def apply(self, p, x, state=None, train=False):
        return self.model.apply(p, x, state=state, train=train)


def define_G(input_nc: int, output_nc: int, ngf: int, netG: str,
             norm: str = "batch", use_dropout: bool = False,
             init_type: str = "normal", init_gain: float = 0.02):
    """Generator factory (basicModel.py:105-139).

    init_type other than 'normal' is accepted for API parity; the per-layer
    initializers already implement normal(0.02) (pix2pix default).
    """
    if netG == "resnet_9blocks":
        return ResnetGenerator(input_nc, output_nc, ngf, norm, use_dropout, 9)
    if netG == "resnet_6blocks":
        return ResnetGenerator(input_nc, output_nc, ngf, norm, use_dropout, 6)
    if netG == "unet_128":
        return UnetGenerator(input_nc, output_nc, 7, ngf, norm, use_dropout)
    if netG == "unet_256":
        return UnetGenerator(input_nc, output_nc, 8, ngf, norm, use_dropout)
    raise NotImplementedError(f"Generator model name [{netG}] is not recognized")
