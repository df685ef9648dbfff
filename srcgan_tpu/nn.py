"""A minimal functional module system for JAX.

Design: modules are lightweight Python objects that hold *hyperparameters only*.
Parameters live in explicit pytrees (nested dicts of jnp arrays) so that the whole
framework stays purely functional — jit/grad/shard_map compose without any hidden
state.  The uniform protocol is:

    params = module.init(rng_key)            # parameter pytree
    state  = module.init_state()             # mutable state pytree ({} if stateless)
    y, state = module.apply(params, x, state=state, train=True)

For the (common) stateless case there is sugar:

    y = module.fwd(params, x, train=False)

Only BatchNorm2d carries state (running stats); everything the reference's main
pipelines use (GroupNorm models) is stateless, so trainers mostly use ``fwd``.

Weight layouts are TPU-native: conv weights HWIO, images NHWC.  Initializers
reproduce the reference's per-model init exactly (kaiming fan_out/relu for the
explicitly-initialized zoos, torch Conv2d defaults elsewhere).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from srcgan_tpu import ops
from srcgan_tpu.ops import initializers as init

Params = Dict[str, Any]
State = Dict[str, Any]


class Module:
    """Base class: hyperparameters in __init__, params/state as explicit pytrees."""

    def init(self, key) -> Params:
        return {}

    def init_state(self) -> State:
        return {}

    # Subclasses override either `forward` (stateless) or `apply` (stateful).
    def forward(self, params: Params, x, train: bool):
        raise NotImplementedError(type(self).__name__)

    def apply(self, params: Params, x, state: Optional[State] = None,
              train: bool = False):
        return self.forward(params, x, train), (state if state is not None else {})

    def fwd(self, params: Params, x, train: bool = False):
        """Stateless application sugar.

        For stateful modules (BatchNorm) this uses FRESH init-state stats and
        discards updates — callers holding trained running stats must use
        ``apply(..., state=...)`` instead (the eval drivers and the serving
        predictor do).
        """
        y, _ = self.apply(params, x, state=self.init_state(), train=train)
        return y

    def __call__(self, params: Params, x, **kw):
        return self.fwd(params, x, **kw)


def _split(key, n):
    return jax.random.split(key, n)


# ---------------------------------------------------------------------------
# Basic layers
# ---------------------------------------------------------------------------

class Conv2d(Module):
    """Conv with HWIO weights.  weight_init: 'kaiming' (fan_out, relu — the
    reference zoo's explicit init, rddb.py:100-105) | 'torch' (PyTorch default)
    | 'normal' | a callable(key, shape)."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size, stride=1, padding=0,
                 bias: bool = True, groups: int = 1, weight_init="kaiming",
                 bias_init=None):
        self.in_ch, self.out_ch = in_ch, out_ch
        self.k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
        self.stride, self.padding = stride, padding
        self.use_bias, self.groups = bias, groups
        self.weight_init = weight_init
        self.bias_init = bias_init

    def _w_shape(self):
        return (*self.k, self.in_ch // self.groups, self.out_ch)

    def init(self, key):
        kw, kb = _split(key, 2)
        shape = self._w_shape()
        wi = self.weight_init
        if callable(wi):
            w = wi(kw, shape)
        elif wi == "kaiming":
            w = init.kaiming_normal(kw, shape, mode="fan_out", nonlinearity="relu")
        elif wi == "torch":
            w = init.torch_conv_default(kw, shape)
        elif wi == "normal":
            w = init.normal(kw, shape, std=0.02)
        else:
            raise ValueError(wi)
        p = {"w": w}
        if self.use_bias:
            if self.bias_init == "zeros":
                p["b"] = jnp.zeros((self.out_ch,))
            elif wi == "kaiming":
                # torch kaiming_normal_ only touches the weight; bias keeps the
                # torch default uniform(+-1/sqrt(fan_in)).
                fan_in = shape[0] * shape[1] * shape[2]
                p["b"] = init.torch_bias_default(kb, (self.out_ch,), fan_in)
            elif wi == "normal":
                p["b"] = jnp.zeros((self.out_ch,))
            else:
                fan_in = shape[0] * shape[1] * shape[2]
                p["b"] = init.torch_bias_default(kb, (self.out_ch,), fan_in)
        return p

    def forward(self, params, x, train):
        return ops.conv2d(x, params["w"], params.get("b"), self.stride,
                          self.padding, groups=self.groups)


class ConvTranspose2d(Module):
    """Transposed conv matching torch.nn.ConvTranspose2d (see ops.conv)."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size: int, stride: int = 1,
                 padding: int = 0, output_padding: int = 0, bias: bool = True,
                 weight_init="kaiming", bias_init=None):
        self.in_ch, self.out_ch = in_ch, out_ch
        self.k, self.stride = kernel_size, stride
        self.padding, self.output_padding = padding, output_padding
        self.use_bias = bias
        self.weight_init = weight_init
        self.bias_init = bias_init

    def init(self, key):
        kw, kb = _split(key, 2)
        shape = (self.k, self.k, self.in_ch, self.out_ch)
        wi = self.weight_init
        if callable(wi):
            w = wi(kw, shape)
        elif wi == "kaiming":
            w = init.kaiming_normal(kw, shape, mode="fan_out", nonlinearity="relu")
        elif wi == "torch":
            # torch ConvTranspose2d default: kaiming_uniform(a=sqrt(5)) with
            # fan_in computed on (in, out, kh, kw) -> fan_in = out*k*k... torch
            # actually uses weight.shape[1]*k*k = out_ch*k*k.
            fan_in = self.out_ch * self.k * self.k
            bound = 1.0 / math.sqrt(fan_in)
            w = jax.random.uniform(kw, shape, jnp.float32, -bound, bound)
        elif wi == "normal":
            w = init.normal(kw, shape, std=0.02)
        else:
            raise ValueError(wi)
        p = {"w": w}
        if self.use_bias:
            if self.bias_init == "zeros":
                p["b"] = jnp.zeros((self.out_ch,))
            else:
                fan_in = self.out_ch * self.k * self.k
                p["b"] = init.torch_bias_default(kb, (self.out_ch,), fan_in)
        return p

    def forward(self, params, x, train):
        return ops.conv_transpose2d(x, params["w"], params.get("b"), self.stride,
                                    self.padding, self.output_padding)


class GroupNorm(Module):
    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5):
        self.g, self.c, self.eps = num_groups, num_channels, eps

    def init(self, key):
        return {"scale": jnp.ones((self.c,)), "bias": jnp.zeros((self.c,))}

    def forward(self, params, x, train):
        return ops.group_norm(x, params["scale"], params["bias"], self.g, self.eps)


class InstanceNorm2d(Module):
    """torch defaults: affine=False, track_running_stats=False."""

    def __init__(self, num_channels: int, eps: float = 1e-5, affine: bool = False):
        self.c, self.eps, self.affine = num_channels, eps, affine

    def init(self, key):
        if self.affine:
            return {"scale": jnp.ones((self.c,)), "bias": jnp.zeros((self.c,))}
        return {}

    def forward(self, params, x, train):
        return ops.instance_norm(x, params.get("scale"), params.get("bias"), self.eps)


class BatchNorm2d(Module):
    def __init__(self, num_channels: int, eps: float = 1e-5, momentum: float = 0.1):
        self.c, self.eps, self.momentum = num_channels, eps, momentum

    def init(self, key):
        return {"scale": jnp.ones((self.c,)), "bias": jnp.zeros((self.c,))}

    def init_state(self):
        return {"mean": jnp.zeros((self.c,)), "var": jnp.ones((self.c,))}

    def apply(self, params, x, state=None, train=False):
        state = state if state else self.init_state()
        y, m, v = ops.batch_norm(x, params["scale"], params["bias"],
                                 state["mean"], state["var"], train=train,
                                 momentum=self.momentum, eps=self.eps)
        return y, {"mean": m, "var": v}


class ReLU(Module):
    def forward(self, params, x, train):
        return jax.nn.relu(x)


class LeakyReLU(Module):
    def __init__(self, negative_slope: float = 0.2):
        self.slope = negative_slope

    def forward(self, params, x, train):
        return jax.nn.leaky_relu(x, self.slope)


class Tanh(Module):
    def forward(self, params, x, train):
        return jnp.tanh(x)


class PixelShuffle(Module):
    def __init__(self, upscale_factor: int):
        self.r = upscale_factor

    def forward(self, params, x, train):
        return ops.pixel_shuffle(x, self.r)


class Identity(Module):
    def forward(self, params, x, train):
        return x


class Lambda(Module):
    """Wrap a pure function (no params) as a module."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def forward(self, params, x, train):
        return self.fn(x)


class Sequential(Module):
    def __init__(self, *layers: Module):
        self.layers = list(layers)

    def init(self, key):
        keys = _split(key, max(len(self.layers), 1))
        return {str(i): l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))}

    def init_state(self):
        s = {}
        for i, l in enumerate(self.layers):
            ls = l.init_state()
            if ls:
                s[str(i)] = ls
        return s

    def apply(self, params, x, state=None, train=False):
        state = dict(state) if state else {}
        for i, l in enumerate(self.layers):
            k = str(i)
            y, ns = l.apply(params.get(k, {}), x, state=state.get(k), train=train)
            x = y
            if ns:
                state[k] = ns
        return x, state


def named(layers: Dict[str, Module]) -> "NamedModules":
    return NamedModules(layers)


class NamedModules(Module):
    """A dict of submodules — for models whose forward is hand-written.

    init() produces {name: subparams}.  The owner composes forward itself.
    """

    def __init__(self, layers: Dict[str, Module]):
        self.layers = layers

    def init(self, key):
        keys = _split(key, max(len(self.layers), 1))
        return {name: l.init(k) for (name, l), k in zip(self.layers.items(), keys)}

    def init_state(self):
        s = {}
        for name, l in self.layers.items():
            ls = l.init_state()
            if ls:
                s[name] = ls
        return s


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def iter_modules(mod: Module):
    """Yield ``mod`` and every submodule, depth-first (all nodes, not just
    parameterized leaves — cf. iter_leaf_modules)."""
    yield mod
    if isinstance(mod, Sequential):
        children = mod.layers
    elif isinstance(mod, NamedModules):
        children = mod.layers.values()
    else:
        children = [v for v in mod.__dict__.values() if isinstance(v, Module)]
    for c in children:
        yield from iter_modules(c)


LEAF_TYPES = (Conv2d, ConvTranspose2d, GroupNorm, InstanceNorm2d, BatchNorm2d)


def iter_leaf_modules(mod: Module):
    """Yield parameterized leaf modules in init/registration order.

    Mirrors torch's module-registration order for every model in this zoo
    (construction order == assignment order == params-dict insertion order),
    which is what makes ordered torch checkpoint import possible
    (srcgan_tpu.interop).
    """
    if isinstance(mod, LEAF_TYPES):
        yield mod
        return
    if isinstance(mod, Sequential):
        for l in mod.layers:
            yield from iter_leaf_modules(l)
        return
    if isinstance(mod, NamedModules):
        for l in mod.layers.values():
            yield from iter_leaf_modules(l)
        return
    if isinstance(mod, Module):
        has_sub = any(isinstance(v, Module) for v in mod.__dict__.values())
        is_custom_leaf = (type(mod).init is not Module.init
                          or getattr(mod, "_torch_leaf", False))
        if is_custom_leaf and not has_sub:
            # custom leaf: own init() (e.g. PReLU) or marked as consuming
            # torch state_dict tensors despite holding none (e.g. MeanShift)
            yield mod
            return
        for v in mod.__dict__.values():
            if isinstance(v, Module):
                yield from iter_leaf_modules(v)
