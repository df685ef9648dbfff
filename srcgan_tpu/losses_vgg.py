"""VGG16/VGG19 perceptual losses (losses.py:344-470 equivalents).

The reference downloads torchvision's pretrained VGG at construction time
(losses.py:348, :459).  This image has no network egress, so pretrained weights
must be supplied as a local file; the architecture and the loss math are fully
implemented here and verified against torch with random weights.

Weight sources accepted by ``load_vgg_params``:
  - a ``.npz`` with arrays named ``features.{i}.weight`` / ``features.{i}.bias``
    (torchvision state_dict keys), conv weights in OIHW;
  - a torch ``.pth`` state_dict (loaded via torch, CPU).

VGG16 feature slices used by the loss (losses.py:354-361):
  slice1 = features[0:4)   (relu1_2)
  slice2 = features[4:9)   (relu2_2)
  slice3 = features[9:16)  (relu3_3)
  slice4 = features[16:23) (relu4_3)
loss = mean of L1 over the four slice outputs; 1-channel inputs are replicated
to 3 channels (losses.py:378-380).

PerceptionLoss (losses.py:455-470): VGG19 features[:35] (through relu5_4's conv
stack, pre-pool), MSE.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from srcgan_tpu import ops

# torchvision VGG 'features' layer layouts: channel spec per conv, 'M' = maxpool.
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _features_plan(cfg) -> List[tuple]:
    """[(torch_layer_idx, kind, out_ch)] mirroring torchvision indexing:
    conv -> relu for each conv entry, maxpool for 'M'."""
    plan, idx = [], 0
    for v in cfg:
        if v == "M":
            plan.append((idx, "pool", None)); idx += 1
        else:
            plan.append((idx, "conv", v)); idx += 1
            plan.append((idx, "relu", None)); idx += 1
    return plan


def init_vgg_params(key, cfg=VGG16_CFG) -> Dict[str, dict]:
    """Random init (testing only — perceptual losses need real weights)."""
    params, cin = {}, 3
    for idx, kind, cout in _features_plan(cfg):
        if kind == "conv":
            key, k1, k2 = jax.random.split(key, 3)
            fan_in = 9 * cin
            bound = 1.0 / np.sqrt(fan_in)
            params[str(idx)] = {
                "w": jax.random.uniform(k1, (3, 3, cin, cout), jnp.float32,
                                        -bound, bound),
                "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
            }
            cin = cout
    return params


def load_vgg_params(path: str, cfg=VGG16_CFG) -> Dict[str, dict]:
    """Load torchvision-format weights from .npz or .pth into HWIO pytrees."""
    if path.endswith(".npz"):
        raw = dict(np.load(path))
        get = lambda k: raw[k]
    else:
        import torch
        sd = torch.load(path, map_location="cpu")
        get = lambda k: sd[k].numpy()
    params = {}
    for idx, kind, _ in _features_plan(cfg):
        if kind == "conv":
            w = get(f"features.{idx}.weight")  # OIHW
            b = get(f"features.{idx}.bias")
            params[str(idx)] = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                                "b": jnp.asarray(b)}
    return params


def _max_pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def vgg_features(params, x, cfg=VGG16_CFG, cut_points: Sequence[int] = (4, 9, 16, 23)):
    """Run the VGG trunk, returning activations at each torchvision cut index."""
    outs, next_cut = [], 0
    for idx, kind, _ in _features_plan(cfg):
        if next_cut < len(cut_points) and idx == cut_points[next_cut]:
            outs.append(x)
            next_cut += 1
        if kind == "conv":
            p = params[str(idx)]
            x = ops.conv2d(x, p["w"], p["b"], 1, 1)
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = _max_pool(x)
    if next_cut < len(cut_points):
        outs.append(x)
    return outs


def _to3ch(x):
    return jnp.concatenate([x, x, x], axis=-1) if x.shape[-1] == 1 else x


def vgg16_loss(params, output, target):
    """Mean L1 over the four VGG16 slices (losses.py:376-393)."""
    fo = vgg_features(params, _to3ch(output))
    ft = vgg_features(params, _to3ch(target))
    losses = [jnp.mean(jnp.abs(a - b)) for a, b in zip(fo, ft)]
    return sum(losses) / len(losses)


def vgg16_loss_3d(params, output, target):
    """Per-frame mean over (N, F, H, W, C) (losses.py:396-453)."""
    f = output.shape[1]
    vals = [vgg16_loss(params, output[:, i], target[:, i]) for i in range(f)]
    return sum(vals) / len(vals)


def perception_loss(params, output, target, feature_layer: int = 35):
    """VGG19 features[:35] MSE (losses.py:455-470)."""
    fo = vgg_features(params, _to3ch(output), cfg=VGG19_CFG,
                      cut_points=(feature_layer,))
    ft = vgg_features(params, _to3ch(target), cfg=VGG19_CFG,
                      cut_points=(feature_layer,))
    return jnp.mean((fo[0] - ft[0]) ** 2)
