"""Geometric self-ensemble (x8 dihedral test-time augmentation).

The classic "EDSR+" evaluation protocol (Lim et al. 2017, the lineage of the
reference's EDSR-derived zoo — /root/reference/src/model/edsr-web.py): run the
network on all 8 dihedral (D4) transforms of the input, invert each output,
and average.  The reference has no test-time augmentation anywhere (its eval
loop runs one forward per sample, testCas.py:78-79); this is a
beyond-reference quality lever that typically buys a few tenths of a dB at
8x the inference FLOPs.

TPU-native shape: the 8 transformed copies are CONCATENATED ALONG BATCH and
run as ONE forward — on square inputs every D4 image has the same shape, so
the MXU sees one 8N-row program instead of 8 dispatches of N rows.  The
dihedral ops themselves are static-shape transposes/flips (XLA relayouts),
legal inside jit and under GSPMD batch sharding.

Op numbering matches the host-side augmentation (data.dataset.dihedral):
0..3 = rot90 CCW by k; 4 = horizontal flip (W); 5 = vertical flip (H);
6 = transpose; 7 = anti-transpose.  Ops 0/2/4/5 preserve (H, W) and are the
legal subset for non-square inputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# op -> inverse op (rot90 and rot270 swap; everything else is an involution)
DIHEDRAL_INVERSE = (0, 3, 2, 1, 4, 5, 6, 7)
ALL_OPS = (0, 1, 2, 3, 4, 5, 6, 7)
SHAPE_PRESERVING_OPS = (0, 2, 4, 5)


def dihedral_nhwc(x, op: int):
    """Apply D4 symmetry ``op`` (0..7) to an NHWC batch.

    Same op semantics as the host-side ``data.dataset.dihedral`` (HWC),
    verified element-equal in tests/test_ensemble.py.
    """
    if op == 0:
        return x
    if op < 4:
        return jnp.rot90(x, k=op, axes=(1, 2))
    if op == 4:
        return x[:, :, ::-1]
    if op == 5:
        return x[:, ::-1]
    if op == 6:
        return jnp.swapaxes(x, 1, 2)
    return jnp.swapaxes(x, 1, 2)[:, ::-1, ::-1]


def ensemble_ops(h: int, w: int):
    """The D4 subset legal for an (h, w) input: all 8 when square, else the
    four shape-preserving ops (so the transformed copies still stack)."""
    return ALL_OPS if h == w else SHAPE_PRESERVING_OPS


def self_ensemble_apply(fn, x, ops=None):
    """fn over all D4 transforms of ``x``, inverted and averaged.

    fn: (kN, H, W, C) -> pytree of (kN, H', W', C') arrays (any number of
    outputs — e.g. the cascade's (SR gray, colorized) pair); spatial dims may
    differ from the input's by a uniform scale (D4 commutes with uniform
    resampling).  The k transformed copies run as ONE batched call; each
    output leaf is inverse-transformed per copy and averaged in its own dtype
    (call in fp32 for metric-grade ensembling).

    Returns the averaged pytree.
    """
    if ops is None:
        ops = ensemble_ops(x.shape[1], x.shape[2])
    k = len(ops)
    xs = jnp.concatenate([dihedral_nhwc(x, op) for op in ops], axis=0)
    ys = fn(xs)

    def avg(leaf):
        parts = jnp.split(leaf, k, axis=0)
        inv = [dihedral_nhwc(p, DIHEDRAL_INVERSE[op])
               for p, op in zip(parts, ops)]
        return sum(inv[1:], start=inv[0]) / float(k)

    return jax.tree_util.tree_map(avg, ys)
