"""Probe: pack P independent images into channels to escape the C=64-minor tax.

The three measured trunk negatives (docs/PERF.md) all stayed inside the
one-image NHWC convention; the unprobed rewrite family is CHANNEL PACKING:
run P=2 images through the trunk as one (N/2, H, W, 2C) tensor, where every
conv becomes either

  - a grouped conv (feature_group_count=2, both groups sharing the weights) —
    exact, no FLOP waste, IF XLA's TPU emitter lowers feature groups well; or
  - a block-diagonal dense conv (2Cin -> 2Cout, weights on the diagonal
    blocks) — exact, 2x the FLOPs, but runs at the C=128-wide rates the
    round-2 microbench measured at 330 TFLOP/s (vs <=149 at C=64 shapes).

Why it could win: every trunk activation becomes C=128-minor (f32 copy rates
double there — PERF.md "Fused RDB5" finding #2), and the emitter's best rates
live at >=128-wide operands.  Why it could lose: grouped conv may lower to a
loop / masked dense (paying the 2x anyway), and the dense chain's concats
become 2x-sliced interleaves.

Sections:
  a  conv microbench: dense C=64 shapes vs grouped/blockdiag packed twins
  b  whole-trunk end-to-end (3 RRDBs): production paired bs=8 vs packed bs=4

Usage: python scripts/packed_channels_probe.py [ab]   (real TPU via relay)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts._bench_util import slope
from srcgan_tpu import config, ops

config.set_conv_precision("default")  # bf16 MXU

B, S = 8, 128  # flagship trunk shapes: batch 8 @ 128^2, nf=64, gc=32
NF, GC = 64, 32


def _rand(shape, seed, dtype=jnp.bfloat16):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.standard_normal(shape, np.float32) * 0.05).astype(dtype)


def time_conv(cin, cout, batch, groups, label, kind="dense"):
    """Scan-slope a single 3x3 conv; prints us/call + effective TFLOP/s
    (effective = useful FLOPs of the P underlying images, so blockdiag's
    wasted zero-block FLOPs count against it)."""
    x0 = _rand((batch, S, S, cin), 0)
    if kind == "grouped":
        w1 = _rand((3, 3, cin // groups, cout // groups), 1)
        w = jnp.concatenate([w1] * groups, axis=-1)
    elif kind == "blockdiag":
        w1 = _rand((3, 3, cin // groups, cout // groups), 1)
        w = jnp.zeros((3, 3, cin, cout), w1.dtype)
        ci, co = cin // groups, cout // groups
        for g in range(groups):
            w = w.at[:, :, g * ci:(g + 1) * ci, g * co:(g + 1) * co].set(w1)
        groups = 1
    else:
        w = _rand((3, 3, cin, cout), 1)

    def make_chain(K):
        @jax.jit
        def chain(x, seed):
            def body(c, _):
                y = ops.conv2d(c, w, None, 1, 1, groups=groups)
                # carry keeps the input shape; dependency via scalar fold-in
                return c + (0.0 * jnp.mean(y)).astype(c.dtype), jnp.mean(y)
            _, ys = jax.lax.scan(body, x + seed.astype(x.dtype), None, length=K)
            return jnp.sum(ys)

        return lambda s: float(chain(x0, jnp.float32(s)))

    per = slope(make_chain, 1, 17, tries=3)
    # useful FLOPs: dense C=64 baseline work regardless of packing form
    use_groups = max(groups, 1) if kind != "blockdiag" else 2
    useful = 2 * 9 * (cin // use_groups) * (cout // use_groups) * use_groups \
        * batch * S * S if kind != "dense" else 2 * 9 * cin * cout * batch * S * S
    print(f"  {label:42s} {per * 1e6:8.1f} us  "
          f"{useful / per / 1e12:6.1f} eff-TFLOP/s")
    return per


def section_a():
    print("a) 3x3 conv rates, bf16, 128^2 images (effective = useful FLOPs):")
    # the trunk's dominant paired-schedule shapes at batch 8...
    time_conv(64, 192, B, 1, "dense 64->192 @bs8 (production shape)")
    time_conv(64, 64, B, 1, "dense 64->64   @bs8")
    # ...and their packed twins at batch 4
    time_conv(128, 384, B // 2, 2, "grouped g2 128->384 @bs4 (packed twin)",
              "grouped")
    time_conv(128, 384, B // 2, 2, "blockdiag 128->384 @bs4 (packed twin)",
              "blockdiag")
    time_conv(128, 128, B // 2, 2, "grouped g2 128->128 @bs4", "grouped")
    time_conv(128, 128, B // 2, 2, "blockdiag 128->128 @bs4", "blockdiag")
    # context: the C>=128 dense rates the packing chases
    time_conv(128, 128, B, 1, "dense 128->128 @bs8 (round-2 table row)")
    time_conv(128, 384, B // 2, 1, "dense 128->384 @bs4 (raw emitter rate)")


# ---------------------------------------------------------------- trunk ----

def _trunk_params(seed=0):
    """9 RDB5s' worth of conv weights + first/trunk convs, HWIO bf16."""
    r = np.random.default_rng(seed)
    def w(ci, co):
        return jnp.asarray(
            r.standard_normal((3, 3, ci, co), np.float32) * 0.05
        ).astype(jnp.bfloat16)
    rdb = lambda: [w(NF + i * GC, GC if i < 4 else NF) for i in range(5)]
    return {"rdbs": [rdb() for _ in range(9)], "tc": w(NF, NF)}


def _rdb5_naive(ws, x):
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    feats = [x]
    for i, wi in enumerate(ws):
        y = ops.conv2d(jnp.concatenate(feats, -1) if i else x, wi, None, 1, 1)
        if i < 4:
            feats.append(lrelu(y))
    return y * 0.2 + x


def _trunk(ps, x):
    fea = x
    for r in range(3):
        rx = fea
        for b in range(3):
            rx = _rdb5_naive(ps["rdbs"][r * 3 + b], rx)
        fea = rx * 0.2 + fea
    return ops.conv2d(fea, ps["tc"], None, 1, 1) + x


def _pack_w(w1, kind):
    ci, co = w1.shape[2], w1.shape[3]
    if kind == "grouped":
        return jnp.concatenate([w1, w1], axis=-1)
    wp = jnp.zeros((3, 3, 2 * ci, 2 * co), w1.dtype)
    wp = wp.at[:, :, :ci, :co].set(w1)
    return wp.at[:, :, ci:, co:].set(w1)


def _cat_packed(parts):
    """Concat per-image features of packed (N,H,W,2C_i) tensors: the packed
    layout is image-major per tensor ([a_img1 | a_img2]), so the packed
    concat interleaves slices: [a1 b1 ... | a2 b2 ...]."""
    img1 = [t[..., : t.shape[-1] // 2] for t in parts]
    img2 = [t[..., t.shape[-1] // 2:] for t in parts]
    return jnp.concatenate(img1 + img2, -1)


def _rdb5_packed(ws, x, kind):
    g = 2 if kind == "grouped" else 1
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    feats = [x]
    for i, w1 in enumerate(ws):
        xin = _cat_packed(feats) if i else x
        y = ops.conv2d(xin, _pack_w(w1, kind), None, 1, 1, groups=g)
        if i < 4:
            feats.append(lrelu(y))
    return y * 0.2 + x


def _trunk_packed(ps, x, kind):
    g = 2 if kind == "grouped" else 1
    fea = x
    for r in range(3):
        rx = fea
        for b in range(3):
            rx = _rdb5_packed(ps["rdbs"][r * 3 + b], rx, kind)
        fea = rx * 0.2 + fea
    return ops.conv2d(fea, _pack_w(ps["tc"], kind), None, 1, 1, groups=g) + x


def section_b():
    from srcgan_tpu.models.blocks import ResidualDenseBlock5, rdb5_schedule

    print("b) whole trunk (9 RDB5 + residuals + trunk_conv), bf16:")
    ps = _trunk_params()
    x8 = _rand((B, S, S, NF), 7)
    # packed: same 8 images as 4 samples x 2-image channels
    x4p = jnp.concatenate([x8[:4], x8[4:]], axis=-1)

    def run(label, fn, x):
        def make_chain(K):
            @jax.jit
            def chain(v, seed):
                def body(c, _):
                    y = fn(c)
                    return c + (0.0 * jnp.mean(y)).astype(c.dtype), jnp.mean(y)
                _, ys = jax.lax.scan(body, v + seed.astype(v.dtype),
                                     None, length=K)
                return jnp.sum(ys)
            return lambda s: float(chain(x, jnp.float32(s)))

        per = slope(make_chain, 1, 9, tries=3)
        print(f"  {label:42s} {per * 1e3:7.2f} ms")
        return per

    # equivalence check first (CPU-cheap, bf16 tolerances)
    y_ref = _trunk(ps, x8)
    for kind in ("grouped", "blockdiag"):
        y_p = _trunk_packed(ps, x4p, kind)
        y_un = jnp.concatenate([y_p[..., :NF], y_p[..., NF:]], axis=0)
        err = float(jnp.max(jnp.abs(y_un.astype(jnp.float32)
                                    - y_ref.astype(jnp.float32))))
        print(f"  packed-{kind} max|err| vs unpacked: {err:.3e}")

    run("naive unpacked @bs8 (baseline form)", lambda v: _trunk(ps, v), x8)
    run("packed grouped g2 @bs4",
        lambda v: _trunk_packed(ps, v, "grouped"), x4p)
    run("packed blockdiag @bs4",
        lambda v: _trunk_packed(ps, v, "blockdiag"), x4p)

    # production bar: the paired schedule through the real module
    blk = ResidualDenseBlock5(NF, GC)
    bp = [{f"conv{i+1}": {"w": ws[i]} for i in range(5)}
          for ws in ps["rdbs"]]

    def trunk_paired(v):
        fea = v
        with rdb5_schedule("paired"):
            for r in range(3):
                rx = fea
                for b in range(3):
                    rx = blk.forward(bp[r * 3 + b], rx, train=False)
                fea = rx * 0.2 + fea
        return ops.conv2d(fea, ps["tc"], None, 1, 1) + v

    run("paired unpacked @bs8 (PRODUCTION bar)", trunk_paired, x8)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    print(f"devices: {jax.devices()}")
    if "a" in which:
        section_a()
    if "b" in which:
        section_b()
