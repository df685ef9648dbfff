"""Deployment artifacts: serialize the fused cascade as StableHLO.

The reference's deployment story is "ship the .pth and the source tree"
(testCas.py re-instantiates the architecture by eval()-ing the checkpoint
filename).  A TPU-native framework can do better: `jax.export` lowers the
ENTIRE fused inference program (preprocessing + both networks + output
quantization, weights baked in as constants) to a single self-contained
StableHLO artifact that any JAX runtime of a compatible version can execute
without this package, its model code, or the checkpoint files.

  pred = CascadePredictor.from_checkpoints(ga, gb, bf16=True)
  blob = export_cascade(pred, h=128, w=128)          # symbolic batch dim
  open("cascade.shlo", "wb").write(blob)
  ...
  run = load_exported(open("cascade.shlo", "rb").read())
  sr_rgb_u8 = run(gray_u8)                            # any batch size

Notes:
  - the batch dimension is symbolic by default (`batch=None`): one artifact
    serves every batch size.  H/W stay concrete — conv SAME padding and the
    deconv output shapes are resolution-dependent, and serving already
    bucket-pads to fixed shapes.
  - `platforms=("tpu", "cpu")` cross-lowers from any host, so artifacts for
    the fleet can be produced on a CPU build machine.
  - the eval-tail Pallas kernel is traced out (`rddb.no_pallas_tail`):
    a Mosaic custom call would pin the artifact to one TPU generation;
    the pure-XLA folded tail is portable and within ~8% (docs/PERF.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def export_cascade(pred, h: int, w: int, c: int = 1, batch: int | None = None,
                   platforms=("tpu", "cpu")) -> bytes:
    """Serialize `pred`'s fused uint8->uint8 program; returns the artifact.

    pred: a CascadePredictor (weights are baked into the artifact).
    h, w, c: the compiled input resolution/channels (1 gray or 3 RGB-luma).
    batch: concrete batch size, or None for a symbolic batch dimension.
    platforms: lowering targets; a loader checks the artifact matches its
        runtime platform.
    """
    from jax import export as jx

    from srcgan_tpu.models import rddb

    if getattr(pred, "int8", False):
        # the int8 path runs through quant.quant_mode's scoped conv
        # dispatch, which this exporter does not trace — exporting would
        # silently bake the NON-quantized program into the artifact
        raise NotImplementedError(
            "export_cascade does not support int8 predictors; export the "
            "bf16/fp32 predictor instead")

    def f(gray_u8):
        return pred._run.__wrapped__(pred, pred.sr_params, pred.c_params,
                                     pred.sr_state, pred.c_state, gray_u8)

    if batch is None:
        (b,) = jx.symbolic_shape("b")
        shape = (b, h, w, c)
    else:
        shape = (batch, h, w, c)
    spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
    with rddb.no_pallas_tail():
        exp = jx.export(jax.jit(f), platforms=list(platforms))(spec)
    return bytes(exp.serialize())


def load_exported(blob: bytes):
    """Deserialize an `export_cascade` artifact into a callable.

    Returns `run(gray_u8) -> uint8 SR RGB`; executes through jax on the
    current default platform (which must be one of the artifact's lowering
    targets)."""
    from jax import export as jx

    exp = jx.deserialize(bytearray(blob))

    def run(gray_u8):
        return exp.call(jnp.asarray(gray_u8))

    run.exported = exp
    return run
