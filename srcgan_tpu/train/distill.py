"""Knowledge distillation for the cascaded pipeline.

The flagship generator (RDDBNet, rddb.py:85-114) costs ~2.3x an ESPCN
forward on TPU (docs/PERF.md conv tables); distillation transfers its
quality into a cheaper student for serving.  The reference has no
compression tooling at all (checkpoints are trained once and served
as-is, trainCas.py:221-225 / testCas.py:41-58) — this closes that gap
the standard way: train the student on a convex blend of the ground
truth and a frozen teacher's outputs,

    loss_stage = alpha * L1(student, target) + (1-alpha) * L1(student, teacher)

per cascade stage (SR and colorizer), with the teacher run in eval mode
under ``stop_gradient`` inside the SAME fused jit step — the teacher
forward adds zero dispatches and stores no residuals.

``DistillTrainer`` subclasses CasTrainer and overrides only the two loss
hooks (`_distill_targets`, `_stage_loss`), so every production feature
composes unchanged: --bf16-acts (the teacher runs in the same activation
dtype), --mesh-size DP / --zero-opt / --space-size (the parallel wrappers
all funnel through ``grads``), --steps-per-dispatch, --ema-decay,
--grad-accum, resume, retention.  At ``alpha=1`` the step is exactly
CasTrainer's (gradient-equivalence tested).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from srcgan_tpu import losses
from srcgan_tpu.train.cas import CasTrainer


class DistillTrainer(CasTrainer):
    """CasTrainer + a frozen teacher cascade blended into both stage losses.

    teacher_sr / teacher_c: model objects (srcgan_tpu.nn.Module) for the
    teacher's SR and colorizer stages; params/state are the trained weights
    (frozen — they live outside the optimized CasState and are closed over
    by the jit'd step as compile-time constants).
    """

    def __init__(self, teacher_sr, teacher_sr_params, teacher_c,
                 teacher_c_params, alpha: float = 0.5,
                 teacher_sr_state=None, teacher_c_state=None, **cas_kwargs):
        super().__init__(**cas_kwargs)
        if not 0.0 <= alpha <= 1.0:
            raise ValueError(f"alpha must be in [0, 1], got {alpha}")
        self.alpha = float(alpha)
        self.teacher_sr, self.teacher_c = teacher_sr, teacher_c
        self.teacher_sr_state = teacher_sr_state
        self.teacher_c_state = teacher_c_state
        if self.act_dtype is not None:
            # the teacher is frozen: cast once at construction instead of
            # per-step (no fp32 masters needed — nothing updates it)
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(self.act_dtype)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                t)
            teacher_sr_params = cast(teacher_sr_params)
            teacher_c_params = cast(teacher_c_params)
        self.teacher_sr_params = teacher_sr_params
        self.teacher_c_params = teacher_c_params

    @classmethod
    def from_checkpoints(cls, netGA_path: str, netGB_path: str,
                         alpha: float = 0.5, **cas_kwargs):
        """Build from teacher checkpoint files (.npz ours / .pth reference),
        rebuilding the teacher architectures from the name-encoded config
        (testCas.py:41-53 convention) and validating them against the
        student pipeline (up factor, RGB/LAB target space)."""
        from srcgan_tpu.weightspace import load_checkpoint_model

        sr_model, sr_params, sr_state, sr_info = load_checkpoint_model(
            netGA_path)
        c_model, c_params, c_state, c_info = load_checkpoint_model(netGB_path)
        if sr_info["role"] != "A2C" or c_info["role"] != "C2B":
            raise ValueError(
                f"teacher checkpoints must be an (A2C, C2B) pair; got "
                f"{sr_info['role']} + {c_info['role']}")
        up = cas_kwargs.get("up", 2)
        lab = bool(cas_kwargs.get("lab", False))
        const = bool(cas_kwargs.get("const", False))
        # const pipelines run resolution-preserving SR nets; a scale-up
        # teacher would emit the wrong spatial shape for the student's L1
        if not const and sr_info["up"] != up:
            raise ValueError(
                f"teacher SR checkpoint is x{sr_info['up']} but the student "
                f"pipeline is x{up}")
        if (sr_info["ver"] == "G2LAB") != lab:
            raise ValueError(
                f"teacher is a {sr_info['ver'] or 'G2RGB'} checkpoint but "
                f"the student pipeline is {'G2LAB' if lab else 'G2RGB'}")
        return cls(sr_model, sr_params, c_model, c_params, alpha=alpha,
                   teacher_sr_state=sr_state, teacher_c_state=c_state,
                   **cas_kwargs)

    # -- the two hooks ---------------------------------------------------

    def _distill_targets(self, sr_in, c_in):
        """Frozen-teacher outputs on the step's (already degraded, already
        act_dtype-cast) stage inputs, eval mode, gradients cut."""
        if self.alpha == 1.0:  # pure supervision: skip the teacher entirely
            return None, None
        y_sr, _ = self.teacher_sr.apply(self.teacher_sr_params, sr_in,
                                        state=self.teacher_sr_state,
                                        train=False)
        y_c, _ = self.teacher_c.apply(self.teacher_c_params, c_in,
                                      state=self.teacher_c_state, train=False)
        return (jax.lax.stop_gradient(y_sr.astype(jnp.float32)),
                jax.lax.stop_gradient(y_c.astype(jnp.float32)))

    def _stage_loss(self, pred, target, kd_target):
        supervised = super()._stage_loss(pred, target, None)
        if kd_target is None:  # alpha == 1: bitwise the CasTrainer step
            return supervised
        return (self.alpha * supervised
                + (1.0 - self.alpha) * losses.l1(pred, kd_target))
