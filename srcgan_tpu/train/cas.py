"""Cascaded SR -> colorization trainer (CasSRC).

Re-creation of the reference's four cascade pipelines as ONE fused jit step:
  trainCas.py         (bilinear 1/up degradation, RGB targets)
  trainCasConst.py    (const=True: down+up blur, full-size transfer)
  trainCasLAB.py      (lab=True: L-channel SR, ab-channel colorization)
  trainCasConstLAB.py (both)

Key structural fact exploited for TPU: the reference updates netG_A2C on
L1(SR(degrade(luma(B))), luma(B)) and netG_C2B on L1(C(luma(B)), B) — the second
stage consumes the CLEAN gray, not the SR output (trainCas.py:99-101), so the
two stages are data-independent and both gradients/updates compile into a
single XLA program with no sequencing constraint.  The zero-shot transfer and
PSNR validation (trainCas.py:103-131) run in the same program under
stop_gradient.

Both optimizer updates, the degradation replay, the transfer cascade and the
validation PSNRs form one jit-compiled function — zero host round-trips per
step.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from srcgan_tpu import losses, models
from srcgan_tpu.data import preprocess
from srcgan_tpu.train import optim
from srcgan_tpu.train.state import TrainState


class CasState(NamedTuple):
    sr: TrainState
    c: TrainState
    sr_model_state: Any
    c_model_state: Any


class CasTrainer:
    """Owns the two nets + optimizers; all compute is in pure jitted fns."""

    def __init__(self, sr_model: str = "ESPCN", c_model: str = "ResDeconv",
                 up: int = 2, lr: float = 1e-4, const: bool = False,
                 lab: bool = False, lr_policy: str = "cosine",
                 num_epochs: int = 50, remat: bool = False,
                 perceptual_params=None, perceptual_weight: float = 1.0,
                 act_dtype=None, fused_input: bool = False):
        self.sr_name, self.c_name = sr_model, c_model
        self.up, self.lr, self.const, self.lab = up, lr, const, lab
        self.lr_policy, self.num_epochs = lr_policy, num_epochs
        # remat=True wraps each network apply in jax.checkpoint — trades one
        # extra forward for activation memory; for large tiles / up=8.
        self.remat = remat
        # act_dtype=jnp.bfloat16: bf16 compute with fp32 master params (same
        # pattern as CycleGANTrainer) — params and inputs are cast per step,
        # the backward's saved residuals are stored bf16 (halving the
        # bandwidth the XLA cost model says dominates the step), grads flow
        # back through the cast to fp32 masters and the Adam update stays
        # fp32.  Losses/metrics are computed in fp32.
        self.act_dtype = act_dtype
        # Optional VGG16 perceptual term (reference losses.py:344-393) added
        # to both stage losses: loss = L1 + w * VGG16.  The frozen VGG params
        # are closed over (compiled as constants).  LAB targets are ab-only
        # 2-channel tensors the VGG trunk cannot consume — rejected.
        if perceptual_params is not None and lab:
            raise ValueError("--perceptual requires an RGB pipeline (the LAB "
                             "colorizer predicts 2-channel ab maps)")
        self.perceptual_params = perceptual_params
        self.perceptual_weight = perceptual_weight
        # fused_input: the uint8 steps derive (real_BC, real_BA) via the
        # Pallas preprocess kernel (ops/pallas/preprocess_kernel.py — one
        # VMEM pass: u8 decode + luma + MXU bilinear degrade) instead of
        # the XLA convert+luma+interpolate chain.  Exact math either way;
        # G2RGB non-const only (the kernel computes the bilinear 1/up
        # degradation of luma).
        if fused_input and (lab or const):
            raise ValueError("fused_input applies to the G2RGB non-const "
                             "uint8 input path only")
        self.fused_input = fused_input
        # trainCas.py:30-31 / trainCasLAB.py:31
        self.netG_A2C = models.create(sr_model, 1, 1, up)
        self.netG_C2B = models.create(c_model, 1, 2 if lab else 3)
        self.opt = optim.adam(lr)
        # the ZeRO-1 step re-implements this optimizer sharded; it reads the
        # hyperparameters from here so the two can never silently diverge
        self.adam_hparams = optim.ADAM_HPARAMS

    # -- setup ---------------------------------------------------------------

    def init(self, key) -> CasState:
        k1, k2 = jax.random.split(key)
        sr_params = self.netG_A2C.init(k1)
        c_params = self.netG_C2B.init(k2)
        return CasState(
            sr=TrainState(sr_params, self.opt.init(sr_params), jnp.zeros((), jnp.int32)),
            c=TrainState(c_params, self.opt.init(c_params), jnp.zeros((), jnp.int32)),
            sr_model_state=self.netG_A2C.init_state(),
            c_model_state=self.netG_C2B.init_state(),
        )

    def lr_at_epoch(self, epoch: int) -> float:
        return optim.reference_lr(self.lr_policy, self.lr, self.num_epochs, epoch)

    # -- the fused step ------------------------------------------------------

    def _split_targets(self, realB):
        """(SR target 1ch, colorization target)."""
        if self.lab:
            return realB[..., :1], realB[..., 1:]  # L, ab (trainCasLAB.py:83-84)
        return preprocess.luma(realB), realB  # trainCas.py:85-87

    def _degrade(self, x):
        if self.const:
            return preprocess.degrade_const(x, self.up)
        return preprocess.degrade_bilinear(x, self.up)

    def _stage_loss(self, pred, target, kd_target):
        """Per-stage training loss (hook: DistillTrainer blends in
        ``kd_target``, the frozen teacher's output, which is None here)."""
        loss = losses.l1(pred, target)
        if self.perceptual_params is not None:
            from srcgan_tpu import losses_vgg
            loss = loss + self.perceptual_weight * losses_vgg.vgg16_loss(
                self.perceptual_params, pred, target)
        return loss

    def _distill_targets(self, sr_in, c_in):
        """Hook: DistillTrainer returns the frozen teacher's per-stage
        outputs on the same inputs; the base trainer has no teacher."""
        return None, None

    def grads(self, state: CasState, realA, realB, precomputed=None):
        """Per-shard gradient computation (pure; no update).

        Returns (grads {sr, c}, model_states {sr, c}, metrics).  Split from
        the update so the data-parallel wrapper can psum grads across the
        mesh before applying them (srcgan_tpu.parallel.dp).
        ``precomputed``: optional (real_BC, real_BA) pair from the fused
        Pallas preprocess kernel (fused_input); realB is then the stage-2
        target directly.
        """
        if precomputed is not None:
            real_BC, real_BA = precomputed
            tgt_B = realB
        else:
            real_BC, tgt_B = self._split_targets(realB)
            real_BA = self._degrade(real_BC)
        sr_in, c_in = real_BA, real_BC
        if self.act_dtype is not None:
            sr_in = sr_in.astype(self.act_dtype)
            c_in = c_in.astype(self.act_dtype)

        def _apply(net, p, v, st):
            if self.act_dtype is not None:
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(self.act_dtype), p)
            f = lambda p_, v_: net.apply(p_, v_, state=st, train=True)
            y, st2 = jax.checkpoint(f)(p, v) if self.remat else f(p, v)
            return y.astype(jnp.float32), st2

        kd_sr, kd_c = self._distill_targets(sr_in, c_in)

        def sr_loss(p, st):
            fake_BC, st2 = _apply(self.netG_A2C, p, sr_in, st)
            return self._stage_loss(fake_BC, real_BC, kd_sr), (fake_BC, st2)

        (loss_sr, (fake_BC, sr_mstate)), g_sr = jax.value_and_grad(
            sr_loss, has_aux=True)(state.sr.params, state.sr_model_state)

        def c_loss(p, st):
            fake_BB, st2 = _apply(self.netG_C2B, p, c_in, st)
            return self._stage_loss(fake_BB, tgt_B, kd_c), (fake_BB, st2)

        (loss_c, (fake_BB, c_mstate)), g_c = jax.value_and_grad(
            c_loss, has_aux=True)(state.c.params, state.c_model_state)

        metrics = {
            "loss_SR": loss_sr,
            "loss_C": loss_c,
            # validate() (trainCas.py:124-131): PSNR on this step's outputs
            "psnr_SR": losses.psnr(jax.lax.stop_gradient(fake_BC), real_BC),
            "psnr_C": losses.psnr(jax.lax.stop_gradient(fake_BB), tgt_B),
        }
        return {"sr": g_sr, "c": g_c}, {"sr": sr_mstate, "c": c_mstate}, metrics

    def apply_grads(self, state: CasState, grads, model_states, lr) -> CasState:
        def update(ts: TrainState, g) -> TrainState:
            opt_state = optim.set_lr(ts.opt_state, lr)
            updates, opt_state = self.opt.update(g, opt_state, ts.params)
            return TrainState(optax.apply_updates(ts.params, updates),
                              opt_state, ts.step + 1)

        return CasState(update(state.sr, grads["sr"]), update(state.c, grads["c"]),
                        model_states["sr"], model_states["c"])

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: CasState, realA, realB, lr
                   ) -> Tuple[CasState, Dict[str, jnp.ndarray]]:
        """One optimization step on a (realA gray, realB target) batch.

        realA: (N,H,W,1) source-domain gray; realB: (N,H,W,3) RGB or norm-LAB.
        Returns (new_state, metrics { loss_SR, loss_C, psnr_SR, psnr_C }).
        """
        grads, mstates, metrics = self.grads(state, realA, realB)
        return self.apply_grads(state, grads, mstates, lr), metrics

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def train_step_ema(self, state: CasState, ema, realA, realB, lr, decay
                       ) -> Tuple[CasState, Any, Dict[str, jnp.ndarray]]:
        """train_step fused with an exponential moving average of the
        weights (ESRGAN-style eval weights: the EMA copy is what you ship;
        it smooths the adversarial/last-batch jitter out of checkpoints).

        ``ema`` is a {"sr": params, "c": params} tree (init with ema_init).
        One program — the EMA update rides the step's dispatch instead of
        paying a second host->device round-trip per iteration.
        """
        new_state, metrics = self.train_step.__wrapped__(
            self, state, realA, realB, lr)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, ema,
            {"sr": new_state.sr.params, "c": new_state.c.params})
        return new_state, new_ema, metrics

    def ema_init(self, state: CasState):
        """Fresh EMA tree seeded from the current weights."""
        return jax.tree_util.tree_map(
            jnp.array, {"sr": state.sr.params, "c": state.c.params})

    @partial(jax.jit, static_argnums=(0, 5), donate_argnums=1)
    def train_step_accum(self, state: CasState, realA, realB, lr,
                         microbatches: int
                         ) -> Tuple[CasState, Dict[str, jnp.ndarray]]:
        """One optimization step with gradient accumulation.

        Splits the batch into ``microbatches`` equal chunks, runs
        forward/backward per chunk under lax.scan (so only ONE chunk's
        activations are live at a time — peak memory of a batch/k step),
        averages the gradients and metrics, and applies a single Adam
        update.  Mathematically identical to train_step on the full batch
        for the L1 losses (mean-of-means with equal chunks), so large
        effective batches fit a 16 GB chip without remat's recompute cost.
        Composes with act_dtype (grads leave each chunk fp32).
        """
        n = realA.shape[0]
        if n % microbatches:
            raise ValueError(f"batch {n} not divisible by {microbatches}")
        m = n // microbatches
        chunksA = realA.reshape(microbatches, m, *realA.shape[1:])
        chunksB = realB.reshape(microbatches, m, *realB.shape[1:])

        def body(carry, chunk):
            g_acc, ms_any, met_acc = carry
            a, b = chunk
            g, mstates, met = self.grads(state, a, b)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            met_acc = jax.tree_util.tree_map(jnp.add, met_acc, met)
            return (g_acc, mstates, met_acc), 0.0

        zero_g = jax.tree_util.tree_map(
            jnp.zeros_like, {"sr": state.sr.params, "c": state.c.params})
        zero_m = {"loss_SR": jnp.zeros(()), "loss_C": jnp.zeros(()),
                  "psnr_SR": jnp.zeros(()), "psnr_C": jnp.zeros(())}
        init_ms = {"sr": state.sr_model_state, "c": state.c_model_state}
        (g, mstates, met), _ = jax.lax.scan(
            body, (zero_g, init_ms, zero_m), (chunksA, chunksB))
        inv = 1.0 / microbatches
        g = jax.tree_util.tree_map(lambda x: x * inv, g)
        met = jax.tree_util.tree_map(lambda x: x * inv, met)
        return self.apply_grads(state, g, mstates, lr), met

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_steps_u8(self, state: CasState, src_u8_k, tar_u8_k, lr
                       ) -> Tuple[CasState, Dict[str, jnp.ndarray]]:
        """K optimization steps in ONE compiled program (lax.scan), on the
        uint8 fused-preprocessing input path.

        ``src_u8_k``/``tar_u8_k`` carry a leading steps axis (K, N, H, W, C):
        K (src, tar) uint8 batches cross host->HBM as one 4x-compressed
        block, decode/normalize/colourspace run inside the scan body (fused
        into each step's first convs), and the state threads through K
        sequential updates — so a host loop pays ONE dispatch + one metrics
        sync per K steps (the CLI's --steps-per-dispatch).  Within an epoch
        the reference holds lr constant (trainCas.py:45-61 steps the
        scheduler once per epoch), so a scalar lr is exact.  Metrics come
        back stacked per step, shape (K,)."""
        ver = "G2LAB" if self.lab else "G2RGB"

        def body(st, batch):
            s, t = batch
            realA, realB, pre = self._u8_inputs(s, t, ver)
            grads, mstates, metrics = self.grads(st, realA, realB,
                                                 precomputed=pre)
            return self.apply_grads(st, grads, mstates, lr), metrics

        return jax.lax.scan(body, state, (src_u8_k, tar_u8_k))

    def _u8_inputs(self, src_u8, tar_u8, ver):
        """(realA, realB, precomputed) for the uint8 steps; fused_input
        routes the gray+degrade chain through the Pallas kernel."""
        if self.fused_input:
            import jax as _jax

            from srcgan_tpu.ops.pallas.preprocess_kernel import (
                fused_gray_degrade)

            interpret = _jax.devices()[0].platform != "tpu"
            real_BC, real_BA = fused_gray_degrade(tar_u8, self.up,
                                                  interpret=interpret)
            realB = tar_u8.astype(jnp.float32) / 255.0
            return realB, realB, (real_BC, real_BA)
        realA, realB = preprocess.convert_pair(src_u8, tar_u8, ver)
        return realA, realB, None

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step_u8(self, state: CasState, src_u8, tar_u8, lr):
        """uint8-input step: decode/normalize/colourspace happen INSIDE the
        same XLA program as the model step — uint8 batches cross host->HBM
        (4x smaller than fp32) and the preprocessing fuses into the first
        convs with no extra dispatch."""
        realA, realB, pre = self._u8_inputs(
            src_u8, tar_u8, "G2LAB" if self.lab else "G2RGB")
        grads, mstates, metrics = self.grads(state, realA, realB,
                                             precomputed=pre)
        return self.apply_grads(state, grads, mstates, lr), metrics

    # -- transfer / eval cascade (trainCas.py:103-109, testCas protocol) -----

    @partial(jax.jit, static_argnums=0)
    def transfer(self, state: CasState, realA):
        """Zero-shot source-domain cascade in eval mode.

        bilinear-degrades realA (const pipelines keep full size,
        trainCasConst.py:104-106) then runs SR -> colorize.
        Returns (real_A_in, fake_AC, fake_AB).
        """
        if self.const:
            real_A_in = realA
        else:
            real_A_in = preprocess.degrade_bilinear(realA, self.up)
        fake_AC, _ = self.netG_A2C.apply(state.sr.params, real_A_in,
                                         state=state.sr_model_state, train=False)
        fake_AB, _ = self.netG_C2B.apply(state.c.params,
                                         jax.lax.stop_gradient(fake_AC),
                                         state=state.c_model_state, train=False)
        return real_A_in, fake_AC, fake_AB

    @partial(jax.jit, static_argnums=0)
    def snapshot(self, state: CasState, realA, realB):
        """Recompute the logged image set (trainCas.py:208-217) in eval mode."""
        real_BC, tgt_B = self._split_targets(realB)
        real_BA = self._degrade(real_BC)
        fake_BC, _ = self.netG_A2C.apply(state.sr.params, real_BA,
                                         state=state.sr_model_state, train=False)
        fake_BB, _ = self.netG_C2B.apply(state.c.params, real_BC,
                                         state=state.c_model_state, train=False)
        real_A_in, fake_AC, fake_AB = self.transfer(state, realA)
        return {"real_A": real_A_in, "fake_AC": fake_AC, "fake_AB": fake_AB,
                "real_BA": real_BA, "real_BC": real_BC, "real_B": realB,
                "fake_BC": fake_BC, "fake_BB": fake_BB}
