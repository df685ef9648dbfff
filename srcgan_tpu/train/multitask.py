"""Multi-task CycleGAN trainer — reference multi-task.py (net='2') parity.

Adds a third generator netG_C (SRDenseNetA 1->1 SR) in front of a pix2pix
ResnetGenerator colorization cycle:

  real_C = G_C(realA)            # SR'd gray, full resolution
  fake_B = G_A(real_C)           # colorize (resnet_9blocks, instance norm)
  recl_A = G_B(fake_B)           # back to gray
  fake_A = G_B(realB); recl_B = G_A(fake_A)

Reference quirks replicated deliberately (multi-task.py:331,339-340):
  - loss_G_C = MSE(G_C(realA), realB) is computed (broadcast gray-vs-RGB) and
    reported, but NOT added to loss_G — G_C still trains because optimizer_G
    chains its params and gradients flow through the fake_B/cycle path (:200);
  - cycle_A is anchored at real_C, not real_A (:335); D_B discriminates
    real_C vs fake_A (:307);
  - lambda_identity defaults to 0 (:371) — identity terms are off (the
    identity inputs the reference still computes are dead; XLA would DCE
    them, we skip them);
  - realB1 (downsampled gray) is prepared by the driver but never consumed
    (:410-415); accepted and ignored for API parity.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from srcgan_tpu import losses, models
from srcgan_tpu.train import optim
from srcgan_tpu.train.cyclegan import CycleState, ImagePool
from srcgan_tpu.train.state import TrainState


class MultiTaskTrainer:
    def __init__(self, mode: str = "x2", lr: float = 1e-4, d_lr: float = 1e-5,
                 beta1: float = 0.5, pool_size: int = 4,
                 lambda_identity: float = 0.0, lambda_a: float = 10.0,
                 lambda_b: float = 10.0, ngf: int = 64,
                 netG: str = "resnet_9blocks", norm: str = "instance",
                 gan_mode: str = "lsgan", lr_policy: str = "cosine",
                 num_epochs: int = 25, remat: bool = True, act_dtype=None,
                 pack_passes: bool = False):
        self.remat = remat
        # Batch same-net independent generator passes (g_a over
        # [real_C ; fake_A] — 5 passes -> 4).  Exact per-sample math for the
        # default nets (convs + instance norm, dropout off); BatchNorm
        # generators couple samples through batch stats, so norm='batch'
        # forces the sequential form.  Off by default: the analogous
        # CycleGAN packing measured SLOWER on v5e at the reference protocol
        # (docs/PERF.md "Pass-packed GAN generator step").
        self.pack_passes = pack_passes and norm != "batch"
        # act_dtype=jnp.bfloat16: bf16 compute/stored activations with fp32
        # master params (same pattern as CycleGANTrainer/CasTrainer)
        self.act_dtype = act_dtype
        self.mode = mode
        self.lr, self.d_lr = lr, d_lr
        self.lambda_identity = lambda_identity
        self.lambda_a, self.lambda_b = lambda_a, lambda_b
        self.gan_mode = gan_mode
        self.lr_policy, self.num_epochs = lr_policy, num_epochs

        self.netG_C = models.SRDenseNetA(1, 1, mode=mode, num_blocks=2,
                                         num_layers=2)
        self.netG_A = models.define_G(1, 3, ngf, netG, norm)
        self.netG_B = models.define_G(3, 1, ngf, netG, norm)
        if remat:
            # per-RRDB remat on THIS trainer's generators only (instance-
            # scoped; other models in the process are unaffected)
            from srcgan_tpu.models import blocks as _blocks
            for net in (self.netG_C, self.netG_A, self.netG_B):
                _blocks.set_trunk_remat(net, True)
        self.netD_A = models.NLayerDiscriminator(3, 64, 2)
        self.netD_B = models.NLayerDiscriminator(1, 64, 2)

        self.fake_A_pool = ImagePool(pool_size)
        self.fake_B_pool = ImagePool(pool_size)
        self.opt_g = optim.adam(lr, b1=beta1)
        self.opt_d = optim.adam(d_lr, b1=beta1)

    def init(self, key) -> CycleState:
        ka, kb, kc, kda, kdb = jax.random.split(key, 5)
        g_params = {"G_A": self.netG_A.init(ka), "G_B": self.netG_B.init(kb),
                    "G_C": self.netG_C.init(kc)}
        d_params = {"D_A": self.netD_A.init(kda), "D_B": self.netD_B.init(kdb)}
        d_state = {"D_A": self.netD_A.init_state(),
                   "D_B": self.netD_B.init_state()}
        return CycleState(
            g=TrainState(g_params, self.opt_g.init(g_params),
                         jnp.zeros((), jnp.int32)),
            d=TrainState(d_params, self.opt_d.init(d_params),
                         jnp.zeros((), jnp.int32)),
            d_model_state=d_state,
        )

    def lr_at_epoch(self, epoch: int):
        f = optim.reference_lr(self.lr_policy, 1.0, self.num_epochs, epoch)
        return self.lr * f, self.d_lr * f

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def g_step(self, state: CycleState, realA, realB, lr):
        if self.act_dtype is not None:
            realA = realA.astype(self.act_dtype)
            realB32 = realB
            realB = realB.astype(self.act_dtype)
        else:
            realB32 = realB

        def loss_fn(gp):
            def mk(net, p):
                if self.act_dtype is not None:
                    p = jax.tree_util.tree_map(
                        lambda a: a.astype(self.act_dtype), p)
                f = lambda prm, v: net.fwd(prm, v, train=True)
                return (lambda v: jax.checkpoint(f)(p, v)) if self.remat else (
                    lambda v: f(p, v))

            g_a = mk(self.netG_A, gp["G_A"])
            g_b = mk(self.netG_B, gp["G_B"])
            g_c = mk(self.netG_C, gp["G_C"])
            real_C = g_c(realA)
            if self.pack_passes:
                # g_a's two inputs (real_C from G_C, fake_A from G_B) are
                # mutually independent — batch them into one forward
                # (multi-task.py:239-277's five passes as four).
                n = realA.shape[0]
                fake_A = g_b(realB)
                out_a = g_a(jnp.concatenate([real_C, fake_A], 0))
                fake_B, recl_B = out_a[:n], out_a[n:]
                recl_A = g_b(fake_B)
            else:
                fake_B = g_a(real_C)
                recl_A = g_b(fake_B)
                fake_A = g_b(realB)
                recl_B = g_a(fake_A)

            # Ds run fp32 regardless of the generators' activation dtype
            # (same policy as CycleGANTrainer.g_step)
            pred_fake_B, _ = self.netD_A.apply(
                state.d.params["D_A"], fake_B.astype(jnp.float32),
                state=state.d_model_state["D_A"], train=True)
            pred_fake_A, _ = self.netD_B.apply(
                state.d.params["D_B"], fake_A.astype(jnp.float32),
                state=state.d_model_state["D_B"], train=True)
            loss_g_a = losses.gan_loss(pred_fake_B, True, self.gan_mode)
            loss_g_b = losses.gan_loss(pred_fake_A, True, self.gan_mode)
            loss_cycle_a = losses.l1(recl_A, real_C) * self.lambda_a * 0.5
            loss_cycle_b = losses.l1(recl_B, realB) * self.lambda_b * 0.5
            # reported-but-unused auxiliary SR loss (multi-task.py:331,:339-340)
            loss_g_c = losses.mse(
                jnp.broadcast_to(real_C, realB.shape).astype(jnp.float32),
                realB32)
            loss_g = loss_g_a + loss_g_b + loss_cycle_a + loss_cycle_b
            aux = {"real_C": real_C, "fake_A": fake_A, "fake_B": fake_B,
                   "recl_A": recl_A, "recl_B": recl_B,
                   "loss_G": loss_g, "loss_G_A": loss_g_a, "loss_G_B": loss_g_b,
                   "loss_G_C": jax.lax.stop_gradient(loss_g_c),
                   "loss_cycle_A": loss_cycle_a, "loss_cycle_B": loss_cycle_b}
            return loss_g, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.g.params)
        opt_state = optim.set_lr(state.g.opt_state, lr)
        updates, opt_state = self.opt_g.update(grads, opt_state, state.g.params)
        new_g = TrainState(optax.apply_updates(state.g.params, updates),
                           opt_state, state.g.step + 1)
        return CycleState(new_g, state.d, state.d_model_state), aux

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def d_step(self, state: CycleState, real_C, realB, fake_A_pooled,
               fake_B_pooled, lr):
        """D_A: realB vs pooled fake_B; D_B: real_C vs pooled fake_A
        (multi-task.py:307).  Ds always run fp32 (inputs may arrive bf16
        from a g_step with act_dtype set)."""
        real_C = real_C.astype(jnp.float32)
        realB = realB.astype(jnp.float32)
        fake_A_pooled = fake_A_pooled.astype(jnp.float32)
        fake_B_pooled = fake_B_pooled.astype(jnp.float32)

        def loss_fn(dp, dstate):
            new_state = {}

            def d_losses(net, p, st, real, fake):
                pred_real, st1 = net.apply(p, real, state=st, train=True)
                l_real = losses.gan_loss(pred_real, True, self.gan_mode)
                pred_fake, st2 = net.apply(p, jax.lax.stop_gradient(fake),
                                           state=st1, train=True)
                l_fake = losses.gan_loss(pred_fake, False, self.gan_mode)
                return (l_real + l_fake) * 0.5, st2

            l_da, new_state["D_A"] = d_losses(
                self.netD_A, dp["D_A"], dstate["D_A"], realB, fake_B_pooled)
            l_db, new_state["D_B"] = d_losses(
                self.netD_B, dp["D_B"], dstate["D_B"],
                jax.lax.stop_gradient(real_C), fake_A_pooled)
            return l_da + l_db, (l_da, l_db, new_state)

        (_, (l_da, l_db, d_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d.params, state.d_model_state)
        opt_state = optim.set_lr(state.d.opt_state, lr)
        updates, opt_state = self.opt_d.update(grads, opt_state, state.d.params)
        new_d = TrainState(optax.apply_updates(state.d.params, updates),
                           opt_state, state.d.step + 1)
        return (CycleState(state.g, new_d, d_mstate),
                {"loss_D_A": l_da, "loss_D_B": l_db})

    # -- device-side ImagePool (fused stateful-pool iteration) ---------------

    def device_pool_init(self, state: CycleState, realA, realB,
                         seed: int = 0):
        """Device pool state for gd_step_pooled — same layout and semantics
        as CycleGANTrainer.device_pool_init (buffer + fill count + PRNG key
        per pool); shapes via eval_shape, no compute."""
        shapes = jax.eval_shape(
            lambda st, a, b: {k: MultiTaskTrainer.g_step.__wrapped__(
                self, st, a, b, 1e-4)[1][k] for k in ("fake_A", "fake_B")},
            state, realA, realB)

        def buf(sh):
            return {"buf": jnp.zeros((self.fake_A_pool.pool_size,)
                                     + sh.shape[1:], sh.dtype),
                    "n": jnp.zeros((), jnp.int32)}

        return {"A": buf(shapes["fake_A"]), "B": buf(shapes["fake_B"]),
                "key": jax.random.PRNGKey(seed)}

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def gd_step_pooled(self, state: CycleState, pools, realA, realB,
                       g_lr, d_lr):
        """One fused program for the stateful-pool multi-task iteration:
        G update (three generators), device 50%-replace pool queries, D
        update on (real_C, pooled fakes) — the --device-pool path, mirroring
        CycleGANTrainer.gd_step_pooled."""
        from srcgan_tpu.train.cyclegan import CycleGANTrainer

        state, aux = MultiTaskTrainer.g_step.__wrapped__(
            self, state, realA, realB, g_lr)
        kA, kB, knext = jax.random.split(pools["key"], 3)
        poolA, fake_A = CycleGANTrainer._device_pool_query(
            pools["A"], jax.lax.stop_gradient(aux["fake_A"]), kA)
        poolB, fake_B = CycleGANTrainer._device_pool_query(
            pools["B"], jax.lax.stop_gradient(aux["fake_B"]), kB)
        state, dm = MultiTaskTrainer.d_step.__wrapped__(
            self, state, aux["real_C"], realB, fake_A, fake_B, d_lr)
        aux.update(dm)
        return state, {"A": poolA, "B": poolB, "key": knext}, aux

    def optimize_parameters(self, state: CycleState, realA, realB,
                            realB1=None, g_lr=None, d_lr=None):
        """realB1 accepted and ignored (multi-task.py prepares it unused)."""
        del realB1
        g_lr = self.lr if g_lr is None else g_lr
        d_lr = self.d_lr if d_lr is None else d_lr
        state, aux = self.g_step(state, realA, realB, g_lr)
        fake_A = self.fake_A_pool.query(np.asarray(aux["fake_A"]))
        fake_B = self.fake_B_pool.query(np.asarray(aux["fake_B"]))
        state, dm = self.d_step(state, aux["real_C"], realB,
                                jnp.asarray(fake_A), jnp.asarray(fake_B), d_lr)
        aux.update(dm)
        return state, aux
