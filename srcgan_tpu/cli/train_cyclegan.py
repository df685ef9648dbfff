"""CycleGAN SR training driver — train.py parity.

  python -m srcgan_tpu.cli.train_cyclegan --net 1 --mode x2

net='1' (the reference default, train.py:360): RGB<->RGB cycle where realA is a
0.5x nearest downsample of the target (train.py:380-382).  net='SRdens' uses
the SRDenseNet pair; any other value uses the gray<->RGB RDDB pair.
"""
from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="CycleGAN SR training")
    p.add_argument("--net", type=str, default="1")
    p.add_argument("--mode", type=str, default="x2", choices=["x2", "x4"])
    p.add_argument("--root", type=str, default=None,
                   help="dataset root (default Sat2Aer<mode>)")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num-epochs", type=int, default=25)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--pool-size", type=int, default=4)
    p.add_argument("--save-every", type=int, default=5)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--checkpoints", type=str, default="./checkpoints")
    p.add_argument("--bf16-acts", action="store_true",
                   help="bf16 activations with fp32 master params (halves the "
                        "six-pass backward memory; enables larger batches)")
    p.add_argument("--no-remat", action="store_true",
                   help="disable per-pass rematerialization: ~1.6x faster "
                        "iterations, but the six-pass backward must fit HBM "
                        "(it does below batch ~3 at 256^2 on a 16 GB chip)")
    p.add_argument("--pack-passes", action="store_true",
                   help="batch same-net independent generator passes into "
                        "one forward (6 passes -> 3; exact math).  Measured "
                        "SLOWER on v5e at the reference's 256^2 protocol "
                        "(docs/PERF.md) — opt-in for small-image regimes")
    p.add_argument("--eval-after-save", action="store_true",
                   help="run the eval driver on each saved checkpoint pair "
                        "(train.py:406-412 spawns test.py via os.system after "
                        "every save; here in-process, same protocol)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="maintain an exponential moving average of the "
                        "generator weights (e.g. 0.999) and save it under "
                        "<checkpoints>/ema/ — the eval/shipping copy")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--run-dir", type=str, default="runs/latest",
                   help="per-run log dir: loss history (losses.jsonl) + "
                        "live image windows (Visdom-window-per-name PNGs)")
    p.add_argument("--augment", action="store_true",
                   help="random per-sample D4 rotation/flip applied to both "
                        "images of each training pair (deterministic per "
                        "--seed/epoch; beyond-reference data augmentation)")
    p.add_argument("--perceptual", type=str, default=None,
                   help="VGG16 weights (.npz from convert_vgg or torchvision "
                        ".pth) adding a perceptual term on the cycle "
                        "reconstructions; 'random' = untrained VGG (testing)")
    p.add_argument("--perceptual-weight", type=float, default=1.0)
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="run K fused G+D iterations per device dispatch "
                        "(lax.scan inside one jit program; requires "
                        "--pool-size 0, where the fused iteration is exact) "
                        "— one dispatch + one host sync per K iterations")
    p.add_argument("--zero-opt", action="store_true",
                   help="with --mesh-size: ZeRO-1 sharded Adam moments for "
                        "G AND D (8/D bytes/param of optimizer state at "
                        "rest); requires --pool-size 0 (the fused G+D "
                        "program), composes without --ema-decay/"
                        "--device-pool/--steps-per-dispatch")
    p.add_argument("--resume", action="store_true",
                   help="resume from <checkpoints>/cyclestate_latest.npz "
                        "(full G+D state: params + Adam moments + epoch; the "
                        "tiny host-side ImagePool restarts empty and rewarms "
                        "in pool_size iterations)")
    p.add_argument("--device-pool", action="store_true",
                   help="run the ImagePool ON DEVICE: G update, both 50%%-"
                        "replace pool queries and the D update fuse into ONE "
                        "program per iteration (no fake-image D2H/H2D hop). "
                        "Same sampling distribution as the host pool, "
                        "jax.random stream instead of python random; "
                        "single-device, pool-size > 0")
    p.add_argument("--mesh-size", type=int, default=0,
                   help="data-parallel devices (0/1 = single device): GSPMD "
                        "batch sharding with replicated G+D state; the "
                        "PatchGAN's BatchNorm stats stay global-batch "
                        "(equivalence-tested in tests/test_parallel.py). "
                        "Composes with --steps-per-dispatch.")
    from srcgan_tpu.utils.live import add_live_flag
    add_live_flag(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    # Preemption safety, as in train_cas: register before any slow compile;
    # the loop checks the flag per step and persists full state on SIGTERM.
    # The finally restores the previous handler on every exit path (incl.
    # the non-finite-loss RuntimeError).
    import signal

    preempted = {"flag": False}
    prev_handler = signal.signal(signal.SIGTERM,
                                 lambda s_, f_: preempted.update(flag=True))
    from srcgan_tpu.utils import live as live_mod
    live = live_mod.maybe_start(args, run_dir=args.run_dir)
    try:
        return _run(args, preempted)
    finally:
        if live is not None:
            live.stop()
        signal.signal(signal.SIGTERM, prev_handler)


def _run(args, preempted):
    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from srcgan_tpu import data, ops
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.train import CycleGANTrainer, save_params
    from srcgan_tpu.train.state import load_train_state, save_train_state
    from srcgan_tpu.utils import Logger

    root = args.root or f"Sat2Aer{args.mode}"
    from srcgan_tpu.cli.train_cas import load_perceptual
    trainer = CycleGANTrainer(net=args.net, mode=args.mode, lr=args.lr,
                              pool_size=args.pool_size,
                              num_epochs=args.num_epochs,
                              act_dtype=jnp.bfloat16 if args.bf16_acts else None,
                              remat=not args.no_remat,
                              pack_passes=args.pack_passes,
                              perceptual_params=load_perceptual(args.perceptual),
                              perceptual_weight=args.perceptual_weight)
    state = trainer.init(jax.random.PRNGKey(args.seed))
    ema = trainer.ema_init(state) if args.ema_decay > 0 else None
    zero_mesh = None
    if args.zero_opt:
        # ZeRO-1 for the GAN: G and D Adam moments row-sharded at rest.
        # The state template changes shape, so convert BEFORE the resume
        # load (load_train_state matches against the template).
        if args.mesh_size <= 1:
            raise SystemExit("--zero-opt requires --mesh-size > 1")
        if (args.pool_size != 0 or args.device_pool or args.ema_decay > 0
                or args.steps_per_dispatch > 1):
            raise SystemExit("--zero-opt requires --pool-size 0 (the fused "
                             "G+D program) and composes without --ema-decay/"
                             "--device-pool/--steps-per-dispatch")
        from srcgan_tpu import parallel
        zero_mesh = parallel.make_mesh((args.mesh_size,), ("data",))
        state = parallel.zero1_gd_from_state(state, zero_mesh)
    start_epoch = 1
    state_path = os.path.join(args.checkpoints, "cyclestate_latest.npz")
    if args.resume and os.path.exists(state_path):
        state, extra = load_train_state(state_path, state)
        if zero_mesh is not None:
            from srcgan_tpu import parallel
            state = parallel.zero1_gd_put(state, zero_mesh)
        start_epoch = int(extra.get("epoch", 0)) + 1
        print(f"resumed from {state_path} at epoch {start_epoch}")
        if ema is not None:
            # re-seed from the RESTORED generators — ema above was built
            # from the fresh random init, and high decay would keep that
            # garbage in the eval weights for ~1/(1-decay) steps
            ema = trainer.ema_init(state)

    def _preempt_save(epoch):
        os.makedirs(args.checkpoints, exist_ok=True)
        save_train_state(state_path, jax.device_get(state),
                         extra={"epoch": epoch - 1})  # redo this epoch
        print(f"\nSIGTERM: train state saved to {state_path} "
              f"(resume with --resume); exiting")

    def _save_epoch(epoch):
        # reads the loop-current `state`/`ema` bindings (closure over _run)
        os.makedirs(args.checkpoints, exist_ok=True)
        netGA = os.path.join(args.checkpoints,
                             f"netG_A2B_SRtask_{args.mode}_{epoch:04d}.npz")
        netGB = os.path.join(args.checkpoints,
                             f"netG_B2A_SRtask_{args.mode}_{epoch:04d}.npz")
        save_params(netGA, jax.device_get(state.g.params["G_A"]))
        save_params(netGB, jax.device_get(state.g.params["G_B"]))
        if ema is not None:
            ema_dir = os.path.join(args.checkpoints, "ema")
            os.makedirs(ema_dir, exist_ok=True)
            save_params(os.path.join(ema_dir, os.path.basename(netGA)),
                        jax.device_get(ema["G_A"]))
            save_params(os.path.join(ema_dir, os.path.basename(netGB)),
                        jax.device_get(ema["G_B"]))
        save_train_state(state_path, jax.device_get(state),
                         extra={"epoch": epoch})
        print(f"\nsaved {netGA} {netGB} (+ resume state)")
        if args.eval_after_save:
            from srcgan_tpu.cli import test_cyclegan
            ev = ["--netGA", netGA, "--netGB", netGB, "--net", args.net]
            if args.root:
                ev += ["--root", args.root]
            if args.data_dir:
                ev += ["--data-dir", args.data_dir]
            test_cyclegan.main(ev)

    if args.steps_per_dispatch > 1:
        if args.ema_decay > 0:
            raise SystemExit("--steps-per-dispatch composes without "
                             "--ema-decay")
        if args.pool_size != 0 and not args.device_pool:
            raise SystemExit("--steps-per-dispatch requires --pool-size 0 "
                             "(the pass-through pool makes the fused K-step "
                             "program exact) or --device-pool (the pool "
                             "state rides the scan carry)")

    if args.device_pool and (args.pool_size <= 0 or args.mesh_size > 1):
        raise SystemExit("--device-pool needs --pool-size > 0 and a single "
                         "device (--ema-decay and --steps-per-dispatch "
                         "compose)")
    pool_state = None  # lazily built from the first batch's shapes

    mesh = None
    b_shard = blk_shard = None
    zero_step = None
    if args.mesh_size > 1:
        # GSPMD data parallelism: batch-sharded inputs + replicated state;
        # XLA inserts the gradient psums AND the cross-shard reductions that
        # keep the PatchGAN's BatchNorm statistics global-batch
        # (tests/test_parallel.py::TestCycleGANDP proves equivalence).
        if args.ema_decay > 0:
            raise SystemExit("--ema-decay composes with the single-device "
                             "step only")
        if args.batch_size % args.mesh_size:
            raise SystemExit("--mesh-size needs --batch-size divisible by "
                             "the mesh")
        from jax.sharding import NamedSharding, PartitionSpec

        from srcgan_tpu import parallel
        mesh = zero_mesh or parallel.make_mesh((args.mesh_size,), ("data",))
        b_shard = parallel.batch_sharding(mesh)
        blk_shard = NamedSharding(mesh, PartitionSpec(None, "data"))
        if args.zero_opt:
            zero_step = parallel.make_gd_zero1_step(trainer, mesh)
        else:
            state = parallel.put_replicated(state, mesh)

    trainset = data.FileListDataset(root, "train", "G2RGB", args.data_dir)
    print(f"Starting Training Loop... ({len(trainset)} samples, net={args.net})")
    logger = Logger(len(trainset), args.num_epochs, image_dir=args.run_dir)

    for epoch in range(start_epoch, args.num_epochs + 1):
        g_lr, d_lr = trainer.lr_at_epoch(epoch)
        if args.steps_per_dispatch > 1:
            # K fused G+D iterations per dispatch: stacked uint8 blocks
            # scanned on device (gd_steps_u8); scalar losses come back per
            # step, images from the block's last step (used for any log
            # rows inside the block — the freshest sample available).
            from srcgan_tpu.cli.train_cas import _stacked_blocks
            it = -1  # the per-step loop below enumerates from 0
            for src_blk, tar_blk in preprocess.device_put_iter(
                    _stacked_blocks(
                        data.batches(trainset, args.batch_size, shuffle=True,
                                     seed=args.seed, epoch=epoch,
                                     augment=args.augment,
                                     drop_last=mesh is not None),
                        args.steps_per_dispatch), sharding=blk_shard):
                if args.device_pool:
                    if pool_state is None:
                        # pool buffers are sized from the first batch's
                        # converted shapes (exactly the shapes the scan
                        # body produces)
                        srcA0, realB0 = preprocess.convert_pair(
                            src_blk[0], tar_blk[0], "G2RGB")
                        realA0 = (ops.interpolate(
                            realB0, scale_factor=1.0 / trainer.scale,
                            mode="nearest")
                                  if args.net == "1" else srcA0)
                        pool_state = trainer.device_pool_init(
                            state, realA0, realB0, seed=args.seed)
                    state, pool_state, imgs, rows = trainer.gd_steps_pooled_u8(
                        state, pool_state, src_blk, tar_blk, g_lr, d_lr)
                else:
                    state, imgs, rows = trainer.gd_steps_u8(
                        state, src_blk, tar_blk, g_lr, d_lr)
                if preempted["flag"]:
                    _preempt_save(epoch)
                    return state
                rows = {k: np.asarray(v) for k, v in rows.items()}
                for j in range(int(src_blk.shape[0])):
                    it += 1
                    if not np.isfinite(float(rows["loss_G"][j])):
                        raise RuntimeError(
                            f"non-finite generator loss at epoch {epoch} it "
                            f"{it}; restart with --resume to restore from "
                            f"{state_path}")
                    if it % args.log_every == 0:
                        logger.log(
                            nepoch=epoch, niter=it,
                            losses={
                                "loss_G": float(rows["loss_G"][j]),
                                "loss_G_identity":
                                    float(rows["loss_iden_A"][j])
                                    + float(rows["loss_iden_B"][j]),
                                "loss_G_GAN": float(rows["loss_G_A"][j])
                                + float(rows["loss_G_B"][j]),
                                "loss_G_cycle": float(rows["loss_cycle_A"][j])
                                + float(rows["loss_cycle_B"][j]),
                                "loss_D": float(rows["loss_D_A"][j])
                                + float(rows["loss_D_B"][j]),
                            },
                            images=imgs)
            if epoch % args.save_every == 0:
                _save_epoch(epoch)
            continue
        for it, (src_u8, tar_u8, _) in enumerate(
                data.batches(trainset, args.batch_size, shuffle=True,
                             seed=args.seed, epoch=epoch,
                             augment=args.augment,
                             drop_last=mesh is not None)):
            if mesh is not None:
                # shard the uint8 batch BEFORE the on-device conversion so
                # decode/normalize and everything downstream run sharded
                src_u8 = jax.device_put(np.asarray(src_u8), b_shard)
                tar_u8 = jax.device_put(np.asarray(tar_u8), b_shard)
            srcA, realB = preprocess.convert_pair(
                jnp.asarray(src_u8), jnp.asarray(tar_u8), "G2RGB")
            if args.net == "1":
                # realA = nearest downsample of the RGB target by the
                # generator scale (reference train.py:380-382 hardcodes
                # 0.5x — its net='1' protocol is x2-only)
                realA = ops.interpolate(realB,
                                        scale_factor=1.0 / trainer.scale,
                                        mode="nearest")
            else:
                realA = srcA
            if args.device_pool:
                if pool_state is None:
                    pool_state = trainer.device_pool_init(
                        state, realA, realB, seed=args.seed)
                if ema is not None:
                    state, pool_state, ema, aux = trainer.gd_step_pooled_ema(
                        state, pool_state, ema, realA, realB, g_lr, d_lr,
                        args.ema_decay)
                else:
                    state, pool_state, aux = trainer.gd_step_pooled(
                        state, pool_state, realA, realB, g_lr, d_lr)
            elif ema is not None:
                state, ema, aux = trainer.optimize_parameters(
                    state, realA, realB, g_lr, d_lr, ema=ema,
                    ema_decay=args.ema_decay)
            elif zero_step is not None:
                state, aux = zero_step(state, realA, realB, g_lr, d_lr)
            else:
                state, aux = trainer.optimize_parameters(state, realA, realB,
                                                         g_lr, d_lr)
            if preempted["flag"]:
                _preempt_save(epoch)
                return state
            loss_now = float(aux["loss_G"])
            if not np.isfinite(loss_now):
                # failure detection (SURVEY.md §5.3), as in train_cas
                raise RuntimeError(
                    f"non-finite generator loss at epoch {epoch} it {it}; "
                    f"restart with --resume to restore from {state_path}")
            if it % args.log_every == 0:
                logger.log(
                    nepoch=epoch, niter=it,
                    losses={
                        "loss_G": float(aux["loss_G"]),
                        "loss_G_identity": float(aux["loss_iden_A"])
                        + float(aux["loss_iden_B"]),
                        "loss_G_GAN": float(aux["loss_G_A"])
                        + float(aux["loss_G_B"]),
                        "loss_G_cycle": float(aux["loss_cycle_A"])
                        + float(aux["loss_cycle_B"]),
                        "loss_D": float(aux["loss_D_A"]) + float(aux["loss_D_B"]),
                    },
                    images={k: aux[k] for k in
                            ("fake_A", "fake_B", "recl_A", "recl_B",
                             "iden_A", "iden_B", "B2Gry", "A2RGB")})
        if epoch % args.save_every == 0:
            _save_epoch(epoch)
    return state


if __name__ == "__main__":
    main()
