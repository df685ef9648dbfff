"""Cascaded SR->colorization training driver.

CLI-parity replacement for the reference's trainCas.py / trainCasConst.py /
trainCasLAB.py / trainCasConstLAB.py — one driver, two flags:

  python -m srcgan_tpu.cli.train_cas --SRModel RDDBNet --CModel ResDeconv --up 2
  python -m srcgan_tpu.cli.train_cas --const            # trainCasConst
  python -m srcgan_tpu.cli.train_cas --lab              # trainCasLAB
  python -m srcgan_tpu.cli.train_cas --const --lab      # trainCasConstLAB

Differences from the reference (all TPU-motivated, observable behavior kept):
  - batch size defaults to 1 (reference) but any size works; with --mesh-size N
    the step runs data-parallel over an N-device mesh (grads psum'd over ICI);
  - checkpoints keep the reference naming convention but are .npz param trees
    plus optional full train-state for resume (--resume).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="cascaded SR->colorization training")
    p.add_argument("--SRModel", type=str, default="ESPCN")
    p.add_argument("--CModel", type=str, default="ResDeconv")
    p.add_argument("--up", type=int, default=2)
    p.add_argument("--const", action="store_true",
                   help="constant-resolution pipeline (trainCasConst)")
    p.add_argument("--lab", action="store_true",
                   help="LAB colour space (trainCasLAB)")
    p.add_argument("--root", type=str, default="Sat2Aerx1")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-policy", type=str, default="cosine")
    p.add_argument("--num-epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--save-every", type=int, default=25)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--checkpoints", type=str, default="./checkpoints")
    p.add_argument("--mesh-size", type=int, default=0,
                   help="devices on the data axis (0 = single device)")
    p.add_argument("--space-size", type=int, default=0,
                   help="with --mesh-size: extra mesh axis sharding image "
                        "height (2-D data x space mesh; GSPMD halo exchange) "
                        "for per-sample resolutions beyond one chip's HBM")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3/FSDP over the --mesh-size data mesh: params "
                        "AND Adam moments stored row-sharded (12/D bytes/"
                        "param at rest vs ZeRO-1's 4+8/D); per-step gather, "
                        "same ICI volume as plain DP")
    p.add_argument("--zero-opt", action="store_true",
                   help="with --mesh-size: ZeRO-1 optimizer-state sharding — "
                        "grads reduce-scattered, Adam moments and update on "
                        "1/N-th per chip, updated params all-gathered (same "
                        "math as plain DP, 1/N optimizer HBM); composes with "
                        "--steps-per-dispatch, --bf16-acts and --orbax-dir "
                        "(per-shard moment saves, gather-free restore)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--run-dir", type=str, default="runs/latest",
                   help="per-run log dir: loss history (losses.jsonl) + "
                        "live image windows (Visdom-window-per-name PNGs)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize network activations (jax.checkpoint) "
                        "for large tiles / deep models")
    p.add_argument("--augment", action="store_true",
                   help="random per-sample D4 rotation/flip applied to both "
                        "images of each training pair (deterministic per "
                        "--seed/epoch; beyond-reference data augmentation)")
    p.add_argument("--workers", type=int, default=2,
                   help="host decode threads (reference DataLoader "
                        "num_workers=2, trainCas.py:187); 0 = in-line decode")
    p.add_argument("--cache", action="store_true",
                   help="decode PNGs once into a raw uint8 cache; later "
                        "epochs memmap it (host-side decode is the feed "
                        "bottleneck at TPU step rates)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MXU conv mode (fp32 params; ~4x step speedup "
                        "on TPU vs fp32-highest)")
    p.add_argument("--bf16-acts", action="store_true",
                   help="additionally store activations/saved residuals in "
                        "bf16 (fp32 master params + fp32 Adam; halves the "
                        "train step's HBM traffic)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="maintain an exponential moving average of the "
                        "weights (e.g. 0.999) and save it under "
                        "<checkpoints>/ema/ with the standard names — the "
                        "ESRGAN-style eval/shipping copy")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each batch into K microbatches and accumulate "
                        "gradients (peak activation memory of batch/K; same "
                        "update as the full batch) — for effective batches "
                        "that exceed one chip's HBM")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="run K optimization steps per device dispatch "
                        "(lax.scan inside one jit program): K uint8 batches "
                        "are stacked into one H2D block and the host pays "
                        "one dispatch + one sync per K steps — amortizes "
                        "per-call dispatch overhead when the host loop, not "
                        "the device, paces training")
    p.add_argument("--resume", action="store_true",
                   help="resume from <checkpoints>/casstate_latest.npz "
                        "(full state: params + Adam moments + epoch)")
    p.add_argument("--orbax-dir", type=str, default=None,
                   help="use orbax for the full-state checkpoints instead of "
                        "the npz file: async per-shard writes, gather-free "
                        "sharded restore under a mesh, step retention "
                        "(keep-last applies); name-encoded weight .npz files "
                        "are still written for the eval protocol")
    p.add_argument("--keep-last", type=int, default=0,
                   help="retain only the newest K checkpoint epochs "
                        "(0 = keep all, reference behavior)")
    p.add_argument("--keep-best", type=int, default=0,
                   help="additionally retain the K best epochs by "
                        "training-validation PSNR (trainCas.py:124-131 metric)")
    p.add_argument("--early-stop-patience", type=int, default=0,
                   help="stop when epoch-mean validation PSNR hasn't improved "
                        "for K epochs (0 = off)")
    p.add_argument("--early-stop-delta", type=float, default=0.0,
                   help="minimum PSNR improvement (dB) to reset patience")
    p.add_argument("--perceptual", type=str, default=None,
                   help="VGG16 weights (.npz from convert_vgg, or torchvision "
                        ".pth) enabling the VGG16 perceptual term "
                        "(losses.py:344-393); 'random' = untrained VGG "
                        "(testing only)")
    p.add_argument("--perceptual-weight", type=float, default=1.0)
    p.add_argument("--distill-netGA", type=str, default=None,
                   help="teacher SR checkpoint (.npz/.pth): train this run's "
                        "(smaller) --SRModel/--CModel as a student on "
                        "alpha*L1(gt) + (1-alpha)*L1(teacher) per stage")
    p.add_argument("--distill-netGB", type=str, default=None,
                   help="teacher colorizer checkpoint (pairs with "
                        "--distill-netGA)")
    p.add_argument("--distill-alpha", type=float, default=0.5,
                   help="weight on the ground-truth term (1 = pure "
                        "supervision, 0 = pure teacher mimicry)")
    from srcgan_tpu.utils.live import add_live_flag
    add_live_flag(p)
    return p


def load_perceptual(spec):
    """--perceptual value -> VGG16 params pytree (or None)."""
    if not spec:
        return None
    import jax as _jax

    from srcgan_tpu import losses_vgg
    if spec == "random":
        return losses_vgg.init_vgg_params(_jax.random.PRNGKey(0))
    return losses_vgg.load_vgg_params(spec)


def _stacked_blocks(it, k):
    """Group up to ``k`` consecutive same-shape (src, tar) uint8 batches from
    a ``data.batches`` iterator and stack them with a leading steps axis —
    the input blocks for ``CasTrainer.train_steps_u8``.  A ragged epoch tail
    (or a batch-size change) flushes early, producing a shorter block."""
    buf = []

    def flush():
        return (np.stack([s for s, _ in buf]), np.stack([t for _, t in buf]))

    for src, tar, _ in it:
        if buf and src.shape != buf[-1][0].shape:
            yield flush()
            buf = []
        buf.append((src, tar))
        if len(buf) == k:
            yield flush()
            buf = []
    if buf:
        yield flush()


def main(argv=None):
    args = build_parser().parse_args(argv)

    # Preemption safety (SURVEY.md §5.3): TPU pods get SIGTERM'd with a
    # grace window on maintenance/preemption.  Register the flag handler
    # FIRST (before any multi-second jit compile) so a signal during setup
    # is not fatal; the train loop below checks the flag after every step,
    # persists the FULL train state, and returns cleanly so --resume
    # continues the interrupted epoch (the reference loses up to 25 epochs,
    # trainCas.py:221).  The finally restores the previous handler on EVERY
    # exit path (incl. the non-finite-loss RuntimeError) so a later caller
    # in the same process doesn't inherit a SIGTERM-swallowing handler.
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

    from srcgan_tpu import config, data, parallel
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.train import CasTrainer, checkpoint_name, save_params
    from srcgan_tpu.train.retention import CheckpointManager, EarlyStopper
    from srcgan_tpu.train.state import load_train_state, save_train_state
    from srcgan_tpu.utils import Logger

    if args.bf16 or args.bf16_acts:
        config.set_conv_precision("default")
    ver = "G2LAB" if args.lab else "G2RGB"
    cas_kwargs = dict(
        sr_model=args.SRModel, c_model=args.CModel, up=args.up,
        lr=args.lr, const=args.const, lab=args.lab,
        lr_policy=args.lr_policy, num_epochs=args.num_epochs,
        remat=args.remat,
        perceptual_params=load_perceptual(args.perceptual),
        perceptual_weight=args.perceptual_weight,
        act_dtype=jnp.bfloat16 if args.bf16_acts else None)
    if args.distill_netGA or args.distill_netGB:
        if not (args.distill_netGA and args.distill_netGB):
            raise SystemExit("--distill-netGA and --distill-netGB must be "
                             "given together (a teacher cascade)")
        from srcgan_tpu.train import DistillTrainer
        trainer = DistillTrainer.from_checkpoints(
            args.distill_netGA, args.distill_netGB,
            alpha=args.distill_alpha, **cas_kwargs)
        print(f"distilling from {os.path.basename(args.distill_netGA)} + "
              f"{os.path.basename(args.distill_netGB)} "
              f"(alpha={args.distill_alpha})")
    else:
        trainer = CasTrainer(**cas_kwargs)
    state = trainer.init(jax.random.PRNGKey(args.seed))
    start_epoch = 1
    state_path = os.path.join(args.checkpoints, "casstate_latest.npz")

    mesh = None
    fsdp_shapes = None
    if args.zero_opt or args.fsdp:
        # sharded-state layouts: ZeRO-1 shards the (mu, nu) moments, FSDP
        # additionally shards the params at rest — both need their own
        # state templates and step wrappers vs the replicated-optax
        # branches below.
        if args.zero_opt and args.fsdp:
            raise SystemExit("--zero-opt and --fsdp are mutually exclusive "
                             "(FSDP subsumes the moment sharding)")
        which = "--fsdp" if args.fsdp else "--zero-opt"
        if args.mesh_size <= 1 or args.space_size > 1:
            raise SystemExit(f"{which} requires a 1-D --mesh-size data "
                             "mesh (no --space-size)")
        if args.ema_decay > 0 or args.grad_accum > 1:
            raise SystemExit(f"{which} composes with the plain DP loop "
                             "(not --ema-decay/--grad-accum)")
        mesh = parallel.make_mesh((args.mesh_size,), ("data",))
        if args.fsdp:
            state, fsdp_shapes = parallel.fsdp_from_state(state, mesh)
        else:
            state = parallel.zero1_from_state(state, mesh)
    if args.mesh_size > 1 and args.batch_size % args.mesh_size:
        # every mesh path shards the batch dim over 'data' (shard_map needs
        # exact divisibility; GSPMD would silently pad — reject both)
        raise SystemExit("--mesh-size requires --batch-size divisible by it")

    # npz resume (one block for plain AND zero layouts: the device_get'd
    # current state is the load template, so whatever shape the opt_state
    # slot has — optax tree or sharded (mu, nu) — round-trips)
    if args.resume and not args.orbax_dir and os.path.exists(state_path):
        raw, extra = load_train_state(state_path, jax.device_get(state))
        # orbax composes naturally: the zero state IS a sharded target, so
        # saves are per-shard and restore places moments sharded with no
        # gather (the orbax block below restores into this state's shardings)
        if args.fsdp:
            state = parallel.fsdp_put(raw, mesh)
        elif args.zero_opt:
            state = parallel.zero1_put(raw, mesh)
        else:
            state = raw
        start_epoch = int(extra.get("epoch", 0)) + 1
        print(f"resumed from {state_path} at epoch {start_epoch}")

    if args.zero_opt:
        step = (parallel.make_cas_zero1_step(trainer, mesh)
                if args.steps_per_dispatch == 1 else None)
    elif args.fsdp:
        step = (parallel.make_cas_fsdp_step(trainer, mesh, fsdp_shapes)
                if args.steps_per_dispatch == 1 else None)
    elif args.mesh_size > 1 and args.space_size > 1:
        mesh = parallel.make_mesh((args.mesh_size, args.space_size),
                                  ("data", "space"))
        step = parallel.make_cas_2d_step(trainer, mesh)
        state = parallel.put_replicated(state, mesh)
    elif args.mesh_size > 1:
        mesh = parallel.make_mesh((args.mesh_size,), ("data",))
        # spd > 1 runs make_cas_dp_steps_u8 instead (built below); the
        # per-step wrapper would be dead code there
        step = (parallel.make_cas_dp_step(trainer, mesh)
                if args.steps_per_dispatch == 1 else None)
        state = parallel.put_replicated(state, mesh)
    else:
        step = trainer.train_step

    if args.grad_accum > 1 and mesh is not None:
        raise SystemExit("--grad-accum composes with the single-device step "
                         "only; under a mesh add data-parallel shards instead")
    ema = None
    if args.ema_decay > 0:
        if mesh is not None or args.grad_accum > 1:
            raise SystemExit("--ema-decay currently composes with the plain "
                             "single-device step only")
        ema = trainer.ema_init(state)
    dp_steps_u8 = None
    if args.steps_per_dispatch > 1:
        if args.grad_accum > 1 or ema is not None or (
                mesh is not None and args.space_size > 1):
            raise SystemExit("--steps-per-dispatch composes with the plain "
                             "single-device step or a 1-D --mesh-size data "
                             "mesh (not --space-size/--grad-accum/"
                             "--ema-decay)")
        if mesh is not None:
            # DP x steps-per-dispatch: K scanned psum'd updates per dispatch
            # — the production multi-chip loop (batch divisibility was
            # validated above; the ragged tail batch is dropped via
            # drop_last so every block is uniformly (K', batch_size, ...)).
            if args.zero_opt:
                dp_steps_u8 = parallel.make_cas_zero1_steps_u8(trainer, mesh)
            elif args.fsdp:
                dp_steps_u8 = parallel.make_cas_fsdp_steps_u8(
                    trainer, mesh, fsdp_shapes)
            else:
                dp_steps_u8 = parallel.make_cas_dp_steps_u8(trainer, mesh)
            from jax.sharding import NamedSharding, PartitionSpec
            dp_blk_sharding = NamedSharding(mesh, PartitionSpec(None, "data"))

    # orbax backend: restore AFTER mesh placement so shards land on-device
    # according to the (possibly replicated/sharded) target's sharding
    ock = None
    if args.orbax_dir:
        from srcgan_tpu.train.orbax_io import OrbaxCheckpointer
        ock = OrbaxCheckpointer(args.orbax_dir,
                                max_to_keep=args.keep_last or None)
        if args.resume and ock.latest_step() is not None:
            state, extra = ock.restore(state)
            start_epoch = int(extra.get("epoch", 0)) + 1
            print(f"resumed from orbax {args.orbax_dir} at epoch "
                  f"{start_epoch}")
            if ema is not None:
                # re-seed from the RESTORED params (matching the npz-resume
                # path, where restore precedes ema_init) — ema was built
                # from the fresh random init above, and decay 0.999 would
                # keep that garbage in the eval weights for ~1000 steps
                ema = trainer.ema_init(state)

    def _save_full_state(extra):
        """Full-state checkpoint through whichever backend is configured.

        orbax: async, monotonically-increasing step counter (the epoch lives
        in `extra`, so preemption re-saves never collide with epoch saves).
        """
        if ock is not None:
            ock.save((ock.latest_step() or 0) + 1, state, extra)
        else:
            save_train_state(state_path, jax.device_get(state), extra=extra)

    if args.data_dir:
        trainset = data.FileListDataset(args.root, "train", ver, args.data_dir)
    else:
        trainset, _, _ = data.load_dataset(args.root, ver)
    if args.cache:
        trainset = data.CachedDataset(trainset)
    print(f"Starting Training Loop... ({len(trainset)} samples, ver={ver}, "
          f"const={args.const}, up={args.up})")
    logger = Logger(len(trainset), args.num_epochs, image_dir=args.run_dir)

    manager = CheckpointManager(args.checkpoints, keep_last=args.keep_last,
                                keep_best=args.keep_best, mode="max")
    stopper = EarlyStopper(args.early_stop_patience, args.early_stop_delta,
                           mode="max")

    def _preempt_save(epoch):
        _save_full_state({"epoch": epoch - 1})  # redo this epoch
        if ock is not None:
            ock.wait_until_finished()  # durable before the process dies
        dest = args.orbax_dir if ock is not None else state_path
        print(f"\nSIGTERM: train state saved to {dest} "
              f"(resume with --resume); exiting")

    def _host_params():
        """(sr, c) params in ORIGINAL leaf shapes on host — the FSDP layout
        stores row-sharded 2-D leaves that save/eval tooling can't use."""
        if fsdp_shapes is not None:
            return (parallel.fsdp_full_params(state.sr.params,
                                              fsdp_shapes["sr"]),
                    parallel.fsdp_full_params(state.c.params,
                                              fsdp_shapes["c"]))
        return jax.device_get(state.sr.params), jax.device_get(state.c.params)

    def _snapshot(realA, realB):
        if fsdp_shapes is None:
            return trainer.snapshot(state, realA, realB)
        from srcgan_tpu.train.cas import CasState as _CS
        from srcgan_tpu.train.state import TrainState as _TS
        sr_p, c_p = _host_params()
        snap = _CS(_TS(sr_p, None, 0), _TS(c_p, None, 0),
                   state.sr_model_state, state.c_model_state)
        return trainer.snapshot(snap, realA, realB)

    def _save_epoch_checkpoints(epoch, mean_psnr):
        # reads the loop-current `state`/`ema` bindings (closure over _run)
        os.makedirs(args.checkpoints, exist_ok=True)
        lab_ver = "G2LAB" if args.lab else None
        netGA = os.path.join(args.checkpoints, checkpoint_name(
            args.SRModel, "A2C", args.up, epoch, ver=lab_ver))
        netGB = os.path.join(args.checkpoints, checkpoint_name(
            args.CModel, "C2B", args.up, epoch, ver=lab_ver))
        sr_host, c_host = _host_params()
        save_params(netGA, sr_host)
        save_params(netGB, c_host)
        if ema is not None:
            ema_dir = os.path.join(args.checkpoints, "ema")
            os.makedirs(ema_dir, exist_ok=True)
            save_params(os.path.join(ema_dir, os.path.basename(netGA)),
                        jax.device_get(ema["sr"]))
            save_params(os.path.join(ema_dir, os.path.basename(netGB)),
                        jax.device_get(ema["c"]))
        _save_full_state({"epoch": epoch, "val_psnr": mean_psnr})
        removed = manager.register(epoch, [netGA, netGB], metric=mean_psnr)
        print(f"\nsaved {netGA} {netGB} (+ resume state; "
              f"val PSNR {mean_psnr:.2f} dB)"
              + (f"; retention removed {len(removed)} files" if removed
                 else ""))

    def _print_early_stop(epoch):
        print(f"early stop at epoch {epoch}: validation PSNR stalled for "
              f"{args.early_stop_patience} epochs (best "
              f"{stopper.best:.2f} dB, best epoch {manager.best_epoch()})")

    window = {"loss_SR": [], "loss_C": [], "psnr_SR": [], "psnr_C": []}
    for epoch in range(start_epoch, args.num_epochs + 1):
        epoch_psnr = []
        lr = trainer.lr_at_epoch(epoch)
        # shard_map paths (DP / ZeRO per-step loops and the K-steps blocks)
        # need every batch's leading dim divisible by the mesh: drop the
        # epoch's ragged tail batch there.  The 2-D GSPMD path and the
        # single-device steps handle any batch size.
        shardmap_loop = mesh is not None and args.space_size <= 1
        raw_iter = data.batches(trainset, args.batch_size, shuffle=True,
                                seed=args.seed, epoch=epoch,
                                workers=args.workers, augment=args.augment,
                                drop_last=(dp_steps_u8 is not None
                                           or shardmap_loop))
        if args.steps_per_dispatch > 1:
            # K steps per dispatch: stacked uint8 blocks scanned on device
            # (train_steps_u8, or its psum'd DP composition under a mesh) —
            # one dispatch + one metrics sync per K steps.
            steps_fn = (dp_steps_u8 if dp_steps_u8 is not None
                        else trainer.train_steps_u8)
            blk_sharding = dp_blk_sharding if dp_steps_u8 is not None else None
            it = 0
            for src_blk, tar_blk in preprocess.device_put_iter(
                    _stacked_blocks(raw_iter, args.steps_per_dispatch),
                    sharding=blk_sharding):
                state, mrows = steps_fn(state, src_blk, tar_blk, lr)
                if preempted["flag"]:
                    _preempt_save(epoch)
                    return state
                mrows = {k: np.asarray(v) for k, v in mrows.items()}
                for j in range(int(src_blk.shape[0])):
                    it += 1
                    loss_now = (float(mrows["loss_SR"][j])
                                + float(mrows["loss_C"][j]))
                    if not np.isfinite(loss_now):
                        raise RuntimeError(
                            f"non-finite loss at epoch {epoch} it {it}; "
                            f"restart with --resume to restore from "
                            f"{state_path}")
                    for k in window:
                        window[k].append(float(mrows[k][j]))
                    epoch_psnr.append(float(mrows["psnr_C"][j]))
                    if it % args.log_every == 0:
                        realA, realB = preprocess.convert_pair(
                            src_blk[j], tar_blk[j], ver)
                        logger.log(nepoch=epoch, niter=it,
                                   losses={k: float(np.mean(v))
                                           for k, v in window.items()},
                                   images=_snapshot(realA, realB),
                                   ver=ver)
                        window = {k: [] for k in window}
            mean_psnr = float(np.mean(epoch_psnr)) if epoch_psnr else float("nan")
            stop = stopper.update(mean_psnr)
            if epoch % args.save_every == 0 or stop:
                _save_epoch_checkpoints(epoch, mean_psnr)
            if stop:
                _print_early_stop(epoch)
                break
            continue
        batch_iter = preprocess.device_put_iter(raw_iter)
        for it, (src_u8, tar_u8, _) in enumerate(batch_iter, start=1):
            if mesh is not None:
                realA, realB = preprocess.convert_pair(src_u8, tar_u8, ver)
                realA = parallel.put_batch(realA, mesh)
                realB = parallel.put_batch(realB, mesh)
                state, metrics = step(state, realA, realB, lr)
            elif args.grad_accum > 1:
                realA, realB = preprocess.convert_pair(src_u8, tar_u8, ver)
                state, metrics = trainer.train_step_accum(
                    state, realA, realB, lr, args.grad_accum)
            elif ema is not None:
                realA, realB = preprocess.convert_pair(src_u8, tar_u8, ver)
                state, ema, metrics = trainer.train_step_ema(
                    state, ema, realA, realB, lr, args.ema_decay)
            else:
                # uint8-input fused step: preprocessing inside the step's jit
                state, metrics = trainer.train_step_u8(state, src_u8, tar_u8, lr)
            if preempted["flag"]:
                _preempt_save(epoch)
                return state
            loss_now = float(metrics["loss_SR"]) + float(metrics["loss_C"])
            if not np.isfinite(loss_now):
                # failure detection (SURVEY.md §5.3): the reference would
                # silently train on garbage; we stop, and with --resume the
                # run restarts from the last full-state checkpoint.
                raise RuntimeError(
                    f"non-finite loss at epoch {epoch} it {it}; restart with "
                    f"--resume to restore from {state_path}")
            for k in window:
                window[k].append(float(metrics[k]))
            epoch_psnr.append(float(metrics["psnr_C"]))
            if it % args.log_every == 0:
                realA, realB = preprocess.convert_pair(src_u8, tar_u8, ver)
                logger.log(nepoch=epoch, niter=it,
                           losses={k: float(np.mean(v)) for k, v in window.items()},
                           images=_snapshot(realA, realB), ver=ver)
                window = {k: [] for k in window}
        mean_psnr = float(np.mean(epoch_psnr)) if epoch_psnr else float("nan")
        stop = stopper.update(mean_psnr)
        if epoch % args.save_every == 0 or stop:
            _save_epoch_checkpoints(epoch, mean_psnr)
        if stop:
            _print_early_stop(epoch)
            break
    if ock is not None:
        ock.close()  # join pending async writes before returning
    return state


if __name__ == "__main__":
    main()
