"""Multi-task CycleGAN training driver — multi-task.py parity (net='2').

  python -m srcgan_tpu.cli.train_multitask --mode x2
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="multi-task CycleGAN training")
    p.add_argument("--mode", type=str, default="x2", choices=["x2", "x4"])
    p.add_argument("--root", type=str, default=None)
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num-epochs", type=int, default=25)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--netG", type=str, default="resnet_9blocks")
    p.add_argument("--norm", type=str, default="instance")
    p.add_argument("--device-pool", action="store_true",
                   help="run the ImagePools ON DEVICE: the three-generator "
                        "G update, both 50%%-replace pool queries and the D "
                        "update fuse into ONE program per iteration (same "
                        "sampling distribution as the host pools, "
                        "jax.random stream)")
    p.add_argument("--pack-passes", action="store_true",
                   help="batch the two independent G_A inputs into one "
                        "forward (exact for the default instance-norm nets; "
                        "auto-disabled for --norm batch).  Opt-in: the "
                        "analogous CycleGAN packing measured slower on v5e "
                        "at the 256^2 protocol (docs/PERF.md)")
    p.add_argument("--bf16-acts", action="store_true",
                   help="bf16 generator activations with fp32 master params")
    p.add_argument("--mesh-size", type=int, default=0,
                   help="GSPMD data parallelism: batch sharded over an "
                        "N-device 'data' mesh, state replicated, gradient "
                        "psums compiler-derived (the default instance-norm "
                        "generators have no cross-batch statistics, so the "
                        "sharded step is exact); pooled fakes are re-sharded "
                        "after the host pool round-trip")
    p.add_argument("--save-every", type=int, default=5)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--checkpoints", type=str, default="./checkpoints")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--run-dir", type=str, default="runs/latest",
                   help="per-run log dir: loss history (losses.jsonl) + "
                        "live image windows (Visdom-window-per-name PNGs)")
    p.add_argument("--augment", action="store_true",
                   help="random per-sample D4 rotation/flip applied to both "
                        "images of each training pair (deterministic per "
                        "--seed/epoch; beyond-reference data augmentation)")
    from srcgan_tpu.utils.live import add_live_flag
    add_live_flag(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from srcgan_tpu.utils import live as live_mod
    live = live_mod.maybe_start(args, run_dir=args.run_dir)
    try:
        return _run(args)
    finally:
        if live is not None:
            live.stop()


def _run(args):

    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from srcgan_tpu import data
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.train import MultiTaskTrainer, save_params
    from srcgan_tpu.utils import Logger

    root = args.root or f"Sat2Aer{args.mode}"
    if args.bf16_acts:
        from srcgan_tpu import config
        config.set_conv_precision("default")
    trainer = MultiTaskTrainer(
        mode=args.mode, lr=args.lr, ngf=args.ngf,
        netG=args.netG, norm=args.norm, num_epochs=args.num_epochs,
        act_dtype=jnp.bfloat16 if args.bf16_acts else None,
        pack_passes=args.pack_passes)
    state = trainer.init(jax.random.PRNGKey(args.seed))

    mesh = b_shard = None
    if args.mesh_size > 1:
        if args.device_pool:
            raise SystemExit("--device-pool composes with the single-device "
                             "iteration only")
        if args.batch_size % args.mesh_size:
            raise SystemExit("--mesh-size needs --batch-size divisible by "
                             "the mesh")
        from srcgan_tpu import parallel
        mesh = parallel.make_mesh((args.mesh_size,), ("data",))
        b_shard = parallel.batch_sharding(mesh)
        state = parallel.put_replicated(state, mesh)

    trainset = data.FileListDataset(root, "train", "G2RGB", args.data_dir)
    print(f"Starting Training Loop... ({len(trainset)} samples, multi-task)")
    logger = Logger(len(trainset), args.num_epochs, image_dir=args.run_dir)
    sf = 2 if args.mode == "x2" else 4

    pool_state = None  # --device-pool: lazily built from first batch shapes
    for epoch in range(1, args.num_epochs + 1):
        g_lr, d_lr = trainer.lr_at_epoch(epoch)
        for it, (src_u8, tar_u8, _) in enumerate(
                data.batches(trainset, args.batch_size, shuffle=True,
                             seed=args.seed, epoch=epoch,
                             augment=args.augment,
                             drop_last=mesh is not None)):
            if mesh is not None:
                # shard the uint8 batch BEFORE the on-device conversion so
                # everything downstream runs sharded (as in train_cyclegan)
                src_u8 = jax.device_put(src_u8, b_shard)
                tar_u8 = jax.device_put(tar_u8, b_shard)
            realA, realB = preprocess.convert_pair(
                jnp.asarray(src_u8), jnp.asarray(tar_u8), "G2RGB")
            # realB1: prepared like the reference (multi-task.py:410-415);
            # it is unused by the model, kept for protocol parity.
            realB1 = preprocess.degrade_nearest(preprocess.luma(realB), sf)
            if args.device_pool:
                if pool_state is None:
                    pool_state = trainer.device_pool_init(
                        state, realA, realB, seed=args.seed)
                state, pool_state, aux = trainer.gd_step_pooled(
                    state, pool_state, realA, realB, g_lr, d_lr)
            elif mesh is not None:
                # optimize_parameters inlined so the pooled fakes get
                # re-sharded after their host round-trip
                state, aux = trainer.g_step(state, realA, realB, g_lr)
                fa = trainer.fake_A_pool.query(np.asarray(aux["fake_A"]))
                fb = trainer.fake_B_pool.query(np.asarray(aux["fake_B"]))
                state, dm = trainer.d_step(
                    state, aux["real_C"], realB,
                    jax.device_put(fa, b_shard), jax.device_put(fb, b_shard),
                    d_lr)
                aux.update(dm)
            else:
                state, aux = trainer.optimize_parameters(
                    state, realA, realB, realB1, g_lr, d_lr)
            if it % args.log_every == 0:
                logger.log(
                    nepoch=epoch, niter=it,
                    losses={k: float(aux[k]) for k in
                            ("loss_G", "loss_G_C", "loss_D_A", "loss_D_B")},
                    images={k: aux[k] for k in
                            ("real_C", "fake_A", "fake_B", "recl_A", "recl_B")})
        if epoch % args.save_every == 0:
            os.makedirs(args.checkpoints, exist_ok=True)
            for name in ("G_A", "G_B", "G_C"):
                path = os.path.join(
                    args.checkpoints,
                    f"netG_{name}_MTtask_{args.mode}_{epoch:04d}.npz")
                save_params(path, jax.device_get(state.g.params[name]))
            print(f"\nsaved multi-task generators at epoch {epoch}")
    return state


if __name__ == "__main__":
    main()
