"""Cascaded pipeline evaluation driver — testCas.py / testCasConst.py /
testCasLAB.py / testCasConstLAB.py parity.

  python -m srcgan_tpu.cli.test_cas --netGA checkpoints/RDDBNet_A2C_x2_0050.npz \
                                    --netGB checkpoints/ResDeconv_C2B_x2_0050.npz

Reproduces the reference protocol exactly:
  - model class + scale parsed from the checkpoint filename (testCas.py:41-53);
  - degradation replay uses F.interpolate's DEFAULT nearest mode (:75-77) —
    unlike training, which uses bilinear;
  - evaluators [MSE, PSNR, AE, SSIM] averaged over the test split (:63, :92);
  - per-sample PNGs to result/{A,B}_<model>_<x>_<epoch>/ named by datalist
    entry (:87-88); means appended to result/Performs.csv (:92-103).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(description="cascaded pipeline evaluation")
    p.add_argument("--netGA", type=str, required=True)
    p.add_argument("--netGB", type=str, required=True)
    p.add_argument("--const", action="store_true",
                   help="constant-resolution eval (testCasConst)")
    p.add_argument("--root", type=str, default="Sat2Aerx1")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--result-dir", type=str, default="./result")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--mesh-size", type=int, default=None,
                   help="data-parallel eval over the first N devices (batch "
                        "sharded over a 1-D mesh, GSPMD derives the "
                        "collectives; --batch-size is rounded up to a mesh "
                        "multiple — protocol-neutral, metrics are per-sample "
                        "— and the ragged final batch is edge-padded, pad "
                        "rows dropped from metrics/saves) — the eva.sh "
                        "sweep's multi-chip form")
    p.add_argument("--self-ensemble", action="store_true",
                   help="geometric self-ensemble (x8 dihedral TTA, the "
                        "'EDSR+' protocol): run every D4 transform of each "
                        "input as one batched forward, invert and average "
                        "the outputs — beyond-reference quality at ~8x "
                        "inference FLOPs")
    p.add_argument("--precision", type=str, default="highest",
                   choices=["highest", "high", "default", "int8"],
                   help="conv precision: highest=fp32 (metric-grade), "
                        "high=3-pass bf16 (~fp32, ~2x faster), default=bf16, "
                        "int8=post-training quantized convs (srcgan_tpu.quant;"
                        " calibrated on the first eval batches)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from srcgan_tpu import config, data, metrics, models
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.interop import load_params_any
    from srcgan_tpu.train.state import parse_checkpoint_name
    from srcgan_tpu.utils import vis

    int8 = args.precision == "int8"
    if args.mesh_size and int8:
        sys.exit("--mesh-size does not compose with --precision int8 (the "
                 "quant calibrate/replay contract is one trace per "
                 "quant_mode block on ONE platform/sharding; run int8 "
                 "single-device)")
    config.set_conv_precision("highest" if int8 else args.precision)
    infoA = parse_checkpoint_name(args.netGA)
    infoB = parse_checkpoint_name(args.netGB)
    lab = infoA["ver"] == "G2LAB"
    sf = infoA["up"]

    # build + load models from name-encoded config (testCas.py:52-58)
    netG_A2C = models.create(infoA["model"], 1, 1, sf)
    netG_C2B = models.create(infoB["model"], 1, 2 if lab else 3)
    pA, stA = load_params_any(netG_A2C, args.netGA)
    pB, stB = load_params_any(netG_C2B, args.netGB)

    mesh = None
    if args.mesh_size:
        from srcgan_tpu import parallel

        if args.batch_size % args.mesh_size:
            eff = -(-args.batch_size // args.mesh_size) * args.mesh_size
            print(f"--mesh-size {args.mesh_size}: raising --batch-size "
                  f"{args.batch_size} -> {eff} (a mesh multiple; per-sample "
                  "metrics make this protocol-neutral, and without it every "
                  "batch would be mostly discarded pad rows)")
            args.batch_size = eff
        mesh = parallel.make_mesh((args.mesh_size,), ("data",))
        b_shard = parallel.batch_sharding(mesh)
        # params replicated across the mesh; inputs batch-sharded per batch
        # below — GSPMD derives the (collective-free) per-device programs
        pA, pB = parallel.put_replicated((pA, pB), mesh)
        if stA is not None:
            stA = parallel.put_replicated(stA, mesh)
        if stB is not None:
            stB = parallel.put_replicated(stB, mesh)

    testset = data.FileListDataset(args.root, "test", infoA["ver"],
                                   args.data_dir)

    tagA = "_".join([infoA["model"], f"x{sf}", f"{infoA['epoch']:04d}"])
    save_dirA = os.path.join(args.result_dir, "A_" + tagA)
    save_dirB = os.path.join(args.result_dir, "B_" + tagA)
    os.makedirs(save_dirA, exist_ok=True)
    os.makedirs(save_dirB, exist_ok=True)

    @jax.jit
    def cascade(pA, pB, realA, realB):
        """Degradation replay + both-domain cascade (testCas.py:71-79)."""
        if lab:
            realBC = realB[..., :1]
        else:
            realBC = preprocess.luma(realB)
        if args.const:
            realBA = preprocess.degrade_const_nearest(realBC, sf)
            realAA = realA
        else:
            realBA = preprocess.degrade_nearest(realBC, sf)
            realAA = preprocess.degrade_nearest(realA, sf)

        def run_casc(x):
            c, _ = netG_A2C.apply(pA, x, state=stA, train=False)
            b, _ = netG_C2B.apply(pB, c, state=stB, train=False)
            return c, b

        if args.self_ensemble:
            from srcgan_tpu.ops import ensemble

            fake_AC, fake_AB = ensemble.self_ensemble_apply(run_casc, realAA)
            fake_BC, fake_BB = ensemble.self_ensemble_apply(run_casc, realBA)
        else:
            fake_AC, fake_AB = run_casc(realAA)
            fake_BC, fake_BB = run_casc(realBA)
        return fake_AC, fake_AB, fake_BC, fake_BB

    # Batched eval with per-sample metrics reproduces the reference's bs=1
    # protocol means exactly while amortizing dispatch (metrics.py per-sample
    # forms; see test_metrics equivalence check).
    import contextlib

    from srcgan_tpu import data as data_mod
    from srcgan_tpu.metrics import per_sample_evaluators

    run_ctx = contextlib.nullcontext
    if int8:
        from srcgan_tpu import quant

        cal = []
        for src_u8, tar_u8, _ in data_mod.batches(testset, args.batch_size):
            cal.append((src_u8, tar_u8))
            if len(cal) >= 2:
                break

        def eager_fwd(pair):
            rA, rB = preprocess.convert_pair(
                jnp.asarray(pair[0]), jnp.asarray(pair[1]), infoA["ver"])
            cascade.__wrapped__(pA, pB, rA, rB)

        scales = quant.calibrate_fn(eager_fwd, cal)
        print(f"int8: calibrated {len(scales)} conv callsites")
        print("int8 note: accuracy tooling only on this hardware — bf16 "
              "('--precision default') is ~2x faster (docs/INT8_CLOSURE.md)")
        run_ctx = lambda: quant.quant_mode("int8", scales)

    tail_ctx = contextlib.nullcontext
    if mesh is not None:
        # GSPMD-sharded programs must not trace the Pallas eval tail
        # (models/rddb.py invariant: the custom call pins an unsharded
        # layout); the pure-XLA folded tail lowers under any sharding
        from srcgan_tpu.models import rddb as rddb_mod

        tail_ctx = rddb_mod.no_pallas_tail

    ps_evals = per_sample_evaluators()
    performs = [[] for _ in ps_evals]
    done = 0
    for src_u8, tar_u8, idxs in data_mod.batches(testset, args.batch_size):
        if mesh is not None:
            # pad rows only feed the device program; the save/metric loop
            # below walks idxs, so they never reach Performs.csv or disk
            src_u8, _ = parallel.pad_batch_to(np.asarray(src_u8),
                                              args.mesh_size)
            tar_u8, _ = parallel.pad_batch_to(np.asarray(tar_u8),
                                              args.mesh_size)
            # shard the uint8 batch BEFORE the on-device conversion (the
            # trainers' pattern, train_multitask.py) so convert_pair itself
            # runs sharded instead of on device 0 followed by a reshard
            src_u8 = jax.device_put(src_u8, b_shard)
            tar_u8 = jax.device_put(tar_u8, b_shard)
        realA, realB = preprocess.convert_pair(
            jnp.asarray(src_u8), jnp.asarray(tar_u8), infoA["ver"])
        with run_ctx(), tail_ctx():
            fake_AC, fake_AB, fake_BC, fake_BB = cascade(pA, pB, realA, realB)

        if lab:
            # metrics + save on L (+) ab concat (testCasLAB.py:84-98)
            pred = jnp.concatenate([fake_BC, fake_BB], axis=-1)
            tgt = realB
        else:
            pred, tgt = fake_BB, realB

        per_sample = [np.asarray(fn(pred, tgt)) for _, fn in ps_evals]
        batch_paths_a, batch_imgs_a = [], []
        batch_paths_b, batch_imgs_b = [], []
        for j, idx in enumerate(idxs):
            if lab:
                outB = vis.tensor2img(np.asarray(pred[j:j + 1]), "LAB",
                                      dsize=pred.shape[1:3])
                outA = vis.tensor2img(
                    np.asarray(jnp.concatenate(
                        [fake_AC, fake_AB], -1)[j:j + 1]), "LAB",
                    dsize=fake_AB.shape[1:3])
            else:
                outB = vis.tensor2image_u8(
                    np.clip(np.asarray(fake_BB[j:j + 1]), 0, 1))
                outA = vis.tensor2image_u8(
                    np.clip(np.asarray(fake_AB[j:j + 1]), 0, 1))
            acc = ""
            for i, (ev_name, _) in enumerate(ps_evals):
                val = float(per_sample[i][j])
                acc += " {}:{:0.2f};".format(ev_name, val)
                performs[i].append(val)
            name = testset.datalist[int(idx)]
            batch_paths_a.append(os.path.join(save_dirA, name))
            batch_imgs_a.append(outA)
            batch_paths_b.append(os.path.join(save_dirB, name))
            batch_imgs_b.append(outB)
            done += 1
            sys.stdout.write("\rGenerated %s (%04d / %04d) >> %s" %
                             (name, done - 1, len(testset), acc))
        # one threaded C++ encode per batch (falls back to PIL per image)
        vis.save_png_batch(batch_paths_a, batch_imgs_a)
        vis.save_png_batch(batch_paths_b, batch_imgs_b)
    sys.stdout.write("\n")

    # Performs.csv append (testCas.py:92-103)
    import pandas as pd

    row = [[time.strftime("%h_%d"),
            os.path.basename(args.netGA).rsplit(".", 1)[0]] +
           [sum(p) / len(p) for p in performs]]
    df = pd.DataFrame(row, columns=["time", "checkpoint"] +
                      [name for name, _ in ps_evals])
    log_path = os.path.join(args.result_dir, "Performs.csv")
    if os.path.exists(log_path):
        df = pd.concat([pd.read_csv(log_path), df], ignore_index=True)
    df.to_csv(log_path, index=False, float_format="%.3f")
    print(df.tail(1).to_string(index=False))
    return df


if __name__ == "__main__":
    main()
