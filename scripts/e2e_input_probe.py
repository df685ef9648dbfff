"""Probe: can the host input pipeline feed the TPU train step from disk?

bench.py's train numbers run on device-resident synthetic batches; the
reference protocol trains from PNG files (trainCas.py:187 DataLoader).  This
probe quantifies the full path on THIS host:

  1  loader-only throughput: data.batches() over an on-disk Sat2Aer-layout
     dataset — native C++/libpng threaded decode vs PIL, workers 0/2/4,
     and the CachedDataset memmap path (second-epoch regime);
  2  end-to-end: the real cli.train_cas loop (uint8 H2D fused step,
     --bf16-acts --steps-per-dispatch) on the same dataset, samples/s vs
     the device-only bench number => input-pipeline overhead %.

Usage: python scripts/e2e_input_probe.py [12] [--n 512] [--size 256]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset(n: int, size: int) -> str:
    from srcgan_tpu.data.dataset import make_synthetic_dataset

    base = os.path.join(tempfile.gettempdir(), f"srcgan_e2e_{n}x{size}")
    root = os.path.join(base, "Sat2Aerx1")
    if not os.path.exists(os.path.join(root, "train.txt")):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        t0 = time.perf_counter()
        make_synthetic_dataset(root, n_train=n, n_val=4, n_test=4, size=size)
        print(f"built {n}x{size}^2 dataset in {time.perf_counter() - t0:.1f}s"
              f" at {root}")
    return base


def loader_only(base: str, n: int, batch: int):
    from srcgan_tpu import data
    from srcgan_tpu.data.dataset import CachedDataset

    ds = data.FileListDataset("Sat2Aerx1", "train", data_dir=base)

    def run(label, dataset, workers, env_no_native=False):
        if env_no_native:
            os.environ["SRCGAN_NO_NATIVE"] = "1"
        else:
            os.environ.pop("SRCGAN_NO_NATIVE", None)
        # native.py caches availability process-wide; reset its probe
        from srcgan_tpu.data import native
        native._tried, native._lib = False, None

        cnt = 0
        t0 = time.perf_counter()
        for src, tar, idx in data.batches(dataset, batch, shuffle=True,
                                          workers=workers):
            cnt += len(idx)
        dt = time.perf_counter() - t0
        print(f"  {label:44s} {cnt / dt:8.1f} pairs/s")
        return cnt / dt

    print(f"1) loader-only throughput (uint8 pair batches, bs={batch}):")
    run("PIL decode, workers=0", ds, 0, env_no_native=True)
    run("PIL decode, workers=4", ds, 4, env_no_native=True)
    run("native C++ decode, workers=0", ds, 0)
    run("native C++ decode, workers=2", ds, 2)
    run("native C++ decode, workers=4", ds, 4)
    cds = CachedDataset(ds)  # first build decodes once
    run("CachedDataset memmap (warm epochs)", cds, 0)
    run("CachedDataset memmap, workers=2", cds, 2)


def e2e_train(base: str, batch: int, k: int, workers: int = 2):
    """The CLI's production hot loop (steps-per-dispatch block path,
    cli/train_cas.py:377-414), timed per epoch, vs a pre-staged control."""
    import jax
    import jax.numpy as jnp

    from srcgan_tpu import config, data
    from srcgan_tpu.cli.train_cas import _stacked_blocks
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.train import CasTrainer

    config.set_conv_precision("default")
    trainset = data.FileListDataset("Sat2Aerx1", "train", data_dir=base)
    trainer = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2,
                         act_dtype=jnp.bfloat16)
    state = trainer.init(jax.random.PRNGKey(0))
    print(f"2) production hot loop from disk (bs={batch}, K={k}, "
          f"workers={workers}, bf16-acts, RDDBNet+ResDeconv x2, "
          f"{len(trainset)} pairs/epoch):")

    def one_epoch(epoch, st):
        n = 0
        t0 = time.perf_counter()
        raw = data.batches(trainset, batch, shuffle=True, seed=0,
                           epoch=epoch, workers=workers)
        last = None
        for src_blk, tar_blk in preprocess.device_put_iter(
                _stacked_blocks(raw, k)):
            st, mrows = trainer.train_steps_u8(st, src_blk, tar_blk, 1e-4)
            last = mrows
            n += int(src_blk.shape[0]) * batch
        # the CLI syncs metrics every dispatch; sync the last to close timing
        float(np.asarray(last["loss_SR"])[-1])
        return st, n, time.perf_counter() - t0

    state, n, dt = one_epoch(1, state)
    print(f"  epoch 1 (cold: compile + decode): {dt:6.1f}s "
          f"{n / dt:7.1f} samples/s")
    for e in (2, 3):
        state, n, dt = one_epoch(e, state)
        print(f"  epoch {e} (warm): {dt:19.1f}s {n / dt:7.1f} samples/s")

    # control: identical dispatch loop on pre-staged host blocks (no decode)
    raw = data.batches(trainset, batch, shuffle=True, seed=0, epoch=3)
    blocks = list(_stacked_blocks(raw, k))
    t0 = time.perf_counter()
    n = 0
    last = None
    for src_blk, tar_blk in preprocess.device_put_iter(iter(blocks)):
        state, mrows = trainer.train_steps_u8(state, src_blk, tar_blk, 1e-4)
        last = mrows
        n += int(src_blk.shape[0]) * batch
    float(np.asarray(last["loss_SR"])[-1])
    dt = time.perf_counter() - t0
    print(f"  control (pre-staged blocks, no decode): {dt:5.1f}s "
          f"{n / dt:7.1f} samples/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sections", nargs="?", default="12")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    base = build_dataset(args.n, args.size)
    if "1" in args.sections:
        loader_only(base, args.n, args.batch)
    if "2" in args.sections:
        e2e_train(base, args.batch, args.k)
