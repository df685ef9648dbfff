"""Multi-PROCESS data-parallel validation — the DCN analog testable on one host.

Everything multi-device in the test suite runs single-process over 8 virtual
CPU devices.  Real TPU pods are multi-process (one process per host, devices
global across hosts, collectives riding DCN between slices).  This script
validates that the Cas DP train step produces IDENTICAL parameters when run:

  - as 2 processes x 4 virtual CPU devices each (jax.distributed over a
    localhost coordinator, global 8-device mesh, per-host data.batches
    sharding, psum crossing the process boundary), vs
  - as 1 process x 4 virtual CPU devices (the plain single-controller run).

Gradient-mean equivalence holds because data.batches' strided host sharding
is a permutation of the same global batch (dataset.py host_id/num_hosts) and
pmean is permutation-invariant.  SURVEY.md §2.9 comm-backend row.

Usage:
  python scripts/multiproc_dp.py            # parent: launch, compare, report
  python scripts/multiproc_dp.py --worker I N PORT OUTDIR   # internal
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEPS = 3
GLOBAL_BATCH = 8
SIZE = 32
DEVS_PER_PROC = 4


def worker(pid: int, nproc: int, port: int, outdir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVS_PER_PROC}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        # cross-process CPU collectives need a real implementation
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=pid)
    assert jax.device_count() == DEVS_PER_PROC * nproc, jax.devices()

    import jax.tree_util as jtu
    from jax.sharding import NamedSharding, PartitionSpec as P

    from srcgan_tpu import data, parallel
    from srcgan_tpu.train import CasTrainer

    trainer = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2, lr=1e-3)
    state = trainer.init(jax.random.PRNGKey(0))
    mesh = parallel.make_mesh((jax.device_count(),), ("data",))
    step = parallel.make_cas_dp_step(trainer, mesh)
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))

    # grads-only probe: the pmean'd global gradient at step 1 is the tight
    # plumbing check (identical params across runs; the psum crosses the
    # process boundary).  Params after Adam steps only get a loose check:
    # Adam's first-step update is ~sign(grad)*lr, so reduction-order noise
    # on near-zero grads flips whole +-lr increments (the same drift model
    # as tests/test_training_dynamics.py).
    from jax import shard_map

    def grads_fn(st, realA, realB):
        g, _, m = trainer.grads(st, realA, realB)
        return jax.lax.pmean(g, "data"), jax.lax.pmean(m, "data")

    gprobe = jax.jit(shard_map(grads_fn, mesh=mesh,
                               in_specs=(P(), P("data"), P("data")),
                               out_specs=(P(), P()), check_vma=False))

    def to_global_replicated(tree):
        return jtu.tree_map(
            lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a)),
            tree)

    def to_global_batch(local):
        return jax.make_array_from_process_local_data(bsh, local)

    state = to_global_replicated(state)
    ds = data.FileListDataset("SynthSat", "train", "G2RGB", outdir)
    from srcgan_tpu.data import preprocess
    import jax.numpy as jnp

    per_host = GLOBAL_BATCH // nproc
    flat = {}
    losses = []
    for epoch in range(1, STEPS + 1):  # one step per epoch: fresh shuffle
        it = data.batches(ds, per_host, shuffle=True, seed=0, epoch=epoch,
                          host_id=pid, num_hosts=nproc)
        src_u8, tar_u8, _ = next(it)
        realA, realB = preprocess.convert_pair(jnp.asarray(src_u8),
                                               jnp.asarray(tar_u8), "G2RGB")
        realA = to_global_batch(np.asarray(realA))
        realB = to_global_batch(np.asarray(realB))
        if epoch == 1:
            g, m = gprobe(state, realA, realB)
            for i, leaf in enumerate(jtu.tree_leaves(g)):
                flat[f"g{i}"] = np.asarray(leaf.addressable_shards[0].data)
            flat["loss1"] = np.float64(m["loss_SR"].addressable_shards[0].data)
        state, metrics = step(state, realA, realB, 1e-3)
        losses.append(float(np.asarray(
            metrics["loss_SR"].addressable_shards[0].data)))

    if pid == 0:
        for i, leaf in enumerate(jtu.tree_leaves(state.sr.params) +
                                 jtu.tree_leaves(state.c.params)):
            flat[f"p{i}"] = np.asarray(leaf.addressable_shards[0].data)
        flat["losses"] = np.asarray(losses)
        np.savez(os.path.join(outdir, f"run_n{nproc}.npz"), **flat)
        print(f"worker {pid}/{nproc}: saved {len(flat)} arrays, "
              f"losses={losses}")


def parent() -> int:
    import socket

    import numpy as np

    with tempfile.TemporaryDirectory() as outdir:
        # synthetic dataset shared by all runs
        sys.path.insert(0, REPO)
        from srcgan_tpu import data
        data.make_synthetic_dataset(os.path.join(outdir, "SynthSat"),
                                    n_train=16, size=SIZE, seed=0)

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

        def launch(pid, nproc):
            return subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(pid), str(nproc), str(port), outdir],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

        # 2-process run (4+4 devices), then the single-process reference
        procs = [launch(0, 2), launch(1, 2)]
        outs = [p.communicate(timeout=2100)[0] for p in procs]
        for p, o in zip(procs, outs):
            if p.returncode != 0:
                print(o)
                if ("distributed" in o.lower() or "gloo" in o.lower()
                        or "collective" in o.lower()):
                    print(json.dumps({"ok": None,
                                      "skip": "jax.distributed unsupported"}))
                    return 3
                print(json.dumps({"ok": False, "error": "worker failed"}))
                return 1
        ref = launch(0, 1)
        out_ref = ref.communicate(timeout=2100)[0]
        if ref.returncode != 0:
            print(out_ref)
            print(json.dumps({"ok": False, "error": "reference run failed"}))
            return 1

        a = np.load(os.path.join(outdir, "run_n2.npz"))
        b = np.load(os.path.join(outdir, "run_n1.npz"))
        # tight: step-1 global gradients at identical params (permutation-
        # invariant pmean; only fp32 reduction order differs between the
        # 2x4 and 1x4 runs)
        gkeys = [k for k in a.files if k.startswith("g")]
        grad_err = max(
            float(np.max(np.abs(a[k] - b[k]))
                  / (np.max(np.abs(b[k])) + 1e-12)) for k in gkeys)
        loss1_err = float(abs(a["loss1"] - b["loss1"]))
        # loose: per-step losses and final params under the Adam sign-flip
        # drift model (see worker comment)
        loss_err = float(np.max(np.abs(a["losses"] - b["losses"])))
        pkeys = [k for k in a.files if k.startswith("p")]
        param_err = max(float(np.max(np.abs(a[k] - b[k]))) for k in pkeys)
        ok = bool(grad_err <= 1e-4 and loss1_err <= 1e-6
                  and loss_err <= 5e-3 and param_err <= 2e-2)
        print(json.dumps({"ok": ok, "step1_grad_rel_err": grad_err,
                          "step1_loss_abs_err": loss1_err,
                          "max_loss_abs_err": loss_err,
                          "final_param_abs_diff_adam_envelope": param_err,
                          "steps": STEPS, "global_batch": GLOBAL_BATCH,
                          "procs": 2, "devices_per_proc": DEVS_PER_PROC}))
        return 0 if ok else 1


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5])
        return 0
    return parent()


if __name__ == "__main__":
    sys.exit(main())
