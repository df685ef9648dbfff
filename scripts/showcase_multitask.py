"""Converged multi-task showcase: the second adversarial driver trains to
quality (reference multi-task.py, net='2').

Protocol: cli.train_multitask with the reference's hyperparameters (bs=1,
Adam G 1e-4 / D 1e-5, pools of 4, cosine LR; identity off and loss_G_C
reported-not-added — the replicated multi-task.py:331,339-371 quirks) on
the colorizable synthetic Sat2Aerx2 layout.  Evaluation scores the full
adversarial SR-colorization composite fake_B = G_A(G_C(realA)) against
realB with the testCas.py metric protocol, and saves PSNR-gated
[gray src | fake_B | realB] panels (vis.sh:13 bar).

Usage:  python scripts/showcase_multitask.py
        MT_EPOCHS=2 python scripts/showcase_multitask.py   (smoke)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srcgan_tpu import data
from srcgan_tpu.cli import train_multitask

WORK = os.environ.get("MT_DIR", os.path.join("runs", "showcase_mt"))
EPOCHS = int(os.environ.get("MT_EPOCHS", "60"))
THRESHOLD = 22.5  # vis.sh:13


def main():
    data_dir = os.path.join(WORK, "dataset")
    ck = os.path.join(WORK, "checkpoints")
    res = os.path.join(WORK, "result")
    run_dir = os.path.join(WORK, "run")
    root = data.make_synthetic_dataset(
        os.path.join(data_dir, "Sat2Aerx2"), n_train=16, n_val=4, n_test=8,
        size=256, seed=7, scale=2, colorizable=True)

    train_multitask.main([
        "--mode", "x2", "--num-epochs", str(EPOCHS), "--batch-size", "1",
        # HOST pools (the reference's structure): the fully-fused
        # G+pools+D device-pool program (3 generators, 5 passes, remat)
        # OOM-kills the relay's remote compile helper at 256^2
        "--save-every", str(max(EPOCHS // 6, 1)),
        "--root", root, "--data-dir", data_dir, "--checkpoints", ck,
        "--run-dir", run_dir, "--log-every", "4", "--seed", "0"])

    _eval_and_panels(ck, root, data_dir, res)
    _loss_summary(os.path.join(run_dir, "losses.jsonl"))


def _eval_and_panels(ck, root, data_dir, res):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from srcgan_tpu import data as data_mod
    from srcgan_tpu.data import preprocess
    from srcgan_tpu.metrics import per_sample_evaluators
    from srcgan_tpu.train.multitask import MultiTaskTrainer
    from srcgan_tpu.train.state import load_params
    from srcgan_tpu.utils import vis

    tr = MultiTaskTrainer(mode="x2")
    pC = load_params(os.path.join(ck, f"netG_G_C_MTtask_x2_{EPOCHS:04d}.npz"))
    pA = load_params(os.path.join(ck, f"netG_G_A_MTtask_x2_{EPOCHS:04d}.npz"))
    ps_evals = per_sample_evaluators()

    @jax.jit
    def run(srcA):
        real_C = tr.netG_C.fwd(pC, srcA)     # SR'd gray, full resolution
        fake_B = tr.netG_A.fwd(pA, real_C)   # adversarial colorization
        return fake_B

    testset = data_mod.FileListDataset(root, "test", "G2RGB", data_dir)
    out_dir = os.path.join(res, f"vis_netG_MTtask_x2_{EPOCHS:04d}")
    os.makedirs(out_dir, exist_ok=True)
    performs = [[] for _ in ps_evals]
    n_saved = 0
    for idx in range(len(testset)):
        src_u8, tar_u8 = testset.raw(idx)
        srcA, realB = preprocess.convert_pair(
            jnp.asarray(src_u8[None]), jnp.asarray(tar_u8[None]), "G2RGB")
        fake_B = run(srcA)
        acc = ""
        for i, (name_, fn) in enumerate(ps_evals):
            val = float(np.asarray(fn(fake_B, realB))[0])
            performs[i].append(val)
            acc += f" {name_}:{val:0.2f};"
        name = testset.datalist[idx]
        p = performs[1][-1]  # PSNR
        print(f"  {name}:{acc}" + ("" if p > THRESHOLD
                                   else "  (below bar, not saved)"))
        if p > THRESHOLD:
            panel = vis.patch2vis(
                vis.tensor2img(np.asarray(srcA), "RGB"),
                vis.tensor2img(np.asarray(fake_B), "RGB"),
                vis.tensor2img(np.asarray(realB), "RGB"))
            vis.save_png(os.path.join(out_dir, name), panel)
            n_saved += 1
    print(f"panels clearing the {THRESHOLD} dB bar: {n_saved} -> {out_dir}")

    import pandas as pd

    os.makedirs(res, exist_ok=True)
    row = [[time.strftime("%h_%d"), f"netG_MTtask_x2_{EPOCHS:04d}"] +
           [sum(p) / len(p) for p in performs]]
    df = pd.DataFrame(row, columns=["time", "checkpoint"] +
                      [n for n, _ in ps_evals])
    log_path = os.path.join(res, "Performs.csv")
    if os.path.exists(log_path):
        df = pd.concat([pd.read_csv(log_path), df], ignore_index=True)
    df.to_csv(log_path, index=False, float_format="%.3f")
    print(df.tail(1).to_string(index=False))


def _loss_summary(path):
    if not os.path.exists(path):
        return
    rows = [json.loads(ln) for ln in open(path)]
    if not rows:
        return
    epochs = sorted({r["epoch"] for r in rows})
    picks = sorted({epochs[0], epochs[len(epochs) // 4],
                    epochs[len(epochs) // 2], epochs[3 * len(epochs) // 4],
                    epochs[-1]})
    keys = sorted(rows[0]["losses"])
    print("\nloss trajectory (per-epoch means):")
    print("  epoch  " + "  ".join(f"{k:>15s}" for k in keys))
    for e in picks:
        sel = [r["losses"] for r in rows if r["epoch"] == e]
        means = {k: sum(s[k] for s in sel) / len(sel) for k in keys}
        print(f"  {e:5d}  " + "  ".join(f"{means[k]:15.3f}" for k in keys))


if __name__ == "__main__":
    main()
