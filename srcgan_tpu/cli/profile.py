"""Profiling driver: per-step timing + optional jax.profiler trace.

  python -m srcgan_tpu.cli.profile --SRModel RDDBNet --up 2 --steps 20 \
      [--trace-dir runs/trace] [--bf16]

The reference has no profiling at all (SURVEY.md §5.1).  This measures the
fused cascaded train step with warmup exclusion and, with --trace-dir, emits
an xprof/TensorBoard trace of the XLA execution.
"""
from __future__ import annotations

import argparse
import json
import time


def build_parser():
    p = argparse.ArgumentParser(description="train-step profiler")
    p.add_argument("--SRModel", type=str, default="RDDBNet")
    p.add_argument("--CModel", type=str, default="ResDeconv")
    p.add_argument("--up", type=int, default=2)
    p.add_argument("--const", action="store_true")
    p.add_argument("--lab", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MXU conv mode (default: fp32-highest)")
    p.add_argument("--bf16-acts", action="store_true",
                   help="profile the mixed-precision step (bf16 stored "
                        "activations, fp32 masters — train_cas --bf16-acts)")
    p.add_argument("--trace-dir", type=str, default=None)
    p.add_argument("--cost-analysis", action="store_true",
                   help="print XLA's compiled cost model for the train step "
                        "(FLOPs, bytes accessed, optimal-seconds estimate) "
                        "and the achieved fraction")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from srcgan_tpu import config
    from srcgan_tpu.train import CasTrainer
    from srcgan_tpu.utils import StepTimer

    if args.bf16 or args.bf16_acts:
        config.set_conv_precision("default")

    trainer = CasTrainer(sr_model=args.SRModel, c_model=args.CModel,
                         up=args.up, const=args.const, lab=args.lab,
                         act_dtype=jnp.bfloat16 if args.bf16_acts else None)
    state = trainer.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tar = jnp.asarray(rng.uniform(
        0, 1, (args.batch_size, args.size, args.size, 3)).astype(np.float32))
    src = jnp.asarray((np.asarray(tar) @ np.array(
        [0.2125, 0.7154, 0.0721], np.float32))[..., None])

    # compile
    state, m = trainer.train_step(state, src, tar, 1e-4)
    float(m["loss_SR"])

    cost = None
    if args.cost_analysis:
        import jax.numpy as _jnp

        compiled = (jax.jit(trainer.train_step)
                    .lower(state, src, tar, _jnp.float32(1e-4)).compile())
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        cost = {k: float(ca[k]) for k in
                ("flops", "bytes accessed", "optimal_seconds") if k in ca}
        # some backends report a negative/garbage optimal_seconds
        if cost.get("optimal_seconds", 0) <= 0:
            cost.pop("optimal_seconds", None)

    timer = StepTimer(warmup=args.warmup)
    ctx = None
    if args.trace_dir:
        ctx = jax.profiler.trace(args.trace_dir)
        ctx.__enter__()
    for i in range(args.steps):
        with timer:
            state, m = trainer.train_step(
                state, src + jnp.float32(1e-6 * i), tar, 1e-4)
            float(m["loss_SR"])  # force completion
    if ctx is not None:
        ctx.__exit__(None, None, None)
        print(f"trace written to {args.trace_dir}")

    summary = timer.summary()
    summary.update({
        "samples_per_s": round(args.batch_size / summary["p50_s"], 2),
        "config": f"{args.SRModel}+{args.CModel} x{args.up} "
                  f"bs={args.batch_size} {args.size}^2 "
                  f"{'bf16acts' if args.bf16_acts else 'bf16' if args.bf16 else 'fp32'}",
    })
    if cost is not None:
        summary["cost_analysis"] = cost
        if cost.get("flops"):
            summary["achieved_tflops"] = round(
                cost["flops"] / summary["p50_s"] / 1e12, 3)
        if cost.get("optimal_seconds"):
            summary["fraction_of_xla_optimal"] = round(
                cost["optimal_seconds"] / summary["p50_s"], 3)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
