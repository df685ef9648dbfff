"""TPU validation + throughput of TiledPredictor and the StableHLO export.

Run from the repo root on the axon TPU:  python scripts/scene_probe.py

1. exactness: a 512x512 scene through the flagship RDDBNet(x4)+SRCNN-style
   local cascade, tiled (tile 128, overlap 48 >= RF radius ~19+) vs the
   full-image program — must match bit-for-bit on hardware too.
2. throughput: scene MP/s for a 1024x1024 gray scene through the x4
   RDDBNet+ResDeconv cascade (tile 256, overlap 32, bf16) — the number a
   user serving whole scenes actually gets, host stitch included.
3. deploy: export the cascade for ("tpu","cpu"), reload, run on the chip,
   compare to the live predictor.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from srcgan_tpu import models, serving
from srcgan_tpu.config import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    # -- 1. bit-exactness on hardware (local small-RF cascade) --------------
    # RF radius: nb=1 trunk = 1 + 15 + 1 = 17 LR convs, +1 LR for the HR
    # conv_last, + SRCNN 6 HR = 3 LR -> 21; overlap 32 > 21 => bit-exact
    sr = models.RDDBNet(1, 1, 2, nb=1)
    c = models.create("SRCNN", 1, 3, 1)
    pA, pB = sr.init(jax.random.PRNGKey(0)), c.init(jax.random.PRNGKey(1))
    full = serving.CascadePredictor(sr, pA, c, pB, up=2)
    tiled = serving.TiledPredictor(sr, pA, c, pB, up=2,
                                   tile=128, overlap=32, max_batch=8)
    scene = rng.integers(0, 256, (320, 448), dtype=np.uint8)
    want = full.predict(scene[None, ..., None])[0]
    got = tiled.predict_scene(scene)
    diff = np.abs(got.astype(int) - want.astype(int))
    print(f"exactness RDDBNet(x2)+SRCNN 320x448: mismatches="
          f"{int((diff > 0).sum())} max={int(diff.max())}")

    # -- 2. scene throughput (flagship serving config) ----------------------
    sr4 = models.create("RDDBNet", 1, 1, 4)
    c3 = models.create("ResDeconv", 1, 3)
    # tile 256 / overlap 32 -> core 192: 6x6 = 36 tiles, 3 dispatches at
    # max_batch 16.  Through the axon relay this measures the TUNNEL, not
    # the chip: ~150 MB of uint8 output D2H at ~20 MB/s dominates (device
    # compute for 50 MP at 203 MP/s is ~250 ms) — see docs/PERF.md.
    t4 = serving.TiledPredictor(
        sr4, sr4.init(jax.random.PRNGKey(2)), c3, c3.init(jax.random.PRNGKey(3)),
        up=4, bf16=True, tile=256, overlap=32, max_batch=16)
    big = rng.integers(0, 256, (1024, 1024), dtype=np.uint8)
    t4.predict_scene(big)  # warm (compile)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = t4.predict_scene(big)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    mp = out.shape[0] * out.shape[1] / 1e6
    print(f"scene x4 1024^2 -> 4096^2: {dt*1e3:.0f} ms = {mp/dt:.1f} MP/s "
          f"(output, host stitch included), 36 tiles / 3 dispatches")

    # -- 3. deploy artifact runs on the chip --------------------------------
    # fp32 for the comparison: artifact and live jit are two lowerings of
    # the same math, equal to ~1e-7 in fp32 (only round-boundary uint8
    # flips).  A bf16 comparison through a RANDOM-INIT GroupNorm colorizer
    # is chaotic and meaningless (docs/PERF.md "Scene serving..." section).
    from srcgan_tpu.deploy import export_cascade, load_exported

    pred = serving.CascadePredictor(sr, pA, c, pB, up=2)
    blob = export_cascade(pred, h=64, w=64, batch=None)
    run = load_exported(blob)
    x = rng.integers(0, 256, (2, 64, 64, 1), dtype=np.uint8)
    got = np.asarray(run(x))
    want = pred.predict(x)
    d = np.abs(got.astype(int) - want.astype(int))
    print(f"deploy artifact: {len(blob)/1e6:.2f} MB, on-chip mismatches="
          f"{int((d > 1).sum())} beyond +/-1 (maxdiff={int(d.max())})")


if __name__ == "__main__":
    main()
