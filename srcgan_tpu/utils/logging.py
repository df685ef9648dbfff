"""Training logger (utils.py:32-59 equivalent) + step profiler.

The reference pushes live image windows to a Visdom server and prints
loss/ETA lines.  Visdom isn't part of this image (and a live server is a poor
fit for batch TPU jobs), so images go to PNG files under a run directory —
one file per window name, overwritten each log call, mirroring Visdom's
window-per-name semantics.  The stdout line format matches the reference.
"""
from __future__ import annotations

import datetime
import json
import os
import sys
import time
from typing import Dict, Optional

import numpy as np

from srcgan_tpu.utils import vis


class Logger:
    def __init__(self, n_iters: int, n_epochs: int,
                 image_dir: Optional[str] = "runs/latest"):
        self.n_iters = n_iters
        self.n_epochs = n_epochs
        self.init_time = time.time()
        self.image_dir = image_dir
        if image_dir:
            # run dirs (e.g. runs/latest) are reused across runs: start this
            # run's loss history AND window set fresh, like Visdom's windows
            # reset — otherwise the live dashboard presents the previous
            # run's PNGs (possibly a different trainer's window names) as
            # current
            try:
                for f in os.listdir(image_dir):
                    if f.endswith((".png", ".jsonl")):
                        os.remove(os.path.join(image_dir, f))
            except OSError:
                pass

    def log(self, nepoch: int, niter: int, losses: Optional[Dict] = None,
            images: Optional[Dict] = None, ver: str = "G2RGB") -> None:
        period = time.time() - self.init_time
        sys.stdout.write("\n Epoch %02d [%04d/%04d] >> " %
                         (nepoch, niter, self.n_iters))
        for k, v in (losses or {}).items():
            sys.stdout.write("%s: %.3f | " % (k, float(v)))
        iters_done = self.n_iters * (nepoch - 1) + niter
        iters_left = self.n_iters * self.n_epochs - iters_done
        eta = iters_left / max(iters_done, 1) * period
        sys.stdout.write("ETA: %s" % (datetime.timedelta(seconds=int(eta))))
        sys.stdout.flush()

        if losses and self.image_dir:
            # history consumed by utils.live.LiveView (and greppable per run)
            os.makedirs(self.image_dir, exist_ok=True)
            row = {"epoch": nepoch, "iter": niter, "t": round(period, 2),
                   "losses": {k: float(v) for k, v in losses.items()}}
            with open(os.path.join(self.image_dir, "losses.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")

        if images and self.image_dir:
            os.makedirs(self.image_dir, exist_ok=True)
            for k, v in images.items():
                mode = "RGB"
                # LAB-space windows (utils.py:54-55)
                if k in ("fake_AB", "real_B", "fake_BB") and ver == "G2LAB":
                    mode = "LAB"
                img = vis.tensor2img(np.asarray(v), mode)
                # atomic overwrite: LiveView may be serving this window
                # concurrently, and a reader racing a plain in-place write
                # would get a truncated PNG.  The hidden dot-name keeps the
                # temp out of the dashboard's window list (and the .png
                # suffix keeps PIL's format inference working).
                final = os.path.join(self.image_dir, f"{k}.png")
                tmp = os.path.join(self.image_dir, f".{k}.png")
                vis.save_png(tmp, img)
                os.replace(tmp, final)


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion; prints a summary.

    The reference has no profiling at all (SURVEY.md §5.1); this plus
    jax.profiler tracing (see profile_trace) is the TPU-side replacement.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t0 = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.array(self.times)
        return {"mean_s": float(arr.mean()), "p50_s": float(np.median(arr)),
                "min_s": float(arr.min()), "steps": len(arr)}


def profile_trace(log_dir: str):
    """Context manager: JAX profiler trace for TensorBoard/xprof."""
    import jax

    return jax.profiler.trace(log_dir)
