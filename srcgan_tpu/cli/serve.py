"""HTTP serving daemon for the SR->colorize cascade.

The reference's only inference story is the per-sample eval loop in
testCas.py; `srcgan_tpu.serving.CascadePredictor` packages it as a fused
uint8->uint8 program, and this driver puts a production front on it:

  python -m srcgan_tpu.cli.serve \
      --netGA checkpoints/RDDBNet_A2C_x4_0050.npz \
      --netGB checkpoints/ResDeconv_C2B_x4_0050.npz \
      --port 8500 --bf16 --max-batch 8 --max-wait-ms 5

  POST /predict   body = PNG (gray or RGB; RGB is luma-converted on device)
                  -> 200 with the SR RGB PNG
  POST /predict_scene  (with --tile N) body = PNG of ANY size -> SR RGB PNG;
                  the scene is cut into overlapping NxN windows, run through
                  one compiled tile shape, and stitched seam-free
                  (serving.TiledPredictor)
  POST /reload    body = JSON {"netGA": path, "netGB": path} (either may be
                  omitted to re-read the currently-served file) -> hot-swap
                  the weights with ZERO downtime: same-architecture params
                  are jit arguments, so no recompile; the install runs on
                  the Batcher worker thread between device groups, so no
                  request ever sees half-swapped weights.  Pairs with
                  training epoch saves and cli.blend outputs.  With
                  --watch N the daemon polls the served files every N
                  seconds and hot-reloads on change by itself (save_params
                  writes atomically, so a poll never reads a torn file).
  GET  /healthz   -> JSON liveness + model config
  GET  /stats     -> JSON counters (requests, batches, mean batch size,
                     latency quantiles over a sliding window)
  GET  /metrics   -> the same counters in Prometheus text exposition
                     format (srcgan_* counters/gauges) for scraping

Requests are micro-batched: a collector thread groups same-shaped requests
for up to --max-wait-ms (or --max-batch), runs ONE fused device program per
group (batch padding buckets recompiles), and fans the outputs back out.
TPU throughput comes from batching — serving requests one by one leaves the
MXU >90% idle at these model sizes.

Stdlib-only (http.server + threading): no web framework in the image, and
none needed.

Shutdown drains: ``Batcher.close()`` stops admitting new requests (late
submits get a 503) but runs every already-queued group to completion before
the worker exits, so no accepted request is ever dropped on SIGINT/shutdown.
Scene requests get the same contract through ``SceneGate``: new scenes are
503'd once shutdown begins and ``close()`` waits out the in-flight ones.
Oversized bodies are rejected with 413 before the body is read
(``--max-request-mb``).

int8 concurrency: ``quant.quant_mode`` patches the conv dispatch
process-globally, but every device call goes through the Batcher's single
worker thread, so an int8 predictor is safe under concurrent HTTP clients.
The unsafe pattern — two predictors (or a predictor plus any other tracing
code) entering quant blocks concurrently in one process — now RAISES
RuntimeError at entry (quant_mode holds a process-exclusive lock) instead
of silently desyncing callsite indices; run one predictor per process.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import threading
import time
from collections import defaultdict, deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="SR cascade serving daemon")
    p.add_argument("--netGA", type=str, required=True)
    p.add_argument("--netGB", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MXU serving mode (recommended on TPU)")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--self-ensemble", action="store_true",
                   help="geometric self-ensemble (x8 dihedral TTA): every "
                        "request runs all D4 transforms as one batched "
                        "forward and averages — higher quality at ~8x "
                        "device FLOPs per request")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="micro-batching window")
    p.add_argument("--pad-batch", type=int, default=4,
                   help="pad group sizes to a multiple (compile bucketing); "
                        "0 disables")
    p.add_argument("--warmup", type=str, default=None,
                   help="comma-separated HxW gray input shapes to pre-compile "
                        "at startup (e.g. 128x128,256x256) so first requests "
                        "don't pay the ~20 s jit compile")
    p.add_argument("--max-request-mb", type=float, default=16.0,
                   help="reject request bodies larger than this with 413")
    p.add_argument("--watch", type=float, default=0.0,
                   help="poll the served checkpoint files every N seconds "
                        "and hot-reload when they change on disk (0 = off) "
                        "— follow a training run's epoch saves or cli.blend "
                        "outputs with no operator action")
    p.add_argument("--tile", type=int, default=0,
                   help="enable POST /predict_scene: arbitrary-size scenes "
                        "served through one compiled NxN tile shape "
                        "(serving.TiledPredictor); 0 disables")
    p.add_argument("--mesh-size", type=int, default=0,
                   help="shard the cascade over an N-device 'space' mesh "
                        "(image-height sharding, GSPMD halo exchange — "
                        "serving.SpatialShardedPredictor); composes with "
                        "--tile for any-size scenes.  0 = single device")
    p.add_argument("--tile-overlap", type=int, default=32,
                   help="tile halo cropped from each output tile; >= the "
                        "cascade receptive-field radius makes stitching "
                        "bit-exact vs a full-image program")
    return p


class ShuttingDown(RuntimeError):
    """Raised by Batcher.submit once close() has begun (HTTP 503)."""


class SceneGate:
    """Drain accounting for /predict_scene requests (which bypass the
    Batcher: TiledPredictor does its own device batching).  Gives scene
    traffic the same contract as /predict: new requests are 503'd once
    shutdown begins, and close() waits for every in-flight scene to finish
    so the process never exits mid-response."""

    def __init__(self):
        self._lock = threading.Condition()
        self._inflight = 0
        self._stop = False
        self.stats = {"scene_requests": 0, "scene_errors": 0}
        self._lat = deque(maxlen=512)
        # per-thread start time: the gate is entered by concurrent HTTP
        # handler threads (entry precedes the tiled_lock), so a shared
        # attribute would let thread B's entry clobber thread A's t0
        self._local = threading.local()

    def __enter__(self):
        with self._lock:
            if self._stop:
                raise ShuttingDown("server is shutting down")
            self._inflight += 1
            self.stats["scene_requests"] += 1
        self._local.t0 = time.perf_counter()
        return self

    def __exit__(self, et, ev, tb):
        with self._lock:
            self._inflight -= 1
            if et is None:
                self._lat.append(time.perf_counter() - self._local.t0)
            else:
                self.stats["scene_errors"] += 1
            self._lock.notify_all()
        return False

    def latency_quantiles(self):
        if not self._lat:
            return {}
        xs = np.sort(np.asarray(self._lat))
        q = lambda p: float(xs[min(len(xs) - 1, int(p * len(xs)))])
        return {"scene_p50_s": round(q(0.5), 4),
                "scene_p99_s": round(q(0.99), 4)}

    def close(self, timeout: float = 600.0):
        with self._lock:
            self._stop = True
            deadline = time.monotonic() + timeout
            while self._inflight and time.monotonic() < deadline:
                self._lock.wait(timeout=deadline - time.monotonic())


class _Request:
    __slots__ = ("img", "event", "out", "err", "t0")

    def __init__(self, img):
        self.img = img
        self.event = threading.Event()
        self.out = None
        self.err = None
        self.t0 = time.perf_counter()


class Batcher:
    """Groups same-shaped requests into one device call."""

    def __init__(self, predictor, max_batch: int = 8, max_wait_s: float = 0.005):
        self.predictor = predictor
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._lock = threading.Condition()
        self._queues = defaultdict(deque)   # (h, w, c) -> deque[_Request]
        self._control = deque()             # (fn, result_box, done_event)
        self._stop = False
        self.stats = {"requests": 0, "batches": 0, "batched_samples": 0,
                      "errors": 0}
        self._lat = deque(maxlen=512)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, img: np.ndarray) -> np.ndarray:
        req = _Request(img)
        with self._lock:
            if self._stop:
                raise ShuttingDown("server is shutting down")
            self._queues[img.shape].append(req)
            self.stats["requests"] += 1
            self._lock.notify()
        req.event.wait()
        if req.err is not None:
            raise req.err
        self._lat.append(time.perf_counter() - req.t0)
        return req.out

    def latency_quantiles(self):
        if not self._lat:
            return {}
        xs = np.sort(np.asarray(self._lat))
        q = lambda p: float(xs[min(len(xs) - 1, int(p * len(xs)))])
        return {"p50_s": round(q(0.5), 4), "p90_s": round(q(0.9), 4),
                "p99_s": round(q(0.99), 4)}

    def run_in_worker(self, fn, timeout: float = 60.0):
        """Run ``fn()`` on the batching worker thread, between device groups.

        The worker is the ONLY ``predict()`` caller, so predictor mutation
        here (checkpoint hot-reload) is race-free by construction — no
        group ever sees half-swapped weights.  Returns fn's result or
        re-raises its exception in the calling thread.
        """
        done = threading.Event()
        box = {}
        with self._lock:
            if self._stop:
                raise ShuttingDown("server is shutting down")
            self._control.append((fn, box, done))
            self._lock.notify_all()
        if not done.wait(timeout):
            raise TimeoutError("batcher worker did not run the action "
                               f"within {timeout}s")
        if "err" in box:
            raise box["err"]
        return box.get("out")

    def close(self, drain: bool = True, timeout: float = 60.0):
        """Stop admitting requests; by default run every queued group first.

        With ``drain=False`` (or on join timeout) the remaining waiters are
        failed with ShuttingDown instead of being left hanging.
        """
        with self._lock:
            self._stop = True
            if not drain:
                self._fail_queued_locked()
            self._lock.notify_all()
        self._thread.join(timeout=timeout)
        with self._lock:
            self._fail_queued_locked()

    def _fail_queued_locked(self):
        for q in self._queues.values():
            for r in q:
                r.err = ShuttingDown("server shut down before running this "
                                     "request")
                r.event.set()
        self._queues.clear()
        for _, box, done in self._control:
            box["err"] = ShuttingDown("server shut down before running this "
                                      "action")
            done.set()
        self._control.clear()

    def _take_group(self):
        """Largest same-shape group, capped at max_batch (holds the lock)."""
        if not any(self._queues.values()):
            return None
        shape = max(self._queues, key=lambda s: len(self._queues[s]))
        q = self._queues[shape]
        group = [q.popleft() for _ in range(min(len(q), self.max_batch))]
        if not q:
            del self._queues[shape]
        return group

    def _run(self):
        while True:
            ctl = group = None
            with self._lock:
                while (not self._stop and not any(self._queues.values())
                       and not self._control):
                    self._lock.wait()
                if self._control:
                    # control actions jump the queue (a reload should not
                    # wait out a deep backlog; already-running groups have
                    # finished by construction)
                    ctl = self._control.popleft()
                elif self._stop and not any(self._queues.values()):
                    break  # drained: nothing queued remains
                else:
                    if not self._stop:
                        # micro-batching window: wait for stragglers of any
                        # shape
                        deadline = time.monotonic() + self.max_wait_s
                        while (not self._stop and not self._control
                               and sum(map(len, self._queues.values()))
                               < self.max_batch
                               and time.monotonic() < deadline):
                            self._lock.wait(
                                timeout=deadline - time.monotonic())
                        if self._control:
                            ctl = self._control.popleft()
                    if ctl is None:
                        group = self._take_group()
            if ctl is not None:
                fn, box, done = ctl
                try:
                    box["out"] = fn()
                except Exception as e:
                    box["err"] = e
                finally:
                    done.set()
                continue
            if not group:
                continue
            try:
                batch = np.stack([r.img for r in group])
                outs = self.predictor.predict(batch)
                for r, o in zip(group, outs):
                    r.out = o
            except Exception as e:  # surface to every waiter
                for r in group:
                    r.err = e
                self.stats["errors"] += 1
            finally:
                self.stats["batches"] += 1
                self.stats["batched_samples"] += len(group)
                for r in group:
                    r.event.set()


def make_reloader(batcher, config, tiled, tiled_lock):
    """A serialized do_reload(netGA, netGB) closure shared by the /reload
    endpoint and the --watch poller.  None arguments mean "re-read the
    currently-served path"."""
    reload_lock = threading.Lock()

    def do_reload(ga=None, gb=None):
        with reload_lock:
            ga = ga or config["netGA"]
            gb = gb or config["netGB"]
            install = batcher.predictor.reload_checkpoints(ga, gb)
            batcher.run_in_worker(install)
            if tiled is not None:
                install_t = tiled.reload_checkpoints(ga, gb)
                with tiled_lock:
                    install_t()
            config["netGA"], config["netGB"] = ga, gb
            batcher.stats["reloads"] = batcher.stats.get("reloads", 0) + 1
        return ga, gb

    return do_reload


def make_watcher(batcher, config, do_reload, interval: float):
    """Daemon thread polling the served checkpoint files' (mtime_ns, size);
    on change, hot-reload through ``do_reload``.  Load failures (e.g. a
    non-atomic external writer caught mid-write) count as watch_errors and
    retry on the next tick — the old weights keep serving.  Returns a stop
    Event."""
    stop = threading.Event()

    def sig():
        try:
            out = []
            for p in (config["netGA"], config["netGB"]):
                st = os.stat(p)
                out.append((st.st_mtime_ns, st.st_size))
            return tuple(out)
        except OSError:
            return None

    def loop():
        last = sig()
        while not stop.wait(interval):
            cur = sig()
            if cur is None or cur == last:
                continue
            try:
                do_reload()
                last = sig()
                batcher.stats["watch_reloads"] = (
                    batcher.stats.get("watch_reloads", 0) + 1)
                print(f"watch: reloaded {config['netGA']} + "
                      f"{config['netGB']}")
            except ShuttingDown:
                return
            except Exception as e:  # noqa: BLE001 - keep serving old weights
                batcher.stats["watch_errors"] = (
                    batcher.stats.get("watch_errors", 0) + 1)
                print(f"watch: reload failed ({e}); retrying next tick")

    threading.Thread(target=loop, daemon=True, name="ckpt-watch").start()
    return stop


def make_handler(batcher, config, tiled=None, scene_gate=None,
                 do_reload=None, tiled_lock=None):
    # scene requests are internally batched by TiledPredictor; a lock keeps
    # concurrent HTTP threads from interleaving big tile streams on-device
    if tiled_lock is None:
        tiled_lock = threading.Lock()
    if do_reload is None:
        do_reload = make_reloader(batcher, config, tiled, tiled_lock)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; /stats has counters
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _collect_stats(self):
            s = dict(batcher.stats)
            if s["batches"]:
                s["mean_batch"] = round(
                    s["batched_samples"] / s["batches"], 2)
            s.update(batcher.latency_quantiles())
            if scene_gate is not None:
                s.update(scene_gate.stats)
                s.update(scene_gate.latency_quantiles())
            return s

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **config})
            elif self.path == "/stats":
                self._json(200, self._collect_stats())
            elif self.path == "/metrics":
                # Prometheus text exposition of the same counters: scrape
                # the daemon like any other production service.  Monotonic
                # totals are counters; latency quantiles / mean batch size
                # are gauges (quantile keys end in _s, seconds).
                lines = []
                for k, v in sorted(self._collect_stats().items()):
                    if not isinstance(v, (int, float)):
                        continue
                    typ = ("gauge" if k.endswith("_s") or k == "mean_batch"
                           else "counter")
                    name = f"srcgan_{k}"
                    lines += [f"# TYPE {name} {typ}", f"{name} {v}"]
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path == "/reload":
                self._reload()
                return
            if self.path not in ("/predict", "/predict_scene"):
                self._json(404, {"error": "unknown path"})
                return
            if self.path == "/predict_scene" and tiled is None:
                self._json(404, {"error": "scene serving disabled; start "
                                 "the daemon with --tile"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                # negative length would turn rfile.read(n) into
                # read-to-EOF — unbounded buffering, the exact hazard the
                # size limit exists to prevent
                if n < 0 or n > config["max_request_bytes"]:
                    # reject before reading the body; the unread body makes
                    # the connection unreusable, so close it
                    self.close_connection = True
                    self._json(413, {"error": "request body too large "
                                     f"({n} > {config['max_request_bytes']} "
                                     "bytes)"})
                    return
                from PIL import Image

                img = np.asarray(Image.open(io.BytesIO(self.rfile.read(n))))
                if img.dtype != np.uint8:
                    raise ValueError("PNG must be 8-bit")
                if img.ndim == 2:
                    img = img[..., None]
                if self.path == "/predict_scene":
                    with scene_gate, tiled_lock:
                        out = tiled.predict_scene(img)
                else:
                    out = batcher.submit(img)
                buf = io.BytesIO()
                Image.fromarray(out).save(buf, format="PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except ShuttingDown as e:
                self._json(503, {"error": str(e)})
            except Exception as e:
                self._json(400, {"error": str(e)})

        def _reload(self):
            """Checkpoint hot-reload: body = JSON {"netGA": …, "netGB": …}
            (either may be omitted to re-read the currently-served path —
            e.g. after a training run overwrote it, or after cli.blend).
            Same architecture only; weights swap with zero recompilation
            and no dropped requests (the install runs on the Batcher worker
            between groups / under the scene lock)."""
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n < 0 or n > config["max_request_bytes"]:
                    self.close_connection = True
                    self._json(413, {"error": "request body too large"})
                    return
                body = json.loads(self.rfile.read(n) or b"{}")
                t0 = time.perf_counter()
                ga, gb = do_reload(body.get("netGA"), body.get("netGB"))
                self._json(200, {"reloaded": True, "netGA": ga, "netGB": gb,
                                 "seconds": round(
                                     time.perf_counter() - t0, 3)})
            except ShuttingDown as e:
                self._json(503, {"error": str(e)})
            except Exception as e:
                self._json(400, {"error": str(e)})

    return Handler


def make_server(args) -> ThreadingHTTPServer:
    from srcgan_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from srcgan_tpu.serving import CascadePredictor, SpatialShardedPredictor

    mesh = None
    mesh_size = getattr(args, "mesh_size", 0)
    if mesh_size:
        import jax

        from srcgan_tpu import parallel

        if mesh_size > jax.device_count():
            raise SystemExit(
                f"--mesh-size {mesh_size} exceeds the {jax.device_count()} "
                f"visible devices")
        mesh = parallel.make_mesh((mesh_size,), ("space",))
    pred_cls = SpatialShardedPredictor if mesh is not None else CascadePredictor
    pred = pred_cls.from_checkpoints(
        args.netGA, args.netGB, bf16=args.bf16, pad_batch_to=args.pad_batch,
        self_ensemble=args.self_ensemble,
        **({"mesh": mesh} if mesh is not None else {}))
    if args.warmup:
        for spec in args.warmup.split(","):
            h, w = (int(v) for v in spec.lower().split("x"))
            # the batcher pads ragged groups via pad_batch_to, so warming
            # every padded BUCKET up to max_batch covers every group size
            # (warming only batch 1 would still leave e.g. sizes 5-8 to pay
            # the first-request jit when pad_batch=4, max_batch=8); without
            # bucketing warm the two sizes the batcher actually produces
            # under no-load (1) and saturation (max_batch)
            if args.pad_batch:
                import math

                nb = math.ceil(args.max_batch / args.pad_batch)
                sizes = {args.pad_batch * i for i in range(1, nb + 1)}
            else:
                sizes = {1, args.max_batch}
            for n in sorted(sizes):
                t0 = time.perf_counter()
                pred.predict(np.zeros((n, h, w, 1), np.uint8))
                print(f"warmed {n}x{h}x{w} in {time.perf_counter()-t0:.1f}s")
    tiled = None
    if args.tile:
        from srcgan_tpu.serving import (SpatialShardedTiledPredictor,
                                        TiledPredictor)

        # share the loaded weights; TiledPredictor owns its batch padding.
        # Under --mesh-size the scene tiles cross the height-sharded
        # program too (SpatialShardedTiledPredictor).
        tiled_cls = (SpatialShardedTiledPredictor if mesh is not None
                     else TiledPredictor)
        tiled = tiled_cls(
            pred.sr_model, pred.sr_params, pred.c_model, pred.c_params,
            up=pred.up, lab=pred.lab, bf16=pred.bf16,
            sr_state=pred.sr_state, c_state=pred.c_state,
            self_ensemble=args.self_ensemble,
            tile=args.tile, overlap=args.tile_overlap,
            max_batch=args.max_batch,
            **({"mesh": mesh} if mesh is not None else {}))
        if args.warmup:
            # both channel counts: an RGB scene compiles a separate program
            for ch in (1, 3):
                t0 = time.perf_counter()
                tiled.predict(np.zeros(
                    (args.max_batch, args.tile, args.tile, ch), np.uint8))
                print(f"warmed scene tile {args.max_batch}x{args.tile}x"
                      f"{args.tile}x{ch} in {time.perf_counter()-t0:.1f}s")
    batcher = Batcher(pred, max_batch=args.max_batch,
                      max_wait_s=args.max_wait_ms / 1e3)
    config = {"netGA": args.netGA, "netGB": args.netGB, "up": pred.up,
              "lab": pred.lab, "bf16": pred.bf16,
              "max_batch": args.max_batch,
              "max_request_bytes": int(args.max_request_mb * 1024 * 1024),
              **({"tile": args.tile, "tile_overlap": args.tile_overlap}
                 if args.tile else {}),
              **({"mesh_size": mesh_size} if mesh_size else {})}
    scene_gate = SceneGate() if tiled is not None else None
    tiled_lock = threading.Lock()
    do_reload = make_reloader(batcher, config, tiled, tiled_lock)
    srv = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(batcher, config, tiled=tiled, scene_gate=scene_gate,
                     do_reload=do_reload, tiled_lock=tiled_lock))
    srv.batcher = batcher
    srv.scene_gate = scene_gate
    srv.do_reload = do_reload
    srv.watch_stop = (make_watcher(batcher, config, do_reload, args.watch)
                      if args.watch > 0 else None)
    return srv


def main(argv=None):
    import signal
    import threading

    args = build_parser().parse_args(argv)
    srv = make_server(args)
    host, port = srv.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(POST /predict, GET /healthz, GET /stats)")
    # SIGTERM (systemd/k8s stop) takes the same drain path as Ctrl-C.
    # shutdown() must not run on the serve_forever thread (it joins it).
    prev = signal.signal(signal.SIGTERM, lambda s, f: threading.Thread(
        target=srv.shutdown, daemon=True).start())
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        signal.signal(signal.SIGTERM, prev)
        if srv.watch_stop is not None:
            srv.watch_stop.set()
        srv.batcher.close()
        if srv.scene_gate is not None:
            srv.scene_gate.close()  # wait out in-flight tiled scenes too


if __name__ == "__main__":
    main()
