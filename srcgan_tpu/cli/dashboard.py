"""Standalone live dashboard over a run directory.

The in-process route is ``--live-port`` on the train CLIs; this entry point
watches a run directory some OTHER process is writing to (e.g. a training
job launched without the flag), mirroring how the reference's Visdom server
runs separately from training (reference src/utils.py:52-59).

    python -m srcgan_tpu.cli.dashboard --dir runs/latest --port 8097
"""
from __future__ import annotations

import argparse
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir", default="runs/latest",
                   help="run directory a Logger writes windows/losses into")
    p.add_argument("--port", type=int, default=8097,
                   help="HTTP port (Visdom's default); 0 = ephemeral")
    p.add_argument("--host", type=str, default="127.0.0.1",
                   help="bind address; the endpoints are unauthenticated, "
                        "so exposing beyond loopback (e.g. 0.0.0.0) is an "
                        "explicit opt-in")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from srcgan_tpu.utils.live import LiveView

    live = LiveView(args.dir, port=args.port, host=args.host).start()
    print(f"live dashboard over {args.dir}: http://localhost:{live.port}/")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        live.stop()


if __name__ == "__main__":
    main()
