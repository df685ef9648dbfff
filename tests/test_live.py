"""Live dashboard (utils.live) — the Visdom-server replacement.

The reference pushes window-per-name images to a Visdom server
(reference src/utils.py:52-59); LiveView serves the Logger's run directory
over HTTP with the same window semantics plus the loss history.
"""
import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest

from srcgan_tpu.utils import vis
from srcgan_tpu.utils.live import LiveView, maybe_start
from srcgan_tpu.utils.logging import Logger


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


@pytest.fixture()
def run_dir(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    img = np.random.default_rng(0).integers(
        0, 255, (16, 16, 3), dtype=np.uint8)
    vis.save_png(str(d / "fake_B.png"), img)
    vis.save_png(str(d / "real_B.png"), img)
    rows = [{"epoch": 1, "iter": 10, "t": 1.0,
             "losses": {"loss_SR": 0.5, "loss_C": 0.25}},
            {"epoch": 1, "iter": 20, "t": 2.0,
             "losses": {"loss_SR": 0.4, "loss_C": 0.2}}]
    with open(d / "losses.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)
    return str(d)


class TestLiveView:
    def test_endpoints(self, run_dir):
        live = LiveView(run_dir, port=0, host="127.0.0.1").start()
        try:
            st, ct, body = _get(live.port, "/")
            assert st == 200 and "text/html" in ct
            # both windows appear, window-per-name (utils.py:52-59 semantics)
            assert b"fake_B.png" in body and b"real_B.png" in body

            st, ct, body = _get(live.port, "/img/fake_B.png")
            assert st == 200 and ct == "image/png"
            assert body[:8] == b"\x89PNG\r\n\x1a\n"

            st, _, body = _get(live.port, "/losses.json")
            rows = json.loads(body)
            assert [r["iter"] for r in rows] == [10, 20]
            assert rows[-1]["losses"]["loss_SR"] == pytest.approx(0.4)

            # the page's per-tick window sync source: names track the dir,
            # so windows appearing mid-run (after the first compile) show up
            st, ct, body = _get(live.port, "/windows.json")
            assert st == 200 and json.loads(body) == ["fake_B.png",
                                                      "real_B.png"]
            os.remove(os.path.join(run_dir, "real_B.png"))
            _, _, body = _get(live.port, "/windows.json")
            assert json.loads(body) == ["fake_B.png"]
        finally:
            live.stop()

    def test_losses_tail_is_bounded(self, run_dir):
        # a long run's history must not be re-shipped in full every poll
        with open(os.path.join(run_dir, "losses.jsonl"), "w") as f:
            f.writelines(
                json.dumps({"epoch": 1, "iter": i, "t": float(i),
                            "losses": {"loss_SR": i * 1e-4}}) + "\n"
                for i in range(5000))
        live = LiveView(run_dir, port=0, host="127.0.0.1").start()
        try:
            _, _, body = _get(live.port, "/losses.json")
            rows = json.loads(body)
            assert 0 < len(rows) <= 256
            assert rows[-1]["iter"] == 4999  # tail, newest preserved
        finally:
            live.stop()

    def test_missing_and_traversal(self, run_dir, tmp_path):
        secret = tmp_path / "secret.png"
        secret.write_bytes(b"\x89PNG top secret")
        live = LiveView(run_dir, port=0, host="127.0.0.1").start()
        try:
            for path in ("/img/nope.png", "/img/fake_B.txt", "/nope",
                         "/img/../secret.png", "/img/..%2Fsecret.png"):
                with pytest.raises(urllib.error.HTTPError) as ei:
                    _get(live.port, path)
                assert ei.value.code == 404, path
            # empty-history dir still serves a page and an empty list
            os.remove(os.path.join(run_dir, "losses.jsonl"))
            st, _, body = _get(live.port, "/losses.json")
            assert st == 200 and json.loads(body) == []
        finally:
            live.stop()

    def test_maybe_start(self, run_dir):
        class A:
            live_port = None

        assert maybe_start(A()) is None
        A.live_port = 0
        live = maybe_start(A(), run_dir)
        try:
            assert live is not None
            # unauthenticated endpoints: default bind is loopback-only
            assert live._srv.server_address[0] == "127.0.0.1"
            st, _, _ = _get(live.port, "/")
            assert st == 200
        finally:
            live.stop()


class TestLoggerHistory:
    def test_appends_and_truncates(self, tmp_path, capsys):
        d = str(tmp_path / "run")
        lg = Logger(10, 2, image_dir=d)
        lg.log(nepoch=1, niter=5, losses={"loss_SR": 1.0})
        lg.log(nepoch=1, niter=10, losses={"loss_SR": np.float32(0.5)})
        with open(os.path.join(d, "losses.jsonl")) as f:
            rows = [json.loads(ln) for ln in f]
        assert len(rows) == 2
        assert rows[1] == {"epoch": 1, "iter": 10, "t": rows[1]["t"],
                           "losses": {"loss_SR": 0.5}}

        # a new Logger (new run) starts the history fresh
        lg2 = Logger(10, 2, image_dir=d)
        lg2.log(nepoch=1, niter=5, losses={"loss_SR": 2.0})
        with open(os.path.join(d, "losses.jsonl")) as f:
            rows = [json.loads(ln) for ln in f]
        assert len(rows) == 1 and rows[0]["losses"]["loss_SR"] == 2.0

        # image_dir=None never touches the filesystem
        Logger(10, 2, image_dir=None).log(
            nepoch=1, niter=1, losses={"x": 1.0})
        capsys.readouterr()

    def test_new_run_clears_stale_windows(self, tmp_path, capsys):
        """A reused run dir must not present the previous run's windows
        (possibly a different trainer's names) as live."""
        d = str(tmp_path / "run")
        lg = Logger(10, 1, image_dir=d)
        img = np.zeros((1, 8, 8, 3), np.float32)
        lg.log(1, 1, losses={"a": 1.0}, images={"recl_A": img})
        assert os.path.exists(os.path.join(d, "recl_A.png"))

        lg2 = Logger(10, 1, image_dir=d)
        lg2.log(1, 1, losses={"b": 1.0}, images={"fake_B": img})
        names = sorted(f for f in os.listdir(d) if f.endswith(".png"))
        assert names == ["fake_B.png"]  # stale recl_A.png gone
        # atomic-write temp never lingers
        assert not [f for f in os.listdir(d) if f.startswith(".")]
        capsys.readouterr()
