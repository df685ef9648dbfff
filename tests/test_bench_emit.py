"""bench.py survivability: partial emission, regression tripwire, assembly.

Round-3 postmortem (VERDICT.md): the driver's bench run timed out (rc=124)
and produced NO parsed JSON, losing the round's perf evidence.  bench.py is
now a section list with incremental scratch persistence, a budget watchdog
thread, and SIGTERM/SIGALRM partial emission — these tests pin that
contract so it cannot silently rot.  No backend is touched: subprocess runs
use the opt-in `_sleep` section / an empty section set.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# Unit: regression tripwire
# ---------------------------------------------------------------------------

class TestCheckRegressions:
    BANDS = {"thr_mps": (200.0, True), "step_ms": (40.0, False)}

    def test_within_band_clean(self):
        assert bench.check_regressions(
            {"thr_mps": 190.0, "step_ms": 44.0}, self.BANDS) == []

    def test_throughput_drop_flagged(self):
        out = bench.check_regressions({"thr_mps": 120.0}, self.BANDS)
        assert len(out) == 1 and out[0].startswith("thr_mps:")
        assert "40% worse" in out[0]

    def test_latency_rise_flagged(self):
        out = bench.check_regressions({"step_ms": 60.0}, self.BANDS)
        assert len(out) == 1 and out[0].startswith("step_ms:")

    def test_direction_aware_improvements_never_flag(self):
        # 2x faster fwd + 2x lower latency: both improvements
        assert bench.check_regressions(
            {"thr_mps": 400.0, "step_ms": 20.0}, self.BANDS) == []

    def test_missing_and_non_numeric_keys_ignored(self):
        assert bench.check_regressions({"step_ms": "n/a"}, self.BANDS) == []
        assert bench.check_regressions({}, self.BANDS) == []

    def test_tolerance_boundary(self):
        # exactly 20% worse is within tolerance (strict >)
        assert bench.check_regressions({"thr_mps": 160.0}, self.BANDS) == []
        assert bench.check_regressions({"thr_mps": 159.0}, self.BANDS) != []

    def test_default_bands_cover_headline_keys(self):
        for key in ("bf16_mps", "train_step_ms", "gan_step_ms",
                    "train_mfu_pct", "gan_pooled_step_ms", "lab_step_ms"):
            assert key in bench.EXPECTED_BANDS


# ---------------------------------------------------------------------------
# Unit: partial emissions carry the last complete headline (round 5: a
# degraded-relay window can stall the first compile past the whole budget;
# a zero-section partial must not erase all perf evidence)
# ---------------------------------------------------------------------------

class TestPriorComplete:
    def test_partial_attaches_prior_with_age(self, tmp_path, monkeypatch):
        cache = tmp_path / "last.json"
        cache.write_text(json.dumps(
            {"value": 203.2, "vs_baseline": 907.3,
             "t": time.time() - 7200.0}))
        monkeypatch.setattr(bench, "LAST_COMPLETE_CACHE", str(cache))
        out = bench.assemble(_state(), partial=True)
        pc = out["detail"]["prior_complete"]
        assert pc["value"] == 203.2 and pc["vs_baseline"] == 907.3
        assert 1.9 <= pc["age_h"] <= 2.2

    def test_complete_emission_never_attaches(self, tmp_path, monkeypatch):
        cache = tmp_path / "last.json"
        cache.write_text(json.dumps({"value": 1.0, "vs_baseline": 2.0,
                                     "t": time.time()}))
        monkeypatch.setattr(bench, "LAST_COMPLETE_CACHE", str(cache))
        out = bench.assemble(
            _state({"fwd": {"bf16_mps": 7.0, "platform": "tpu"}}),
            partial=False)
        assert "prior_complete" not in out["detail"]

    def test_missing_cache_is_silent(self, tmp_path, monkeypatch):
        monkeypatch.setattr(bench, "LAST_COMPLETE_CACHE",
                            str(tmp_path / "absent.json"))
        out = bench.assemble(_state(), partial=True)
        assert "prior_complete" not in out["detail"]


# ---------------------------------------------------------------------------
# Unit: torch-CPU baseline cache freshness (VERDICT r4 item 8)
# ---------------------------------------------------------------------------

class TestBaselineFreshness:
    def test_fresh_cache_reused_with_age(self, tmp_path, monkeypatch):
        cache = tmp_path / "bl.json"
        cache.write_text(json.dumps(
            {"mps": 0.5, "in_size": bench.IN_SIZE,
             "t": time.time() - 3600.0}))
        monkeypatch.setattr(bench, "BASELINE_CACHE", str(cache))
        out = bench.sec_torch_baseline()
        assert out["torch_cpu_mps"] == 0.5
        assert 0.9 <= out["torch_cpu_mps_age_h"] <= 1.2

    def test_stale_cache_remeasured(self, tmp_path, monkeypatch):
        """A cache older than MAX_BASELINE_AGE_S (or written by the
        pre-timestamp format) is re-measured and re-stamped."""
        cache = tmp_path / "bl.json"
        cache.write_text(json.dumps({"mps": 0.5,
                                     "in_size": bench.IN_SIZE}))  # no 't'
        monkeypatch.setattr(bench, "BASELINE_CACHE", str(cache))
        # shrink the torch net's work: 1 iter on a tiny input via the
        # module constants (the measurement path, not the math, is under
        # test)
        monkeypatch.setattr(bench, "TORCH_ITERS", 1)
        monkeypatch.setattr(bench, "IN_SIZE", 16)
        out = bench.sec_torch_baseline()
        assert out["torch_cpu_mps"] != 0.5
        assert out["torch_cpu_mps_age_h"] == 0.0
        stamped = json.loads(cache.read_text())
        assert stamped["t"] > 0 and stamped["in_size"] == 16


# ---------------------------------------------------------------------------
# Unit: headline assembly from partial section state
# ---------------------------------------------------------------------------

def _state(sections=None, skipped=(), errors=None):
    return {"run_start": 0.0, "sections": sections or {},
            "skipped": list(skipped), "errors": errors or {},
            "durations": {}}


class TestAssemble:
    def test_full_state(self):
        st = _state({"fwd_bf16": {"bf16_mps": 210.0, "fwd_mfu_pct": 30.0,
                                  "platform": "tpu"},
                     "torch_baseline": {"torch_cpu_mps": 0.3}})
        out = bench.assemble(st, partial=False)
        assert out["metric"] == "rddbnet_x4_sr_throughput"
        assert out["value"] == 210.0 and out["unit"] == "MP/s"
        assert out["vs_baseline"] == 700.0
        assert out["detail"]["platform"] == "tpu"
        assert "partial" not in out["detail"]
        assert "regressions" not in out["detail"]

    def test_missing_torch_falls_back_to_recorded(self):
        st = _state({"fwd_bf16": {"bf16_mps": 202.5, "platform": "tpu"}})
        out = bench.assemble(st, partial=True)
        assert out["detail"]["torch_cpu_mps"] == bench.TORCH_CPU_MPS_RECORDED
        assert out["detail"]["torch_cpu_mps_source"] == "recorded_r02"
        assert out["vs_baseline"] == round(
            202.5 / bench.TORCH_CPU_MPS_RECORDED, 2)
        assert out["detail"]["partial"] is True

    def test_cpu_platform_prefers_fp32(self):
        st = _state({"fwd_bf16": {"bf16_mps": 5.0, "platform": "cpu"},
                     "fwd_fp32": {"fp32_mps": 7.0}})
        assert bench.assemble(st, partial=False)["value"] == 7.0

    def test_empty_state_still_valid_json_shape(self):
        out = bench.assemble(_state(), partial=True)
        assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
        assert out["unit"] == "MP/s"

    def test_regression_and_bookkeeping_keys(self):
        st = _state({"fwd_bf16": {"bf16_mps": 100.0, "platform": "tpu"}},
                    skipped=["int8"], errors={"gan": "RuntimeError: x" * 50})
        d = bench.assemble(st, partial=True)["detail"]
        assert any(r.startswith("bf16_mps:") for r in d["regressions"])
        assert d["skipped_sections"] == ["int8"]
        assert len(d["section_errors"]["gan"]) <= 200


# ---------------------------------------------------------------------------
# Subprocess: the bench process yields the JSON line under kill conditions
# ---------------------------------------------------------------------------

def _run_bench(env_extra, tmp_path, sig=None, timeout=120):
    """Run bench.py; if sig is given, wait for the guards-installed
    handshake file (no fixed sleep — a loaded host delays startup
    arbitrarily) then deliver the signal."""
    env = dict(os.environ)
    env.update(env_extra)
    env["SRCGAN_BENCH_SCRATCH"] = str(tmp_path / "scratch.json")
    ready = tmp_path / "ready"
    env["SRCGAN_BENCH_READY_FILE"] = str(ready)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    if sig is not None:
        deadline = time.time() + 90
        while not ready.exists() and proc.poll() is None:
            if time.time() > deadline:
                proc.kill()
                raise AssertionError("bench never signalled readiness")
            time.sleep(0.1)
        time.sleep(0.5)  # let it enter the section body
        proc.send_signal(sig)
    out, err = proc.communicate(timeout=timeout)
    return proc.returncode, out, err


def _parse_last_json(out):
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in stdout: {out!r}"
    return json.loads(lines[-1])


@pytest.mark.parametrize("signame", ["SIGTERM", "SIGALRM"])
def test_signal_mid_section_still_emits_json(tmp_path, signame):
    """kill -TERM / kill -ALRM mid-bench still yields the headline line."""
    rc, out, err = _run_bench(
        {"SRCGAN_BENCH_SECTIONS": "_sleep", "SRCGAN_BENCH_SLEEP_S": "120",
         "SRCGAN_BENCH_BUDGET_S": "300"},
        tmp_path, sig=getattr(signal, signame))
    assert rc == 0, err
    parsed = _parse_last_json(out)
    assert parsed["detail"]["partial"] is True
    assert parsed["unit"] == "MP/s"


def test_budget_watchdog_emits_and_exits_zero(tmp_path):
    """Budget expiry fires the watchdog THREAD even while the main thread is
    blocked inside a section (the round-3 failure shape: a long remote
    compile past the driver timeout)."""
    t0 = time.time()
    rc, out, err = _run_bench(
        {"SRCGAN_BENCH_SECTIONS": "_sleep", "SRCGAN_BENCH_SLEEP_S": "120",
         "SRCGAN_BENCH_BUDGET_S": "6"},
        tmp_path, timeout=90)
    assert rc == 0, err
    assert time.time() - t0 < 60  # exited on budget, not on the sleep
    parsed = _parse_last_json(out)
    assert parsed["detail"]["partial"] is True


def test_empty_sections_completes_cleanly(tmp_path):
    rc, out, err = _run_bench(
        {"SRCGAN_BENCH_SECTIONS": " ", "SRCGAN_BENCH_BUDGET_S": "120"},
        tmp_path, timeout=90)
    assert rc == 0, err
    parsed = _parse_last_json(out)
    # nothing ran: fallback baseline + zero value, but the line exists
    assert parsed["detail"]["torch_cpu_mps_source"] == "recorded_r02"


def test_scratch_resume_skips_completed_sections(tmp_path):
    """Re-exec'd (or retried) runs must not repeat finished sections."""
    scratch = tmp_path / "scratch.json"
    start = 1000.0
    scratch.write_text(json.dumps(
        {"run_start": start,
         "sections": {"fwd_bf16": {"bf16_mps": 123.0, "platform": "tpu"}},
         "skipped": [], "errors": {}, "durations": {"fwd_bf16": 1.0}}))
    env = dict(os.environ)
    env.update({"SRCGAN_BENCH_SECTIONS": "fwd_bf16",
                "SRCGAN_BENCH_BUDGET_S": "100000",
                "SRCGAN_BENCH_START_S": repr(start),
                "SRCGAN_BENCH_SCRATCH": str(scratch)})
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
    parsed = _parse_last_json(proc.stdout)
    # the cached section result was reused verbatim — no TPU work happened
    assert parsed["value"] == 123.0
    assert "fwd_bf16 done" not in proc.stderr
