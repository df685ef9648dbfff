"""Suite wall-clock budget guard (conftest tripwire; VERDICT r4 item 7).

The full suite's cost grew every round (349 tests / 1:26h in round 3 ->
378 / 1:21h in round 4); the tripwire makes further growth visible at the
end of any run instead of silently accumulating.  These tests pin the
comparison logic and the band-regeneration write path.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import conftest  # noqa: E402  (the tripwire lives in tests/conftest.py)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestDurationOverruns:
    BANDS = {"test_a.py": 100.0, "test_b.py": 10.0, "test_tiny.py": 0.4}

    def test_within_band_clean(self):
        assert conftest.duration_overruns(
            {"test_a.py": 140.0, "test_b.py": 14.9}, self.BANDS) == []

    def test_overrun_flagged_with_numbers(self):
        out = conftest.duration_overruns({"test_a.py": 151.0}, self.BANDS)
        assert out == [("test_a.py", 151.0, 100.0)]

    def test_missing_observations_never_flag(self):
        # a band entry whose file didn't run (quick lane, -k selection)
        assert conftest.duration_overruns({}, self.BANDS) == []

    def test_new_files_without_band_never_flag(self):
        assert conftest.duration_overruns(
            {"test_new.py": 9999.0}, self.BANDS) == []

    def test_subsecond_bands_ignored(self):
        # pure-noise bands: a 0.4 s file tripling is not a budget event
        assert conftest.duration_overruns(
            {"test_tiny.py": 1.3}, self.BANDS) == []

    def test_boundary_exact_tolerance_clean(self):
        assert conftest.duration_overruns(
            {"test_b.py": 15.0}, self.BANDS) == []
        assert conftest.duration_overruns(
            {"test_b.py": 15.1}, self.BANDS) != []


def test_durations_write_regenerates_bands(tmp_path):
    """SRCGAN_DURATIONS_WRITE=<path> makes a suite run dump its per-file
    durations as the new band file (the documented regeneration recipe)."""
    out = tmp_path / "bands.json"
    env = dict(os.environ)
    env["SRCGAN_DURATIONS_WRITE"] = str(out)
    env.pop("PYTEST_XDIST_WORKER", None)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         "tests/test_suite_guard.py::TestDurationOverruns"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    bands = json.loads(out.read_text())
    assert "test_suite_guard.py" in bands
    assert bands["test_suite_guard.py"] >= 0.0
