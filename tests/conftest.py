"""Test configuration: force a virtual 8-device CPU backend.

Must run before jax is imported anywhere (pytest imports conftest first), so that
multi-device sharding logic is testable without TPU hardware — the standard JAX
"fake backend" answer to distributed testing (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Keep XLA from oversubscribing the (single) test CPU.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

# Hermetic compilation cache: some tests exercise CLI entry points that call
# config.enable_compilation_cache(); without this override they would share
# the production cache at ~/.cache/srcgan_tpu/jax — and a suite run killed
# mid-write can poison it (observed: a truncated entry SEGFAULTS jax's cache
# deserializer on the next read).  A per-run temp dir keeps test artifacts
# out of the real cache and makes every run start clean.
import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

_jax_cache_dir = tempfile.mkdtemp(prefix="srcgan_test_jax_")
os.environ["SRCGAN_JAX_CACHE"] = _jax_cache_dir
# each process (xdist controller + workers) removes its own dir — without
# this every suite run leaks tens of MB of compiled programs into /tmp
atexit.register(shutil.rmtree, _jax_cache_dir, ignore_errors=True)

# The axon TPU plugin in this image re-forces JAX_PLATFORMS=axon via site hooks,
# so pin the platform through jax.config too (this wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap in-process executable accumulation.

    Thousands of compiled programs alive in one process push the XLA CPU
    client toward a late-run segfault (see addopts note in pyproject.toml);
    dropping the pjit caches between modules keeps the resident compile
    state bounded.  Costs nothing across modules — they compile disjoint
    programs anyway.
    """
    yield
    import jax

    jax.clear_caches()


# ---------------------------------------------------------------------------
# Fast lane: `-m "not slow"`.
#
# Node ids measured >= ~40 s on this host (full-suite `--durations=80` run,
# round 4: 378 tests, 1:21 wall with 2 workers).  Marked centrally so the
# list is trivially regenerable from a durations run instead of scattering
# decorators; parametrized ids match on their base node id.  Two borderline
# parametrized families (zoo strict-export round-trips, CasTrainer variant
# matrix) are deliberately NOT marked: each param is fast and together they
# carry most of the quick lane's zoo parity coverage.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_parallel.py::TestCycleGANDP::test_gd_steps_u8_sharded_matches",
    "test_parallel.py::TestMultiProcessDP::test_two_process_dp_matches_single_process",
    "test_parallel.py::TestGANZero1::test_gd_zero1_matches_fused_gd_step",
    "test_parallel.py::TestCasDP::test_dp_matches_single_device",
    "test_parallel.py::TestCasDP::test_dp_composes_with_bf16_acts",
    "test_parallel.py::TestCasDP::test_dp_steps_u8_match_single_device",
    "test_parallel.py::TestCasDP::test_dp_steps_u8_lab_const_match_single_device",
    "test_serve.py::test_sharded_subtile_odd_scenes",
    "test_parallel.py::TestCycleGANDP::test_dp_matches_single_device",
    "test_parallel.py::TestCycleGANDP::test_sharded_steps_run",
    "test_parallel.py::TestZero1::test_zero1_composes_with_bf16_acts",
    "test_parallel.py::TestZero1::test_zero1_matches_plain_dp",
    "test_parallel.py::TestZero1StepsU8::test_zero1_steps_u8_match_plain_dp_steps",
    "test_parallel.py::TestZero1StepsU8::test_zero1_composes_with_bf16_acts",
    "test_parallel.py::TestZero1StepsU8::test_zero1_save_restore_roundtrip",
    "test_parallel.py::TestFSDP::test_fsdp_matches_plain_dp",
    "test_parallel.py::TestFSDP::test_fsdp_steps_u8_match_plain_dp_steps",
    "test_parallel.py::TestFSDP::test_cli_fsdp_flag",
    "test_parallel.py::TestTensorParallel::test_tp_step_matches_single_device",
    "test_parallel.py::TestCas2D::test_2d_matches_single_device",
    "test_parallel.py::TestTrunkPipeline::test_trunk_pipeline_train_matches_unsharded",
    "test_train.py::TestCycleGAN::test_ema_both_pool_paths",
    "test_train.py::TestCycleGAN::test_gd_steps_scan_matches_sequential",
    "test_train.py::TestCycleGAN::test_pack_passes_matches_sequential",
    "test_train.py::TestCycleGAN::test_fused_gd_step_matches_two_step_when_pool_passthrough",
    "test_train.py::TestCycleGAN::test_ema_with_device_pool",
    "test_train.py::TestCycleGAN::test_net1_rddb_pair",
    "test_train.py::TestCycleGAN::test_gd_step_pooled_matches_gd_step_on_warmup",
    "test_train.py::TestCycleGAN::test_srdens_iteration",
    "test_train.py::TestCycleGAN::test_pack_passes_composes_with_remat_and_bf16",
    "test_train.py::TestPooledStepsPerDispatch::test_gd_steps_pooled_scan_matches_sequential",
    "test_train.py::TestParallelDecode::test_gd_steps_u8_x4_synthesis_shapes",
    "test_train.py::TestMultiTask::test_pack_passes_matches_sequential",
    "test_train.py::TestMultiTask::test_device_pool_warmup_matches_host",
    "test_train.py::TestMultiTask::test_iteration_runs",
    "test_train.py::TestMultiTask::test_bf16_acts_iteration",
    "test_train.py::TestMultiTask::test_g_c_trains_through_chain",
    "test_train.py::TestBF16Training::test_grad_accum_matches_full_batch",
    "test_train.py::TestBF16Training::test_bf16_activations_track_fp32",
    "test_train.py::TestBF16Training::test_act_dtype_bf16_masters_stay_fp32",
    "test_train.py::TestBF16Training::test_train_steps_scan_matches_sequential",
    "test_train.py::TestBF16Training::test_ema_step_tracks_weights",
    "test_train.py::TestCasTrainer::test_loss_decreases",
    "test_train.py::TestMixedPrecision::test_cyclegan_bf16_activations",
    "test_cli.py::TestCycleGANDriver::test_mesh_dp",
    "test_cli.py::TestCycleGANDriver::test_device_pool",
    "test_cli.py::TestCycleGANDriver::test_zero_opt_workflow_and_resume",
    "test_cli.py::TestCycleGANDriver::test_short_training",
    "test_cli.py::TestCycleGANDriver::test_steps_per_dispatch",
    "test_cli.py::TestMultiTaskMesh::test_multitask_mesh_size",
    "test_cli.py::TestDevicePoolStepsPerDispatch::test_device_pool_composes_with_steps_per_dispatch",
    "test_cli.py::TestMultiTaskDriver::test_short_training",
    "test_cli.py::TestTrainTestVis::test_full_workflow",
    "test_cli.py::TestTrainTestVis::test_steps_per_dispatch_with_mesh",
    "test_cli.py::TestTrainTestVis::test_lab_workflow",
    "test_cli.py::TestZeroOptCLI::test_zero_opt_workflow_and_resume",
    "test_cli.py::TestZeroOptCLI::test_zero_opt_composes_with_orbax",
    "test_cli.py::TestZeroOptCLI::test_zero_opt_composes_with_steps_per_dispatch",
    "test_serving.py::TestInt8Serving::test_int8_quality_delta",
    "test_serve.py::test_mesh_sharded_daemon",
    "test_realdata_kit.py::test_realdata_repro_dry_run_all_stages",
    "test_training_dynamics.py::test_training_trajectories_match",
    "test_metrics_losses.py::TestVGGConversion::test_perceptual_train_step",
    "test_distill.py::TestDistillStep::test_dp_composes",
    "test_distill.py::TestDistillStep::test_alpha0_moves_student_toward_teacher",
    "test_distill.py::TestDistillStep::test_alpha1_is_bitwise_castrainer",
    "test_distill.py::TestDistillStep::test_bf16_acts_composes",
    "test_distill.py::TestDistillStep::test_blend_loss_matches_hand_computation",
    "test_distill.py::TestDistillCLI::test_train_cas_distill_flags",
    "test_orbax_io.py::test_zero1_state_round_trips_sharded",
    "test_orbax_io.py::test_fsdp_state_round_trips_sharded",
    "test_orbax_io.py::test_round_trip_with_extra",
    "test_zoo.py::TestEDSRZoo::test_rdn_config_a",
    "test_zoo.py::TestPix2Pix::test_unet_generator_instance_norm",
    "test_interop.py::TestImport::test_resdeconv",
    "test_interop.py::TestImport::test_rddbnet_pth_file",
    "test_fused.py::TestPhasefoldTail::test_rddbnet_fold_flag_equivalence",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("tests/")[-1].split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


# ---------------------------------------------------------------------------
# Suite wall-clock budget guard (VERDICT r4 item 7): per-file durations are
# recorded in tests/.duration_bands.json; a file whose cumulative test time
# exceeds its recorded band by >50% is reported at session end so the
# full-suite cost can't silently creep (round 3: 1:26h -> round 4: 1:21h at
# +29 tests; the band file is the one place the history lives).
#
# Regenerate after an intentional cost change:
#     SRCGAN_DURATIONS_WRITE=tests/.duration_bands.json \
#         python -m pytest tests/ -q
# Missing entries (new test files) never warn — they get a band at the next
# regeneration.  SRCGAN_DURATIONS_STRICT=1 turns warnings into a non-zero
# session exit (off by default: shared-host timing noise must not flake CI).
# ---------------------------------------------------------------------------

_BANDS_PATH = os.path.join(os.path.dirname(__file__), ".duration_bands.json")
_DURATION_TOLERANCE = 0.50
_file_durations: dict = {}


def duration_overruns(observed: dict, bands: dict,
                      tolerance: float = _DURATION_TOLERANCE) -> list:
    """[(file, observed_s, band_s)] for files >tolerance over their band;
    sub-second bands are ignored (pure noise)."""
    out = []
    for fname, band in bands.items():
        got = observed.get(fname)
        if got is None or band < 1.0:
            continue
        if got > band * (1.0 + tolerance):
            out.append((fname, round(got, 1), band))
    return out


def pytest_runtest_logreport(report):
    # xdist forwards worker reports to the controller, so this accumulates
    # the whole suite's call+setup durations in one place
    fname = report.nodeid.split("::")[0].split("/")[-1]
    _file_durations[fname] = (_file_durations.get(fname, 0.0)
                              + getattr(report, "duration", 0.0))


def pytest_sessionfinish(session, exitstatus):
    if getattr(session.config, "workerinput", None) is not None:
        return  # xdist worker: the controller holds the totals
    write = os.environ.get("SRCGAN_DURATIONS_WRITE")
    if write and _file_durations:
        import json as _json

        with open(write, "w") as f:
            _json.dump({k: round(v, 1)
                        for k, v in sorted(_file_durations.items())}, f,
                       indent=0)
        return
    try:
        import json as _json

        with open(_BANDS_PATH) as f:
            bands = _json.load(f)
    except OSError:
        return
    over = duration_overruns(_file_durations, bands)
    if over:
        lines = [f"  {f}: {got}s vs recorded {band}s band"
                 for f, got, band in over]
        msg = ("suite duration tripwire: these files exceed their recorded "
               "band by >50%% (regenerate tests/.duration_bands.json if "
               "intentional):\n%s" % "\n".join(lines))
        print("\nWARNING: " + msg)
        if os.environ.get("SRCGAN_DURATIONS_STRICT"):
            session.exitstatus = 1
