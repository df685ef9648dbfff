"""End-to-end CLI driver tests on synthetic data — the run.sh workflow:
train -> checkpoints -> test (Performs.csv) -> vis panels."""
import os

import numpy as np
import pandas as pd
import pytest

from srcgan_tpu import data


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    data.make_synthetic_dataset(str(d / "Sat2Aerx1"), n_train=4, n_val=1,
                                n_test=2, size=32)
    return str(d)


class TestTrainTestVis:
    def test_full_workflow(self, synth, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas, test_cas, vis_cas

        train_cas.main([
            "--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--num-epochs", "2", "--save-every", "2", "--log-every", "2",
            "--checkpoints", str(tmp_path / "ckpt"),
            "--live-port", "0",  # dashboard server lifecycle around a run
            "--augment",  # D4 augmentation wired through the train loop
        ])
        netGA = str(tmp_path / "ckpt" / "ESPCN_A2C_x2_0002.npz")
        netGB = str(tmp_path / "ckpt" / "ResDeconv_C2B_x2_0002.npz")
        assert os.path.exists(netGA) and os.path.exists(netGB)

        df = test_cas.main([
            "--netGA", netGA, "--netGB", netGB,
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--result-dir", str(tmp_path / "result"),
        ])
        csv = pd.read_csv(tmp_path / "result" / "Performs.csv")
        assert list(csv.columns) == ["time", "checkpoint", "MSE", "PSNR",
                                     "AE", "SSIM"]
        assert len(csv) == 1
        assert np.isfinite(csv["PSNR"].iloc[0])

        # geometric self-ensemble eval (x8 dihedral TTA) appends its own row
        test_cas.main([
            "--netGA", netGA, "--netGB", netGB,
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--result-dir", str(tmp_path / "result"), "--self-ensemble",
        ])
        csv = pd.read_csv(tmp_path / "result" / "Performs.csv")
        assert len(csv) == 2 and np.isfinite(csv["PSNR"].iloc[1])
        # per-sample PNGs for both domains
        outA = os.listdir(tmp_path / "result" / "A_ESPCN_x2_0002")
        assert sorted(outA) == ["test-0.png", "test-1.png"]

        # vis: threshold -100 saves everything, +100 saves nothing
        n = vis_cas.main([
            "--netGA", netGA, "--netGB", netGB, "--root", "Sat2Aerx1",
            "--data-dir", synth, "--result-dir", str(tmp_path / "result"),
            "--threshold", "-100"])
        assert n == 2
        n = vis_cas.main([
            "--netGA", netGA, "--netGB", netGB, "--root", "Sat2Aerx1",
            "--data-dir", synth, "--result-dir", str(tmp_path / "result"),
            "--threshold", "100"])
        assert n == 0

    def test_mesh_eval_matches_single_device(self, synth, tmp_path,
                                             monkeypatch):
        """--mesh-size N on the eval driver: batch-sharded DP eval produces
        the same Performs.csv metrics and per-sample PNGs as the
        single-device protocol (ragged batches edge-padded; pad rows never
        reach metrics or disk)."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import test_cas, train_cas

        train_cas.main([
            "--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--num-epochs", "1", "--save-every", "1", "--log-every", "4",
            "--checkpoints", str(tmp_path / "ckpt_me"),
        ])
        netGA = str(tmp_path / "ckpt_me" / "ESPCN_A2C_x2_0001.npz")
        netGB = str(tmp_path / "ckpt_me" / "ResDeconv_C2B_x2_0001.npz")
        base = [
            "--netGA", netGA, "--netGB", netGB,
            "--root", "Sat2Aerx1", "--data-dir", synth,
        ]
        df0 = test_cas.main(base + ["--result-dir", str(tmp_path / "r0")])
        # default batch-size 1 is auto-raised to the mesh multiple (4), and
        # the 2-sample test split is edge-padded 2 -> 4: pad rows must not
        # perturb the real samples' metrics or get saved
        df1 = test_cas.main(base + [
            "--result-dir", str(tmp_path / "r1"), "--mesh-size", "4"])
        for col in ("MSE", "PSNR", "AE", "SSIM"):
            np.testing.assert_allclose(df1[col].iloc[-1], df0[col].iloc[-1],
                                       rtol=1e-5, atol=2e-5, err_msg=col)
        outB = sorted(os.listdir(tmp_path / "r1" / "B_ESPCN_x2_0001"))
        assert outB == ["test-0.png", "test-1.png"]
        # int8 + mesh is an explicit non-composition
        with pytest.raises(SystemExit, match="int8"):
            test_cas.main(base + ["--result-dir", str(tmp_path / "r2"),
                                  "--mesh-size", "2", "--precision", "int8"])

    def test_steps_per_dispatch_workflow(self, synth, tmp_path, monkeypatch):
        """--steps-per-dispatch K trains through the scanned multi-step
        program (one dispatch per K batches) and produces the same
        checkpoint artifacts as the per-step path."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas

        train_cas.main([
            "--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--num-epochs", "1", "--save-every", "1", "--log-every", "2",
            "--steps-per-dispatch", "2",
            "--checkpoints", str(tmp_path / "ckpt_spd"),
        ])
        assert os.path.exists(
            tmp_path / "ckpt_spd" / "ESPCN_A2C_x2_0001.npz")
        assert os.path.exists(
            tmp_path / "ckpt_spd" / "casstate_latest.npz")

    def test_steps_per_dispatch_with_mesh(self, synth, tmp_path, monkeypatch):
        """--steps-per-dispatch composes with a 1-D data mesh: K scanned
        psum'd DP updates per dispatch (make_cas_dp_steps_u8)."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas

        train_cas.main([
            "--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--num-epochs", "1", "--save-every", "1", "--log-every", "2",
            "--steps-per-dispatch", "2", "--mesh-size", "2",
            "--batch-size", "2",
            "--checkpoints", str(tmp_path / "ckpt_spd_dp"),
        ])
        assert os.path.exists(
            tmp_path / "ckpt_spd_dp" / "ESPCN_A2C_x2_0001.npz")
        # indivisible batch is rejected up front
        with pytest.raises(SystemExit, match="divisible"):
            train_cas.main([
                "--SRModel", "ESPCN", "--root", "Sat2Aerx1",
                "--data-dir", synth, "--steps-per-dispatch", "2",
                "--mesh-size", "2", "--batch-size", "3",
                "--checkpoints", str(tmp_path / "ckpt_spd_bad")])

    def test_lab_workflow(self, synth, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas, test_cas

        train_cas.main([
            "--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
            "--lab", "--root", "Sat2Aerx1", "--data-dir", synth,
            "--num-epochs", "1", "--save-every", "1", "--log-every", "100",
            "--checkpoints", str(tmp_path / "ckpt"),
        ])
        netGA = str(tmp_path / "ckpt" / "ESPCN@G2LAB_A2C_x2_0001.npz")
        netGB = str(tmp_path / "ckpt" / "ResDeconv@G2LAB_C2B_x2_0001.npz")
        assert os.path.exists(netGA)
        test_cas.main([
            "--netGA", netGA, "--netGB", netGB,
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--result-dir", str(tmp_path / "result_lab"),
        ])
        assert os.path.exists(tmp_path / "result_lab" / "Performs.csv")


class TestCycleGANDriver:
    def test_short_training(self, synth, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cyclegan

        train_cyclegan.main([
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--num-epochs", "1", "--save-every", "1",
            "--log-every", "100", "--checkpoints", str(tmp_path / "ckpt_cyc"),
        ])
        assert os.path.exists(tmp_path / "ckpt_cyc" /
                              "netG_A2B_SRtask_x2_0001.npz")
        # full-state resume continues where the run stopped
        assert os.path.exists(tmp_path / "ckpt_cyc" / "cyclestate_latest.npz")
        train_cyclegan.main([
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--num-epochs", "2", "--save-every", "1",
            "--log-every", "100", "--checkpoints", str(tmp_path / "ckpt_cyc"),
            "--resume",
        ])
        assert os.path.exists(tmp_path / "ckpt_cyc" /
                              "netG_A2B_SRtask_x2_0002.npz")

    def test_steps_per_dispatch(self, synth, tmp_path, monkeypatch):
        """--steps-per-dispatch K drives the scanned gd_steps_u8 program
        (requires --pool-size 0) and saves the usual artifacts."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cyclegan

        with pytest.raises(SystemExit, match="pool-size 0"):
            train_cyclegan.main([
                "--net", "SRdens", "--root", "Sat2Aerx1", "--data-dir", synth,
                "--steps-per-dispatch", "2", "--num-epochs", "1",
                "--checkpoints", str(tmp_path / "ckpt_spd_bad")])
        train_cyclegan.main([
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--num-epochs", "1", "--save-every", "1",
            "--log-every", "2", "--pool-size", "0",
            "--steps-per-dispatch", "2",
            "--checkpoints", str(tmp_path / "ckpt_cyc_spd"),
        ])
        assert os.path.exists(tmp_path / "ckpt_cyc_spd" /
                              "netG_A2B_SRtask_x2_0001.npz")

    def test_device_pool(self, synth, tmp_path, monkeypatch):
        """--device-pool: the stateful-pool iteration as ONE fused program
        (G update + on-device 50%-replace pools + D update)."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cyclegan

        train_cyclegan.main([
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--num-epochs", "1", "--save-every", "1",
            "--log-every", "2", "--device-pool",
            "--checkpoints", str(tmp_path / "ckpt_cyc_devpool"),
        ])
        assert os.path.exists(tmp_path / "ckpt_cyc_devpool" /
                              "netG_A2B_SRtask_x2_0001.npz")
        # composes with --ema-decay (fused gd_step_pooled_ema program)
        train_cyclegan.main([
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--num-epochs", "1", "--save-every", "1",
            "--log-every", "2", "--device-pool", "--ema-decay", "0.9",
            "--checkpoints", str(tmp_path / "ckpt_cyc_devpool_ema"),
        ])
        assert os.path.exists(tmp_path / "ckpt_cyc_devpool_ema" / "ema" /
                              "netG_A2B_SRtask_x2_0001.npz")
        with pytest.raises(SystemExit, match="pool-size"):
            train_cyclegan.main([
                "--net", "SRdens", "--root", "Sat2Aerx1", "--data-dir",
                synth, "--device-pool", "--pool-size", "0",
                "--checkpoints", str(tmp_path / "ckpt_cyc_devpool_bad")])

    def test_mesh_dp(self, synth, tmp_path, monkeypatch):
        """--mesh-size N: GSPMD data-parallel GAN training from the CLI —
        the stateful-pool path, and its --steps-per-dispatch composition."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cyclegan

        train_cyclegan.main([
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--num-epochs", "1", "--save-every", "1",
            "--log-every", "2", "--batch-size", "2", "--mesh-size", "2",
            "--checkpoints", str(tmp_path / "ckpt_cyc_dp"),
        ])
        assert os.path.exists(tmp_path / "ckpt_cyc_dp" /
                              "netG_A2B_SRtask_x2_0001.npz")
        train_cyclegan.main([
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--num-epochs", "1", "--save-every", "1",
            "--log-every", "2", "--batch-size", "2", "--mesh-size", "2",
            "--pool-size", "0", "--steps-per-dispatch", "2",
            "--checkpoints", str(tmp_path / "ckpt_cyc_dp_spd"),
        ])
        assert os.path.exists(tmp_path / "ckpt_cyc_dp_spd" /
                              "netG_A2B_SRtask_x2_0001.npz")
        with pytest.raises(SystemExit, match="divisible"):
            train_cyclegan.main([
                "--net", "SRdens", "--root", "Sat2Aerx1", "--data-dir",
                synth, "--batch-size", "3", "--mesh-size", "2",
                "--checkpoints", str(tmp_path / "ckpt_cyc_dp_bad")])

    def test_zero_opt_workflow_and_resume(self, synth, tmp_path, monkeypatch):
        """--zero-opt on the GAN driver: ZeRO-1 moments for G AND D, epoch
        checkpoints in ordinary shapes, --resume round-trips the sharded
        layout (zero1_gd_put)."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cyclegan

        common = [
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--save-every", "1", "--log-every", "2",
            "--batch-size", "2", "--mesh-size", "2", "--pool-size", "0",
            "--zero-opt", "--checkpoints", str(tmp_path / "ckpt_cyc_zero"),
        ]
        train_cyclegan.main(common + ["--num-epochs", "1"])
        assert os.path.exists(tmp_path / "ckpt_cyc_zero" /
                              "netG_A2B_SRtask_x2_0001.npz")
        train_cyclegan.main(common + ["--num-epochs", "2", "--resume"])
        assert os.path.exists(tmp_path / "ckpt_cyc_zero" /
                              "netG_A2B_SRtask_x2_0002.npz")
        with pytest.raises(SystemExit, match="pool-size 0"):
            train_cyclegan.main([
                "--net", "SRdens", "--root", "Sat2Aerx1", "--data-dir",
                synth, "--batch-size", "2", "--mesh-size", "2", "--zero-opt",
                "--checkpoints", str(tmp_path / "ckpt_cyc_zero_bad")])
        with pytest.raises(SystemExit, match="mesh-size"):
            train_cyclegan.main([
                "--net", "SRdens", "--root", "Sat2Aerx1", "--data-dir",
                synth, "--pool-size", "0", "--zero-opt",
                "--checkpoints", str(tmp_path / "ckpt_cyc_zero_bad2")])


class TestMultiTaskDriver:
    def test_short_training(self, synth, tmp_path, monkeypatch):
        """The multi-task driver (reference multi-task.py net='2') trains
        end-to-end and saves all three generators; --device-pool drives the
        fused-pool iteration."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_multitask

        # the multi-task protocol needs the Sat2Aerx2 layout (src at half
        # the target resolution: real_C = G_C(realA) must land on realB)
        d = tmp_path / "ds_x2"
        data.make_synthetic_dataset(str(d / "Sat2Aerx2"), n_train=4,
                                    n_val=1, n_test=1, size=32, scale=2)
        train_multitask.main([
            "--mode", "x2", "--root", "Sat2Aerx2", "--data-dir", str(d),
            "--ngf", "8", "--netG", "resnet_6blocks",
            "--num-epochs", "1", "--save-every", "1", "--log-every", "2",
            "--checkpoints", str(tmp_path / "ckpt_mt"),
        ])
        for name in ("G_A", "G_B", "G_C"):
            assert os.path.exists(
                tmp_path / "ckpt_mt" / f"netG_{name}_MTtask_x2_0001.npz")
        train_multitask.main([
            "--mode", "x2", "--root", "Sat2Aerx2", "--data-dir", str(d),
            "--ngf", "8", "--netG", "resnet_6blocks", "--device-pool",
            "--num-epochs", "1", "--save-every", "1", "--log-every", "2",
            "--checkpoints", str(tmp_path / "ckpt_mt_dp"),
        ])
        assert os.path.exists(
            tmp_path / "ckpt_mt_dp" / "netG_G_C_MTtask_x2_0001.npz")


class TestCycleGANEval:
    def test_eval_driver(self, synth, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import test_cyclegan
        from srcgan_tpu import models
        from srcgan_tpu.train import save_params
        import jax

        # fabricate generator checkpoints matching the 'SRdens' x2 config
        g_a = models.SRDenseNetA(1, 3, mode="x2", num_blocks=2, num_layers=2)
        g_b = models.SRDenseNetB(3, 1, mode="x2", num_blocks=2, num_layers=2)
        netGA = str(tmp_path / "netG_A2B_SRtask_x2_0005.npz")
        netGB = str(tmp_path / "netG_B2A_SRtask_x2_0005.npz")
        save_params(netGA, g_a.init(jax.random.PRNGKey(0)))
        save_params(netGB, g_b.init(jax.random.PRNGKey(1)))

        test_cyclegan.main([
            "--netGA", netGA, "--netGB", netGB, "--net", "SRdens",
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--result-dir", str(tmp_path / "result"),
        ])
        outs = os.listdir(tmp_path / "result")
        assert any(d.startswith("cyc_fakeB_") for d in outs)
        # SRdens on the x1 layout has no same-size target: metrics are
        # skipped (as the reference's test.py does throughout), no CSV
        assert not (tmp_path / "result" / "Performs.csv").exists()

    def test_eval_driver_net1_metrics(self, synth, tmp_path, monkeypatch):
        """net='1' (the reference default): fake_B matches realB by
        construction, so the eval writes the testCas.py:92-103 metric
        protocol row (round-5 addition for the adversarial family)."""
        monkeypatch.chdir(tmp_path)
        import jax

        from srcgan_tpu.cli import test_cyclegan
        from srcgan_tpu.train import save_params
        from srcgan_tpu.train.cyclegan import CycleGANTrainer

        tr = CycleGANTrainer(net="1", mode="x2")
        netGA = str(tmp_path / "netG_A2B_SRtask_x2_0005.npz")
        netGB = str(tmp_path / "netG_B2A_SRtask_x2_0005.npz")
        save_params(netGA, tr.netG_A.init(jax.random.PRNGKey(0)))
        save_params(netGB, tr.netG_B.init(jax.random.PRNGKey(1)))

        test_cyclegan.main([
            "--netGA", netGA, "--netGB", netGB, "--net", "1",
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--result-dir", str(tmp_path / "result"),
        ])
        csv = (tmp_path / "result" / "Performs.csv").read_text()
        assert csv.splitlines()[0] == "time,checkpoint,MSE,PSNR,AE,SSIM"
        assert "netG_A2B_SRtask_x2_0005" in csv


class TestPreemption:
    def test_sigterm_saves_state_and_resumes(self, synth, tmp_path,
                                             monkeypatch):
        """SIGTERM mid-training -> full train state persisted, clean return;
        --resume continues from the interrupted epoch."""
        import os
        import signal
        import threading

        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas

        ck = str(tmp_path / "pck")
        argv = ["--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
                "--root", "Sat2Aerx1", "--data-dir", synth,
                "--num-epochs", "500", "--save-every", "1000",
                "--log-every", "1000", "--checkpoints", ck]

        killer = threading.Timer(
            6.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
        killer.start()
        try:
            train_cas.main(argv)   # returns (not raises) on SIGTERM
        finally:
            killer.cancel()
        state_path = os.path.join(ck, "casstate_latest.npz")
        assert os.path.exists(state_path), "preemption save missing"

        # epochs must not have reached the configured 500 (we were killed)
        import numpy as np
        from srcgan_tpu.train.state import load_train_state
        from srcgan_tpu.train import CasTrainer

        trainer = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        import jax
        like = trainer.init(jax.random.PRNGKey(0))
        _, extra = load_train_state(state_path, like)
        assert 0 <= int(extra["epoch"]) < 500

        # and the run resumes cleanly for a couple more epochs
        resumed_to = int(extra["epoch"]) + 2
        train_cas.main(argv[:-6] + [
            "--num-epochs", str(resumed_to), "--save-every", "1000",
            "--log-every", "1000", "--checkpoints", ck, "--resume"])
        _, extra2 = load_train_state(state_path, like)
        assert int(extra2["epoch"]) >= int(extra["epoch"])


class TestZeroOptCLI:
    def test_zero_opt_workflow_and_resume(self, synth, tmp_path, monkeypatch):
        """--zero-opt trains with sharded Adam state, saves resumable
        full-state checkpoints, and --resume restores through zero1_put."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas

        ck = str(tmp_path / "ckpt_zero")
        argv = ["--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
                "--root", "Sat2Aerx1", "--data-dir", synth,
                "--save-every", "1", "--log-every", "2",
                "--mesh-size", "2", "--zero-opt", "--batch-size", "2",
                "--checkpoints", ck]
        train_cas.main(argv + ["--num-epochs", "1"])
        assert os.path.exists(os.path.join(ck, "ESPCN_A2C_x2_0001.npz"))
        assert os.path.exists(os.path.join(ck, "casstate_latest.npz"))
        # resume continues into epoch 2 through the zero1_put restore path
        train_cas.main(argv + ["--num-epochs", "2", "--resume"])
        assert os.path.exists(os.path.join(ck, "ESPCN_A2C_x2_0002.npz"))

    def test_zero_opt_composes_with_steps_per_dispatch(self, synth, tmp_path,
                                                       monkeypatch):
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas

        train_cas.main([
            "--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
            "--root", "Sat2Aerx1", "--data-dir", synth,
            "--num-epochs", "1", "--save-every", "1", "--log-every", "2",
            "--mesh-size", "2", "--zero-opt", "--batch-size", "2",
            "--steps-per-dispatch", "2",
            "--checkpoints", str(tmp_path / "ckpt_zero_spd"),
        ])
        assert os.path.exists(
            tmp_path / "ckpt_zero_spd" / "ESPCN_A2C_x2_0001.npz")


    def test_zero_opt_composes_with_orbax(self, synth, tmp_path, monkeypatch):
        """--zero-opt x --orbax-dir: per-shard saves of the sharded moments,
        gather-free sharded restore on --resume."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas

        ck = str(tmp_path / "ckpt_zero_ox")
        argv = ["--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
                "--root", "Sat2Aerx1", "--data-dir", synth,
                "--save-every", "1", "--log-every", "2",
                "--mesh-size", "2", "--zero-opt", "--batch-size", "2",
                "--orbax-dir", str(tmp_path / "ox_zero"),
                "--checkpoints", ck]
        train_cas.main(argv + ["--num-epochs", "1"])
        assert os.path.exists(os.path.join(ck, "ESPCN_A2C_x2_0001.npz"))
        train_cas.main(argv + ["--num-epochs", "2", "--resume"])
        assert os.path.exists(os.path.join(ck, "ESPCN_A2C_x2_0002.npz"))

    def test_zero_opt_rejects_bad_compositions(self, synth, tmp_path,
                                               monkeypatch):
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cas

        base = ["--SRModel", "ESPCN", "--root", "Sat2Aerx1",
                "--data-dir", synth,
                "--checkpoints", str(tmp_path / "ckpt_zero_bad")]
        with pytest.raises(SystemExit, match="1-D --mesh-size"):
            train_cas.main(base + ["--zero-opt"])
        with pytest.raises(SystemExit, match="plain DP loop"):
            train_cas.main(base + ["--zero-opt", "--mesh-size", "2",
                                   "--ema-decay", "0.99"])


class TestDevicePoolStepsPerDispatch:
    def test_device_pool_composes_with_steps_per_dispatch(self, synth,
                                                          tmp_path,
                                                          monkeypatch):
        """--device-pool x --steps-per-dispatch: K stateful-pool iterations
        per dispatch (gd_steps_pooled_u8, pool state in the scan carry)."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_cyclegan

        train_cyclegan.main([
            "--net", "SRdens", "--mode", "x2", "--root", "Sat2Aerx1",
            "--data-dir", synth, "--num-epochs", "1", "--save-every", "1",
            "--log-every", "2", "--pool-size", "2", "--device-pool",
            "--steps-per-dispatch", "2",
            "--checkpoints", str(tmp_path / "ckpt_cyc_dp_spd"),
        ])
        assert os.path.exists(tmp_path / "ckpt_cyc_dp_spd" /
                              "netG_A2B_SRtask_x2_0001.npz")


class TestMultiTaskMesh:
    def test_multitask_mesh_size(self, tmp_path, monkeypatch):
        """--mesh-size on the multi-task driver: GSPMD batch sharding with
        the host-pool fakes re-sharded after their round-trip."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu.cli import train_multitask

        # the multi-task protocol needs the Sat2Aerx2 layout (src at half
        # the target resolution: real_C = G_C(realA) must land on realB)
        d = tmp_path / "ds_mt_dp"
        data.make_synthetic_dataset(str(d / "Sat2Aerx2"), n_train=4,
                                    n_val=1, n_test=1, size=32, scale=2)
        train_multitask.main([
            "--mode", "x2", "--root", "Sat2Aerx2", "--data-dir", str(d),
            "--ngf", "8", "--netG", "resnet_6blocks",
            "--num-epochs", "1", "--save-every", "1", "--log-every", "2",
            "--mesh-size", "2", "--batch-size", "2",
            "--checkpoints", str(tmp_path / "ckpt_mt_dp2"),
        ])
        assert os.path.exists(tmp_path / "ckpt_mt_dp2" /
                              "netG_G_A_MTtask_x2_0001.npz")
        with pytest.raises(SystemExit, match="divisible"):
            train_multitask.main([
                "--mode", "x2", "--root", "Sat2Aerx2", "--data-dir", str(d),
                "--mesh-size", "2", "--batch-size", "3",
                "--checkpoints", str(tmp_path / "ckpt_mt_bad")])
