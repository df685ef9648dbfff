"""Knowledge distillation (DistillTrainer): blend-loss math, composition
with the production step variants, teacher loading/validation, CLI wiring.

The reference has no compression tooling (checkpoints are trained once and
served as-is, trainCas.py:221-225); DistillTrainer is the beyond-parity
path from the flagship RDDBNet to a cheaper serving student.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcgan_tpu import models, parallel
from srcgan_tpu.train import CasTrainer, DistillTrainer, save_params
from tests.test_train import make_batch


def make_teacher(seed=7, base_kernel=16):
    """A random-init ESPCN+ResDeconv teacher pair (what it 'knows' doesn't
    matter for mechanics tests — only that its outputs are a fixed target).

    Checkpoint-based tests pass base_kernel=None (the default arch):
    from_checkpoints rebuilds the teacher from the name-encoded config,
    which carries no width override (testCas.py:41-53)."""
    kw = {} if base_kernel is None else {"base_kernel": base_kernel}
    sr = models.create("ESPCN", 1, 1, 2, **kw)
    c = models.create("ResDeconv", 1, 3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return sr, sr.init(k1), c, c.init(k2)


def make_trainer(alpha, **kw):
    sr, sr_p, c, c_p = make_teacher()
    return DistillTrainer(sr, sr_p, c, c_p, alpha=alpha,
                          teacher_sr_state=sr.init_state(),
                          teacher_c_state=c.init_state(),
                          sr_model="ESPCN", c_model="ResDeconv", up=2, **kw)


class TestDistillStep:
    def test_alpha1_is_bitwise_castrainer(self):
        """alpha=1 short-circuits the teacher: the step must be IDENTICAL
        to CasTrainer's (same init, same batch, same update)."""
        base = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        dist = make_trainer(alpha=1.0)
        st_b = base.init(jax.random.PRNGKey(0))
        st_d = dist.init(jax.random.PRNGKey(0))
        realA, realB = make_batch()
        for _ in range(2):
            st_b, m_b = base.train_step(st_b, realA, realB, 1e-3)
            st_d, m_d = dist.train_step(st_d, realA, realB, 1e-3)
        for k in m_b:
            assert float(m_b[k]) == float(m_d[k])
        flat_b = jax.tree_util.tree_leaves(st_b.sr.params)
        flat_d = jax.tree_util.tree_leaves(st_d.sr.params)
        for a, b in zip(flat_b, flat_d):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_alpha0_moves_student_toward_teacher(self):
        """Pure mimicry: L1(student_out, teacher_out) must shrink over steps
        on a FIXED batch (the teacher is the only target)."""
        dist = make_trainer(alpha=0.0)
        st = dist.init(jax.random.PRNGKey(1))
        realA, realB = make_batch()

        def gap(state):
            imgs = dist.snapshot(state, realA, realB)
            kd_sr, kd_c = dist._distill_targets(
                dist._degrade(dist._split_targets(realB)[0]),
                dist._split_targets(realB)[0])
            return (float(jnp.mean(jnp.abs(imgs["fake_BC"] - kd_sr))),
                    float(jnp.mean(jnp.abs(imgs["fake_BB"] - kd_c))))

        g0 = gap(st)
        for _ in range(8):
            st, m = dist.train_step(st, realA, realB, 1e-3)
        g1 = gap(st)
        assert g1[0] < g0[0] and g1[1] < g0[1]
        assert all(np.isfinite(float(v)) for v in m.values())

    def test_blend_loss_matches_hand_computation(self):
        """metrics['loss_SR'] at alpha=0.25 == 0.25*L1(pred,gt) +
        0.75*L1(pred,teacher) computed by hand from the same forward."""
        alpha = 0.25
        dist = make_trainer(alpha=alpha)
        st = dist.init(jax.random.PRNGKey(2))
        realA, realB = make_batch()

        # hand computation FIRST: train_step donates (and deletes) st
        real_BC, _ = dist._split_targets(realB)
        real_BA = dist._degrade(real_BC)
        pred, _ = dist.netG_A2C.apply(st.sr.params, real_BA, state=None,
                                      train=True)
        kd_sr, _ = dist._distill_targets(real_BA, real_BC)
        want = float(alpha * jnp.mean(jnp.abs(pred - real_BC))
                     + (1 - alpha) * jnp.mean(jnp.abs(pred - kd_sr)))

        _, m = dist.train_step(st, realA, realB, 0.0)
        np.testing.assert_allclose(float(m["loss_SR"]), want, rtol=1e-6)

    def test_bf16_acts_composes(self):
        dist = make_trainer(alpha=0.5, act_dtype=jnp.bfloat16)
        # frozen teacher params were pre-cast at construction
        leaves = jax.tree_util.tree_leaves(dist.teacher_sr_params)
        assert all(a.dtype == jnp.bfloat16 for a in leaves)
        st = dist.init(jax.random.PRNGKey(3))
        realA, realB = make_batch()
        st, m = dist.train_step(st, realA, realB, 1e-3)
        assert all(np.isfinite(float(v)) for v in m.values())
        # masters stay fp32
        assert jax.tree_util.tree_leaves(st.sr.params)[0].dtype == jnp.float32

    def test_dp_composes(self):
        """Sharded distill step == unsharded distill step (the teacher is
        closed over inside the shard_map body as a replicated constant)."""
        dist = make_trainer(alpha=0.5)
        st0 = dist.init(jax.random.PRNGKey(4))
        realA, realB = make_batch(n=8)
        st_single, m_single = dist.train_step(st0, realA, realB, 1e-3)

        dist2 = make_trainer(alpha=0.5)
        st0b = dist2.init(jax.random.PRNGKey(4))
        mesh = parallel.make_mesh()
        step = parallel.make_cas_dp_step(dist2, mesh)
        st_rep = parallel.put_replicated(st0b, mesh)
        st_dp, m_dp = step(st_rep, realA, realB, 1e-3)
        np.testing.assert_allclose(float(m_dp["loss_SR"]),
                                   float(m_single["loss_SR"]), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(st_single.sr.params),
                        jax.tree_util.tree_leaves(st_dp.sr.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-6)


class TestFromCheckpoints:
    def _save_pair(self, tmp_path, up=2, ver=None):
        sr, sr_p, c, c_p = make_teacher(base_kernel=None)
        tag = f"@{ver}" if ver else ""
        netGA = str(tmp_path / f"ESPCN{tag}_A2C_x{up}_0050.npz")
        netGB = str(tmp_path / f"ResDeconv{tag}_C2B_x{up}_0050.npz")
        save_params(netGA, jax.device_get(sr_p))
        save_params(netGB, jax.device_get(c_p))
        return netGA, netGB

    def test_loads_and_steps(self, tmp_path):
        netGA, netGB = self._save_pair(tmp_path)
        dist = DistillTrainer.from_checkpoints(
            netGA, netGB, alpha=0.5,
            sr_model="ESPCN", c_model="ResDeconv", up=2)
        st = dist.init(jax.random.PRNGKey(0))
        realA, realB = make_batch()
        st, m = dist.train_step(st, realA, realB, 1e-3)
        assert all(np.isfinite(float(v)) for v in m.values())

    def test_validation(self, tmp_path):
        netGA, netGB = self._save_pair(tmp_path)
        with pytest.raises(ValueError, match="x2 but the student"):
            DistillTrainer.from_checkpoints(netGA, netGB, up=4,
                                            sr_model="ESPCN",
                                            c_model="ResDeconv")
        with pytest.raises(ValueError, match="G2RGB checkpoint"):
            DistillTrainer.from_checkpoints(netGA, netGB, up=2, lab=True,
                                            sr_model="ESPCN",
                                            c_model="ResDeconv")
        with pytest.raises(ValueError, match="pair"):
            DistillTrainer.from_checkpoints(netGB, netGA, up=2,
                                            sr_model="ESPCN",
                                            c_model="ResDeconv")
        with pytest.raises(ValueError, match="alpha"):
            DistillTrainer.from_checkpoints(netGA, netGB, alpha=1.5, up=2,
                                            sr_model="ESPCN",
                                            c_model="ResDeconv")


class TestDistillCLI:
    def test_train_cas_distill_flags(self, tmp_path, monkeypatch):
        """End-to-end: teacher checkpoints on disk -> --distill-* run ->
        student checkpoints written (the run.sh workflow with a teacher)."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu import data
        from srcgan_tpu.cli import train_cas

        data.make_synthetic_dataset(str(tmp_path / "ds" / "Sat2Aerx1"),
                                    n_train=2, n_val=1, n_test=1, size=32)
        sr, sr_p, c, c_p = make_teacher(base_kernel=None)
        netGA = str(tmp_path / "ESPCN_A2C_x2_0050.npz")
        netGB = str(tmp_path / "ResDeconv_C2B_x2_0050.npz")
        save_params(netGA, jax.device_get(sr_p))
        save_params(netGB, jax.device_get(c_p))

        train_cas.main([
            "--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
            "--root", "Sat2Aerx1", "--data-dir", str(tmp_path / "ds"),
            "--num-epochs", "1", "--save-every", "1", "--log-every", "1",
            "--checkpoints", str(tmp_path / "ckpt"),
            "--distill-netGA", netGA, "--distill-netGB", netGB,
            "--distill-alpha", "0.3",
        ])
        assert os.path.exists(tmp_path / "ckpt" / "ESPCN_A2C_x2_0001.npz")
        assert os.path.exists(tmp_path / "ckpt" / "ResDeconv_C2B_x2_0001.npz")

    def test_half_pair_rejected(self, tmp_path):
        from srcgan_tpu.cli import train_cas
        with pytest.raises(SystemExit, match="together"):
            train_cas.main(["--distill-netGA", "x.npz"])
