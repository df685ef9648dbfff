"""Multi-device tests on the 8-device CPU fake backend.

Verifies: DP shard_map step equals the single-device step (same grads after
psum-mean), spatial sharding compiles and matches unsharded output, sharded
CycleGAN steps run.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcgan_tpu import models, parallel
from srcgan_tpu.train import CasTrainer


def make_batch(n, size=16, seed=0):
    rng = np.random.default_rng(seed)
    tar = rng.uniform(0, 1, (n, size, size, 3)).astype(np.float32)
    src = (tar @ np.array([0.2125, 0.7154, 0.0721], np.float32))[..., None]
    return jnp.asarray(src), jnp.asarray(tar)


def tree_allclose(a, b, atol=1e-5):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-4)


class TestMesh:
    def test_make_mesh_all_devices(self):
        m = parallel.make_mesh()
        assert m.devices.size == 8
        m2 = parallel.make_mesh((2, 4), ("data", "space"))
        assert m2.axis_names == ("data", "space")

    def test_pad_batch(self):
        b = np.ones((5, 2, 2, 1))
        p, n = parallel.pad_batch_to(b, 8)
        assert p.shape[0] == 8 and n == 5


class TestCasDP:
    def test_dp_matches_single_device(self):
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st0 = tr.init(jax.random.PRNGKey(0))
        realA, realB = make_batch(8)

        # single-device step (copy state first: train_step donates its input)
        st_copy = jax.tree_util.tree_map(jnp.array, st0)
        st_single, m_single = tr.train_step(st_copy, realA, realB, 1e-4)

        # 8-way DP step
        mesh = parallel.make_mesh()
        step = parallel.make_cas_dp_step(tr, mesh)
        st_rep = parallel.put_replicated(st0, mesh)
        a = parallel.put_batch(realA, mesh)
        b = parallel.put_batch(realB, mesh)
        st_dp, m_dp = step(st_rep, a, b, 1e-4)

        # L1 losses are exact means-of-means; PSNR is a log of a mean, so the
        # DP value (mean of per-shard PSNRs) differs at the ~1e-3 level.
        np.testing.assert_allclose(float(m_single["loss_SR"]),
                                   float(m_dp["loss_SR"]), rtol=1e-5)
        np.testing.assert_allclose(float(m_single["loss_C"]),
                                   float(m_dp["loss_C"]), rtol=1e-5)
        np.testing.assert_allclose(float(m_single["psnr_SR"]),
                                   float(m_dp["psnr_SR"]), atol=0.05)
        # grads agree up to reduction order; Adam's eps-normalization can
        # amplify ~1e-7 grad noise to ~1e-4 on near-zero grads.
        tree_allclose(st_single.sr.params, st_dp.sr.params, atol=2e-4)
        tree_allclose(st_single.c.params, st_dp.c.params, atol=2e-4)

    def test_dp_composes_with_bf16_acts(self):
        """DP wraps CasTrainer.grads, so act_dtype=bf16 (mixed precision)
        flows through the sharded step unchanged: grads leave the bf16
        forward/backward as fp32 (wrt the fp32 masters), the psum is fp32,
        and the sharded losses track an unsharded bf16-acts step."""
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2,
                        act_dtype=jnp.bfloat16)
        st0 = tr.init(jax.random.PRNGKey(0))
        realA, realB = make_batch(8)
        st_copy = jax.tree_util.tree_map(jnp.array, st0)
        _, m_single = tr.train_step(st_copy, realA, realB, 1e-4)

        mesh = parallel.make_mesh()
        step = parallel.make_cas_dp_step(tr, mesh)
        st_rep = parallel.put_replicated(st0, mesh)
        a, b = parallel.put_batch(realA, mesh), parallel.put_batch(realB, mesh)
        st_dp, m_dp = step(st_rep, a, b, 1e-4)
        # bf16 forwards: per-shard loss means vs the global mean agree to
        # bf16 resolution, and the updated masters stay fp32
        np.testing.assert_allclose(float(m_single["loss_SR"]),
                                   float(m_dp["loss_SR"]), rtol=1e-2)
        for leaf in jax.tree_util.tree_leaves(st_dp.sr.params):
            assert leaf.dtype == jnp.float32

    def test_dp_steps_u8_match_single_device(self):
        """DP x steps-per-dispatch (make_cas_dp_steps_u8): K scanned psum'd
        updates on (K, N, ...) uint8 blocks equal the single-device scanned
        program (train_steps_u8) on the same blocks.  A sharding bug (wrong
        axis, missing pmean) would show up O(1); the tolerance only absorbs
        reduction-order + Adam eps-noise compounding over K=2 steps."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st0 = tr.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        K, N, S = 2, 8, 16
        src = jnp.asarray(rng.integers(0, 256, (K, N, S, S, 3),
                                       dtype=np.uint8))
        tar = jnp.asarray(rng.integers(0, 256, (K, N, S, S, 3),
                                       dtype=np.uint8))

        # single-device scanned program (copy: train_steps_u8 donates)
        st_copy = jax.tree_util.tree_map(jnp.array, st0)
        st_single, m_single = tr.train_steps_u8(st_copy, src, tar, 1e-4)

        mesh = parallel.make_mesh()
        steps = parallel.make_cas_dp_steps_u8(tr, mesh)
        sh = NamedSharding(mesh, P(None, "data"))
        st_dp, m_dp = steps(parallel.put_replicated(st0, mesh),
                            jax.device_put(src, sh),
                            jax.device_put(tar, sh), 1e-4)

        # per-step stacked losses agree (L1 means-of-means are exact; the
        # step-2 row sees once-updated params, so it also checks the carry)
        np.testing.assert_allclose(np.asarray(m_single["loss_SR"]),
                                   np.asarray(m_dp["loss_SR"]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(m_single["loss_C"]),
                                   np.asarray(m_dp["loss_C"]), rtol=1e-4)
        assert np.asarray(m_dp["loss_SR"]).shape == (K,)
        tree_allclose(st_single.sr.params, st_dp.sr.params, atol=1e-3)
        tree_allclose(st_single.c.params, st_dp.c.params, atol=1e-3)

    @pytest.mark.parametrize("variant", ["lab", "const"])
    def test_dp_steps_u8_lab_const_match_single_device(self, variant):
        """The LAB and Const cascades under the mesh (VERDICT r4 item 6).

        The LAB step's on-device colorspace path (convert_pair ver='G2LAB',
        rgb2lab inside the shard_map'd scan body) and the Const step's
        down-then-up degradation had never been compiled under a mesh —
        they share step machinery with the G2RGB step, but the colorspace
        and degradation programs are their own code paths."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if variant == "lab":
            tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2,
                            lab=True)
        else:
            tr = CasTrainer(sr_model="SRCNN", c_model="ResDeconv", up=2,
                            const=True)
        st0 = tr.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(7)
        K, N, S = 2, 8, 16
        src = jnp.asarray(rng.integers(0, 256, (K, N, S, S, 3),
                                       dtype=np.uint8))
        tar = jnp.asarray(rng.integers(0, 256, (K, N, S, S, 3),
                                       dtype=np.uint8))

        st_copy = jax.tree_util.tree_map(jnp.array, st0)
        st_single, m_single = tr.train_steps_u8(st_copy, src, tar, 1e-4)

        mesh = parallel.make_mesh()
        steps = parallel.make_cas_dp_steps_u8(tr, mesh)
        sh = NamedSharding(mesh, P(None, "data"))
        st_dp, m_dp = steps(parallel.put_replicated(st0, mesh),
                            jax.device_put(src, sh),
                            jax.device_put(tar, sh), 1e-4)

        np.testing.assert_allclose(np.asarray(m_single["loss_SR"]),
                                   np.asarray(m_dp["loss_SR"]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(m_single["loss_C"]),
                                   np.asarray(m_dp["loss_C"]), rtol=1e-4)
        tree_allclose(st_single.sr.params, st_dp.sr.params, atol=1e-3)
        tree_allclose(st_single.c.params, st_dp.c.params, atol=1e-3)

    def test_dp_two_steps_progress(self):
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        mesh = parallel.make_mesh()
        step = parallel.make_cas_dp_step(tr, mesh)
        st = parallel.put_replicated(tr.init(jax.random.PRNGKey(1)), mesh)
        realA, realB = make_batch(8)
        a, b = parallel.put_batch(realA, mesh), parallel.put_batch(realB, mesh)
        st, m1 = step(st, a, b, 1e-3)
        st, m2 = step(st, a, b, 1e-3)
        assert float(m2["loss_SR"]) < float(m1["loss_SR"])


class TestSpatial:
    def test_spatial_infer_matches(self):
        mesh = parallel.make_mesh((8,), ("space",))
        m = models.ESPCN(1, 3, 2)
        p = m.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 64, 16, 1)).astype(np.float32))
        ref = m.fwd(p, x)
        infer = parallel.make_spatial_infer(m, mesh)
        got = infer(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                                   rtol=1e-4)


class TestCycleGANDP:
    def test_sharded_steps_run(self):
        from srcgan_tpu.train import CycleGANTrainer
        tr = CycleGANTrainer(net="SRdens", mode="x2")
        mesh = parallel.make_mesh()
        g_step, d_step = parallel.make_cyclegan_dp_steps(tr, mesh)
        st = parallel.put_replicated(tr.init(jax.random.PRNGKey(0)), mesh)
        realA, realB = make_batch(8, size=32)
        realA_lr = jnp.asarray(np.asarray(realA)[:, ::2, ::2, :])
        st, aux = g_step(st, realA_lr, realB, 1e-4)
        st, dm = d_step(st, realA_lr, realB, aux["fake_A"], aux["fake_B"], 1e-5)
        assert np.isfinite(float(aux["loss_G"]))
        assert np.isfinite(float(dm["loss_D_A"]))

    def test_dp_matches_single_device(self):
        """Full-iteration equivalence: G grads, D grads, the PatchGAN's
        batch-stat BatchNorm state, and the host-side pooled fakes all match
        the single-device trainer after two optimize_parameters iterations.

        The D's BatchNorm computes batch statistics over the GLOBAL batch
        axis; under GSPMD batch sharding XLA must insert the cross-device
        reductions for the stats to match single-device training — exactly
        the place silent DP divergence would hide (train.py:262-340 +
        model.py:595-639 semantics)."""
        from srcgan_tpu.train import CycleGANTrainer

        def run(sharded):
            tr = CycleGANTrainer(net="SRdens", mode="x2")
            st = tr.init(jax.random.PRNGKey(3))
            if sharded:
                mesh = parallel.make_mesh()
                g_step, d_step = parallel.make_cyclegan_dp_steps(tr, mesh)
                st = parallel.put_replicated(st, mesh)
            else:
                g_step, d_step = tr.g_step, tr.d_step
            losses = []
            for it in range(2):
                realA, realB = make_batch(8, size=32, seed=it)
                realA_lr = jnp.asarray(np.asarray(realA)[:, ::2, ::2, :])
                st, aux = g_step(st, realA_lr, realB, 1e-4)
                fake_A = tr.fake_A_pool.query(np.asarray(aux["fake_A"]))
                fake_B = tr.fake_B_pool.query(np.asarray(aux["fake_B"]))
                st, dm = d_step(st, realA_lr, realB, jnp.asarray(fake_A),
                                jnp.asarray(fake_B), 1e-5)
                losses.append((float(aux["loss_G"]), float(dm["loss_D_A"]),
                               float(dm["loss_D_B"])))
            return st, losses

        st_1, losses_1 = run(sharded=False)
        st_dp, losses_dp = run(sharded=True)

        np.testing.assert_allclose(losses_dp, losses_1, rtol=1e-4)
        # params after two Adam updates (eps-normalization amplifies ~1e-7
        # reduction-order grad noise on near-zero grads to ~1e-4)
        tree_allclose(st_1.g.params, st_dp.g.params, atol=5e-4)
        tree_allclose(st_1.d.params, st_dp.d.params, atol=5e-4)
        # BatchNorm running stats: the global-batch statistics themselves
        tree_allclose(st_1.d_model_state, st_dp.d_model_state, atol=1e-4)


    def test_gd_steps_u8_sharded_matches(self):
        """gd_steps_u8 with GSPMD-sharded (K, N, ...) uint8 blocks equals the
        unsharded program — the CLI's --steps-per-dispatch + --mesh-size
        path (global-batch BN stats must survive inside the scan)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from srcgan_tpu.train import CycleGANTrainer

        tr = CycleGANTrainer(net="SRdens", mode="x2", pool_size=0)
        st0 = tr.init(jax.random.PRNGKey(5))
        rng = np.random.default_rng(7)
        K, N, S = 2, 8, 32
        src = jnp.asarray(rng.integers(0, 256, (K, N, S // 2, S // 2, 3),
                                       dtype=np.uint8))
        tar = jnp.asarray(rng.integers(0, 256, (K, N, S, S, 3),
                                       dtype=np.uint8))

        st_copy = jax.tree_util.tree_map(jnp.array, st0)
        st1, _, rows1 = tr.gd_steps_u8(st_copy, src, tar, 1e-4, 1e-5)

        mesh = parallel.make_mesh()
        sh = NamedSharding(mesh, P(None, "data"))
        st2, _, rows2 = tr.gd_steps_u8(
            parallel.put_replicated(st0, mesh), jax.device_put(src, sh),
            jax.device_put(tar, sh), 1e-4, 1e-5)

        np.testing.assert_allclose(np.asarray(rows1["loss_G"]),
                                   np.asarray(rows2["loss_G"]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rows1["loss_D_A"]),
                                   np.asarray(rows2["loss_D_A"]), rtol=1e-4)
        tree_allclose(st1.g.params, st2.g.params, atol=1e-3)
        tree_allclose(st1.d_model_state, st2.d_model_state, atol=1e-4)


class TestCas2D:
    def test_2d_matches_single_device(self):
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st0 = tr.init(jax.random.PRNGKey(2))
        realA, realB = make_batch(2, size=32)

        st_copy = jax.tree_util.tree_map(jnp.array, st0)
        st_single, m_single = tr.train_step(st_copy, realA, realB, 1e-4)

        mesh = parallel.make_mesh((2, 4), ("data", "space"))
        step = parallel.make_cas_2d_step(tr, mesh)
        st_rep = parallel.put_replicated(st0, mesh)
        st_2d, m_2d = step(st_rep, realA, realB, 1e-4)
        np.testing.assert_allclose(float(m_single["loss_SR"]),
                                   float(m_2d["loss_SR"]), rtol=1e-4)
        tree_allclose(st_single.sr.params, st_2d.sr.params, atol=2e-4)


class TestSpatialRDDB:
    def test_spatial_rddb_x4_matches(self):
        """The phase-folded x4 tail GSPMD-partitions over the space axis
        (grouped 1x1s + folded conv + pixel_shuffle under halo exchange)."""
        mesh = parallel.make_mesh((8,), ("space",))
        m = models.RDDBNet(1, 1, 4, nf=16, nb=1)
        p = m.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 32, 8, 1)).astype(np.float32))
        ref = m.fwd(p, x)
        got = parallel.make_spatial_infer(m, mesh)(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


class TestMultiProcessDP:
    def test_two_process_dp_matches_single_process(self):
        """The DCN analog this host can produce: 2 processes x 4 virtual CPU
        devices via jax.distributed (gloo collectives) vs 1 process x 4 —
        per-host data.batches sharding, global 8-device mesh, the gradient
        psum crossing the process boundary.  scripts/multiproc_dp.py asserts
        step-1 global gradients tight (<=1e-4 rel) and losses over 3 steps
        (<=5e-3); params get only the Adam sign-flip envelope (see the
        worker's drift-model comment).  Runs in subprocesses so the suite's
        own 8-device backend is not disturbed."""
        import json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # Generous timeout: idle-host wall-clock is ~3.5 min (3 subprocesses,
        # each paying its own XLA CPU compiles), but under the full suite the
        # other xdist worker owns half the host and the measured time more
        # than doubles — 560 s was killed at 86% of a full run (round 3).
        # Must exceed the SUM of the script's internal communicate timeouts
        # (2100 s two-worker phase + 2100 s reference run) or a slow-but-
        # succeeding run is killed here without its JSON verdict.
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "multiproc_dp.py")],
            cwd=repo, capture_output=True, text=True, timeout=4800)
        last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        assert last, f"no JSON verdict:\n{proc.stdout}\n{proc.stderr}"
        verdict = json.loads(last[-1])
        if proc.returncode == 3 or verdict.get("skip"):
            pytest.skip(f"jax.distributed unsupported here: {verdict}")
        assert proc.returncode == 0 and verdict["ok"], verdict


class TestZero1:
    def test_zero1_matches_plain_dp(self):
        """ZeRO-1 (sharded Adam moments, psum_scatter grads + all_gather
        params) must be the SAME math as plain DP + optax.adam — only the
        state layout and collective schedule differ.  Three steps so the
        moment recursions and bias corrections are exercised past their
        initializations."""
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        mesh = parallel.make_mesh()
        realA, realB = make_batch(8)
        a, b = parallel.put_batch(realA, mesh), parallel.put_batch(realB, mesh)

        st_dp = parallel.put_replicated(tr.init(jax.random.PRNGKey(0)), mesh)
        dp_step = parallel.make_cas_dp_step(tr, mesh)
        st_z = parallel.zero1_init(tr, jax.random.PRNGKey(0), mesh)
        z_step = parallel.make_cas_zero1_step(tr, mesh)

        for _ in range(3):
            st_dp, m_dp = dp_step(st_dp, a, b, 1e-4)
            st_z, m_z = z_step(st_z, a, b, 1e-4)

        np.testing.assert_allclose(float(m_dp["loss_SR"]),
                                   float(m_z["loss_SR"]), rtol=1e-4)
        np.testing.assert_allclose(float(m_dp["loss_C"]),
                                   float(m_z["loss_C"]), rtol=1e-4)
        # params agree up to cross-device reduction order (psum_scatter vs
        # pmean), amplified by Adam's eps normalization on near-zero grads
        # (sign flips bounded by lr per step -> 3e-4 envelope at lr=1e-4)
        tree_allclose(st_dp.sr.params, st_z.sr.params, atol=5e-4)
        tree_allclose(st_dp.c.params, st_z.c.params, atol=5e-4)
        assert int(st_z.sr.step) == 3

    def test_zero1_composes_with_bf16_acts(self):
        """--zero-opt x --bf16-acts: bf16 compute under shard_map, fp32
        psum_scatter'd grads, fp32 sharded moments/masters — must track
        plain DP at the same act_dtype (same envelope as the fp32 test;
        bf16 affects the grads identically on both sides)."""
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2,
                        act_dtype=jnp.bfloat16)
        mesh = parallel.make_mesh()
        realA, realB = make_batch(8)
        a, b = parallel.put_batch(realA, mesh), parallel.put_batch(realB, mesh)

        st_dp = parallel.put_replicated(tr.init(jax.random.PRNGKey(0)), mesh)
        dp_step = parallel.make_cas_dp_step(tr, mesh)
        st_z = parallel.zero1_init(tr, jax.random.PRNGKey(0), mesh)
        z_step = parallel.make_cas_zero1_step(tr, mesh)

        for _ in range(2):
            st_dp, m_dp = dp_step(st_dp, a, b, 1e-4)
            st_z, m_z = z_step(st_z, a, b, 1e-4)

        np.testing.assert_allclose(float(m_dp["loss_SR"]),
                                   float(m_z["loss_SR"]), rtol=1e-3)
        tree_allclose(st_dp.sr.params, st_z.sr.params, atol=5e-4)
        # fp32 masters and fp32 sharded moments despite bf16 activations
        for leaf in jax.tree_util.tree_leaves(
                (st_z.sr.params, st_z.sr.opt_state)):
            assert leaf.dtype == jnp.float32, leaf.dtype

    def test_moments_physically_sharded(self):
        """Each device must HOLD only its 1/D-th of every moment array —
        the memory claim, checked on the committed buffers."""
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        mesh = parallel.make_mesh()
        st_z = parallel.zero1_init(tr, jax.random.PRNGKey(1), mesh)
        mu, nu = st_z.sr.opt_state
        for leaf in jax.tree_util.tree_leaves(mu):
            assert leaf.shape[0] == 8
            shards = leaf.addressable_shards
            assert len(shards) == 8
            assert all(s.data.shape[0] == 1 for s in shards)
        # the per-device moment bytes are ~1/8th of replicated Adam state
        params = st_z.sr.params
        full = sum(2 * p.size * p.dtype.itemsize
                   for p in jax.tree_util.tree_leaves(params))
        per_dev = parallel.zero1_opt_bytes_per_device(params, mesh)
        # padding adds at most D-1 elements per leaf
        n_leaves = len(jax.tree_util.tree_leaves(params))
        assert per_dev <= full / 8 + n_leaves * 8 * 8


class TestTensorParallel:
    def test_tp_infer_matches(self):
        """Channel-sharded weights + GSPMD propagation = unsharded output,
        on the flagship RDDB architecture (dense concats + deconv tail are
        where a wrong O-dim sharding would misalign channels)."""
        mesh = parallel.make_mesh((8,), ("model",))
        m = models.RDDBNet(1, 1, 4, nf=16, nb=1)
        p = m.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 16, 16, 1)).astype(np.float32))
        from srcgan_tpu.models import rddb
        with rddb.no_pallas_tail():
            ref = m.fwd(p, x)
        p_tp = parallel.tp_shard_params(p, mesh)
        # a 4-D kernel with divisible O really is sharded; the 1-ch head is not
        specs = {id(l): l.sharding.spec for l in jax.tree_util.tree_leaves(p_tp)}
        assert any("model" in str(s) for s in specs.values())
        got = parallel.make_tp_infer(m, mesh)(p_tp, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_tp_step_matches_single_device(self):
        """2-D (data x model) hybrid train step == single-device step: the
        channel-sharded Adam update and the data-axis grad psum are both
        compiler-derived, so any spec error shows up O(1) in the params."""
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st0 = tr.init(jax.random.PRNGKey(2))
        realA, realB = make_batch(4)

        st_copy = jax.tree_util.tree_map(jnp.array, st0)
        st_single, m_single = tr.train_step(st_copy, realA, realB, 1e-4)

        mesh = parallel.make_mesh((2, 4), ("data", "model"))
        step = parallel.make_cas_tp_step(tr, mesh)
        st_tp, m_tp = step(parallel.put_replicated(st0, mesh),
                           realA, realB, 1e-4)
        np.testing.assert_allclose(float(m_single["loss_SR"]),
                                   float(m_tp["loss_SR"]), rtol=1e-4)
        tree_allclose(st_single.sr.params, st_tp.sr.params, atol=2e-4)
        tree_allclose(st_single.c.params, st_tp.c.params, atol=2e-4)
        # the updated params really live channel-sharded over 'model'
        assert any(
            l.ndim == 4 and "model" in str(l.sharding.spec)
            for l in jax.tree_util.tree_leaves(st_tp.sr.params))


class TestPipeline:
    def test_pipeline_matches_sequential_cascade(self):
        """2-stage ppermute pipeline == stage1(stage0(.)) per microbatch.
        Exercises the fill tick (zero buffer discarded), the drain tick,
        and the ring handoff of the inter-stage activation."""
        mesh = parallel.make_mesh((2,), ("pipe",),
                                  devices=jax.devices()[:2])
        sr = models.ESPCN(1, 1, 2)
        col = models.ResDeconv(1, 3)
        p0 = sr.init(jax.random.PRNGKey(0))
        p1 = col.init(jax.random.PRNGKey(1))
        f0 = lambda p, v: sr.fwd(p, v)
        f1 = lambda p, v: col.fwd(p, v)

        T, m, s = 3, 2, 8
        xq = jnp.asarray(np.random.default_rng(2).uniform(
            0, 1, (T, m, s, s, 1)).astype(np.float32))

        infer = parallel.make_cascade_pipeline_infer(f0, f1, mesh)
        got = infer(p0, p1, xq)
        ref = jnp.stack([f1(p1, f0(p0, xq[t])) for t in range(T)])
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)

    def test_pipeline_rejects_wrong_axis_size(self):
        mesh = parallel.make_mesh((8,), ("pipe",))
        with pytest.raises(ValueError, match="size 2"):
            parallel.make_cascade_pipeline_infer(
                lambda p, v: v, lambda p, v: v, mesh)


class TestZero1StepsU8:
    def test_zero1_steps_u8_match_plain_dp_steps(self):
        """ZeRO-1 x steps-per-dispatch (K scanned sharded-optimizer updates
        on uint8 blocks) tracks the plain-DP scanned program on the same
        blocks — the production multi-chip loop with 1/D optimizer HBM."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        rng = np.random.default_rng(11)
        K, N, S = 2, 8, 16
        src = jnp.asarray(rng.integers(0, 256, (K, N, S, S, 3),
                                       dtype=np.uint8))
        tar = jnp.asarray(rng.integers(0, 256, (K, N, S, S, 3),
                                       dtype=np.uint8))

        mesh = parallel.make_mesh()
        sh = NamedSharding(mesh, P(None, "data"))
        src_s, tar_s = jax.device_put(src, sh), jax.device_put(tar, sh)

        dp_steps = parallel.make_cas_dp_steps_u8(tr, mesh)
        st_dp = parallel.put_replicated(tr.init(jax.random.PRNGKey(0)), mesh)
        st_dp, m_dp = dp_steps(st_dp, src_s, tar_s, 1e-4)

        z_steps = parallel.make_cas_zero1_steps_u8(tr, mesh)
        st_z = parallel.zero1_init(tr, jax.random.PRNGKey(0), mesh)
        st_z, m_z = z_steps(st_z, src_s, tar_s, 1e-4)

        np.testing.assert_allclose(np.asarray(m_dp["loss_SR"]),
                                   np.asarray(m_z["loss_SR"]), rtol=1e-4)
        assert np.asarray(m_z["loss_SR"]).shape == (K,)
        # same tolerance rationale as test_dp_steps_u8_match_single_device:
        # Adam's eps normalization flips near-zero-grad update signs on
        # ~1e-7 reduction-order noise (pmean vs psum_scatter), compounding
        # over K=2 steps to O(lr)
        tree_allclose(st_dp.sr.params, st_z.sr.params, atol=1e-3)
        tree_allclose(st_dp.c.params, st_z.c.params, atol=1e-3)
        assert int(st_z.sr.step) == K

    def test_zero1_save_restore_roundtrip(self):
        """device_get -> save_train_state -> load_train_state -> zero1_put
        reproduces the exact ZeRO state (the CLI --zero-opt --resume path)."""
        import os
        import tempfile

        from srcgan_tpu.train.state import load_train_state, save_train_state

        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        mesh = parallel.make_mesh()
        st = parallel.zero1_init(tr, jax.random.PRNGKey(3), mesh)
        realA, realB = make_batch(8)
        a, b = parallel.put_batch(realA, mesh), parallel.put_batch(realB, mesh)
        step = parallel.make_cas_zero1_step(tr, mesh)
        st, _ = step(st, a, b, 1e-3)

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "z.npz")
            save_train_state(path, jax.device_get(st), extra={"epoch": 1})
            like = parallel.zero1_init(tr, jax.random.PRNGKey(0), mesh)
            raw, extra = load_train_state(path, jax.device_get(like))
            restored = parallel.zero1_put(raw, mesh)
        assert extra["epoch"] == 1
        tree_allclose(st.sr.params, restored.sr.params, atol=0)
        mu0, _ = st.sr.opt_state
        mu1, _ = restored.sr.opt_state
        tree_allclose(mu0, mu1, atol=0)
        # restored moments are physically row-sharded again
        leaf = jax.tree_util.tree_leaves(mu1)[0]
        assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)
        # and the restored state can take another step
        st2, m2 = step(restored, a, b, 1e-3)
        assert np.isfinite(float(m2["loss_SR"]))

    def test_zero1_composes_with_bf16_acts(self):
        """Mixed precision flows through the ZeRO step unchanged: bf16
        forward/backward, fp32 grads reduce-scattered, fp32 masters and
        sharded moments."""
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2,
                        act_dtype=jnp.bfloat16)
        mesh = parallel.make_mesh()
        st = parallel.zero1_init(tr, jax.random.PRNGKey(4), mesh)
        realA, realB = make_batch(8)
        a, b = parallel.put_batch(realA, mesh), parallel.put_batch(realB, mesh)
        st, m = parallel.make_cas_zero1_step(tr, mesh)(st, a, b, 1e-4)
        assert np.isfinite(float(m["loss_SR"]))
        for leaf in jax.tree_util.tree_leaves(st.sr.params):
            assert leaf.dtype == jnp.float32
        mu, nu = st.sr.opt_state
        for leaf in jax.tree_util.tree_leaves(mu):
            assert leaf.dtype == jnp.float32


class TestTrunkPipeline:
    def test_trunk_pipeline_matches_fwd(self):
        """Homogeneous-stage pipeline: RRDB block s on mesh position s,
        microbatches advancing one stage per tick over ppermute, last stage
        finishing with the shared tail — must equal model.fwd per
        microbatch.  Exercises fill ticks (S-1 zero rows dropped), the
        stacked-sharded stage params (each device holds 1/S of the trunk),
        and the stage-0 stem / stage-(S-1) tail edge work."""
        from srcgan_tpu.models import rddb as rddb_mod

        nb = 3
        mesh = parallel.make_mesh((nb,), ("pipe",),
                                  devices=jax.devices()[:nb])
        m = models.RDDBNet(1, 1, 4, nf=16, nb=nb)
        p = m.init(jax.random.PRNGKey(0))
        T, mb, s = 4, 1, 8
        xq = jnp.asarray(np.random.default_rng(5).uniform(
            0, 1, (T, mb, s, s, 1)).astype(np.float32))

        infer = parallel.make_rddb_trunk_pipeline_infer(m, mesh)
        got = infer(p, xq)

        with rddb_mod.no_pallas_tail():
            ref = jnp.stack([m.fwd(p, xq[t]) for t in range(T)])
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_stack_trunk_params(self):
        m = models.RDDBNet(1, 1, 2, nf=16, nb=3)
        p = m.init(jax.random.PRNGKey(1))
        stacked = parallel.stack_trunk_params(p["trunk"])
        leaf = jax.tree_util.tree_leaves(stacked)[0]
        assert leaf.shape[0] == 3

    def test_trunk_pipeline_placed_params(self):
        """place_trunk_pipeline_params: the stacked trunk physically lands
        row-sharded (one block per device — true 1/S residency) and the
        placed pair produces the same output as the plain tree."""
        nb = 3
        mesh = parallel.make_mesh((nb,), ("pipe",),
                                  devices=jax.devices()[:nb])
        m = models.RDDBNet(1, 1, 2, nf=16, nb=nb)
        p = m.init(jax.random.PRNGKey(2))
        xq = jnp.asarray(np.random.default_rng(6).uniform(
            0, 1, (3, 1, 8, 8, 1)).astype(np.float32))

        placed = parallel.place_trunk_pipeline_params(p, mesh)
        _, stacked = placed
        for leaf in jax.tree_util.tree_leaves(stacked):
            assert leaf.shape[0] == nb
            shards = leaf.addressable_shards
            assert len(shards) == nb
            assert all(s.data.shape[0] == 1 for s in shards)

        infer = parallel.make_rddb_trunk_pipeline_infer(m, mesh)
        np.testing.assert_allclose(np.asarray(infer(placed, xq)),
                                   np.asarray(infer(p, xq)),
                                   atol=1e-6, rtol=1e-6)

    def test_trunk_pipeline_train_matches_unsharded(self):
        """GPipe training through the trunk pipeline: the ring gradients
        (autodiff transposing the ppermute chain — the backward pipeline)
        must equal the unsharded gradients of the L1 loss over the
        concatenated microbatches.  Gradients, not Adam-updated params, are
        the comparison surface: Adam's eps-normalization turns ~1e-7
        reduction-order noise on near-zero grads into ~1e-3-relative param
        deltas (see CLAUDE.md round-3 lessons).  Also pins the residency
        story: trunk grads and Adam moments stay row-sharded P('pipe')
        (1/S per device)."""
        nb = 3
        mesh = parallel.make_mesh((nb,), ("pipe",),
                                  devices=jax.devices()[:nb])
        m = models.RDDBNet(1, 1, 2, nf=16, nb=nb)
        p = m.init(jax.random.PRNGKey(3))
        rng = np.random.default_rng(7)
        xq = jnp.asarray(rng.uniform(0, 1, (4, 1, 8, 8, 1)
                                     ).astype(np.float32))
        yq = jnp.asarray(rng.uniform(0, 1, (4, 1, 16, 16, 1)
                                     ).astype(np.float32))

        init_opt, step, grads = parallel.make_trunk_pipeline_train(m, mesh)
        pair = parallel.place_trunk_pipeline_params(p, mesh)
        loss, g_ht, g_sp = grads(pair, xq, yq)

        # unsharded reference gradients
        def ref_loss(params):
            pred = m.fwd(params, xq.reshape(-1, 8, 8, 1))
            return jnp.mean(jnp.abs(pred - yq.reshape(-1, 16, 16, 1)))

        ref_l, g_ref = jax.value_and_grad(ref_loss)(p)
        np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-6)
        tree_allclose(g_ht,
                      {k: v for k, v in g_ref.items() if k != "trunk"},
                      atol=1e-6)
        tree_allclose(g_sp, parallel.stack_trunk_params(g_ref["trunk"]),
                      atol=1e-6)
        # stage grads are row-sharded: produced AND resident on their stage
        for leaf in jax.tree_util.tree_leaves(g_sp):
            assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)

        # a few Adam steps: moments land sharded like the params, loss
        # decreases, and everything stays row-sharded through the updates.
        opt = init_opt(pair)
        for leaf in jax.tree_util.tree_leaves(opt.mu["tr"]):
            assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)
        l0 = None
        for _ in range(3):
            pair, opt, l = step(pair, opt, xq, yq, 1e-3)
            l0 = float(l) if l0 is None else l0
        assert float(l) < l0
        for leaf in jax.tree_util.tree_leaves(pair[1]):
            assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)
        for leaf in jax.tree_util.tree_leaves(opt.mu["tr"]):
            assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)

    def test_trunk_pipeline_train_composes_with_dp(self):
        """PP x DP on a 2-D (pipe x data) mesh: microbatch samples shard
        over 'data', each data replica runs its own ring, grads pmean
        across replicas — must equal the unsharded gradients on the full
        batch."""
        nb, dp = 3, 2
        mesh = parallel.make_mesh((nb, dp), ("pipe", "data"),
                                  devices=jax.devices()[:nb * dp])
        m = models.RDDBNet(1, 1, 2, nf=16, nb=nb)
        p = m.init(jax.random.PRNGKey(4))
        rng = np.random.default_rng(9)
        xq = jnp.asarray(rng.uniform(0, 1, (3, 2, 8, 8, 1)
                                     ).astype(np.float32))
        yq = jnp.asarray(rng.uniform(0, 1, (3, 2, 16, 16, 1)
                                     ).astype(np.float32))

        _, _, grads = parallel.make_trunk_pipeline_train(
            m, mesh, data_axis="data")
        pair = parallel.place_trunk_pipeline_params(p, mesh)
        loss, g_ht, g_sp = grads(pair, xq, yq)

        def ref_loss(params):
            pred = m.fwd(params, xq.reshape(-1, 8, 8, 1))
            return jnp.mean(jnp.abs(pred - yq.reshape(-1, 16, 16, 1)))

        ref_l, g_ref = jax.value_and_grad(ref_loss)(p)
        np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-6)
        tree_allclose(g_ht,
                      {k: v for k, v in g_ref.items() if k != "trunk"},
                      atol=1e-6)
        tree_allclose(g_sp, parallel.stack_trunk_params(g_ref["trunk"]),
                      atol=1e-6)

    def test_trunk_pipeline_train_composes_with_remat(self):
        """Instance-scoped RRDB remat (blocks.set_trunk_remat) flows through
        the pipeline train: the per-stage block recomputes its internals
        during the backward ring instead of storing every tick's
        activations.  Remat is value-neutral — grads must be bit-close to
        the non-remat ring."""
        from srcgan_tpu.models import blocks

        nb = 3
        mesh = parallel.make_mesh((nb,), ("pipe",),
                                  devices=jax.devices()[:nb])
        m = models.RDDBNet(1, 1, 2, nf=16, nb=nb)
        p = m.init(jax.random.PRNGKey(5))
        rng = np.random.default_rng(11)
        xq = jnp.asarray(rng.uniform(0, 1, (3, 1, 8, 8, 1)
                                     ).astype(np.float32))
        yq = jnp.asarray(rng.uniform(0, 1, (3, 1, 16, 16, 1)
                                     ).astype(np.float32))
        pair = parallel.place_trunk_pipeline_params(p, mesh)

        _, _, grads = parallel.make_trunk_pipeline_train(m, mesh)
        l0, g_ht0, g_sp0 = grads(pair, xq, yq)

        assert blocks.set_trunk_remat(m, True) == nb
        try:
            _, _, grads_r = parallel.make_trunk_pipeline_train(m, mesh)
            l1, g_ht1, g_sp1 = grads_r(pair, xq, yq)
        finally:
            blocks.set_trunk_remat(m, False)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-7)
        tree_allclose(g_ht0, g_ht1, atol=1e-7)
        tree_allclose(g_sp0, g_sp1, atol=1e-7)

    def test_trunk_pipeline_rejects_wrong_axis_size(self):
        """Both pipeline factories validate the mesh axis against the trunk
        depth up front: a 2-device axis on an nb=3 trunk would silently
        run RRDB block 0's weights on every stage (stage_params[0] after
        the shard) instead of failing loudly."""
        mesh = parallel.make_mesh((2,), ("pipe",), devices=jax.devices()[:2])
        m = models.RDDBNet(1, 1, 2, nf=16, nb=3)
        with pytest.raises(ValueError, match="nb=3"):
            parallel.make_rddb_trunk_pipeline_infer(m, mesh)
        with pytest.raises(ValueError, match="nb=3"):
            parallel.make_trunk_pipeline_train(m, mesh)


class TestFSDP:
    def test_fsdp_matches_plain_dp(self):
        """FSDP (params AND moments row-sharded at rest; per-step gather ->
        fwd/bwd -> psum_scatter -> sharded Adam, no end gather) must be the
        same math as plain DP + optax.adam.  Three steps exercise the moment
        recursions and bias corrections past their initializations."""
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        mesh = parallel.make_mesh()
        realA, realB = make_batch(8)
        a, b = parallel.put_batch(realA, mesh), parallel.put_batch(realB, mesh)

        st_dp = parallel.put_replicated(tr.init(jax.random.PRNGKey(0)), mesh)
        dp_step = parallel.make_cas_dp_step(tr, mesh)
        st_f, shapes = parallel.fsdp_init(tr, jax.random.PRNGKey(0), mesh)
        f_step = parallel.make_cas_fsdp_step(tr, mesh, shapes)

        # at rest each device holds only its own 1/D param rows
        d = mesh.shape["data"]
        leaf = jax.tree_util.tree_leaves(st_f.sr.params)[0]
        assert leaf.shape[0] == d
        shard_rows = leaf.addressable_shards[0].data.shape[0]
        assert shard_rows == 1  # (1, chunk) per device

        for _ in range(3):
            st_dp, m_dp = dp_step(st_dp, a, b, 1e-4)
            st_f, m_f = f_step(st_f, a, b, 1e-4)

        np.testing.assert_allclose(float(m_dp["loss_SR"]),
                                   float(m_f["loss_SR"]), rtol=1e-4)
        np.testing.assert_allclose(float(m_dp["loss_C"]),
                                   float(m_f["loss_C"]), rtol=1e-4)
        # same envelope as the ZeRO-1 equivalence (cross-device reduction
        # order through Adam's eps normalization)
        full_sr = parallel.fsdp_full_params(st_f.sr.params, shapes["sr"])
        full_c = parallel.fsdp_full_params(st_f.c.params, shapes["c"])
        tree_allclose(st_dp.sr.params, full_sr, atol=5e-4)
        tree_allclose(st_dp.c.params, full_c, atol=5e-4)
        assert int(st_f.sr.step) == 3

    def test_fsdp_put_roundtrip_and_bytes(self):
        """Host round-trip (checkpoint resume path) preserves the layout,
        and the at-rest accounting reports ~12/D bytes/param."""
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        mesh = parallel.make_mesh()
        st_f, shapes = parallel.fsdp_init(tr, jax.random.PRNGKey(1), mesh)
        host = jax.device_get(st_f)
        back = parallel.fsdp_put(host, mesh)
        tree_allclose(st_f.sr.params, back.sr.params, atol=0)
        leaf = jax.tree_util.tree_leaves(back.sr.params)[0]
        assert leaf.addressable_shards[0].data.shape[0] == 1

        params = tr.init(jax.random.PRNGKey(1)).sr.params
        per_dev = parallel.fsdp_state_bytes_per_device(params, mesh)
        total = sum(p.size * p.dtype.itemsize
                    for p in jax.tree_util.tree_leaves(params))
        d = mesh.shape["data"]
        assert per_dev <= 3 * total / d * 1.1  # 12/D bytes/param + padding

    def test_fsdp_steps_u8_match_plain_dp_steps(self):
        """FSDP x steps-per-dispatch tracks the plain-DP scanned program on
        the same uint8 blocks."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        mesh = parallel.make_mesh()
        k, n, size = 2, 8, 16
        rng = np.random.default_rng(3)
        src = rng.integers(0, 256, (k, n, size, size, 3), dtype=np.uint8)
        tar = rng.integers(0, 256, (k, n, size, size, 3), dtype=np.uint8)
        blk = NamedSharding(mesh, P(None, "data"))
        src_d = jax.device_put(src, blk)
        tar_d = jax.device_put(tar, blk)

        st_dp = parallel.put_replicated(tr.init(jax.random.PRNGKey(0)), mesh)
        dp_steps = parallel.make_cas_dp_steps_u8(tr, mesh)
        st_f, shapes = parallel.fsdp_init(tr, jax.random.PRNGKey(0), mesh)
        f_steps = parallel.make_cas_fsdp_steps_u8(tr, mesh, shapes)

        st_dp, m_dp = dp_steps(st_dp, src_d, tar_d, 1e-4)
        st_f, m_f = f_steps(st_f, jax.device_put(src, blk),
                            jax.device_put(tar, blk), 1e-4)
        np.testing.assert_allclose(np.asarray(m_dp["loss_SR"]),
                                   np.asarray(m_f["loss_SR"]), rtol=1e-4)
        full_sr = parallel.fsdp_full_params(st_f.sr.params, shapes["sr"])
        tree_allclose(st_dp.sr.params, full_sr, atol=5e-4)
        assert int(st_f.sr.step) == k

    def test_cli_fsdp_flag(self, tmp_path, monkeypatch):
        """--fsdp end-to-end through the training driver: epoch checkpoints
        come out in ORIGINAL leaf shapes (fsdp_full_params save path) and
        --resume round-trips the row-sharded state (fsdp_put)."""
        monkeypatch.chdir(tmp_path)
        from srcgan_tpu import data
        from srcgan_tpu.cli import train_cas
        from srcgan_tpu.train.state import load_params

        data.make_synthetic_dataset(str(tmp_path / "ds" / "Sat2Aerx1"),
                                    n_train=8, n_val=1, n_test=1, size=32)
        common = [
            "--SRModel", "ESPCN", "--CModel", "ResDeconv", "--up", "2",
            "--root", "Sat2Aerx1", "--data-dir", str(tmp_path / "ds"),
            "--batch-size", "8", "--mesh-size", "8", "--fsdp",
            "--save-every", "1", "--log-every", "1",
            "--checkpoints", str(tmp_path / "ckpt"),
        ]
        train_cas.main(common + ["--num-epochs", "1"])
        ck = tmp_path / "ckpt" / "ESPCN_A2C_x2_0001.npz"
        assert ck.exists()
        # original shapes: loadable against a fresh model template
        m = models.create("ESPCN", 1, 1, 2)
        like = m.init(jax.random.PRNGKey(0))
        loaded = load_params(str(ck), like=like)
        for a, b in zip(jax.tree_util.tree_leaves(loaded),
                        jax.tree_util.tree_leaves(like)):
            assert a.shape == b.shape
        # resume continues into epoch 2 from the row-sharded state
        train_cas.main(common + ["--num-epochs", "2", "--resume"])
        assert (tmp_path / "ckpt" / "ESPCN_A2C_x2_0002.npz").exists()


class TestGANZero1:
    def test_gd_zero1_matches_fused_gd_step(self):
        """ZeRO-1 GAN iteration (G AND D Adam moments row-sharded at rest,
        GSPMD keeping the PatchGAN's BatchNorm stats global-batch) is the
        same math as the fused gd_step + optax over two iterations."""
        from srcgan_tpu.train import CycleGANTrainer

        def run(sharded):
            tr = CycleGANTrainer(net="SRdens", mode="x2", pool_size=0)
            st = tr.init(jax.random.PRNGKey(3))
            if sharded:
                mesh = parallel.make_mesh()
                step = parallel.make_gd_zero1_step(tr, mesh)
                st = parallel.zero1_gd_from_state(st, mesh)
            else:
                step = tr.gd_step
            losses = []
            for it in range(2):
                realA, realB = make_batch(8, size=32, seed=it)
                realA_lr = jnp.asarray(np.asarray(realA)[:, ::2, ::2, :])
                st, aux = step(st, realA_lr, realB, 1e-4, 1e-5)
                losses.append((float(aux["loss_G"]), float(aux["loss_D_A"]),
                               float(aux["loss_D_B"])))
            return st, losses

        st_1, losses_1 = run(sharded=False)
        st_z, losses_z = run(sharded=True)

        np.testing.assert_allclose(losses_z, losses_1, rtol=1e-4)
        # params stay replicated and directly comparable (same 5e-4
        # eps-normalization envelope as the other sharded-Adam proofs)
        tree_allclose(st_1.g.params, st_z.g.params, atol=5e-4)
        tree_allclose(st_1.d.params, st_z.d.params, atol=5e-4)
        tree_allclose(st_1.d_model_state, st_z.d_model_state, atol=1e-4)
        assert int(st_z.g.step) == 2 and int(st_z.d.step) == 2
        # the moments physically live row-sharded: device i holds row i only
        mu, _ = st_z.g.opt_state
        leaf = jax.tree_util.tree_leaves(mu)[0]
        assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)
