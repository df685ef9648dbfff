"""Trainer tests: loss decreases, state/checkpoint round-trips, data layer."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcgan_tpu import data
from srcgan_tpu.train import (CasTrainer, CycleGANTrainer, checkpoint_name,
                              load_params, parse_checkpoint_name, save_params)
from srcgan_tpu.train import optim


def make_batch(n=1, size=32, seed=0):
    rng = np.random.default_rng(seed)
    tar = rng.uniform(0, 1, (n, size, size, 3)).astype(np.float32)
    src = (tar @ np.array([0.2125, 0.7154, 0.0721], np.float32))[..., None]
    return jnp.asarray(src), jnp.asarray(tar)


class TestCasTrainer:
    def test_loss_decreases(self):
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st = tr.init(jax.random.PRNGKey(0))
        realA, realB = make_batch()
        first = None
        for i in range(6):
            st, m = tr.train_step(st, realA, realB, 1e-3)
            if first is None:
                first = (float(m["loss_SR"]), float(m["loss_C"]))
        assert float(m["loss_SR"]) < first[0]
        assert float(m["loss_C"]) < first[1]

    @pytest.mark.parametrize("const,lab", [(False, True), (True, False)])
    def test_variants_run(self, const, lab):
        tr = CasTrainer(sr_model="SRCNN" if const else "ESPCN",
                        c_model="ResDeconv", up=2, const=const, lab=lab)
        st = tr.init(jax.random.PRNGKey(0))
        realA, realB = make_batch()
        st, m = tr.train_step(st, realA, realB, 1e-4)
        assert all(np.isfinite(float(v)) for v in m.values())
        imgs = tr.snapshot(st, realA, realB)
        # LAB colorizer predicts ab only (trainCasLAB.py:31)
        assert imgs["fake_BB"].shape[-1] == (2 if lab else 3)
        # const pipelines keep full resolution through the cascade
        if const:
            assert imgs["real_BA"].shape == imgs["real_BC"].shape
            assert imgs["fake_AC"].shape[1] == realA.shape[1]

    def test_transfer_shapes(self):
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st = tr.init(jax.random.PRNGKey(0))
        realA, realB = make_batch()
        real_A_in, fake_AC, fake_AB = tr.transfer(st, realA)
        assert real_A_in.shape == (1, 16, 16, 1)
        assert fake_AC.shape == (1, 32, 32, 1)
        assert fake_AB.shape == (1, 32, 32, 3)


class TestCycleGAN:
    def test_srdens_iteration(self):
        tr = CycleGANTrainer(net="SRdens", mode="x2")
        st = tr.init(jax.random.PRNGKey(0))
        realA, realB = make_batch(n=1, size=32)
        realA_lr = jnp.asarray(np.asarray(realA)[:, ::2, ::2, :])
        st, aux = tr.optimize_parameters(st, realA_lr, realB)
        for k in ["loss_G", "loss_D_A", "loss_D_B", "loss_cycle_A"]:
            assert np.isfinite(float(aux[k])), k
        assert aux["fake_B"].shape == realB.shape
        assert aux["fake_A"].shape == realA_lr.shape

    def test_net1_rddb_pair(self):
        tr = CycleGANTrainer(net="1", mode="x2")
        st = tr.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(0)
        realB = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        realA = jnp.asarray(np.asarray(realB)[:, ::2, ::2, :])
        st, aux = tr.optimize_parameters(st, realA, realB)
        assert aux["recl_A"].shape == realA.shape
        assert aux["recl_B"].shape == realB.shape

    def test_image_pool_semantics(self):
        from srcgan_tpu.train import ImagePool
        pool = ImagePool(2, seed=0)
        imgs = np.arange(8, dtype=np.float32).reshape(2, 1, 2, 2) / 8
        out1 = pool.query(imgs)
        np.testing.assert_array_equal(out1, imgs)  # fills buffer first
        out2 = pool.query(imgs + 1)
        assert out2.shape == imgs.shape

    def test_device_pool_semantics(self):
        """The device pool reproduces the reference algorithm
        (train.py:36-64) exactly given the same random draws: first P
        images insert and pass through; afterwards each image either evicts
        a uniformly chosen history entry with p=0.5 (returning the evicted
        image) or passes through.  The test replays the kernel's own
        jax.random draws into a python simulation of the host pool."""
        P = 3
        pool = {"buf": jnp.zeros((P, 2, 2, 1)),
                "n": jnp.zeros((), jnp.int32)}
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(0, 1, (9, 2, 2, 1)
                                       ).astype(np.float32))
        key = jax.random.PRNGKey(42)
        new_pool, out = CycleGANTrainer._device_pool_query(pool, imgs, key)

        keys = jax.random.split(key, imgs.shape[0])
        buf, n, exp, branches = [None] * P, 0, [], set()
        for i, k in enumerate(keys):
            ku, kr = jax.random.split(k)
            u = float(jax.random.uniform(ku))
            rid = int(jax.random.randint(kr, (), 0, P))
            img = np.asarray(imgs[i])
            if n < P:
                buf[n] = img
                n += 1
                exp.append(img)
            elif u > 0.5:
                branches.add("replace")
                exp.append(buf[rid])
                buf[rid] = img
            else:
                branches.add("pass")
                exp.append(img)
        assert branches == {"replace", "pass"}, \
            f"draws exercised only {branches}; pick another key"
        np.testing.assert_array_equal(np.asarray(out), np.stack(exp))
        np.testing.assert_array_equal(np.asarray(new_pool["buf"]),
                                      np.stack(buf))
        assert int(new_pool["n"]) == P

    def test_gd_step_pooled_matches_gd_step_on_warmup(self):
        """While the pool is filling (first pool_size images), queries are
        pass-through, so the fused device-pool iteration must equal gd_step
        exactly; the pools come back with the fakes inserted."""
        import jax.tree_util as jtu

        tr = CycleGANTrainer(net="SRdens", mode="x2", pool_size=4,
                             remat=False)
        st0 = tr.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        realB = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)
                                        ).astype(np.float32))
        realA = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)
                                        ).astype(np.float32))

        st_ref, aux_ref = tr.gd_step(jtu.tree_map(jnp.array, st0),
                                     realA, realB, 1e-4, 1e-5)

        pools = tr.device_pool_init(st0, realA, realB, seed=0)
        # fake_A = G_B(realB) lives in domain A (low-res), fake_B in domain B
        assert pools["A"]["buf"].shape == (4,) + realA.shape[1:]
        assert pools["B"]["buf"].shape == (4,) + realB.shape[1:]
        st_p, pools, aux_p = tr.gd_step_pooled(
            jtu.tree_map(jnp.array, st0), pools, realA, realB, 1e-4, 1e-5)

        for k in ("loss_G", "loss_D_A", "loss_D_B"):
            np.testing.assert_allclose(float(aux_ref[k]), float(aux_p[k]),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(jtu.tree_leaves(st_ref.d.params),
                        jtu.tree_leaves(st_p.d.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        assert int(pools["A"]["n"]) == 2 and int(pools["B"]["n"]) == 2

    def test_ema_with_device_pool(self):
        """gd_step_pooled_ema: live weights match gd_step_pooled exactly
        (same pool keys), and the EMA tree is the axpy of the updated
        generators."""
        import jax.tree_util as jtu

        tr = CycleGANTrainer(net="SRdens", mode="x2", pool_size=2,
                             remat=False)
        st0 = tr.init(jax.random.PRNGKey(0))
        realA, realB = make_batch(n=1, size=32)
        realA_lr = jnp.asarray(np.asarray(realA)[:, ::2, ::2, :])

        pools = tr.device_pool_init(st0, realA_lr, realB, seed=0)
        st_ref, _, _ = tr.gd_step_pooled(
            jtu.tree_map(jnp.array, st0), jtu.tree_map(jnp.array, pools),
            realA_lr, realB, 1e-4, 1e-5)

        ema0 = tr.ema_init(st0)
        st2, _, ema, aux = tr.gd_step_pooled_ema(
            jtu.tree_map(jnp.array, st0), pools, ema0, realA_lr, realB,
            1e-4, 1e-5, 0.9)
        assert np.isfinite(float(aux["loss_G"]))
        for a, b in zip(jtu.tree_leaves(st_ref.g.params),
                        jtu.tree_leaves(st2.g.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        e = np.asarray(jtu.tree_leaves(ema)[0])
        init_leaf = np.asarray(jtu.tree_leaves(st0.g.params)[0])
        new_leaf = np.asarray(jtu.tree_leaves(st2.g.params)[0])
        np.testing.assert_allclose(e, 0.9 * init_leaf + 0.1 * new_leaf,
                                   rtol=1e-6, atol=1e-7)

    def test_ema_both_pool_paths(self):
        """EMA generator tracking works through both iteration paths (fused
        gd_step when pool_size=0, g/d split + pool otherwise), applies the
        same live-weight update, and lags the live generators."""
        for pool in (0, 2):
            tr = CycleGANTrainer(net="SRdens", mode="x2", pool_size=pool)
            st = tr.init(jax.random.PRNGKey(0))
            realA, realB = make_batch(n=1, size=32)
            realA_lr = jnp.asarray(np.asarray(realA)[:, ::2, ::2, :])
            ref = CycleGANTrainer(net="SRdens", mode="x2", pool_size=pool)
            ref_st, _ = ref.optimize_parameters(
                jax.tree_util.tree_map(jnp.array, st), realA_lr, realB)
            ema = tr.ema_init(st)
            st2, ema, aux = tr.optimize_parameters(
                st, realA_lr, realB, ema=ema, ema_decay=0.9)
            assert np.isfinite(float(aux["loss_G"])), pool
            # live weights match the no-EMA iteration (same pool seed)
            for a, b in zip(jax.tree_util.tree_leaves(ref_st.g.params),
                            jax.tree_util.tree_leaves(st2.g.params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            e0 = np.asarray(jax.tree_util.tree_leaves(ema)[0])
            n0 = np.asarray(jax.tree_util.tree_leaves(st2.g.params)[0])
            assert not np.array_equal(e0, n0), pool  # ema lags

    def test_fused_gd_step_matches_two_step_when_pool_passthrough(self):
        """pool_size=0 makes ImagePool.query the identity (train.py:37-38),
        so the fused single-program gd_step must produce the SAME updates as
        g_step + host pool round-trip + d_step.

        realB >= 32x32: smaller inputs give D_B an empty PatchGAN map whose
        mean is NaN (torch errors outright there; docs/PARITY.md), making
        the loss comparisons vacuous (allclose passes NaN==NaN)."""
        import jax.tree_util as jtu

        rng = np.random.default_rng(7)
        realB = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        realA = jnp.asarray(np.asarray(realB)[:, ::2, ::2, :])

        def run(fused):
            tr = CycleGANTrainer(net="1", mode="x2", pool_size=0, remat=False)
            st = tr.init(jax.random.PRNGKey(3))
            for _ in range(2):
                if fused:
                    st, aux = tr.optimize_parameters(st, realA, realB)
                else:  # the unfused path, exactly as pool_size>0 runs it
                    st, aux = tr.g_step(st, realA, realB, tr.lr)
                    fa = tr.fake_A_pool.query(np.asarray(aux["fake_A"]))
                    fb = tr.fake_B_pool.query(np.asarray(aux["fake_B"]))
                    st, dm = tr.d_step(st, realA, realB, jnp.asarray(fa),
                                       jnp.asarray(fb), tr.d_lr)
                    aux.update(dm)
            return st, aux

        st_f, aux_f = run(True)
        st_u, aux_u = run(False)
        for a, b in zip(jtu.tree_leaves(st_f.g.params) +
                        jtu.tree_leaves(st_f.d.params),
                        jtu.tree_leaves(st_u.g.params) +
                        jtu.tree_leaves(st_u.d.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
        for k in ("loss_G", "loss_D_A", "loss_D_B"):
            assert np.isfinite(float(aux_f[k])), k  # allclose passes NaN==NaN
            np.testing.assert_allclose(float(aux_f[k]), float(aux_u[k]),
                                       rtol=2e-5, atol=2e-6)

    def test_pack_passes_matches_sequential(self):
        """pack_passes batches the six generator passes (train.py:228-260)
        into three same-net forwards along the batch axis.  Every CycleGAN
        generator is conv-only (no batch-coupled ops), so at matched init
        params the step-1 losses and per-sample pass outputs must match the
        sequential six-pass form to conv-reassociation noise.  That pins the
        whole feature: the packing IS the forward (concat + slice routing),
        and its backward is autodiff of the verified-identical graph.
        Updated params are deliberately NOT compared tightly — Adam's first
        step on a noise-dominated gradient entry is +-lr * sign(reduction
        noise) (docs/ROADMAP.md round-3 notes: "Adam-updated params are the
        wrong comparison surface"), so that check can only flake.

        realB must be >= 32x32: below that D_B's PatchGAN tail (k4 s1 p1
        twice on the 8x8 domain-A inputs) emits an EMPTY prediction map
        whose mean is NaN (torch instead raises "Kernel size can't be
        greater than actual input size" there — see docs/PARITY.md; either
        way the regime is outside the 256² protocol).  The NaN's backward
        contributes nothing, so params stay finite, and allclose(NaN, NaN)
        passes vacuously — hence the explicit isfinite guards."""
        rng = np.random.default_rng(11)
        realB = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        realA = jnp.asarray(np.asarray(realB)[:, ::2, ::2, :])

        def run(pack):
            tr = CycleGANTrainer(net="1", mode="x2", pool_size=0, remat=False,
                                 pack_passes=pack)
            st = tr.init(jax.random.PRNGKey(5))
            st1, aux = tr.gd_step(st, realA, realB, tr.lr, tr.d_lr)
            # one more step: the packed program must stay healthy when
            # iterated (fake_A re-enters g_a's packed batch each step)
            st2, aux2 = tr.gd_step(st1, realA, realB, tr.lr, tr.d_lr)
            return aux, aux2

        aux_p, aux2_p = run(True)
        aux_s, _ = run(False)
        for k in ("loss_G", "loss_G_A", "loss_G_B", "loss_cycle_A",
                  "loss_cycle_B", "loss_iden_A", "loss_iden_B",
                  "loss_D_A", "loss_D_B"):
            assert np.isfinite(float(aux_p[k])), k
            np.testing.assert_allclose(float(aux_p[k]), float(aux_s[k]),
                                       rtol=2e-5, atol=2e-6, err_msg=k)
            assert np.isfinite(float(aux2_p[k])), k
        for k in ("fake_A", "fake_B", "recl_A", "recl_B", "iden_A", "iden_B"):
            np.testing.assert_allclose(np.asarray(aux_p[k]),
                                       np.asarray(aux_s[k]),
                                       rtol=2e-4, atol=2e-5, err_msg=k)

    def test_pack_passes_composes_with_remat_and_bf16(self):
        """The packed forward under per-pass jax.checkpoint + bf16 stored
        activations still produces finite losses and the right shapes (the
        production --device-pool/--bf16-acts configs run through it)."""
        tr = CycleGANTrainer(net="SRdens", mode="x2", pool_size=0,
                             act_dtype=jnp.bfloat16, pack_passes=True)
        st = tr.init(jax.random.PRNGKey(2))
        realA, realB = make_batch(n=1, size=32)
        realA_lr = jnp.asarray(np.asarray(realA)[:, ::2, ::2, :])
        st, aux = tr.optimize_parameters(st, realA_lr, realB)
        for k in ("loss_G", "loss_D_A", "loss_D_B"):
            assert np.isfinite(float(aux[k])), k
        assert aux["fake_B"].shape == realB.shape
        assert aux["iden_A"].shape == realB.shape

    def test_gd_steps_scan_matches_sequential(self):
        """gd_steps_u8 (K fused G+D iterations per dispatch) applies the
        same sequence of updates as K gd_step calls with host-side
        conversion, returns scalar losses stacked per step, and the last
        step's logged images."""
        import jax.tree_util as jtu
        from srcgan_tpu import ops
        from srcgan_tpu.data import preprocess

        rng = np.random.default_rng(11)
        # 32x32: at 16x16 D_B's PatchGAN map is empty -> NaN losses that
        # make the allclose checks vacuous (NaN==NaN passes)
        src = rng.integers(0, 256, (2, 1, 32, 32, 3), dtype=np.uint8)
        tar = rng.integers(0, 256, (2, 1, 32, 32, 3), dtype=np.uint8)

        tr = CycleGANTrainer(net="1", mode="x2", pool_size=0, remat=False)
        st = tr.init(jax.random.PRNGKey(3))
        st_seq = jtu.tree_map(jnp.array, st)
        auxs = []
        for j in range(2):
            _, realB = preprocess.convert_pair(
                jnp.asarray(src[j]), jnp.asarray(tar[j]), "G2RGB")
            realA = ops.interpolate(realB, scale_factor=0.5, mode="nearest")
            st_seq, aux = tr.gd_step(st_seq, realA, realB, tr.lr, tr.d_lr)
            auxs.append({k: np.asarray(v) for k, v in aux.items()})

        st_blk, imgs, rows = tr.gd_steps_u8(
            jtu.tree_map(jnp.array, st), jnp.asarray(src), jnp.asarray(tar),
            tr.lr, tr.d_lr)
        for j in range(2):
            for k in ("loss_G", "loss_D_A", "loss_D_B", "loss_cycle_A"):
                assert np.isfinite(float(rows[k][j])), f"step {j} {k}"
                np.testing.assert_allclose(float(rows[k][j]),
                                           float(auxs[j][k]),
                                           rtol=2e-5, atol=2e-6,
                                           err_msg=f"step {j} {k}")
        for a, b in zip(jtu.tree_leaves(st_blk.g.params)
                        + jtu.tree_leaves(st_blk.d.params),
                        jtu.tree_leaves(st_seq.g.params)
                        + jtu.tree_leaves(st_seq.d.params)):
            # Adam's eps-normalization turns ~1e-8 scan-vs-unrolled
            # reduction-order grad noise into up-to-lr-sized param deltas on
            # near-zero grads (measured: 1/36864 elements at 1.6e-4 after 2
            # steps) — same tolerance story as the grad-accum proof.  The
            # per-step losses above are compared at 2e-5 rtol, which is the
            # tight correctness signal.
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)
        # images are the LAST step's logged set; step 2's forward runs
        # through params that already carry the ~1e-4 Adam-amplified
        # reduction noise checked above, so match at that scale
        for k in ("fake_A", "fake_B", "recl_A"):
            np.testing.assert_allclose(np.asarray(imgs[k]), auxs[-1][k],
                                       atol=1e-3)

    def test_remat_is_instance_scoped(self):
        """Two trainers with different remat settings coexist in one process:
        constructing a remat=True GAN trainer must NOT flip rematerialization
        on any other model's trunks (the old module-global REMAT_RRDB flag
        did, silently taxing ~15% extra trunk FLOPs everywhere)."""
        from srcgan_tpu import models, nn
        from srcgan_tpu.models.blocks import RRDB

        def remat_flags(mod):
            return [m.remat for m in nn.iter_modules(mod)
                    if isinstance(m, RRDB)]

        plain = models.RDDBNet(1, 1, 2, nf=8, nb=1, gc=4)
        assert remat_flags(plain) == [False]
        gan = CycleGANTrainer(net="1", mode="x2", pool_size=0, remat=True)
        assert all(remat_flags(gan.netG_A)) and remat_flags(gan.netG_A)
        # the GAN trainer's remat did not leak to the existing model...
        assert remat_flags(plain) == [False]
        # ...nor to models constructed afterwards
        cas = CasTrainer(sr_model="RDDBNet", c_model="ResDeconv", up=2)
        assert not any(remat_flags(cas.netG_A2C))


class TestOptim:
    def test_reference_cosine_compounds(self):
        lr0 = optim.reference_lr("cosine", 1e-4, 50, 1)
        lr50 = optim.reference_lr("cosine", 1e-4, 50, 50)
        assert lr0 < 1e-4
        assert 0.94e-4 < lr50 < 0.96e-4  # ~0.952x after 50 epochs

    def test_step_policy_constant(self):
        assert optim.reference_lr("step", 1e-4, 50, 30) == 1e-4

    def test_warmup_cosine(self):
        """Linear ramp over the first 5% of epochs, then the true-cosine
        arc; peak exactly base_lr at the warmup boundary."""
        base, n = 1e-4, 100  # warm = 5 epochs
        ramp = [optim.reference_lr("warmup_cosine", base, n, e)
                for e in (1, 2, 5)]
        assert ramp == [base / 5, 2 * base / 5, base]
        # first post-warmup epoch trains at the peak (arc index 0); the LR
        # is held for a whole epoch, so the arc is indexed epoch-1
        assert optim.reference_lr("warmup_cosine", base, n, 6) == base
        assert 0 < optim.reference_lr("warmup_cosine", base, n, 7) < base
        # final epoch: near the cosine floor but NONZERO — indexing by
        # `epoch` would waste the whole last epoch at lr=0 (regression)
        lr_end = optim.reference_lr("warmup_cosine", base, n, n)
        assert 0 < lr_end < 1e-3 * base
        # monotone decay after warmup
        post = [optim.reference_lr("warmup_cosine", base, n, e)
                for e in range(5, n + 1)]
        assert all(a >= b for a, b in zip(post, post[1:]))


class TestStateIO:
    def test_checkpoint_name_roundtrip(self):
        name = checkpoint_name("RDDBNet", "A2C", 2, 50)
        assert name == "RDDBNet_A2C_x2_0050.npz"
        d = parse_checkpoint_name(name)
        assert d == {"model": "RDDBNet", "ver": "G2RGB", "role": "A2C",
                     "up": 2, "epoch": 50}
        lab = checkpoint_name("ESPCN", "C2B", 4, 25, ver="G2LAB")
        assert parse_checkpoint_name(lab)["ver"] == "G2LAB"

    def test_params_roundtrip(self, tmp_path):
        from srcgan_tpu import models
        m = models.ESPCN(1, 3, 2)
        p = m.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "m.npz")
        save_params(path, p)
        p2 = load_params(path, like=p)
        for a, b in zip(jax.tree_util.tree_leaves(p),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestData:
    def test_synthetic_dataset_and_loader(self, tmp_path):
        root = data.make_synthetic_dataset(str(tmp_path / "SynthSat"), size=32)
        ds = data.G2RGB("SynthSat", "train", data_dir=str(tmp_path))
        assert len(ds) == 8
        sample = ds[0]
        assert sample["src"].shape == (32, 32, 1)
        assert sample["tar"].shape == (32, 32, 3)
        assert 0.0 <= sample["tar"].min() and sample["tar"].max() <= 1.0
        got = list(data.batches(ds, 4, shuffle=True, seed=1))
        assert got[0][0].shape == (4, 32, 32, 3) and got[0][0].dtype == np.uint8

    def test_g2lab_targets(self, tmp_path):
        data.make_synthetic_dataset(str(tmp_path / "SynthSat"), size=32)
        ds = data.G2LAB("SynthSat", "val", data_dir=str(tmp_path))
        s = ds[0]
        # normalized LAB: all channels in [0,1]
        assert s["tar"].min() >= 0.0 and s["tar"].max() <= 1.0

    def test_preview_png(self, tmp_path):
        data.make_synthetic_dataset(str(tmp_path / "SynthSat"), size=32)
        ds = data.G2RGB("SynthSat", "test", data_dir=str(tmp_path))
        out = ds.show(0, example_dir=str(tmp_path / "example"))
        assert os.path.exists(out)


class TestMultiTask:
    def test_iteration_runs(self):
        from srcgan_tpu.train import MultiTaskTrainer
        tr = MultiTaskTrainer(mode="x2", ngf=8, netG="resnet_6blocks")
        st = tr.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        realB = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        realA = jnp.asarray(
            (np.asarray(realB) @ np.array([0.2125, 0.7154, 0.0721],
                                          np.float32))[..., None][:, ::2, ::2])
        st, aux = tr.optimize_parameters(st, realA, realB)
        # real_C is the SR'd gray at full resolution
        assert aux["real_C"].shape == (1, 32, 32, 1)
        assert aux["fake_B"].shape == realB.shape
        for k in ["loss_G", "loss_G_C", "loss_D_A", "loss_D_B"]:
            assert np.isfinite(float(aux[k])), k

    def test_pack_passes_matches_sequential(self):
        """The packed G_A forward (one batch-2N pass over [real_C ; fake_A])
        equals the sequential two-pass form: instance norm is per-sample, so
        per-sample math is batch-independent.  Step-1 losses and per-sample
        pass outputs at matched init params pin the routing; updated params
        are NOT compared tightly — a conv bias feeding instance norm has a
        mathematically ZERO gradient, so Adam's first step there is
        +-lr * sign(reduction noise) and differs across program shapes
        (docs/ROADMAP.md: "Adam-updated params are the wrong comparison
        surface")."""
        from srcgan_tpu.train import MultiTaskTrainer

        rng = np.random.default_rng(3)
        realB = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)
                                        ).astype(np.float32))
        realA = jnp.asarray((np.asarray(realB) @ np.array(
            [0.2125, 0.7154, 0.0721], np.float32))[..., None][:, ::2, ::2])

        def run(pack):
            tr = MultiTaskTrainer(mode="x2", ngf=8, netG="resnet_6blocks",
                                  pool_size=0, remat=False, pack_passes=pack)
            st = tr.init(jax.random.PRNGKey(4))
            st, aux = tr.optimize_parameters(st, realA, realB)
            return st, aux

        st_p, aux_p = run(True)
        st_s, aux_s = run(False)
        for k in ("loss_G", "loss_G_A", "loss_G_B", "loss_G_C",
                  "loss_cycle_A", "loss_cycle_B", "loss_D_A", "loss_D_B"):
            assert np.isfinite(float(aux_p[k])), k  # allclose passes NaN==NaN
            np.testing.assert_allclose(float(aux_p[k]), float(aux_s[k]),
                                       rtol=2e-5, atol=2e-6, err_msg=k)
        for k in ("real_C", "fake_A", "fake_B", "recl_A", "recl_B"):
            np.testing.assert_allclose(np.asarray(aux_p[k]),
                                       np.asarray(aux_s[k]),
                                       rtol=2e-4, atol=2e-5, err_msg=k)

    def test_pack_passes_disabled_for_batchnorm(self):
        """norm='batch' couples samples through batch statistics — the
        trainer must fall back to sequential passes regardless of the flag."""
        from srcgan_tpu.train import MultiTaskTrainer
        tr = MultiTaskTrainer(mode="x2", ngf=8, netG="resnet_6blocks",
                              norm="batch", pack_passes=True)
        assert tr.pack_passes is False

    def test_device_pool_warmup_matches_host(self):
        """MultiTaskTrainer.gd_step_pooled equals the host-pool
        optimize_parameters while the pools are filling (pass-through
        phase) — same losses and D updates in one fused program."""
        import jax.tree_util as jtu

        from srcgan_tpu.train import MultiTaskTrainer

        rng = np.random.default_rng(0)
        realB = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)
                                        ).astype(np.float32))
        realA = jnp.asarray((np.asarray(realB) @ np.array(
            [0.2125, 0.7154, 0.0721], np.float32))[..., None][:, ::2, ::2])

        tr1 = MultiTaskTrainer(mode="x2", ngf=8, netG="resnet_6blocks")
        st1 = tr1.init(jax.random.PRNGKey(0))
        st1, aux1 = tr1.optimize_parameters(st1, realA, realB)

        tr2 = MultiTaskTrainer(mode="x2", ngf=8, netG="resnet_6blocks")
        st2 = tr2.init(jax.random.PRNGKey(0))
        pools = tr2.device_pool_init(st2, realA, realB, seed=0)
        st2, pools, aux2 = tr2.gd_step_pooled(st2, pools, realA, realB,
                                              tr2.lr, tr2.d_lr)

        for k in ("loss_G", "loss_D_A", "loss_D_B"):
            np.testing.assert_allclose(float(aux1[k]), float(aux2[k]),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(jtu.tree_leaves(st1.d.params),
                        jtu.tree_leaves(st2.d.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        assert int(pools["A"]["n"]) == 1 and int(pools["B"]["n"]) == 1

    def test_bf16_acts_iteration(self):
        """act_dtype=bf16 multitask iteration: losses finite, master params
        and Adam moments stay fp32, Ds receive fp32 inputs (loss path runs)."""
        from srcgan_tpu.train import MultiTaskTrainer
        tr = MultiTaskTrainer(mode="x2", ngf=8, netG="resnet_6blocks",
                              act_dtype=jnp.bfloat16)
        st = tr.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        realB = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        realA = jnp.asarray(
            (np.asarray(realB) @ np.array([0.2125, 0.7154, 0.0721],
                                          np.float32))[..., None][:, ::2, ::2])
        st, aux = tr.optimize_parameters(st, realA, realB)
        for k in ["loss_G", "loss_G_C", "loss_D_A", "loss_D_B"]:
            assert np.isfinite(float(aux[k])), k
        for leaf in jax.tree_util.tree_leaves((st.g.params, st.g.opt_state)):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                assert leaf.dtype == jnp.float32, leaf.dtype

    def test_g_c_trains_through_chain(self):
        """loss_G_C is excluded from loss_G, but G_C still updates via the
        fake_B path (optimizer chains its params)."""
        from srcgan_tpu.train import MultiTaskTrainer
        tr = MultiTaskTrainer(mode="x2", ngf=8, netG="resnet_6blocks")
        st = tr.init(jax.random.PRNGKey(1))
        before = np.asarray(jax.tree_util.tree_leaves(st.g.params["G_C"])[0])
        rng = np.random.default_rng(1)
        realB = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        realA = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32))
        st, _ = tr.optimize_parameters(st, realA, realB)
        after = np.asarray(jax.tree_util.tree_leaves(st.g.params["G_C"])[0])
        assert np.abs(after - before).max() > 0


class TestCache:
    def test_cached_dataset_matches(self, tmp_path):
        data.make_synthetic_dataset(str(tmp_path / "S"), size=32)
        ds = data.G2RGB("S", "train", data_dir=str(tmp_path))
        cached = data.CachedDataset(ds)
        for i in (0, 3):
            s0, t0 = ds.raw(i)
            s1, t1 = cached.raw(i)
            np.testing.assert_array_equal(s0, s1)
            np.testing.assert_array_equal(t0, t1)
        # second construction uses the cache files
        cached2 = data.CachedDataset(data.G2RGB("S", "train", data_dir=str(tmp_path)))
        np.testing.assert_array_equal(cached2.raw(1)[0], ds.raw(1)[0])
        # batches() works over the cache
        b = next(iter(data.batches(cached, 4)))
        assert b[0].shape == (4, 32, 32, 3)

    def test_multi_host_sharding_disjoint(self, tmp_path):
        data.make_synthetic_dataset(str(tmp_path / "S2"), size=16)
        ds = data.G2RGB("S2", "train", data_dir=str(tmp_path))
        seen = []
        for h in range(2):
            for _, _, idxs in data.batches(ds, 2, shuffle=True, seed=1,
                                           host_id=h, num_hosts=2):
                seen.extend(int(i) for i in idxs)
        assert sorted(seen) == list(range(len(ds)))


class TestMixedPrecision:
    def test_cyclegan_bf16_activations(self):
        """bf16 activations with fp32 master params: step runs and updates."""
        from srcgan_tpu.train import CycleGANTrainer
        tr = CycleGANTrainer(net="SRdens", mode="x2", act_dtype=jnp.bfloat16)
        st = tr.init(jax.random.PRNGKey(0))
        realA, realB = make_batch(n=1, size=32)
        realA_lr = jnp.asarray(np.asarray(realA)[:, ::2, ::2, :])
        before = np.asarray(jax.tree_util.tree_leaves(st.g.params)[0])
        st, aux = tr.optimize_parameters(st, realA_lr, realB)
        assert np.isfinite(float(aux["loss_G"]))
        after = np.asarray(jax.tree_util.tree_leaves(st.g.params)[0])
        assert after.dtype == np.float32  # master params stay fp32
        assert np.abs(after - before).max() > 0


class TestRetention:
    def test_keep_last_and_best(self, tmp_path):
        from srcgan_tpu.train.retention import CheckpointManager
        d = str(tmp_path)
        mgr = CheckpointManager(d, keep_last=2, keep_best=1, mode="max")
        metrics = {1: 10.0, 2: 30.0, 3: 20.0, 4: 15.0, 5: 18.0}
        for ep, psnr in metrics.items():
            files = [f"{d}/net_{ep:04d}.npz"]
            open(files[0], "w").write("x")
            mgr.register(ep, files, metric=psnr)
        import os
        left = sorted(f for f in os.listdir(d) if f.endswith(".npz"))
        # newest 2 = epochs 4,5; best 1 = epoch 2
        assert left == ["net_0002.npz", "net_0004.npz", "net_0005.npz"]
        assert mgr.best_epoch() == 2

    def test_keep_zero_keeps_all(self, tmp_path):
        from srcgan_tpu.train.retention import CheckpointManager
        d = str(tmp_path)
        mgr = CheckpointManager(d, keep_last=0, keep_best=0)
        import os
        for ep in range(1, 5):
            f = f"{d}/net_{ep:04d}.npz"
            open(f, "w").write("x")
            mgr.register(ep, [f], metric=float(ep))
        assert len([f for f in os.listdir(d) if f.endswith(".npz")]) == 4

    def test_ledger_survives_restart(self, tmp_path):
        from srcgan_tpu.train.retention import CheckpointManager
        d = str(tmp_path)
        mgr = CheckpointManager(d, keep_last=1, keep_best=1)
        for ep, v in ((1, 5.0), (2, 9.0)):
            f = f"{d}/net_{ep:04d}.npz"
            open(f, "w").write("x")
            mgr.register(ep, [f], metric=v)
        mgr2 = CheckpointManager(d, keep_last=1, keep_best=1)
        assert mgr2.best_epoch() == 2

    def test_early_stopper(self):
        from srcgan_tpu.train.retention import EarlyStopper
        es = EarlyStopper(patience=2, min_delta=0.1, mode="max")
        assert not es.update(10.0)
        assert not es.update(10.05)   # below min_delta: stale 1
        assert es.update(10.04)       # stale 2 -> stop
        es2 = EarlyStopper(patience=0)
        assert not any(es2.update(v) for v in [5, 4, 3, 2, 1])


class TestBF16Training:
    """Guard the bf16-activation training path (the --bf16 mechanism routes
    convs through bf16 MXU inputs; on CPU we reproduce it by feeding bf16
    batches, which makes ops.conv2d compute in bf16): losses must stay
    finite, descend, and track the fp32 trajectory to bf16 accuracy."""

    def test_bf16_activations_track_fp32(self):
        import jax.numpy as jnp
        from srcgan_tpu.train import CasTrainer
        rng = np.random.default_rng(0)
        batches = [rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
                   for _ in range(6)]

        def run(cast):
            tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
            st = tr.init(jax.random.PRNGKey(0))
            out = []
            for tar in batches:
                t = jnp.asarray(tar)
                a = jnp.zeros((2, 32, 32, 1), jnp.float32)
                if cast:
                    t = t.astype(jnp.bfloat16)
                    a = a.astype(jnp.bfloat16)
                st, m = tr.train_step(st, a, t, 1e-3)
                out.append((float(m["loss_SR"]), float(m["loss_C"])))
            return np.array(out)

        fp32 = run(False)
        bf16 = run(True)
        assert np.all(np.isfinite(bf16))
        assert bf16[-1, 0] < bf16[0, 0] and bf16[-1, 1] < bf16[0, 1]
        # trajectories agree to bf16 precision (~0.4% mantissa) + drift
        np.testing.assert_allclose(bf16, fp32, rtol=0.05)

    def test_grad_accum_matches_full_batch(self):
        """train_step_accum(K) applies the same update as train_step on the
        full batch (mean-of-means over equal chunks is exact for L1; only
        fp32 reduction order differs), at batch/K peak activation memory."""
        import jax.numpy as jnp
        from srcgan_tpu.train import CasTrainer
        rng = np.random.default_rng(3)
        tar = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
        src = jnp.zeros((4, 32, 32, 1), jnp.float32)

        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st = tr.init(jax.random.PRNGKey(0))
        full, m_full = tr.train_step(
            jax.tree_util.tree_map(jnp.array, st), src, tar, 1e-3)
        acc, m_acc = tr.train_step_accum(
            jax.tree_util.tree_map(jnp.array, st), src, tar, 1e-3, 2)

        np.testing.assert_allclose(float(m_full["loss_SR"]),
                                   float(m_acc["loss_SR"]), rtol=1e-6)
        np.testing.assert_allclose(float(m_full["loss_C"]),
                                   float(m_acc["loss_C"]), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(full.sr.params),
                        jax.tree_util.tree_leaves(acc.sr.params)):
            # Adam's eps-normalization amplifies reduction-order noise on
            # near-zero grads (same tolerance as the DP equality proof)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_ema_step_tracks_weights(self):
        """train_step_ema applies the identical update to train_step and the
        EMA tree converges toward the live weights at the decay rate."""
        import jax.numpy as jnp
        from srcgan_tpu.train import CasTrainer
        rng = np.random.default_rng(4)
        tar = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        src = jnp.zeros((2, 32, 32, 1), jnp.float32)
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st = tr.init(jax.random.PRNGKey(0))
        ema = tr.ema_init(st)
        ref, _ = tr.train_step(jax.tree_util.tree_map(jnp.array, st),
                               src, tar, 1e-3)
        st2, ema, m = tr.train_step_ema(st, ema, src, tar, 1e-3, 0.9)
        assert np.isfinite(float(m["loss_SR"]))
        # same update as the plain step
        for a, b in zip(jax.tree_util.tree_leaves(ref.sr.params),
                        jax.tree_util.tree_leaves(st2.sr.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        e0 = np.asarray(jax.tree_util.tree_leaves(ema["sr"])[0])
        n0 = np.asarray(jax.tree_util.tree_leaves(st2.sr.params)[0])
        assert not np.array_equal(e0, n0)  # lags the live weights
        # after many steps at decay 0, ema == live weights exactly
        ema0 = tr.ema_init(st2)
        st3, ema0, _ = tr.train_step_ema(st2, ema0, src, tar, 1e-3, 0.0)
        for e, w in zip(jax.tree_util.tree_leaves(ema0["sr"]),
                        jax.tree_util.tree_leaves(st3.sr.params)):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(w))

    def test_train_steps_scan_matches_sequential(self):
        """train_steps_u8 (K steps per one dispatch, lax.scan over stacked
        uint8 batches — the --steps-per-dispatch mechanism) applies the same
        sequence of updates as K sequential train_step_u8 calls and returns
        the per-step metrics stacked."""
        rng = np.random.default_rng(5)
        src = rng.integers(0, 256, (3, 1, 32, 32, 3), dtype=np.uint8)
        tar = rng.integers(0, 256, (3, 1, 32, 32, 3), dtype=np.uint8)
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st0 = tr.init(jax.random.PRNGKey(0))

        seq = jax.tree_util.tree_map(jnp.array, st0)
        seq_metrics = []
        for j in range(3):
            seq, m = tr.train_step_u8(seq, jnp.asarray(src[j]),
                                      jnp.asarray(tar[j]), 1e-3)
            seq_metrics.append({k: float(v) for k, v in m.items()})
        blk, mrows = tr.train_steps_u8(
            jax.tree_util.tree_map(jnp.array, st0),
            jnp.asarray(src), jnp.asarray(tar), 1e-3)
        for j in range(3):
            for k in ("loss_SR", "loss_C", "psnr_SR", "psnr_C"):
                np.testing.assert_allclose(float(mrows[k][j]),
                                           seq_metrics[j][k], rtol=1e-4,
                                           err_msg=f"step {j} metric {k}")
        for net in ("sr", "c"):
            for a, b in zip(
                    jax.tree_util.tree_leaves(getattr(blk, net).params),
                    jax.tree_util.tree_leaves(getattr(seq, net).params)):
                # same tolerance story as the grad-accum proof: Adam's
                # eps-normalization amplifies scan-vs-unrolled
                # reduction-order noise on near-zero grads (measured:
                # 1/589824 elements at 2.7e-4 after 3 steps); the per-step
                # metrics above are the tight (1e-4 rtol) correctness signal
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=5e-4)

    def test_stacked_blocks_grouping(self):
        """_stacked_blocks stacks K same-shape batches and flushes early on
        a shape change (ragged epoch tail)."""
        from srcgan_tpu.cli.train_cas import _stacked_blocks
        full = (np.zeros((2, 4, 4, 3), np.uint8),
                np.ones((2, 4, 4, 3), np.uint8), None)
        tail = (np.zeros((1, 4, 4, 3), np.uint8),
                np.ones((1, 4, 4, 3), np.uint8), None)
        blocks = list(_stacked_blocks(iter([full, full, full, tail]), 2))
        assert [b[0].shape for b in blocks] == [
            (2, 2, 4, 4, 3), (1, 2, 4, 4, 3), (1, 1, 4, 4, 3)]
        assert all(b[0].dtype == np.uint8 for b in blocks)

    def test_grad_accum_rejects_ragged_batch(self):
        import jax.numpy as jnp
        from srcgan_tpu.train import CasTrainer
        tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
        st = tr.init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="not divisible"):
            tr.train_step_accum(st, jnp.zeros((3, 16, 16, 1)),
                                jnp.zeros((3, 16, 16, 3)), 1e-3, 2)

    def test_act_dtype_bf16_masters_stay_fp32(self):
        """act_dtype=bf16 (mixed precision: bf16 compute, fp32 master params
        + fp32 Adam) descends, tracks the fp32 trajectory, and never
        downcasts the master params or optimizer moments."""
        import jax.numpy as jnp
        from srcgan_tpu.train import CasTrainer
        rng = np.random.default_rng(1)
        batches = [rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
                   for _ in range(6)]

        def run(act_dtype):
            tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2,
                            act_dtype=act_dtype)
            st = tr.init(jax.random.PRNGKey(0))
            out = []
            for tar in batches:
                st, m = tr.train_step(st, jnp.zeros((2, 32, 32, 1)),
                                      jnp.asarray(tar), 1e-3)
                out.append((float(m["loss_SR"]), float(m["loss_C"])))
            return np.array(out), st

        fp32, _ = run(None)
        bf16, st = run(jnp.bfloat16)
        assert np.all(np.isfinite(bf16))
        assert bf16[-1, 0] < bf16[0, 0] and bf16[-1, 1] < bf16[0, 1]
        np.testing.assert_allclose(bf16, fp32, rtol=0.05)
        for leaf in jax.tree_util.tree_leaves((st.sr.params, st.c.params,
                                               st.sr.opt_state)):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                assert leaf.dtype == jnp.float32, leaf.dtype


class TestParallelDecode:
    def test_worker_batches_identical(self, tmp_path):
        """workers>0 yields byte-identical batches in identical order."""
        from srcgan_tpu import data
        root = data.make_synthetic_dataset(str(tmp_path / "WSat"), n_train=11,
                                           size=16)
        ds = data.FileListDataset(root, "train", "G2RGB", str(tmp_path))
        seq = lambda w: list(data.batches(ds, 3, shuffle=True, seed=7,
                                          epoch=2, workers=w))
        a, b = seq(0), seq(3)
        assert len(a) == len(b) == 4
        for (s0, t0, i0), (s1, t1, i1) in zip(a, b):
            np.testing.assert_array_equal(i0, i1)
            np.testing.assert_array_equal(s0, s1)
            np.testing.assert_array_equal(t0, t1)

    def test_gd_steps_u8_x4_synthesis_shapes(self):
        """net='1' realA synthesis inside the u8 scan follows the trainer's
        scale (1/4x nearest at mode='x4'), not the reference's hardcoded
        0.5x (train.py:380-382, an x2-only protocol): shapes cycle and the
        losses are finite beyond x2."""
        rng = np.random.default_rng(17)
        src = rng.integers(0, 256, (1, 1, 48, 48, 3), dtype=np.uint8)
        tar = rng.integers(0, 256, (1, 1, 48, 48, 3), dtype=np.uint8)
        tr = CycleGANTrainer(net="1", mode="x4", pool_size=0, remat=False)
        st = tr.init(jax.random.PRNGKey(5))
        st, imgs, rows = tr.gd_steps_u8(st, jnp.asarray(src),
                                        jnp.asarray(tar), tr.lr, tr.d_lr)
        assert imgs["fake_B"].shape == (1, 48, 48, 3)
        assert imgs["fake_A"].shape == (1, 12, 12, 3)
        for k in ("loss_G", "loss_D_A", "loss_D_B"):
            assert np.isfinite(float(rows[k][0])), k

    def test_worker_batches_with_cache(self, tmp_path):
        from srcgan_tpu import data
        root = data.make_synthetic_dataset(str(tmp_path / "WSat2"), n_train=6,
                                           size=16)
        ds = data.CachedDataset(
            data.FileListDataset(root, "train", "G2RGB", str(tmp_path)))
        got = list(data.batches(ds, 4, workers=2))
        assert sum(x[0].shape[0] for x in got) == 6


class TestPooledStepsPerDispatch:
    def test_gd_steps_pooled_scan_matches_sequential(self):
        """gd_steps_pooled_u8 (K fused stateful-pool iterations per
        dispatch) applies the same updates AND the same pool evolution as K
        sequential gd_step_pooled calls with host-side conversion — the
        --device-pool x --steps-per-dispatch composition."""
        import jax.tree_util as jtu
        from srcgan_tpu import ops
        from srcgan_tpu.data import preprocess

        rng = np.random.default_rng(13)
        # 32x32 for non-degenerate D_B maps (see the scan test above)
        src = rng.integers(0, 256, (2, 1, 32, 32, 3), dtype=np.uint8)
        tar = rng.integers(0, 256, (2, 1, 32, 32, 3), dtype=np.uint8)

        tr = CycleGANTrainer(net="1", mode="x2", pool_size=2, remat=False)
        st = tr.init(jax.random.PRNGKey(3))

        # sequential: K gd_step_pooled calls, pool threaded on host
        _, realB0 = preprocess.convert_pair(
            jnp.asarray(src[0]), jnp.asarray(tar[0]), "G2RGB")
        realA0 = ops.interpolate(realB0, scale_factor=0.5, mode="nearest")
        pools_seq = tr.device_pool_init(st, realA0, realB0, seed=0)
        pools_blk = jtu.tree_map(jnp.array, pools_seq)
        st_seq = jtu.tree_map(jnp.array, st)
        auxs = []
        for j in range(2):
            _, realB = preprocess.convert_pair(
                jnp.asarray(src[j]), jnp.asarray(tar[j]), "G2RGB")
            realA = ops.interpolate(realB, scale_factor=0.5, mode="nearest")
            st_seq, pools_seq, aux = tr.gd_step_pooled(
                st_seq, pools_seq, realA, realB, tr.lr, tr.d_lr)
            auxs.append({k: np.asarray(v) for k, v in aux.items()})

        st_blk, pools_out, imgs, rows = tr.gd_steps_pooled_u8(
            jtu.tree_map(jnp.array, st), pools_blk,
            jnp.asarray(src), jnp.asarray(tar), tr.lr, tr.d_lr)

        for j in range(2):
            for k in ("loss_G", "loss_D_A", "loss_D_B", "loss_cycle_A"):
                assert np.isfinite(float(rows[k][j])), f"step {j} {k}"
                np.testing.assert_allclose(float(rows[k][j]),
                                           float(auxs[j][k]),
                                           rtol=2e-5, atol=2e-6,
                                           err_msg=f"step {j} {k}")
        # pool evolution identical: same buffers, counts and carried key
        np.testing.assert_array_equal(np.asarray(pools_out["key"]),
                                      np.asarray(pools_seq["key"]))
        for d in ("A", "B"):
            assert int(pools_out[d]["n"]) == int(pools_seq[d]["n"])
            np.testing.assert_allclose(np.asarray(pools_out[d]["buf"]),
                                       np.asarray(pools_seq[d]["buf"]),
                                       atol=1e-3)
        # params: Adam eps-amplified reduction-order envelope (same story
        # as test_gd_steps_scan_matches_sequential)
        for a, b in zip(jtu.tree_leaves(st_blk.g.params)
                        + jtu.tree_leaves(st_blk.d.params),
                        jtu.tree_leaves(st_seq.g.params)
                        + jtu.tree_leaves(st_seq.d.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)
        for k in ("fake_A", "fake_B"):
            np.testing.assert_allclose(np.asarray(imgs[k]), auxs[-1][k],
                                       atol=1e-3)


def test_save_params_is_atomic_tempfile(tmp_path):
    """save_params/save_train_state write temp+rename: overwriting an
    existing checkpoint leaves no .tmp litter and the destination is always
    a complete file (cli.serve --watch and SIGKILL-mid-save both rely on
    this)."""
    import jax

    from srcgan_tpu import models
    from srcgan_tpu.train.state import load_params, save_params

    m = models.create("ESPCN", 1, 1, 2, base_kernel=8)
    p1 = jax.device_get(m.init(jax.random.PRNGKey(0)))
    p2 = jax.device_get(m.init(jax.random.PRNGKey(1)))
    path = str(tmp_path / "ESPCN_A2C_x2_0001.npz")
    save_params(path, p1)
    save_params(path, p2)  # overwrite via os.replace
    got = load_params(path, like=p1)
    leaf = jax.tree_util.tree_leaves
    np.testing.assert_array_equal(leaf(got)[0], leaf(p2)[0])
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]
