"""Orbax checkpoint backend: round-trips, retention, sharded restore.

The .npz path is the reference-parity format; orbax_io is the scale path
(async per-shard writes).  These tests pin: (1) a full CasState round-trip
with extra metadata, (2) max_to_keep retention, (3) restore INTO a sharded
(replicated-under-mesh) target on the 8-device CPU backend — the property
that makes multi-host restore gather-free.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcgan_tpu import parallel
from srcgan_tpu.train import CasTrainer
from srcgan_tpu.train.orbax_io import (OrbaxCheckpointer,
                                       load_train_state_orbax,
                                       save_train_state_orbax)


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_round_trip_with_extra(tmp_path):
    tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
    st = tr.init(jax.random.PRNGKey(0))
    # one step so moments are non-trivial
    st, _ = tr.train_step(jax.tree_util.tree_map(jnp.array, st),
                          jnp.zeros((1, 16, 16, 1)),
                          jnp.ones((1, 16, 16, 3)) * 0.5, 1e-3)
    d = str(tmp_path / "ck")
    save_train_state_orbax(d, 7, st, {"epoch": 7, "val_psnr": 13.25})
    got, extra = load_train_state_orbax(d, tr.init(jax.random.PRNGKey(1)))
    tree_equal(st, got)
    assert extra == {"epoch": 7, "val_psnr": 13.25}


def test_retention_and_latest(tmp_path):
    tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
    st = tr.init(jax.random.PRNGKey(0))
    with OrbaxCheckpointer(str(tmp_path / "ck"), max_to_keep=2,
                           async_save=True) as ck:
        for step in (1, 2, 3):
            ck.save(step, st, {"epoch": step})
        ck.wait_until_finished()
        assert ck.latest_step() == 3
        _, extra = ck.restore(tr.init(jax.random.PRNGKey(1)))
        assert extra["epoch"] == 3
        with pytest.raises(Exception):
            ck.restore(tr.init(jax.random.PRNGKey(1)), step=1)  # GC'd


def test_sharded_restore_lands_sharded(tmp_path):
    """Restore into a mesh-replicated target: arrays come back carrying the
    target sharding (what makes multi-host restore gather/broadcast-free)."""
    tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
    st = tr.init(jax.random.PRNGKey(0))
    d = str(tmp_path / "ck")
    save_train_state_orbax(d, 1, st)

    mesh = parallel.make_mesh()
    like = parallel.put_replicated(tr.init(jax.random.PRNGKey(1)), mesh)
    got, _ = load_train_state_orbax(d, like)
    tree_equal(st, got)
    leaf = jax.tree_util.tree_leaves(got)[0]
    like_leaf = jax.tree_util.tree_leaves(like)[0]
    assert leaf.sharding.is_equivalent_to(like_leaf.sharding, leaf.ndim), (
        leaf.sharding, like_leaf.sharding)


def test_zero1_state_round_trips_sharded(tmp_path):
    """ZeRO-1 state through orbax: the (D, chunk) row-sharded Adam moments
    save per-shard and restore INTO their sharded layout (no gather) —
    the --zero-opt x --orbax-dir production composition."""
    tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
    mesh = parallel.make_mesh()
    st = parallel.zero1_init(tr, jax.random.PRNGKey(0), mesh)
    step = parallel.make_cas_zero1_step(tr, mesh)
    rng = np.random.default_rng(0)
    tar = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32))
    src = jnp.asarray((np.asarray(tar) @ np.array(
        [0.2125, 0.7154, 0.0721], np.float32))[..., None])
    st, _ = step(st, parallel.put_batch(src, mesh),
                 parallel.put_batch(tar, mesh), 1e-3)

    d = str(tmp_path / "ckz")
    save_train_state_orbax(d, 1, st, {"epoch": 1})
    like = parallel.zero1_init(tr, jax.random.PRNGKey(1), mesh)
    got, extra = load_train_state_orbax(d, like)
    assert extra == {"epoch": 1}
    tree_equal(st, got)
    # moments land physically row-sharded again
    mu, _ = got.sr.opt_state
    leaf = jax.tree_util.tree_leaves(mu)[0]
    assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)
    # and the restored state takes another step
    st2, m2 = step(got, parallel.put_batch(src, mesh),
                   parallel.put_batch(tar, mesh), 1e-3)
    assert np.isfinite(float(m2["loss_SR"]))


def test_fsdp_state_round_trips_sharded(tmp_path):
    """FSDP state through orbax: params AND moments are (D, chunk)
    row-sharded at rest; orbax saves per-shard and restores INTO that
    layout with no gather — the --fsdp x --orbax-dir composition."""
    tr = CasTrainer(sr_model="ESPCN", c_model="ResDeconv", up=2)
    mesh = parallel.make_mesh()
    st, shapes = parallel.fsdp_init(tr, jax.random.PRNGKey(0), mesh)
    step = parallel.make_cas_fsdp_step(tr, mesh, shapes)
    rng = np.random.default_rng(0)
    tar = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32))
    src = jnp.asarray((np.asarray(tar) @ np.array(
        [0.2125, 0.7154, 0.0721], np.float32))[..., None])
    st, _ = step(st, parallel.put_batch(src, mesh),
                 parallel.put_batch(tar, mesh), 1e-3)

    d = str(tmp_path / "ckf")
    save_train_state_orbax(d, 1, st, {"epoch": 1})
    like, _ = parallel.fsdp_init(tr, jax.random.PRNGKey(1), mesh)
    got, extra = load_train_state_orbax(d, like)
    assert extra == {"epoch": 1}
    tree_equal(st, got)
    # params land physically row-sharded again (the FSDP-specific property)
    leaf = jax.tree_util.tree_leaves(got.sr.params)[0]
    assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)
    # and the restored state takes another step
    st2, m2 = step(got, parallel.put_batch(src, mesh),
                   parallel.put_batch(tar, mesh), 1e-3)
    assert np.isfinite(float(m2["loss_SR"]))
