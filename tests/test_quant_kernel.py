"""Tests for the fused int8 RDB5 Pallas kernel (ops/pallas/rdb5_kernel.py).

Run on the CPU backend with interpret=True (conftest pins the platform); the
on-TPU compile path is exercised by bench.py / the serving drivers.

Contracts:
  - kernel ~= rdb5_int8_xla (the XLA statement of its exact semantics) within
    a small relative error.  NOT bitwise: the f32 dequant chain fuses
    differently per program (FMA), and a 1-ulp difference occasionally flips
    a requantization rounding — sparse single-LSB diffs are expected.
  - the int8 semantics stay within quantization noise of the fp32 block.
  - the quant.rdb5_dispatch integration: calibrate + int8 modes consume one
    callsite per block, mix correctly with per-conv quantized convs, and the
    end-to-end RDDBNet int8 forward stays close to fp32.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from srcgan_tpu import models, ops, quant
from srcgan_tpu.models.blocks import ResidualDenseBlock5
from srcgan_tpu.ops.pallas import rdb5_kernel as K


def _block_and_input(n=1, h=16, w=128, seed=0):
    rng = np.random.default_rng(seed)
    blk = ResidualDenseBlock5(64, 32)
    params = blk.init(jax.random.PRNGKey(seed))
    x = jnp.asarray(rng.uniform(-0.5, 1.5, (n, h, w, 64)).astype(np.float32))
    _, cat = blk.forward_with_sources(params, x)
    absmax = jnp.max(jnp.abs(cat), axis=(0, 1, 2))
    return blk, params, x, absmax


class TestRDB5Int8Kernel:
    def test_kernel_matches_xla_reference(self):
        blk, params, x, absmax = _block_and_input()
        y_ref = K.rdb5_int8_xla(x, params, absmax)
        y_pl = K.rdb5_int8_fused(x, params, absmax, interpret=True)
        rel = float(jnp.linalg.norm(y_pl - y_ref) / jnp.linalg.norm(y_ref))
        assert rel < 1e-2, rel

    def test_kernel_multi_tile_multi_image(self):
        blk, params, x, absmax = _block_and_input(n=2, h=64, w=128, seed=3)
        y_ref = K.rdb5_int8_xla(x, params, absmax)
        y_pl = K.rdb5_int8_fused(x, params, absmax, interpret=True)
        rel = float(jnp.linalg.norm(y_pl - y_ref) / jnp.linalg.norm(y_ref))
        assert rel < 1e-2, rel

    def test_kernel_tiled_mode(self):
        # H large enough to force the halo-tiled grid (pick_tiling -> HALO)
        blk, params, x, absmax = _block_and_input(n=1, h=128, w=128, seed=5)
        assert K.pick_tiling(128, 128)[1] == K.HALO
        y_ref = K.rdb5_int8_xla(x, params, absmax)
        y_pl = K.rdb5_int8_fused(x, params, absmax, interpret=True)
        rel = float(jnp.linalg.norm(y_pl - y_ref) / jnp.linalg.norm(y_ref))
        assert rel < 1e-2, rel

    def test_bf16_kernel_matches_xla_block(self):
        blk, params, x, absmax = _block_and_input(n=2, h=32, w=128, seed=9)
        xb = x.astype(jnp.bfloat16)
        pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
        y_xla = blk.forward(pb, xb, train=False)   # paired schedule, bf16
        y_pl = K.rdb5_bf16_fused(xb, pb, interpret=True)
        rel = float(jnp.linalg.norm((y_pl - y_xla).astype(jnp.float32))
                    / jnp.linalg.norm(y_xla.astype(jnp.float32)))
        # kernel keeps f32 partial sums; XLA's paired schedule stores px
        # slices bf16 — differences are bf16 staging noise
        assert rel < 2e-2, rel
        # and both track the fp32 forward
        y_fp = blk.forward(params, x, train=False)
        rel_fp = float(jnp.linalg.norm(y_pl.astype(jnp.float32) - y_fp)
                       / jnp.linalg.norm(y_fp))
        assert rel_fp < 2e-2, rel_fp

    def test_int8_semantics_close_to_fp32(self):
        blk, params, x, absmax = _block_and_input(seed=1)
        y_fp = blk.forward(params, x, train=False)
        y_ref = K.rdb5_int8_xla(x, params, absmax)
        rel = float(jnp.linalg.norm(y_ref - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.06, rel

    def test_unsupported_shapes_rejected(self):
        assert not K.supported((1, 16, 100, 64), 64, 32)   # w % 128 != 0
        assert not K.supported((1, 4, 128, 64), 64, 32)    # h too small
        assert not K.supported((1, 16, 128, 48), 64, 32)   # c != nf
        assert K.supported((2, 128, 128, 64), 64, 32)      # whole-image mode
        assert K.supported((1, 15, 128, 64), 64, 32)       # ditto, odd h
        assert K.supported((1, 512, 128, 64), 64, 32)      # tiled mode
        assert K.pick_tiling(64, 128) == (64, 1)
        assert K.pick_tiling(128, 128) == (64, K.HALO)
        assert K.pick_tiling(512, 128)[1] == K.HALO


class TestRDB5DispatchIntegration:
    @pytest.fixture(autouse=True)
    def _force(self):
        quant.FORCE_PALLAS_RDB5 = True
        yield
        quant.FORCE_PALLAS_RDB5 = False

    def test_rddbnet_int8_fused_end_to_end(self):
        rng = np.random.default_rng(7)
        model = models.RDDBNet(1, 1, 2, nf=64, nb=1)
        params = model.init(jax.random.PRNGKey(7))
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 128, 1)).astype(np.float32))

        y_fp = model.fwd(params, x)
        scales = quant.calibrate_fn(lambda b: model.fwd(params, b), [x])
        # 3 RDB5 callsites (nb=1) + quantizable non-RDB5 convs (trunk_conv;
        # conv_first/last & the deconv tail fall below MIN_QUANT_CH or are
        # handled by the phasefold path)
        n_rdb5 = sum(1 for v in scales.values()
                     if np.asarray(v).shape == (192,))
        assert n_rdb5 == 3, scales.keys()
        with quant.quant_mode("int8", scales):
            y_q = model.fwd(params, x)
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.1, rel

    def test_dispatch_consistent_callsites_with_per_conv(self):
        """The same scale table must work whether or not blocks hit the fused
        path, as long as the gate decides identically in both passes."""
        rng = np.random.default_rng(8)
        blk = ResidualDenseBlock5(64, 32)
        params = blk.init(jax.random.PRNGKey(8))
        x = jnp.asarray(rng.uniform(-0.5, 1.5, (1, 16, 128, 64)
                                    ).astype(np.float32))
        scales = quant.calibrate_fn(
            lambda b: blk.forward(params, b, train=False), [x])
        assert list(scales.keys()) == [0]
        assert np.asarray(scales[0]).shape == (192,)
        with quant.quant_mode("int8", scales):
            y_q = blk.forward(params, x, train=False)
        y_fp = blk.forward(params, x, train=False)
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.06, rel

    def test_calibration_survives_instance_remat(self):
        """jax.checkpoint traces its body even in eager mode, which would
        hand the calibration recorders tracers.  RRDB.forward must skip its
        (instance-scoped) remat wrap during a calibration pass — remat is
        value-neutral, so int8 accuracy is unchanged."""
        from srcgan_tpu.models import blocks as blocks_mod

        rng = np.random.default_rng(11)
        model = models.RDDBNet(1, 1, 2, nf=64, nb=1)
        assert blocks_mod.set_trunk_remat(model, True) == 1
        params = model.init(jax.random.PRNGKey(11))
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 128, 1)
                                    ).astype(np.float32))
        scales = quant.calibrate_fn(lambda b: model.fwd(params, b), [x])
        # remat is still enabled on the instance after the pass
        from srcgan_tpu.models.blocks import RRDB
        from srcgan_tpu import nn as nn_mod
        assert all(m.remat for m in nn_mod.iter_modules(model)
                   if isinstance(m, RRDB))
        with quant.quant_mode("int8", scales):
            y_q = model.fwd(params, x)
        y_fp = model.fwd(params, x)
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.1, rel

    def test_train_mode_never_dispatches(self):
        blk, params, x, _ = _block_and_input(seed=2)
        with quant.quant_mode("int8", {0: np.full((192,), 2.0, np.float32)}):
            # the serving kernel is forward-only: train=True must bypass it
            assert quant.rdb5_dispatch(blk, params, x, train=True) is None
        # and outside any quant mode the dispatch is inert
        assert quant.rdb5_dispatch(blk, params, x, train=False) is None


class TestQuantModeExclusivity:
    """quant_mode is process-exclusive: the conv2d dispatch install/restore
    is a global patch, so a concurrent block on another thread used to let
    whichever block exited first restore the real conv2d under the other
    one mid-trace — silent callsite desync.  Entry now raises instead
    (contract noted in cli/serve.py)."""

    def test_concurrent_entry_raises(self):
        import threading

        entered, release = threading.Event(), threading.Event()
        fail = []

        def holder():
            try:
                with quant.quant_mode("int8", {}):
                    entered.set()
                    release.wait(10)
            except Exception as e:  # pragma: no cover - diagnostic
                fail.append(e)
                entered.set()

        t = threading.Thread(target=holder, name="holder")
        t.start()
        try:
            assert entered.wait(10)
            assert not fail, fail
            with pytest.raises(RuntimeError, match="already active"):
                with quant.quant_mode("calibrate", {}):
                    pass
        finally:
            release.set()
            t.join(10)
        # once the holder exits, the block is available again
        with quant.quant_mode("int8", {}):
            pass

    def test_nested_entry_raises(self):
        with quant.quant_mode("int8", {}):
            with pytest.raises(RuntimeError, match="already active"):
                with quant.quant_mode("int8", {}):
                    pass
        # the failed inner entry must not have broken the outer teardown
        with quant.quant_mode("calibrate", {}):
            pass
