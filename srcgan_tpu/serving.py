"""Production inference: load a trained cascade and serve batched requests.

The reference's only "serving" story is the per-sample eval loop in
testCas.py.  This module packages the cascade as a deployable predictor:

  - construct from our .npz checkpoints OR reference .pth state_dicts
    (config parsed from the checkpoint filename, as the reference does);
  - one jit-compiled program: uint8 in -> uint8 SR RGB out (all preprocessing,
    the two networks, and the output quantization fused);
  - bf16 compute mode for MXU throughput, fp32-highest for metric-grade output;
  - optional batch padding so ragged request sizes hit one compiled shape;
  - optional data-parallel sharding over a mesh for multi-chip serving.

Example:
    pred = CascadePredictor.from_checkpoints(
        "checkpoints/RDDBNet_A2C_x4_0050.npz",
        "checkpoints/ResDeconv_C2B_x4_0050.npz", bf16=True)
    sr_u8 = pred.predict(gray_u8_batch)   # (N,h,w,{1|3}) -> (N,h*up,w*up,3)
"""
from __future__ import annotations

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

from srcgan_tpu import config, models, ops
from srcgan_tpu.train.state import load_params, parse_checkpoint_name


class CascadePredictor:
    """SR -> colorize cascade with a single fused inference program."""

    def __init__(self, sr_model, sr_params, c_model, c_params, up: int,
                 lab: bool = False, bf16: bool = False, pad_batch_to: int = 0,
                 sr_state=None, c_state=None, int8: bool = False,
                 self_ensemble: bool = False):
        self.sr_model, self.c_model = sr_model, c_model
        # geometric self-ensemble (x8 dihedral TTA, ops.ensemble): the D4
        # copies run as ONE 8N-row batch through the fused program and the
        # inverted outputs average in fp32 — a quality/throughput trade
        # (~8x FLOPs) the reference protocol lacks
        self.self_ensemble = self_ensemble
        # int8: post-training quantized serving (srcgan_tpu.quant) — per-
        # channel weight scales + calibrated activation scales; ~2x MXU rate
        # vs bf16 at this zoo's widths.  Requires calibrate() before predict.
        self.int8 = int8
        self.int8_scales = {}
        if int8:
            bf16 = False  # dequantized elementwise runs fp32 between convs
        self.up, self.lab, self.bf16 = up, lab, bf16
        self.pad = pad_batch_to
        dtype = jnp.bfloat16 if bf16 else jnp.float32
        self.sr_params = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                                sr_params)
        self.c_params = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                               c_params)
        # model state (BatchNorm running stats) from the checkpoint; empty
        # for the GN-normed default zoo.  Baked to device arrays once —
        # host-numpy state would re-transfer H2D on every _run call
        self.sr_state = jax.tree_util.tree_map(
            jnp.asarray,
            sr_state if sr_state is not None else sr_model.init_state())
        self.c_state = jax.tree_util.tree_map(
            jnp.asarray,
            c_state if c_state is not None else c_model.init_state())

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_checkpoints(cls, netGA: str, netGB: str, bf16: bool = False,
                         **kw) -> "CascadePredictor":
        """Build from name-encoded checkpoints (.npz ours / .pth reference)."""
        infoA = parse_checkpoint_name(netGA)
        infoB = parse_checkpoint_name(netGB)
        lab = infoA["ver"] == "G2LAB"
        up = infoA["up"]
        sr = models.create(infoA["model"], 1, 1, up)
        c = models.create(infoB["model"], 1, 2 if lab else 3)
        from srcgan_tpu.interop import load_params_any

        sr_p, sr_st = load_params_any(sr, netGA)
        c_p, c_st = load_params_any(c, netGB)
        return cls(sr, sr_p, c, c_p, up, lab=lab, bf16=bf16,
                   sr_state=sr_st, c_state=c_st, **kw)

    def reload_checkpoints(self, netGA: str, netGB: str):
        """Hot-reload: load new weights for this predictor's EXACT
        architecture and return a zero-arg installer thunk.

        Loading, dtype casting and H2D transfer happen on the CALLING
        thread; the returned ``install()`` only rebinds the param/state
        attributes, so callers serialise installation with in-flight
        ``predict`` calls however they like (the serve daemon runs it on
        the Batcher worker thread / under its scene lock).  ``_run`` takes
        the params as jit ARGUMENTS, so a same-architecture swap triggers
        no recompilation — the new weights serve at full speed immediately.
        """
        if self.int8:
            raise ValueError(
                "int8 predictors cannot hot-reload: the calibrated "
                "activation scales belong to the old weights — restart "
                "the server and re-calibrate")
        from srcgan_tpu.interop import load_params_any

        infoA = parse_checkpoint_name(netGA)
        infoB = parse_checkpoint_name(netGB)
        if infoA["role"] != "A2C" or infoB["role"] != "C2B":
            raise ValueError(
                f"reload needs an (A2C, C2B) checkpoint pair; got "
                f"{infoA['role']} + {infoB['role']}")
        if infoA["up"] != self.up:
            raise ValueError(f"checkpoint is x{infoA['up']} but this "
                             f"predictor serves x{self.up}")
        if (infoA["ver"] == "G2LAB") != self.lab:
            raise ValueError(
                f"checkpoint is {infoA['ver'] or 'G2RGB'} but this "
                f"predictor serves {'G2LAB' if self.lab else 'G2RGB'}")
        # load against the CURRENT model objects: the template catches any
        # architecture/shape mismatch the filename convention can't encode
        sr_p, sr_st = load_params_any(self.sr_model, netGA)
        c_p, c_st = load_params_any(self.c_model, netGB)
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        sr_p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), sr_p)
        c_p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), c_p)

        sr_st = jax.tree_util.tree_map(
            jnp.asarray,
            sr_st if sr_st is not None else self.sr_model.init_state())
        c_st = jax.tree_util.tree_map(
            jnp.asarray,
            c_st if c_st is not None else self.c_model.init_state())

        def install():
            self.sr_params, self.c_params = sr_p, c_p
            self.sr_state, self.c_state = sr_st, c_st

        return install

    # -- the fused program ---------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def _run(self, sr_params, c_params, sr_state, c_state, gray_u8):
        # the model states ride as jit ARGUMENTS like the params: with self
        # static, anything read off it here is a trace-time constant, and a
        # checkpoint hot-reload that rebinds self.sr_state/c_state (BatchNorm
        # running stats) would be silently ignored by the cached executable
        with config.matmul_precision("default" if self.bf16 else "highest"):
            x = gray_u8.astype(jnp.float32) / 255.0
            if x.shape[-1] == 3:
                x = ops.rgb_to_gray(x)

            def rgb_of(x32):
                xin = x32.astype(jnp.bfloat16) if self.bf16 else x32
                fake_c, _ = self.sr_model.apply(
                    sr_params, xin, state=sr_state, train=False)
                out, _ = self.c_model.apply(
                    c_params, fake_c, state=c_state, train=False)
                out = out.astype(jnp.float32)
                if self.lab:
                    lab_img = jnp.concatenate(
                        [fake_c.astype(jnp.float32), out], -1)
                    return ops.lab_norm_to_rgb(lab_img)
                return jnp.clip(out, 0.0, 1.0)

            if self.self_ensemble:
                from srcgan_tpu.ops import ensemble

                rgb = ensemble.self_ensemble_apply(rgb_of, x)
                rgb = jnp.clip(rgb, 0.0, 1.0)
            else:
                rgb = rgb_of(x)
            return jnp.round(rgb * 255.0).astype(jnp.uint8)

    def calibrate(self, gray_u8_batches) -> None:
        """int8 mode: record per-callsite activation scales from
        representative inputs (eager fp32 pass; a handful of batches is
        enough — absmax over all of them)."""
        assert self.int8, "calibrate() only applies to int8 predictors"
        from srcgan_tpu import quant

        self.int8_scales = quant.calibrate_fn(
            lambda b: self._run(self.sr_params, self.c_params, self.sr_state,
                                self.c_state, jnp.asarray(b)),
            gray_u8_batches)

    def _predict_async(self, gray_u8: np.ndarray, pad: int | None = None):
        """Dispatch one batch; returns (device_array, valid_n) without
        blocking on execution (jax async dispatch).  ``pad`` overrides the
        predictor's batch-padding bucket (0 disables) for callers that
        dispatch a shape the bucket would only waste work on."""
        n = gray_u8.shape[0]
        pad = self.pad if pad is None else pad
        if pad and n % pad:
            reps = pad - n % pad
            gray_u8 = np.concatenate(
                [gray_u8, np.repeat(gray_u8[-1:], reps, axis=0)], axis=0)
        if self.int8:
            if not self.int8_scales:
                raise RuntimeError("int8 predictor needs calibrate() first")
            from srcgan_tpu import quant

            with quant.quant_mode("int8", self.int8_scales):
                out = self._run(self.sr_params, self.c_params, self.sr_state,
                                self.c_state, jnp.asarray(gray_u8))
        else:
            out = self._run(self.sr_params, self.c_params, self.sr_state,
                            self.c_state, jnp.asarray(gray_u8))
        return out, n

    def predict(self, gray_u8: np.ndarray) -> np.ndarray:
        """(N, h, w, 1|3) uint8 LR gray (or RGB, luma taken) -> SR RGB uint8."""
        out, n = self._predict_async(gray_u8)
        return np.asarray(out[:n])

    def predict_stream(self, batches, lookahead: int = 2):
        """Serve an iterator of uint8 batches, keeping ``lookahead`` batches
        in flight: host decode / H2D of batch k+1..k+lookahead overlap the
        device executing batch k (jax async dispatch), so a slow producer
        doesn't serialize with compute.  Yields uint8 outputs in order."""
        from collections import deque

        q = deque()
        for b in batches:
            q.append(self._predict_async(b))
            if len(q) > lookahead:
                out, n = q.popleft()
                yield np.asarray(out[:n])
        while q:
            out, n = q.popleft()
            yield np.asarray(out[:n])


class TiledPredictor(CascadePredictor):
    """Whole-scene inference for images of ANY size through ONE compiled
    tile shape.

    The reference evaluates fixed pre-cut 256x256 patches only
    (testCas.py:65-88); real satellite scenes are arbitrarily large.  This
    predictor cuts the scene into overlapping ``tile`` x ``tile`` windows,
    runs them through the fused cascade in ``max_batch`` chunks (jax async
    dispatch keeps the device busy while the host crops/stitches), discards
    each output tile's ``overlap`` halo and stitches the cores.

    Exactness: the cascade's ops are all local (convs / deconvs / pixel
    shuffle / per-pixel color math), so with ``overlap`` >= the network's
    receptive-field radius the stitched scene is BIT-IDENTICAL to running
    the full image in one program.  Edge windows are laid FLUSH with the
    scene boundary (not input-padded): conv SAME zero-padding then applies
    at the true border exactly as in the full-image program — explicit
    zero-pixel padding would NOT match, because zero inputs become nonzero
    activations after the first bias+ReLU while SAME padding re-zeros every
    layer's border.  Smaller overlaps trade exactness near tile seams for
    compute: overhead scales as (tile/(tile-2*overlap))^2.  Caveats:
    models with global spatial reductions (RCAN's channel attention pools
    over H,W) are never tileable-exact, and strided encoders (ResDeconv)
    are only seam-consistent when ``tile - 2*overlap`` is a multiple of
    their total stride.

    Scale is inferred from the first output tile, so resolution-preserving
    (Const) cascades stitch correctly too.  Scenes smaller than one tile in
    either dimension run as a single full-image program.

    With ``self_ensemble=True`` the dihedral averaging is PER TILE (each
    window is ensembled independently) — a valid TTA estimator, but not
    bit-equal to ensembling the whole scene, since rotating a tile is not
    rotating the scene.
    """

    def __init__(self, *args, tile: int = 256, overlap: int = 32,
                 max_batch: int = 8, **kw):
        super().__init__(*args, **kw)
        if tile <= 2 * overlap:
            raise ValueError(f"tile ({tile}) must exceed 2*overlap "
                             f"({2 * overlap}) to leave a core")
        self.tile, self.overlap, self.max_batch = tile, overlap, max_batch
        self.pad = max_batch  # one compiled batch shape for ragged chunks

    @staticmethod
    def _axis_windows(n: int, t: int, ov: int):
        """Per-axis window plan: (win_start, keep_off_in_win, keep_start,
        keep_len) covering [0, n) with tile windows clamped inside it."""
        core = t - 2 * ov
        plan = []
        for i in range(-(-n // core)):
            c0, c1 = i * core, min((i + 1) * core, n)
            w = min(max(c0 - ov, 0), n - t)
            plan.append((w, c0 - w, c0, c1 - c0))
        return plan

    def predict_scene(self, scene_u8: np.ndarray) -> np.ndarray:
        """(H, W) / (H, W, 1|3) uint8 -> (H*scale, W*scale, 3) uint8."""
        if scene_u8.ndim == 2:
            scene_u8 = scene_u8[..., None]
        H, W, C = scene_u8.shape
        t = self.tile
        if H < t or W < t:
            # sub-tile scene: one native-shape program, batch of 1 — do NOT
            # pad to max_batch (that would run max_batch copies of the
            # whole scene for nothing)
            out, n = self._predict_async(scene_u8[None], pad=0)
            return np.asarray(out[:n])[0]
        rows = self._axis_windows(H, t, self.overlap)
        cols = self._axis_windows(W, t, self.overlap)
        tiles = np.stack([scene_u8[wy:wy + t, wx:wx + t]
                          for wy, _, _, _ in rows for wx, _, _, _ in cols])

        outs, pending = [], []
        for k in range(0, len(tiles), self.max_batch):
            pending.append(self._predict_async(tiles[k:k + self.max_batch]))
            if len(pending) > 2:      # bounded in-flight window
                out, n = pending.pop(0)
                outs.append(np.asarray(out[:n]))
        for out, n in pending:
            outs.append(np.asarray(out[:n]))
        out_tiles = np.concatenate(outs, axis=0)

        s = out_tiles.shape[1] // t   # inferred output scale
        canvas = np.empty((H * s, W * s, 3), dtype=np.uint8)
        for idx in range(len(rows) * len(cols)):
            i, j = divmod(idx, len(cols))
            _, ky, cy, ly = rows[i]
            _, kx, cx, lx = cols[j]
            canvas[cy * s:(cy + ly) * s, cx * s:(cx + lx) * s] = \
                out_tiles[idx, ky * s:(ky + ly) * s, kx * s:(kx + lx) * s]
        return canvas


class SpatialShardedPredictor(CascadePredictor):
    """Cascade sharded over image height for tiles beyond one chip's HBM.

    GSPMD inserts the conv halo exchanges; results match the unsharded
    predictor within uint8 rounding.
    """

    def __init__(self, *args, mesh=None, **kw):
        super().__init__(*args, **kw)
        from srcgan_tpu import parallel

        self.mesh = mesh or parallel.make_mesh(
            (jax.device_count(),), ("space",))
        self._sharding = parallel.spatial_sharding(self.mesh)

    @partial(jax.jit, static_argnums=0)
    def _run(self, sr_params, c_params, sr_state, c_state, gray_u8):
        from srcgan_tpu.models import rddb

        # XLA cannot spatially partition the eval-tail custom call — trace
        # the pure-XLA folded tail for sharded programs.
        with rddb.no_pallas_tail():
            gray_u8 = jax.lax.with_sharding_constraint(gray_u8, self._sharding)
            return CascadePredictor._run.__wrapped__(
                self, sr_params, c_params, sr_state, c_state, gray_u8)


class SpatialShardedTiledPredictor(SpatialShardedPredictor, TiledPredictor):
    """Any-size scenes over a multi-chip mesh: TiledPredictor's window
    plan + stitching drives SpatialShardedPredictor._run, so every tile
    batch crosses the height-sharded program while scenes keep the one
    compiled tile shape.  This is the serve daemon's ``--mesh-size`` x
    ``--tile`` composition (cli/serve.py) — the multi-chip replacement for
    the reference's single-device per-sample eval loop (testCas.py:61-88).

    Cooperative __init__ chain: SpatialSharded consumes ``mesh``, Tiled
    consumes ``tile``/``overlap``/``max_batch``, CascadePredictor the rest.

    Sub-tile scenes dispatch native-shape through the height-sharded
    program; GSPMD's uneven sharding + conv halo exchange handle heights
    smaller than (or not divisible by) the mesh — pinned by
    tests/test_serve.py::test_sharded_subtile_odd_scenes down to H < mesh
    size.
    """
