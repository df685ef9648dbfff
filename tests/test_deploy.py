"""StableHLO deployment artifacts (srcgan_tpu.deploy + cli.export)."""
import os

import numpy as np
import pytest
import jax

from srcgan_tpu import models, serving
from srcgan_tpu.deploy import export_cascade, load_exported


@pytest.fixture(scope="module")
def pred():
    sr = models.create("ESPCN", 1, 1, 2)
    c = models.create("SRCNN", 1, 3, 1)
    return serving.CascadePredictor(
        sr, sr.init(jax.random.PRNGKey(0)),
        c, c.init(jax.random.PRNGKey(1)), up=2)


class TestExportCascade:
    def test_roundtrip_matches_predictor(self, pred):
        """Serialized program == live predictor, bit-for-bit (uint8)."""
        blob = export_cascade(pred, h=16, w=16, batch=2, platforms=("cpu",))
        assert isinstance(blob, bytes) and len(blob) > 1000
        run = load_exported(blob)
        x = np.random.default_rng(0).integers(
            0, 256, (2, 16, 16, 1), dtype=np.uint8)
        got = np.asarray(run(x))
        want = pred.predict(x)
        np.testing.assert_array_equal(got, want)

    def test_symbolic_batch_serves_any_size(self, pred):
        blob = export_cascade(pred, h=16, w=16, batch=None, platforms=("cpu",))
        run = load_exported(blob)
        for n in (1, 3, 5):
            x = np.random.default_rng(n).integers(
                0, 256, (n, 16, 16, 1), dtype=np.uint8)
            got = np.asarray(run(x))
            assert got.shape == (n, 32, 32, 3)
            np.testing.assert_array_equal(got, pred.predict(x))

    def test_cross_platform_lowering_records_targets(self, pred):
        """An artifact lowered for (tpu, cpu) is produced on this CPU host
        and still runs here — the build-machine workflow."""
        blob = export_cascade(pred, h=16, w=16, batch=1,
                              platforms=("tpu", "cpu"))
        run = load_exported(blob)
        assert "tpu" in [p.lower() for p in run.exported.platforms]
        x = np.zeros((1, 16, 16, 1), np.uint8)
        assert np.asarray(run(x)).shape == (1, 32, 32, 3)


def test_cli_export(tmp_path):
    from srcgan_tpu.cli import export as cli_export
    from srcgan_tpu.train.state import checkpoint_name, save_params

    sr = models.ESPCN(1, 1, 2)
    c = models.ResDeconv(1, 3)
    ga = os.path.join(str(tmp_path), checkpoint_name("ESPCN", "A2C", 2, 3))
    gb = os.path.join(str(tmp_path), checkpoint_name("ResDeconv", "C2B", 2, 3))
    save_params(ga, sr.init(jax.random.PRNGKey(0)))
    save_params(gb, c.init(jax.random.PRNGKey(1)))
    out = str(tmp_path / "cascade.shlo")
    cli_export.main(["--netGA", ga, "--netGB", gb, "--out", out,
                     "--size", "16x16", "--batch", "2",
                     "--platforms", "cpu"])
    run = load_exported(open(out, "rb").read())
    x = np.random.default_rng(1).integers(
        0, 256, (2, 16, 16, 1), dtype=np.uint8)
    assert np.asarray(run(x)).shape == (2, 32, 32, 3)


def test_export_rejects_int8_predictor(pred):
    """int8 runs through quant_mode's scoped dispatch, which export does
    not trace — exporting must fail loudly, not bake the fp32 program."""
    p8 = serving.CascadePredictor(pred.sr_model, pred.sr_params,
                                  pred.c_model, pred.c_params, up=2,
                                  int8=True)
    with pytest.raises(NotImplementedError):
        export_cascade(p8, h=16, w=16, batch=1, platforms=("cpu",))
