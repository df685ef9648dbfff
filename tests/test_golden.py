"""Golden regression: fixed-seed outputs must not drift across changes.

Unlike the torch-parity suite (which needs /root/reference and torch), these
snapshots pin our own numerics standalone — init determinism, model forwards,
metrics, and colour math.
"""
import os

import numpy as np

import jax
import jax.numpy as jnp

from srcgan_tpu import metrics, models, ops

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_v1.npz")


def test_golden_snapshots():
    g = np.load(GOLDEN)
    zoo = {
        "rddbnet_x2": models.RDDBNet(1, 1, 2, nf=32, nb=1),
        "espcn_x2": models.ESPCN(1, 3, 2),
        "srdn": models.SRDN(1, 3, 2, nf=32, nb=1),
    }
    for name, m in zoo.items():
        p = m.init(jax.random.PRNGKey(42))
        x = jnp.asarray(g[f"model/{name}/in"])
        y = m.fwd(p, x)
        np.testing.assert_allclose(np.asarray(y), g[f"model/{name}/out"],
                                   atol=1e-5, rtol=1e-5, err_msg=name)

    a, b = jnp.asarray(g["metric/in_a"]), jnp.asarray(g["metric/in_b"])
    np.testing.assert_allclose(float(metrics.mse(a, b)), g["metric/mse"],
                               rtol=1e-6)
    np.testing.assert_allclose(float(metrics.psnr(a, b)), g["metric/psnr"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(metrics.angular_error(a, b)),
                               g["metric/ae"], rtol=1e-5)
    np.testing.assert_allclose(float(metrics.ssim_xla(a, b)),
                               g["metric/ssim"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ops.rgb_to_lab(a)), g["color/lab"],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ops.rgb_to_gray(a)),
                               g["color/gray"], atol=1e-6)


class TestReferenceExampleParity:
    def test_preview_dimensions_match_reference_examples(self, tmp_path):
        """The reference ships dataset preview PNGs under example/ produced
        by G2RGB.show() (dataset.py:201-215): two patches side by side, each
        with the 5-px whitespace border.  Our show() must produce the same
        geometry for the same patch size."""
        import os

        from PIL import Image

        from srcgan_tpu import data

        ref_dir = "/root/reference/example/Sat2Aerx1G2RGB"
        if not os.path.isdir(ref_dir):
            pytest.skip("reference examples not available")
        ref_png = sorted(os.listdir(ref_dir))[0]
        ref_w, ref_h = Image.open(os.path.join(ref_dir, ref_png)).size

        root = data.make_synthetic_dataset(str(tmp_path / "Ex"), n_train=1,
                                           size=256)
        ds = data.G2RGB(root, "train", data_dir=str(tmp_path))
        out = str(tmp_path / "prev")
        ds.show(0, example_dir=out)
        ours = os.listdir(out)
        assert len(ours) == 1
        w, h = Image.open(os.path.join(out, ours[0])).size
        assert (w, h) == (ref_w, ref_h) == (532, 266)
