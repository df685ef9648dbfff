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
