"""Torch checkpoint import tests: reference .pth state_dicts -> our params."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from srcgan_tpu import interop, models
from srcgan_tpu.models import edsr_zoo

from tests.ref_import import HAS_REF, ref_module


def nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


RNG = np.random.default_rng(3)


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def roundtrip(torch_model, jax_model, x, train=False, atol=5e-4):
    sd = torch_model.state_dict()
    params, state = interop.import_torch_state_dict(jax_model, sd)
    torch_model.train() if train else torch_model.eval()
    with torch.no_grad():
        ref = torch_model(nchw(x))
    got, _ = jax_model.apply(params, jnp.asarray(x), state=state, train=train)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref), atol=atol, rtol=1e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestImport:
    def test_rddbnet_pth_file(self, tmp_path):
        ref = ref_module("model.rddb")
        t = ref.RDDBNet(1, 1, 2, nf=32, nb=1)
        path = str(tmp_path / "RDDBNet_A2C_x2_0050.pth")
        torch.save(t.state_dict(), path)
        j = models.RDDBNet(1, 1, 2, nf=32, nb=1)
        params, state = interop.import_torch_state_dict(j, path)
        t.eval()
        x = rand(1, 8, 8, 1)
        with torch.no_grad():
            expect = t(nchw(x))
        got = j.fwd(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), nhwc(expect), atol=5e-4,
                                   rtol=1e-3)

    def test_resdeconv(self):
        ref = ref_module("model.resdeconv")
        roundtrip(ref.ResDeconv(src_ch=1, tar_ch=3), models.ResDeconv(1, 3),
                  rand(1, 32, 32, 1), atol=1e-3)

    def test_discriminator_with_bn_state(self):
        ref = ref_module("model.model")
        t = ref.NLayerDiscriminator(3, 16, 2)
        # run a few torch forwards in train mode to move the running stats
        t.train()
        for _ in range(3):
            t(nchw(rand(2, 16, 16, 3)))
        j = models.NLayerDiscriminator(3, 16, 2)
        # eval-mode comparison exercises the imported running stats
        roundtrip(t, j, rand(2, 16, 16, 3), train=False)

    def test_ddbpn_with_prelu_and_meanshift(self):
        ref = ref_module("model.ddbpn")
        a = edsr_zoo.args_namespace(scale=[2], rgb_range=1)
        roundtrip(ref.DDBPN(a), models.DDBPN(a), rand(1, 8, 8, 3), atol=1e-3)

    def test_mismatch_raises(self):
        ref = ref_module("model.rddb")
        t = ref.RDDBNet(1, 1, 2, nf=32, nb=1)
        j = models.RDDBNet(1, 1, 2, nf=32, nb=2)  # wrong depth
        with pytest.raises(ValueError):
            interop.import_torch_state_dict(j, t.state_dict())


def _zoo_args(**kw):
    base = dict(scale=[2], rgb_range=1)
    base.update(kw)
    return edsr_zoo.args_namespace(**base)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestExport:
    """Our params -> real torch state_dict, strict-loadable by the reference."""

    @pytest.mark.parametrize("name", ["RDDBNet", "SRDN", "ESPCN", "SRCNN",
                                      "EDSR", "ResDeconv", "RDDBNetB",
                                      "VDSR", "MDSR", "RDN", "RCAN"])
    def test_strict_load_and_output_match(self, name):
        ref_mods = {
            "RDDBNet": ("model.rddb", lambda m: m.RDDBNet(1, 1, 2, nf=32, nb=1),
                        lambda: models.RDDBNet(1, 1, 2, nf=32, nb=1), (1, 8, 8, 1)),
            "SRDN": ("model.srdn", lambda m: m.SRDN(1, 3, 2, nf=32, nb=1),
                     lambda: models.SRDN(1, 3, 2, nf=32, nb=1), (1, 8, 8, 1)),
            "ESPCN": ("model.espcn", lambda m: m.ESPCN(1, 3, 2),
                      lambda: models.ESPCN(1, 3, 2), (1, 8, 8, 1)),
            "SRCNN": ("model.srcnn", lambda m: m.SRCNN(3, 3, 2),
                      lambda: models.SRCNN(3, 3, 2), (1, 8, 8, 3)),
            "EDSR": ("model.edsr",
                     lambda m: m.EDSR(1, 3, 2, base_channel=32, num_residuals=2),
                     lambda: models.EDSR(1, 3, 2, base_channel=32,
                                         num_residuals=2), (1, 8, 8, 1)),
            "ResDeconv": ("model.resdeconv",
                          lambda m: m.ResDeconv(src_ch=1, tar_ch=3),
                          lambda: models.ResDeconv(1, 3), (1, 32, 32, 1)),
            # a registration-order landmine: RDDBNetB's HRconv is reused 8x
            "RDDBNetB": ("model.model",
                         lambda m: m.RDDBNetB(1, 3, 32, nb=1, mode="x2"),
                         lambda: models.RDDBNetB(1, 3, 32, nb=1, mode="x2"),
                         (1, 8, 8, 1)),
            # the EDSR-derived zoo: Sequential-index names + synthesized
            # MeanShift buffers; the reference MDSR constructor indexes its
            # pretrained-url table by r<n_resblocks>f<n_feats> (mdsr.py:21),
            # so only r16f64 constructs
            # (vdsr.py:20 indexes the url table: only r20f64 constructs)
            "VDSR": ("model.vdsr",
                     lambda m: m.VDSR(_zoo_args(n_resblocks=20, n_feats=64)),
                     lambda: models.VDSR(_zoo_args(n_resblocks=20, n_feats=64)),
                     (1, 8, 8, 3)),
            "MDSR": ("model.mdsr",
                     lambda m: m.MDSR(_zoo_args()),
                     lambda: models.MDSR(_zoo_args()), (1, 8, 8, 3)),
            "RDN": ("model.rdn",
                    lambda m: m.RDN(_zoo_args(G0=16, RDNconfig="A")),
                    lambda: models.RDN(_zoo_args(G0=16, RDNconfig="A")),
                    (1, 8, 8, 3)),
            "RCAN": ("model.rcan",
                     lambda m: m.RCAN(_zoo_args(n_resgroups=2, n_resblocks=2,
                                                n_feats=16, reduction=4)),
                     lambda: models.RCAN(_zoo_args(n_resgroups=2,
                                                   n_resblocks=2, n_feats=16,
                                                   reduction=4)),
                     (1, 8, 8, 3)),
        }
        mod_name, mk_ref, mk_ours, shape = ref_mods[name]
        ref_mod = ref_module(mod_name)
        ours = mk_ours()
        params = ours.init(jax.random.PRNGKey(5))
        sd = interop.export_torch_state_dict(ours, params)
        t = mk_ref(ref_mod)
        t.load_state_dict({k: torch.from_numpy(v.copy())
                           for k, v in sd.items()}, strict=True)
        t.eval()
        x = rand(*shape)
        with torch.no_grad():
            ref_out = t(nchw(x))
        got, _ = ours.apply(params, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), nhwc(ref_out), atol=1e-3,
                                   rtol=1e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_export_survives_tree_map_reordering():
    """jax tree ops return sorted-key dicts; export must reorder internally."""
    ref = ref_module("model.rddb")
    j = models.RDDBNet(1, 1, 2, nf=32, nb=1)
    params = j.init(jax.random.PRNGKey(0))
    # round-trip through tree_map (sorts dict keys)
    sorted_params = jax.tree_util.tree_map(lambda a: a, params)
    sd = interop.export_torch_state_dict(j, sorted_params)
    t = ref.RDDBNet(1, 1, 2, nf=32, nb=1)
    t.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                      strict=True)
    t.eval()
    x = rand(1, 8, 8, 1)
    with torch.no_grad():
        expect = t(nchw(x))
    got = j.fwd(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), nhwc(expect), atol=5e-4,
                               rtol=1e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_export_edsr_web():
    """EDSRWeb strict-exports too (the dash-named reference file is exec'd
    under a synthetic module name, as in test_zoo)."""
    from tests.ref_import import ref_module_from_file

    ref_web = ref_module_from_file("model.edsr_web_x", "model/edsr-web.py")
    ours = models.EDSRWeb(3, 3, 2)   # the reference hardcodes r16f64
    params = ours.init(jax.random.PRNGKey(6))
    sd = interop.export_torch_state_dict(ours, params)
    t = ref_web.EDSR(3, 3, 2)
    t.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                      strict=True)
    t.eval()
    x = rand(1, 8, 8, 3)
    with torch.no_grad():
        ref_out = t(nchw(x))
    got, _ = ours.apply(params, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref_out), atol=1e-3,
                               rtol=1e-3)
