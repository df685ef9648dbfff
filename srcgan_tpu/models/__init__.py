"""Model zoo + explicit registry.

The reference exposes exactly six models via ``from model import *``
(/root/reference/src/model/__init__.py:1-6) and instantiates them by name with
``eval(opt.SRModel)(in_ch, ou_ch, up)`` (trainCas.py:30-31, testCas.py:52-53).
Here the string-eval pattern becomes an explicit registry: ``create(name, ...)``.

The CycleGAN drivers additionally use the legacy nets (train.py:11):
RDDBNetA/RDDBNetB/NLayerDiscriminator/SRDenseNetA/SRDenseNetB — provided in
``legacy.py``/``discriminator.py`` with the import inconsistency fixed
(SURVEY.md §2.2).
"""
from __future__ import annotations

from typing import Dict

from srcgan_tpu.models.espcn import ESPCN, SRCNN
from srcgan_tpu.models.edsr import EDSR
from srcgan_tpu.models.rddb import RDDBNet
from srcgan_tpu.models.srdn import SRDN
from srcgan_tpu.models.resdeconv import ResDeconv
from srcgan_tpu.models.discriminator import NLayerDiscriminator
from srcgan_tpu.models.legacy import (
    Decoder,
    Encoder,
    RDDBNetA,
    RDDBNetB,
    RDDBNetD,
    SRDenseNetA,
    SRDenseNetB,
)
from srcgan_tpu.models.edsr_zoo import (
    DDBPN,
    EDSRWeb,
    MDSR,
    RCAN,
    RDN,
    VDSR,
    args_namespace,
)
from srcgan_tpu.models.pix2pix import (
    ResnetGenerator,
    UnetGenerator,
    define_G,
)

# The reference package's public export list (model/__init__.py:1-6).
EXPORTED = ("ESPCN", "SRCNN", "EDSR", "RDDBNet", "SRDN", "ResDeconv")

REGISTRY: Dict[str, type] = {
    "ESPCN": ESPCN,
    "SRCNN": SRCNN,
    "EDSR": EDSR,
    "RDDBNet": RDDBNet,
    "SRDN": SRDN,
    "ResDeconv": ResDeconv,
    "NLayerDiscriminator": NLayerDiscriminator,
    "RDDBNetA": RDDBNetA,
    "RDDBNetB": RDDBNetB,
    "RDDBNetD": RDDBNetD,
    "Decoder": Decoder,
    "Encoder": Encoder,
    "SRDenseNetA": SRDenseNetA,
    "SRDenseNetB": SRDenseNetB,
    "EDSRWeb": EDSRWeb,
    "VDSR": VDSR,
    "MDSR": MDSR,
    "RDN": RDN,
    "RCAN": RCAN,
    "DDBPN": DDBPN,
    "ResnetGenerator": ResnetGenerator,
    "UnetGenerator": UnetGenerator,
}


def register(name: str, cls: type) -> None:
    REGISTRY[name] = cls


def create(name: str, *args, **kwargs):
    """Registry-backed replacement for the reference's eval(name)(...)."""
    try:
        cls = REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; known: {sorted(REGISTRY)}") from None
    return cls(*args, **kwargs)


__all__ = list(REGISTRY) + ["REGISTRY", "EXPORTED", "create", "register",
           "args_namespace", "define_G"]
