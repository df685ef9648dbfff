"""Shared helper: import the torch reference (read-only) for parity tests.

Imports /root/reference/src as a package root so ``model`` resolves to the
reference's model package (``model.model`` is the legacy flat zoo,
``model.vdsr`` etc. the EDSR-family files which do ``from model import common``).
"""
import importlib
import os
import sys

REF_SRC = "/root/reference/src"
HAS_REF = os.path.isdir(REF_SRC)

_cache = {}


def ref_module(name: str):
    """Import e.g. 'model.rddb', 'model.model', 'model.vdsr', 'model.basicModel'."""
    if not HAS_REF:
        raise RuntimeError("reference not mounted")
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    if name not in _cache:
        _cache[name] = importlib.import_module(name)
    return _cache[name]
