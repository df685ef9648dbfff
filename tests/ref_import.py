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


def ref_module_from_file(modname: str, relpath: str):
    """Import a reference file that is not module-importable (e.g. the
    dash-named model/edsr-web.py).  Executes it under the given module name
    with package context so its relative imports resolve."""
    if not HAS_REF:
        raise RuntimeError("reference not mounted")
    if modname in _cache:
        return _cache[modname]
    ref_module("model")  # ensure the parent package is imported
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF_SRC, relpath))
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = modname.rsplit(".", 1)[0]
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    _cache[modname] = mod
    return mod
