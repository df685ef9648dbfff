"""Driver-artifact health: bench.py and __graft_entry__.py import cleanly.

These two files are executed by the round driver on real TPU hardware and
never imported by the CPU test suite — a syntax error or a renamed symbol
would otherwise surface only at round end.  Heavy work (TPU bench, the
8-device dryrun) is exercised elsewhere; here we pin importability and the
cheap structural contracts.
"""
import importlib

import numpy as np


def test_bench_imports_and_declares_protocol():
    bench = importlib.import_module("bench")
    for fn in ("bench_jax", "bench_train", "bench_gan", "bench_lab",
               "bench_int8", "torch_rddb_mps", "main"):
        assert callable(getattr(bench, fn)), fn


def test_bench_transient_retry_gate():
    """The relay-failure retry gate re-execs ONLY on transient backend
    errors and never past MAX_ATTEMPTS (a real bug must surface, not loop)."""
    import pytest

    bench = importlib.import_module("bench")
    with pytest.raises(ValueError):
        bench._retry_or_raise(ValueError("shape mismatch"))  # not transient
    import os
    old = os.environ.get(bench.RETRY_ENV)
    try:
        os.environ[bench.RETRY_ENV] = str(bench.MAX_ATTEMPTS - 1)
        with pytest.raises(RuntimeError):
            bench._retry_or_raise(
                RuntimeError("TPU backend error (FailedPrecondition)"))
    finally:
        if old is None:
            os.environ.pop(bench.RETRY_ENV, None)
        else:
            os.environ[bench.RETRY_ENV] = old


def test_graft_entry_contract():
    g = importlib.import_module("__graft_entry__")
    fn, args = g.entry()
    params, x = args
    assert callable(fn)
    assert x.shape == (1, 64, 64, 1)
    # eager forward on the CPU backend: the jittable contract is exercised
    # by the driver's single-chip compile check
    y = fn(params, x)
    assert y.shape == (1, 256, 256, 1)
    assert np.all(np.isfinite(np.asarray(y)))
    assert callable(g.dryrun_multichip)
