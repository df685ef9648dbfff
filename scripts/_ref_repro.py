"""Seeded runner for the torch reference's trainCas.py / testCas.py.

Used by scripts/realdata_repro.sh to execute the reference EXACTLY as
committed (runpy of the untouched files under $REF_DIR/src) while fixing
the three things the repro needs and the reference does not provide:

  * determinism — torch / numpy / random are seeded BEFORE the reference
    module runs (reference draws init weights from torch's global RNG);
  * dataset location — reference hardcodes Dataset_DIR = <ref>/dataset/
    (dataset.py:25); we pre-import its ``dataset`` module and repoint
    Dataset_DIR at $REPRO_DATASET_DIR, so the read-only checkout needs no
    symlink;
  * visdom — the reference Logger needs a live Visdom server; a no-op
    stub is installed when the package (or the server) is unavailable.

Exit codes: 0 ok; 3 = reference dependencies missing on this machine
(skimage / cv2 / torchvision / pandas) — realdata_repro.sh treats 3 as a
skip in --dry-run and as a failure otherwise.

Usage: python scripts/_ref_repro.py <trainCas.py|testCas.py> [args...]
  env: REF_DIR (reference checkout), REPRO_DATASET_DIR (dir holding
  Sat2Aerx1/), REPRO_SEED (default 0)
"""
import importlib.util
import os
import runpy
import sys
import types

REF_DIR = os.environ.get("REF_DIR", "/root/reference")
SEED = int(os.environ.get("REPRO_SEED", "0"))


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    script = sys.argv[1]
    for dep in ("skimage", "cv2", "torchvision", "pandas"):
        if importlib.util.find_spec(dep) is None:
            print(f"_ref_repro: reference dependency {dep!r} is not "
                  f"installed on this machine", file=sys.stderr)
            sys.exit(3)

    # visdom stub (only if the real package is absent): Logger pushes live
    # image windows; the repro only needs stdout loss lines
    if importlib.util.find_spec("visdom") is None:
        stub = types.ModuleType("visdom")

        class Visdom:  # noqa: D401 - interface mimic
            def __init__(self, *a, **k):
                pass

            def __getattr__(self, name):
                return lambda *a, **k: None

        stub.Visdom = Visdom
        sys.modules["visdom"] = stub

    import random

    import numpy as np
    import torch

    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)

    src_dir = os.path.join(REF_DIR, "src")
    sys.path.insert(0, src_dir)
    ds_dir = os.environ.get("REPRO_DATASET_DIR")
    if ds_dir:
        import dataset as ref_dataset  # the reference's module

        ref_dataset.Dataset_DIR = ds_dir

    sys.argv = [script] + sys.argv[2:]
    runpy.run_path(os.path.join(src_dir, script), run_name="__main__")


if __name__ == "__main__":
    main()
