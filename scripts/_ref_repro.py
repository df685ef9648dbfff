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


def _install_stub_deps() -> None:
    """REPRO_STUB_DEPS=1: install numpy-faithful stubs for MISSING optional
    reference deps so the reference executes end-to-end on this image.

    Stubbed surface (only what trainCas/testCas actually touch):
      skimage.color.rgb2gray/rgb2lab/lab2rgb — same D65/sRGB math as
        srcgan_tpu.ops.color (which is golden-tested against real skimage
        values), in numpy;
      skimage.io.imsave — PIL writer;
      torchvision(.models/.transforms) — import surface only; the vgg
        constructors raise if actually called (CasSRC never does).
    Real machines with the real deps never hit this path; stubbing is an
    explicit opt-in for the dry-run rehearsal."""
    import numpy as np

    if importlib.util.find_spec("skimage") is None:
        xyz_from_rgb = np.array([[0.412453, 0.357580, 0.180423],
                                 [0.212671, 0.715160, 0.072169],
                                 [0.019334, 0.119193, 0.950227]], np.float64)
        rgb_from_xyz = np.linalg.inv(xyz_from_rgb)
        white = np.array([0.95047, 1.0, 1.08883], np.float64)

        def _as_float(a):
            a = np.asarray(a)
            if a.dtype == np.uint8:
                return a.astype(np.float64) / 255.0
            return a.astype(np.float64)

        def rgb2gray(a):
            return _as_float(a) @ np.array([0.2125, 0.7154, 0.0721])

        def rgb2lab(a):
            v = _as_float(a)
            lin = np.where(v > 0.04045, ((v + 0.055) / 1.055) ** 2.4,
                           v / 12.92)
            xyz = (lin @ xyz_from_rgb.T) / white
            f = np.where(xyz > 0.008856, np.cbrt(xyz),
                         7.787 * xyz + 16.0 / 116.0)
            out = np.empty_like(f)
            out[..., 0] = 116.0 * f[..., 1] - 16.0
            out[..., 1] = 500.0 * (f[..., 0] - f[..., 1])
            out[..., 2] = 200.0 * (f[..., 1] - f[..., 2])
            return out

        def lab2rgb(lab):
            lab = np.asarray(lab, np.float64)
            fy = (lab[..., 0] + 16.0) / 116.0
            f = np.stack([lab[..., 1] / 500.0 + fy, fy,
                          fy - lab[..., 2] / 200.0], axis=-1)
            xyz = np.where(f > 0.2068966, f ** 3,
                           (f - 16.0 / 116.0) / 7.787) * white
            lin = xyz @ rgb_from_xyz.T
            lin = np.clip(lin, 0.0, None)
            srgb = np.where(lin > 0.0031308,
                            1.055 * lin ** (1.0 / 2.4) - 0.055, 12.92 * lin)
            return np.clip(srgb, 0.0, 1.0)

        def imsave(path, img):
            from PIL import Image

            img = np.asarray(img)
            if img.dtype != np.uint8:
                img = np.clip(np.round(img * 255.0) if img.max() <= 1.0 + 1e-6
                              else np.round(img), 0, 255).astype(np.uint8)
            Image.fromarray(img.squeeze()).save(path)

        pkg = types.ModuleType("skimage")
        pkg.__path__ = []  # mark as package
        color = types.ModuleType("skimage.color")
        color.rgb2gray, color.rgb2lab, color.lab2rgb = (rgb2gray, rgb2lab,
                                                        lab2rgb)
        io_mod = types.ModuleType("skimage.io")
        io_mod.imsave = imsave
        pkg.color, pkg.io = color, io_mod
        sys.modules["skimage"] = pkg
        sys.modules["skimage.color"] = color
        sys.modules["skimage.io"] = io_mod

    if importlib.util.find_spec("torchvision") is None:
        def _no_weights(*a, **k):
            raise RuntimeError("torchvision stub: pretrained VGG weights "
                               "are not available on this machine")

        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        tv_models = types.ModuleType("torchvision.models")
        tv_models.vgg16 = tv_models.vgg19 = _no_weights
        tv_transforms = types.ModuleType("torchvision.transforms")
        tv.models, tv.transforms = tv_models, tv_transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.transforms"] = tv_transforms


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    script = sys.argv[1]
    if os.environ.get("REPRO_STUB_DEPS"):
        _install_stub_deps()
    for dep in ("skimage", "cv2", "torchvision", "pandas"):
        # sys.modules first: find_spec raises on spec-less stub modules
        if dep not in sys.modules and importlib.util.find_spec(dep) is None:
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

    # pandas 2.x removed DataFrame.append; the reference's CSV writer
    # (testCas.py:92-103) uses it.  Restore the 1.x behavior via concat so
    # the committed reference runs unmodified on modern pandas.
    import pandas as pd

    if not hasattr(pd.DataFrame, "append"):
        def _df_append(self, other, ignore_index=False, **kw):
            return pd.concat([self, other], ignore_index=ignore_index)

        pd.DataFrame.append = _df_append

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
