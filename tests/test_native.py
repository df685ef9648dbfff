"""Native (C++/libpng) batch decoder: byte-parity with PIL + fallbacks."""
import numpy as np
import pytest

from srcgan_tpu import data
from srcgan_tpu.data import native


@pytest.fixture
def synth(tmp_path):
    root = data.make_synthetic_dataset(str(tmp_path / "NSat"), n_train=6,
                                       size=32)
    return data.FileListDataset(root, "train", "G2RGB", str(tmp_path))


@pytest.mark.skipif(not native.available(),
                    reason="native decoder not buildable here")
class TestNativeDecoder:
    def test_byte_parity_with_pil(self, synth):
        idxs = np.arange(len(synth))
        s_n, t_n = synth.raw_batch(idxs)
        srcs, tars = zip(*(synth.raw(int(i)) for i in idxs))
        np.testing.assert_array_equal(s_n, np.stack(srcs))
        np.testing.assert_array_equal(t_n, np.stack(tars))

    def test_probe(self, synth):
        assert native.probe(synth.srcpath % synth.datalist[0]) == (32, 32)
        assert native.probe("/nonexistent.png") is None

    def test_batches_use_native(self, synth):
        got = list(data.batches(synth, 4, workers=2))
        assert sum(b[0].shape[0] for b in got) == len(synth)

    def test_corrupt_file_falls_back(self, synth, tmp_path):
        # corrupt one file: decode_batch raises, raw_batch falls back to PIL
        # ... which also fails; instead check decode_batch's error surface
        bad = str(tmp_path / "bad.png")
        open(bad, "wb").write(b"not a png")
        with pytest.raises(RuntimeError, match="native decode failed"):
            native.decode_batch([bad], 32, 32)


@pytest.mark.skipif(not native.available(),
                    reason="native encoder not buildable here")
class TestNativeEncoder:
    def test_roundtrip_rgb(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        p = str(tmp_path / "e.png")
        native.encode(p, img)
        from PIL import Image

        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)
        # and the native decoder reads back its own output
        np.testing.assert_array_equal(native.decode_batch([p], 40, 56)[0], img)

    def test_roundtrip_gray(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        p = str(tmp_path / "g.png")
        native.encode(p, img)
        from PIL import Image

        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)

    def test_batch_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 256, (5, 24, 24, 3), dtype=np.uint8)
        paths = [str(tmp_path / f"b{i}.png") for i in range(5)]
        native.encode_batch(paths, imgs, threads=3)
        got = native.decode_batch(paths, 24, 24)
        np.testing.assert_array_equal(got, imgs)

    def test_encode_error_surface(self, tmp_path):
        img = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(RuntimeError, match="native encode failed"):
            native.encode(str(tmp_path / "no" / "dir" / "x.png"), img)

    def test_save_png_helpers_use_native(self, tmp_path):
        from srcgan_tpu.utils import vis

        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, (3, 20, 20, 3), dtype=np.uint8)
        paths = [str(tmp_path / f"h{i}.png") for i in range(3)]
        vis.save_png_batch(paths, list(imgs))
        vis.save_png(str(tmp_path / "single.png"), imgs[0])
        from PIL import Image

        np.testing.assert_array_equal(
            np.asarray(Image.open(paths[1])), imgs[1])
        np.testing.assert_array_equal(
            np.asarray(Image.open(str(tmp_path / "single.png"))), imgs[0])


class TestFallback:
    def test_env_disables_native(self, synth, monkeypatch):
        monkeypatch.setenv("SRCGAN_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_tried", False)
        monkeypatch.setattr(native, "_lib", None)
        assert not native.available()
        s, t = synth.raw_batch(np.arange(3))  # PIL path
        assert s.shape == (3, 32, 32, 3)
        monkeypatch.setattr(native, "_tried", False)
