"""Data-layer tooling: D4 augmentation in ``data.batches`` and the
``prepare_data`` split-list builder (both beyond-reference additions: the
reference's DataLoader has no transforms, trainCas.py:187-188, and its
dataset lists are assumed to pre-exist, dataset.py:40-45)."""
import os

import numpy as np
import pytest

from srcgan_tpu import data
from srcgan_tpu.cli import prepare_data
from srcgan_tpu.data.dataset import _SHAPE_PRESERVING_OPS, dihedral


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    data.make_synthetic_dataset(str(d / "Sat2Aerx1"), n_train=16, n_val=2,
                                n_test=2, size=16)
    return str(d)


class TestDihedral:
    def test_group_properties(self):
        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        outs = [dihedral(img, op) for op in range(8)]
        # all 8 ops distinct, identity is op 0, each preserves the multiset
        assert all((o.shape in ((4, 6, 3), (6, 4, 3))) for o in outs)
        for a in range(8):
            for b in range(a + 1, 8):
                if outs[a].shape == outs[b].shape:
                    assert not np.array_equal(outs[a], outs[b]), (a, b)
        np.testing.assert_array_equal(outs[0], img)
        for o in outs:
            assert sorted(o.ravel()) == sorted(img.ravel())
        # shape-preserving subset really preserves shape
        for op in _SHAPE_PRESERVING_OPS:
            assert dihedral(img, int(op)).shape == img.shape

    def test_commutes_with_downscale(self):
        # the pair-alignment argument: D4 then 2x2-mean-pool == pool then D4
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (8, 8, 3))
        pool = lambda a: a.reshape(4, 2, 4, 2, 3).mean((1, 3))
        for op in range(8):
            np.testing.assert_allclose(pool(dihedral(img, op)),
                                       dihedral(pool(img), op), atol=1e-12)


class TestAugmentedBatches:
    def test_deterministic_and_pairwise_consistent(self, synth):
        ds = data.G2RGB("Sat2Aerx1", "train", data_dir=synth)
        got = {}
        for workers in (0, 2):
            for src, tar, idxs in data.batches(ds, 3, shuffle=True, seed=1,
                                               epoch=2, workers=workers,
                                               augment=True):
                for s, t, i in zip(src, tar, idxs):
                    got.setdefault(workers, {})[int(i)] = (s.copy(), t.copy())
        # identical across worker counts (ops keyed by original index)
        assert got[0].keys() == got[2].keys()
        for i in got[0]:
            np.testing.assert_array_equal(got[0][i][0], got[2][i][0])
            np.testing.assert_array_equal(got[0][i][1], got[2][i][1])
        # every sample is SOME single D4 op of its raw pair — same op on
        # src and tar (the alignment contract)
        ops_seen = set()
        for i, (s, t) in got[0].items():
            raw_s, raw_t = ds.raw(i)
            ok = [op for op in range(8)
                  if dihedral(raw_s, op).shape == s.shape
                  and np.array_equal(dihedral(raw_s, op), s)
                  and np.array_equal(dihedral(raw_t, op), t)]
            assert ok, f"sample {i}: no consistent D4 op"
            ops_seen.update(ok)
        assert len(ops_seen) >= 4  # 16 samples: op variety, not all identity

    def test_epoch_varies_and_off_matches_raw(self, synth):
        ds = data.G2RGB("Sat2Aerx1", "train", data_dir=synth)
        by_epoch = []
        for epoch in (0, 1):
            srcs = {int(i): s.copy()
                    for src, _, idxs in data.batches(ds, 4, epoch=epoch,
                                                     augment=True)
                    for s, i in zip(src, idxs)}
            by_epoch.append(srcs)
        assert any(not np.array_equal(by_epoch[0][i], by_epoch[1][i])
                   for i in by_epoch[0])
        for src, tar, idxs in data.batches(ds, 4):  # augment off: raw bytes
            for s, t, i in zip(src, tar, idxs):
                raw_s, raw_t = ds.raw(int(i))
                np.testing.assert_array_equal(s, raw_s)
                np.testing.assert_array_equal(t, raw_t)

    def test_nonsquare_restricts_to_shape_preserving(self):
        class NonSquare:
            def __len__(self):
                return 8

            def raw(self, idx):
                a = np.full((4, 6, 3), idx, np.uint8)
                a[0, 0, 0] = 255  # corner marker so flips are observable
                return a, a.copy()

        ds = NonSquare()
        flipped = 0
        for src, tar, idxs in data.batches(ds, 4, augment=True):
            assert src.shape == (4, 4, 6, 3)  # stacking never breaks
            for s, i in zip(src, idxs):
                raw = ds.raw(int(i))[0]
                ok = [int(op) for op in _SHAPE_PRESERVING_OPS
                      if np.array_equal(dihedral(raw, int(op)), s)]
                assert ok
                flipped += ok[0] != 0
        assert flipped  # some non-identity op actually fired


class TestPrepareData:
    def _mkpairs(self, root, names, unpaired_src=(), unpaired_tar=()):
        from PIL import Image
        for sub in ("src", "tar"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        img = Image.fromarray(np.zeros((4, 4, 3), np.uint8))
        for n in names:
            img.save(os.path.join(root, "src", n))
            img.save(os.path.join(root, "tar", n))
        for n in unpaired_src:
            img.save(os.path.join(root, "src", n))
        for n in unpaired_tar:
            if n.lower().endswith(prepare_data.IMAGE_EXTS):
                img.save(os.path.join(root, "tar", n))
            else:  # non-image clutter the lister must ignore
                with open(os.path.join(root, "tar", n), "w") as f:
                    f.write("not an image")

    def test_split_and_loadable(self, tmp_path, capsys):
        root = str(tmp_path / "MySat")
        names = [f"p{i:02d}.png" for i in range(20)]
        self._mkpairs(root, names, unpaired_src=["lonely.png"],
                      unpaired_tar=["orphan.png", "notes.txt"])
        prepare_data.main(["--dir", root, "--val", "0.1", "--test", "0.2",
                           "--seed", "3"])
        out = capsys.readouterr().out
        assert "no tar/ counterpart: lonely.png" in out
        splits = {}
        for s in ("train", "val", "test", "all"):
            with open(os.path.join(root, f"{s}.txt")) as f:
                splits[s] = [ln.strip() for ln in f if ln.strip()]
        assert sorted(splits["all"]) == names  # .txt never listed
        assert (len(splits["val"]), len(splits["test"])) == (2, 4)
        parts = splits["train"] + splits["val"] + splits["test"]
        assert sorted(parts) == names  # disjoint and complete
        # deterministic: same seed reproduces the same split
        first = dict(splits)
        prepare_data.main(["--dir", root, "--val", "0.1", "--test", "0.2",
                           "--seed", "3", "--force"])
        with open(os.path.join(root, "val.txt")) as f:
            assert [ln.strip() for ln in f if ln.strip()] == first["val"]
        # the result is directly consumable by the data layer
        ds = data.G2RGB("MySat", "train", data_dir=str(tmp_path))
        assert len(ds) == 14 and ds.raw(0)[0].shape == (4, 4, 3)

    def test_refuses_overwrite_and_bad_fractions(self, tmp_path):
        root = str(tmp_path / "MySat")
        self._mkpairs(root, ["a.png", "b.png", "c.png"])
        prepare_data.main(["--dir", root, "--val", "0.34", "--test", "0.34"])
        with pytest.raises(SystemExit, match="--force"):
            prepare_data.main(["--dir", root])
        with pytest.raises(ValueError, match="val"):
            prepare_data.split_names(["a", "b"], 0.5, 0.5)
        # tiny dataset: every non-zero split gets >= 1, train keeps >= 1
        s = prepare_data.split_names(["a", "b", "c"], 0.01, 0.01, seed=0)
        assert sorted(s["train"] + s["val"] + s["test"]) == ["a", "b", "c"]
        assert s["val"] and s["test"] and s["train"]

    def test_empty_errors(self, tmp_path):
        root = str(tmp_path / "Empty")
        os.makedirs(os.path.join(root, "src"))
        os.makedirs(os.path.join(root, "tar"))
        with pytest.raises(SystemExit, match="no paired images"):
            prepare_data.main(["--dir", root])
        with pytest.raises(FileNotFoundError):
            prepare_data.paired_names(str(tmp_path / "Missing"))
