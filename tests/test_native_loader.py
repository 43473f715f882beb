"""Native seldio dataset cache: build, write, read, gather — vs numpy."""

import numpy as np
import pytest

from seld_tpu.config import SELDConfig
from seld_tpu.data.native import PakReader, build_library, pack_dataset, write_pak
from seld_tpu.data.synthetic import gen_fake_task2_dataset


def test_library_builds():
    assert build_library() is not None, "g++ build of libseldio.so failed"


def test_write_read_roundtrip(tmp_path, rng):
    tensors = [
        rng.standard_normal((5, 3, 4)).astype(np.float32),
        rng.standard_normal((7, 2)).astype(np.float32),
    ]
    path = str(tmp_path / "t.seldpak")
    write_pak(path, tensors)
    reader = PakReader(path)
    assert reader.num_tensors() == 2
    for i, t in enumerate(tensors):
        assert reader.shape(i) == t.shape
        np.testing.assert_array_equal(reader.tensor(i), t)
    reader.close()


def test_native_gather_matches_numpy(tmp_path, rng):
    t = rng.standard_normal((20, 6, 3)).astype(np.float32)
    path = str(tmp_path / "g.seldpak")
    write_pak(path, [t])
    reader = PakReader(path)
    idx = np.array([3, 0, 19, 7, 7], dtype=np.int64)
    got = reader.gather(0, idx)
    np.testing.assert_array_equal(got, t[idx])
    if reader.native:
        # out-of-range must fail cleanly, not crash
        with pytest.raises(AssertionError):
            reader.gather(0, np.array([25], dtype=np.int64))
    reader.close()


def test_pack_dataset_from_pickles(tmp_path):
    paths = gen_fake_task2_dataset(str(tmp_path / "d"), n_train=3, n_val=2, n_test=2)
    cfg = SELDConfig(
        training_predictors_path=paths["train"][0],
        training_target_path=paths["train"][1],
        validation_predictors_path=paths["validation"][0],
        validation_target_path=paths["validation"][1],
        test_predictors_path=paths["test"][0],
        test_target_path=paths["test"][1],
    )
    pak = pack_dataset(cfg, str(tmp_path / "data.seldpak"))
    reader = PakReader(pak)
    assert reader.num_tensors() == 6
    x, y = reader.split("train")
    assert x.shape[0] == 3 and y.shape[0] == 3
    import pickle

    with open(paths["train"][0], "rb") as f:
        ref = np.asarray(pickle.load(f), dtype=np.float32)
    np.testing.assert_array_equal(x, ref)
    reader.close()


def test_pak_batch_iterator_matches_inmemory(tmp_path, rng):
    """PakBatchIterator (native gather + per-batch z-score) yields the exact
    batches of the in-memory BatchIterator over normalize_dataset output."""
    from seld_tpu.data.loader import BatchIterator, PakBatchIterator
    from seld_tpu.data.normalize import (
        compute_norm_stats,
        make_batch_transform,
        normalize_dataset,
    )

    x = rng.standard_normal((10, 8, 4, 6)).astype(np.float32) * 2 + 1
    y = rng.standard_normal((10, 3, 168)).astype(np.float32)
    path = str(tmp_path / "d.seldpak")
    write_pak(path, [x, y, x[:2], y[:2], x[:2], y[:2]])
    reader = PakReader(path)
    assert reader.native

    kw = dict(mode="True", n_mics=2, phase=False, domain="R")
    want_x = normalize_dataset({"train": x}, **kw)["train"]
    ref_it = BatchIterator(np.asarray(want_x), y, 4, shuffle=True, seed=7)
    tr = make_batch_transform(stats=compute_norm_stats(x, **kw), **kw)
    pak_it = PakBatchIterator(reader, "train", 4, shuffle=True, seed=7, transform=tr)
    for epoch in (1, 2):
        ref_it.set_epoch(epoch)
        pak_it.set_epoch(epoch)
        for (ax, ay), (bx, by) in zip(ref_it, pak_it):
            np.testing.assert_allclose(bx, ax, rtol=1e-6, atol=1e-6)
            np.testing.assert_array_equal(by, ay)
    assert len(ref_it) == len(pak_it) == 3
    reader.close()
