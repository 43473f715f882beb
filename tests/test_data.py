"""Label building, segmentation, normalization and loader tests."""

import numpy as np
import pandas as pd
import pytest

from seld_tpu.config import SELDConfig
from seld_tpu.data.labels import SOUND_CLASSES_TASK2, csv_to_matrix_task2, segment_task2
from seld_tpu.data.loader import BatchIterator, load_task2_pickles, make_loaders
from seld_tpu.data.normalize import dq_unitnorm, normalize_dataset
from seld_tpu.data.synthetic import gen_fake_task2_dataset


def test_csv_to_matrix_task2(tmp_path):
    csv = tmp_path / "labels.csv"
    pd.DataFrame(
        {
            "Start": [0.0, 0.05, 1.0],
            "End": [0.3, 0.3, 1.2],
            "Class": ["Knock", "Knock", "Printer"],
            "X": [1.0, -1.0, 0.5],
            "Y": [0.0, 0.5, 0.5],
            "Z": [0.2, 0.1, -0.3],
        }
    ).to_csv(csv, index=False)
    m = csv_to_matrix_task2(str(csv), SOUND_CLASSES_TASK2, dur=60, step=0.1)
    assert m.shape == (600, 42 + 126)
    knock = SOUND_CLASSES_TASK2["Knock"]
    # two overlapping knocks active at frame 1 (0.1s-0.3s window)
    assert m[1, knock * 3] == 1.0 and m[1, knock * 3 + 1] == 1.0
    # xyz normalized by max_loc_value=2
    assert m[1, 42 + knock * 9] == pytest.approx(0.5)
    printer = SOUND_CLASSES_TASK2["Printer"]
    assert m[10, printer * 3] == 1.0
    assert m[13, printer * 3] == 0.0


def test_segment_task2_shapes(rng):
    pred = rng.standard_normal((8, 32, 400)).astype(np.float32)
    target = rng.standard_normal((50, 168)).astype(np.float32)
    xs, ys = segment_task2(pred, target, predictors_len_segment=80, target_len_segment=10, overlap=0.5)
    assert len(xs) == len(ys) == 10
    assert xs[0].shape == (8, 32, 80)
    assert ys[0].shape == (10, 168)
    # tail chunks are zero-padded
    assert xs[-1].shape == (8, 32, 80)


def test_dq_unitnorm_invariants(rng):
    x = rng.standard_normal((3, 8, 5, 7)).astype(np.float32) + 2.0
    out = dq_unitnorm(x)
    q, p = out[:, :4], out[:, 4:8]
    np.testing.assert_allclose(np.sum(q * q, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(q * p, axis=1), 0.0, atol=1e-5)


def test_zscore_normalization(rng):
    x = rng.standard_normal((4, 8, 6, 10)).astype(np.float32) * 3 + 1
    out = normalize_dataset({"train": x}, mode="True", n_mics=2, phase=False, domain="R")
    t = out["train"]
    assert abs(np.mean(t[:, :8])) < 1e-5
    assert abs(np.std(t[:, :8]) - 1) < 1e-4


def test_dq_phase_raises(rng):
    x = rng.standard_normal((2, 16, 4, 5)).astype(np.float32)
    with pytest.raises(ValueError, match="PHASE DUAL QUATERNION"):
        normalize_dataset({"train": x}, mode="UnitNorm", n_mics=2, phase=True, domain="DQ")


def test_fake_dataset_and_loaders(tmp_path):
    paths = gen_fake_task2_dataset(str(tmp_path), n_train=6, n_val=3, n_test=2)
    cfg = SELDConfig(
        training_predictors_path=paths["train"][0],
        training_target_path=paths["train"][1],
        validation_predictors_path=paths["validation"][0],
        validation_target_path=paths["validation"][1],
        test_predictors_path=paths["test"][0],
        test_target_path=paths["test"][1],
    )
    predictors, targets = load_task2_pickles(cfg)
    assert predictors["train"].shape[0] == 6
    assert targets["train"].shape == (6, 20, 168)
    loaders = make_loaders(predictors, targets, batch_size=4, seed=1)
    batches = list(loaders["train"])
    assert len(batches) == 2
    assert batches[0][0].shape[0] == 4 and batches[1][0].shape[0] == 2


def test_batch_iterator_determinism(rng):
    x = np.arange(10)[:, None].astype(np.float32)
    it = BatchIterator(x, x, batch_size=3, shuffle=True, seed=7)
    it.set_epoch(1)
    a = [b[0].ravel().tolist() for b in it]
    b = [b[0].ravel().tolist() for b in it]
    assert a == b
    it.set_epoch(2)
    c = [b[0].ravel().tolist() for b in it]
    assert a != c


def test_batch_transform_matches_normalize_dataset(rng):
    """Per-batch lazy normalization == whole-split normalize_dataset, for
    z-score (phase on/off) and DQ UnitNorm modes."""
    from seld_tpu.data.normalize import compute_norm_stats, make_batch_transform

    cases = [
        dict(mode="True", n_mics=2, phase=False, domain="R"),
        dict(mode="True", n_mics=1, phase=True, domain="R"),
        dict(mode="UnitNorm", n_mics=2, phase=False, domain="DQ"),
        dict(mode="False", n_mics=2, phase=False, domain="DQ"),
    ]
    for kw in cases:
        ch = 8 if not kw["phase"] else 8
        x = rng.standard_normal((6, ch, 4, 10)).astype(np.float32) * 2 + 0.5
        want = normalize_dataset({"train": x}, **kw)["train"]
        tr = make_batch_transform(stats=compute_norm_stats(x, **kw), **kw)
        got = np.concatenate([tr(x[:4]), tr(x[4:])], axis=0)
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-6)


def test_missing_dataset_pickle_friendly_error(tmp_path):
    cfg = SELDConfig(
        training_predictors_path=str(tmp_path / "nope_x.pkl"),
        training_target_path=str(tmp_path / "nope_y.pkl"),
    )
    with pytest.raises(FileNotFoundError, match="training_predictors_path"):
        load_task2_pickles(cfg)
