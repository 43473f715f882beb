"""Synthetic fixtures for tests and benchmarks.

Equivalents of the reference's fake-data generators ("***only for testing",
reference ``utility_functions.py:345-459``), extended with a Task-2-layout
pickle dataset generator so the full trainer can be integration-tested
without the real L3DAS21 data.
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import numpy as np


def gen_seld_out(n_frames: int, n_overlaps: int = 3, n_classes: int = 14, rng=None):
    """Random SELD event list [[frame, class, x, y, z], ...]."""
    rng = rng or np.random.default_rng()
    results = []
    for frame in range(n_frames):
        for _ in range(int(rng.integers(0, 4))):
            results.append(
                [
                    frame,
                    int(rng.integers(0, n_classes)),
                    rng.random() * 4 - 2,
                    (rng.random() * 2 - 1) * 1.5,
                    rng.random() * 2 - 1,
                ]
            )
    return np.array(results)


def gen_dummy_seld_results(
    out_path: str,
    n_frames: int = 10,
    n_files: int = 30,
    perc_tp: float = 0.6,
    n_overlaps: int = 3,
    n_classes: int = 14,
    seed: int = 0,
) -> None:
    """Paired pred/truth CSV folders with a controllable true-positive rate."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    truth_path = os.path.join(out_path, "truth")
    pred_path = os.path.join(out_path, "pred")
    os.makedirs(truth_path, exist_ok=True)
    os.makedirs(pred_path, exist_ok=True)
    for file in range(n_files):
        pred = gen_seld_out(n_frames, n_overlaps, n_classes, rng)
        truth = gen_seld_out(n_frames, n_overlaps, n_classes, rng)
        num_tp = int(len(truth) * perc_tp)
        entries = list(range(min(len(truth), len(pred))))
        rng.shuffle(entries)
        for t in entries[:num_tp]:
            pred[t] = truth[t]
        pd.DataFrame(truth).to_csv(os.path.join(truth_path, f"{file}.csv"), index=None, header=None)
        pd.DataFrame(pred).to_csv(os.path.join(pred_path, f"{file}.csv"), index=None, header=None)


def gen_dummy_waveforms(n: int, out_path: str, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    sr, max_len = 16000, 10
    os.makedirs(out_path, exist_ok=True)
    for i in range(n):
        length = int(rng.random() * max_len * sr)
        np.save(os.path.join(out_path, f"{i}.npy"), (rng.random(length) * 2 - 1) * 0.9)


def make_task2_example(
    rng,
    channels: int = 8,
    freq: int = 32,
    time_frames: int = 160,
    label_frames: int = 20,
    classes: int = 14,
    overlaps: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """One synthetic (predictor, target) pair in the reference tensor layout."""
    x = rng.standard_normal((channels, freq, time_frames)).astype(np.float32)
    sed = (rng.random((label_frames, classes * overlaps)) < 0.05).astype(np.float32)
    doa = (rng.random((label_frames, classes * overlaps * 3)) * 2 - 1).astype(np.float32)
    doa = doa * sed.repeat(3, axis=1)  # locations only where events exist
    return x, np.concatenate([sed, doa], axis=1).astype(np.float32)


def gen_fake_task2_dataset(
    out_dir: str,
    n_train: int = 8,
    n_val: int = 4,
    n_test: int = 4,
    channels: int = 8,
    freq: int = 32,
    time_frames: int = 160,
    label_frames: int = 20,
    seed: int = 0,
) -> dict:
    """Write the 6-pickle Task-2 layout the trainer consumes; return the paths."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    counts = {"train": n_train, "validation": n_val, "test": n_test}
    paths = {}
    for split, n in counts.items():
        xs, ys = [], []
        for _ in range(n):
            x, y = make_task2_example(rng, channels, freq, time_frames, label_frames)
            xs.append(x)
            ys.append(y)
        px = os.path.join(out_dir, f"task2_predictors_{split}.pkl")
        py = os.path.join(out_dir, f"task2_target_{split}.pkl")
        with open(px, "wb") as f:
            pickle.dump(np.stack(xs), f)
        with open(py, "wb") as f:
            pickle.dump(np.stack(ys), f)
        paths[split] = (px, py)
    return paths
