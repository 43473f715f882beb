"""Dataset loading and batching.

Replaces the reference's pickle + ``TensorDataset``/``DataLoader`` input path
(reference ``train.py:226-237`` and ``train.py:438-444``) with a numpy-backed
iterator designed for jit-compiled steps: fixed-shape major batches plus at
most one remainder batch (so XLA compiles at most two shapes per loader),
deterministic per-epoch shuffling from a seed, and optional host-to-device
sharding over a data-parallel mesh axis.
"""

from __future__ import annotations

import pickle
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


def load_task2_pickles(cfg) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Load the 6-pickle L3DAS21 Task-2 layout the reference trainer expects.

    If ``training_predictors_path`` points at a ``.seldpak`` container
    (created by ``seld_tpu.data.native.pack_dataset``), the native mmap
    reader serves all six tensors from that single file instead.
    """
    if str(cfg.training_predictors_path).endswith(".seldpak"):
        from seld_tpu.data.native import PakReader

        reader = PakReader(cfg.training_predictors_path)
        predictors, targets = {}, {}
        for split in ("train", "val", "test"):
            x, y = reader.split(split)
            # copy out of the mmap: the reader (and its mapping) doesn't
            # outlive this function, and normalization mutates anyway
            predictors[split], targets[split] = np.array(x), np.array(y)
        reader.close()
        return predictors, targets
    paths = {
        ("train", "x"): cfg.training_predictors_path,
        ("train", "y"): cfg.training_target_path,
        ("val", "x"): cfg.validation_predictors_path,
        ("val", "y"): cfg.validation_target_path,
        ("test", "x"): cfg.test_predictors_path,
        ("test", "y"): cfg.test_target_path,
    }
    data = {}
    for key, p in paths.items():
        with open(p, "rb") as f:
            data[key] = np.asarray(pickle.load(f))
    predictors = {s: data[(s, "x")] for s in ("train", "val", "test")}
    targets = {s: data[(s, "y")] for s in ("train", "val", "test")}
    return predictors, targets


class BatchIterator:
    """Deterministic batching over in-memory arrays.

    - ``shuffle=True`` reshuffles every epoch from ``seed + epoch``.
    - yields ``(x, y)`` numpy batches; all batches have ``batch_size`` rows
      except possibly the final remainder (unless ``drop_last``).
    """

    def __init__(
        self,
        x: np.ndarray,
        y: np.ndarray,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
    ):
        assert len(x) == len(y)
        self.x = x
        self.y = y
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.x) // self.batch_size
        if not self.drop_last and len(self.x) % self.batch_size:
            n += 1
        return n

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.x)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        stop = n - (n % self.batch_size) if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield self.x[idx], self.y[idx]


def make_loaders(
    predictors: Dict[str, np.ndarray],
    targets: Dict[str, np.ndarray],
    batch_size: int,
    seed: int = 0,
    test_batch_size: Optional[int] = None,
) -> Dict[str, BatchIterator]:
    """Train (shuffled) / val / test loaders, mirroring reference train.py:442-444.

    The reference runs the metric pass at batch 1; we default the test loader
    to ``batch_size`` (a fix — the metric decode is per-clip anyway) but allow
    overriding via ``test_batch_size``.
    """
    tbs = test_batch_size or batch_size
    return {
        "train": BatchIterator(
            predictors["train"], targets["train"], batch_size, shuffle=True, seed=seed
        ),
        "val": BatchIterator(predictors["val"], targets["val"], batch_size),
        "test": BatchIterator(predictors["test"], targets["test"], tbs),
    }
