"""Dataset loading and batching.

Replaces the reference's pickle + ``TensorDataset``/``DataLoader`` input path
(reference ``train.py:226-237`` and ``train.py:438-444``) with a numpy-backed
iterator designed for jit-compiled steps: fixed-shape major batches plus at
most one remainder batch (so XLA compiles at most two shapes per loader),
deterministic per-epoch shuffling from a seed, and optional host-to-device
sharding over a data-parallel mesh axis.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, Iterator, Optional, Tuple

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
        if not os.path.isfile(str(p)):
            split, kind = key
            flag = {
                ("train", "x"): "training_predictors_path",
                ("train", "y"): "training_target_path",
                ("val", "x"): "validation_predictors_path",
                ("val", "y"): "validation_target_path",
                ("test", "x"): "test_predictors_path",
                ("test", "y"): "test_target_path",
            }[key]
            raise FileNotFoundError(
                f"dataset pickle not found: {p!r} (config --{flag}, {split} "
                f"{'predictors' if kind == 'x' else 'targets'}). Point the six "
                "--*_path flags at the L3DAS21 Task-2 pickles, pack them once "
                "into a .seldpak (seld_tpu.data.native.pack_dataset), or "
                "generate a synthetic set with "
                "seld_tpu.data.synthetic.gen_fake_task2_dataset."
            )
        with open(p, "rb") as f:
            data[key] = np.asarray(pickle.load(f))
    predictors = {s: data[(s, "x")] for s in ("train", "val", "test")}
    targets = {s: data[(s, "y")] for s in ("train", "val", "test")}
    return predictors, targets


def _shard_slice(idx: np.ndarray, batch_size: int, num_shards: int, shard_id: int):
    """This host's contiguous rows of one global batch (multihost data
    sharding; see seld_tpu.parallel.multihost). Full-size global batches
    split evenly; a remainder batch is kept only if it still divides."""
    if num_shards == 1:
        return idx
    if len(idx) % num_shards:
        return None
    local = len(idx) // num_shards
    return idx[shard_id * local : (shard_id + 1) * local]


class BatchIterator:
    """Deterministic batching over in-memory arrays.

    - ``shuffle=True`` reshuffles every epoch from ``seed + epoch``.
    - yields ``(x, y)`` numpy batches; all batches have ``batch_size`` rows
      except possibly the final remainder (unless ``drop_last``).
    - ``num_shards``/``shard_id``: multihost data sharding — ``batch_size``
      is the GLOBAL batch; every host draws the identical epoch order (it
      depends only on ``seed + epoch``) and yields its own contiguous
      ``batch_size // num_shards`` rows of each global batch.
    """

    def __init__(
        self,
        x: np.ndarray,
        y: np.ndarray,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        assert len(x) == len(y)
        assert batch_size % num_shards == 0, (batch_size, num_shards)
        self.x = x
        self.y = y
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = int(num_shards)
        self.shard_id = int(shard_id)
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.x) // self.batch_size
        rem = len(self.x) % self.batch_size
        if not self.drop_last and rem and rem % self.num_shards == 0:
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
            idx = _shard_slice(
                order[start : start + self.batch_size],
                self.batch_size, self.num_shards, self.shard_id,
            )
            if idx is None:
                continue
            yield self.x[idx], self.y[idx]


class PakBatchIterator:
    """BatchIterator over a ``.seldpak`` mmap via the native C++ row gather.

    Same protocol as :class:`BatchIterator` (len / set_epoch / iteration,
    deterministic per-epoch shuffles from ``seed + epoch``) but the split
    arrays never enter RAM: each batch is gathered straight out of the mmap
    by ``seldio_gather_rows`` (seld_tpu/data/native/loader.cc) and then
    normalized per batch by ``transform`` — this is what lets the O(1)-startup
    native loader actually feed training.
    """

    def __init__(
        self,
        reader,
        split: str,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        assert batch_size % num_shards == 0, (batch_size, num_shards)
        self.reader = reader
        self.x_idx, self.y_idx = reader.SPLITS[split]
        self.n = reader.shape(self.x_idx)[0]
        assert self.n == reader.shape(self.y_idx)[0]
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.transform = transform
        self.num_shards = int(num_shards)
        self.shard_id = int(shard_id)
        self.epoch = 0

    def __len__(self) -> int:
        n = self.n // self.batch_size
        rem = self.n % self.batch_size
        if not self.drop_last and rem and rem % self.num_shards == 0:
            n += 1
        return n

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        stop = self.n - (self.n % self.batch_size) if self.drop_last else self.n
        for start in range(0, stop, self.batch_size):
            idx = _shard_slice(
                order[start : start + self.batch_size],
                self.batch_size, self.num_shards, self.shard_id,
            )
            if idx is None:
                continue
            x = self.reader.gather(self.x_idx, idx)
            y = self.reader.gather(self.y_idx, idx)
            if self.transform is not None:
                x = self.transform(x)
            yield x, y


def make_pak_loaders(
    reader,
    batch_size: int,
    seed: int = 0,
    test_batch_size: Optional[int] = None,
    transforms: Optional[Dict[str, Callable]] = None,
    num_shards: int = 1,
    shard_id: int = 0,
) -> Dict[str, PakBatchIterator]:
    """Pak-backed train/val/test loaders (native-gather counterpart of
    :func:`make_loaders`); ``transforms`` maps split -> per-batch normalizer.
    ``num_shards``/``shard_id`` select this host's rows of each global batch
    (validated against ``batch_size`` in the iterator constructors)."""
    transforms = transforms or {}
    tbs = test_batch_size or batch_size
    shard = dict(num_shards=num_shards, shard_id=shard_id)
    return {
        "train": PakBatchIterator(
            reader, "train", batch_size, shuffle=True, seed=seed,
            transform=transforms.get("train"), **shard,
        ),
        "val": PakBatchIterator(
            reader, "val", batch_size, transform=transforms.get("val"), **shard
        ),
        "test": PakBatchIterator(
            reader, "test", tbs, transform=transforms.get("test"), **shard
        ),
    }


def make_loaders(
    predictors: Dict[str, np.ndarray],
    targets: Dict[str, np.ndarray],
    batch_size: int,
    seed: int = 0,
    test_batch_size: Optional[int] = None,
    num_shards: int = 1,
    shard_id: int = 0,
) -> Dict[str, BatchIterator]:
    """Train (shuffled) / val / test loaders, mirroring reference train.py:442-444.

    The reference runs the metric pass at batch 1; we default the test loader
    to ``batch_size`` (a fix — the metric decode is per-clip anyway) but allow
    overriding via ``test_batch_size``.
    """
    tbs = test_batch_size or batch_size
    shard = dict(num_shards=num_shards, shard_id=shard_id)
    return {
        "train": BatchIterator(
            predictors["train"], targets["train"], batch_size, shuffle=True,
            seed=seed, **shard,
        ),
        "val": BatchIterator(predictors["val"], targets["val"], batch_size, **shard),
        "test": BatchIterator(predictors["test"], targets["test"], tbs, **shard),
    }
