"""Grain-backed input pipeline (production path).

The reference feeds the GPU from torch DataLoaders with 16 workers
(coco.yaml:4). The TPU-native equivalent is Google Grain: deterministic,
checkpointable, multi-worker host input. ``GrainLoader`` wraps any of
this package's indexable datasets (they already return dict-of-ndarray
samples) behind the same iteration surface as ``ArrayLoader`` —
per-epoch iteration of stacked batches with a ``valid`` mask — so the
federation layer can switch loaders transparently
(``make_loader(..., backend='grain'|'array')``).

Falls back to ArrayLoader when grain is not importable.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from creamfl_tpu.data.loaders import ArrayLoader

try:
    import grain.python as grain

    HAVE_GRAIN = True
except Exception:  # pragma: no cover
    grain = None
    HAVE_GRAIN = False


class _PadBatch(grain.MapTransform if HAVE_GRAIN else object):
    """Repeat-pad a (possibly short) grain.Batch output to the full
    batch size and attach the ``valid`` mask (ArrayLoader contract)."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size

    def map(self, batch):
        batch = dict(batch)
        first = next(v for v in batch.values()
                     if isinstance(v, np.ndarray))
        n_valid = len(first)
        if n_valid < self.batch_size:
            pad_idx = np.arange(self.batch_size - n_valid) % n_valid
            for key, val in batch.items():
                if isinstance(val, np.ndarray):
                    batch[key] = np.concatenate([val, val[pad_idx]])
                elif isinstance(val, (list, tuple)):
                    batch[key] = list(val) + [val[i] for i in pad_idx]
        batch["valid"] = np.arange(self.batch_size) < n_valid
        return batch


class _ValidMask(grain.MapTransform if HAVE_GRAIN else object):
    """Attach an all-true ``valid`` mask to a bare (possibly ragged)
    batch — the pad_last=False public-loader contract."""

    def map(self, batch):
        batch = dict(batch)
        first = next(v for v in batch.values()
                     if isinstance(v, np.ndarray))
        batch["valid"] = np.ones(len(first), bool)
        return batch


class GrainLoader:
    """Epoch-iterable over a Grain DataLoader with ArrayLoader surface."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, pad_last: bool = True,
                 seed: int = 2021, num_workers: int = 0):
        assert HAVE_GRAIN
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.pad_last = pad_last
        self._epoch = 0
        self._shuffle = shuffle
        self._seed = seed
        self._num_workers = num_workers

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(
            -n // self.batch_size)

    def _build(self, epoch: int):
        sampler = grain.IndexSampler(
            num_records=len(self.dataset),
            shuffle=self._shuffle,
            seed=self._seed + (epoch if self._shuffle else 0),
            num_epochs=1,
            shard_options=grain.NoSharding(),
        )
        ops = [
            grain.Batch(batch_size=self.batch_size,
                        drop_remainder=self.drop_last),
        ]
        if self.pad_last:
            ops.append(_PadBatch(self.batch_size))
        else:
            # Bare trailing partial batch (public-loader contract):
            # still needs the valid mask consumers expect.
            ops.append(_ValidMask())
        return grain.DataLoader(
            data_source=self.dataset,
            sampler=sampler,
            operations=ops,
            worker_count=self._num_workers,
        )

    def __iter__(self):
        from creamfl_tpu.data.sample_rng import set_epoch

        # Must happen BEFORE _build: worker_count>0 pickles the data
        # source into fresh worker processes at loader construction, so
        # the epoch has to already be baked into the dataset state.
        set_epoch(self.dataset, self._epoch)
        loader = self._build(self._epoch)
        self._epoch += 1
        return iter(loader)


def make_loader(dataset, batch_size: int, backend: str = "array",
                **kwargs):
    """backend: 'array' (in-process) or 'grain' (multi-worker)."""
    if backend == "grain" and HAVE_GRAIN:
        kwargs.pop("collate_fn", None)
        return GrainLoader(dataset, batch_size, **kwargs)
    kwargs.pop("num_workers", None)
    return ArrayLoader(dataset, batch_size, **kwargs)
