"""Grain-backed input pipeline (production path).

The reference feeds the GPU from torch DataLoaders with 16 workers
(coco.yaml:4). The TPU-native equivalent is Google Grain: deterministic,
checkpointable, multi-worker host input. ``GrainLoader`` wraps any of
this package's indexable datasets (they already return dict-of-ndarray
samples) behind the same iteration surface as ``ArrayLoader`` —
per-epoch iteration of stacked batches with a ``valid`` mask — so the
federation layer can switch loaders transparently
(``make_loader(..., backend='grain'|'array')``).

Batch composition parity: grain's DataLoader distributes *records*
round-robin across workers and applies operations (including Batch)
per worker, so a naive record-level pipeline at worker_count=2 yields
batches [0,2,4,6], [1,3,5,7], ... — different batch statistics than
the in-process loader and the reference's index-ordered torch
DataLoader (which parallelizes fetches but preserves batch
composition). Here each grain record IS one whole batch
(``_BatchView``): workers parallelize batch assembly + augmentation,
grain's deterministic ordering preserves batch order, and the view
computes its epoch order with the same stateful ``random.Random(seed)``
stream ArrayLoader uses — batches are identical to the array backend
for shuffled and unshuffled loaders alike.

Falls back to ArrayLoader when grain is not importable.
"""

from __future__ import annotations

import random
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from creamfl_tpu.data.loaders import ArrayLoader, stack_samples

try:
    import grain.python as grain

    HAVE_GRAIN = True
except Exception:  # pragma: no cover
    grain = None
    HAVE_GRAIN = False


class _BatchView:
    """Indexable view whose record ``b`` is the ready-stacked batch
    ``order[b*bs:(b+1)*bs]`` of the wrapped dataset, replicating
    ArrayLoader's pad/valid semantics exactly (short final batch:
    repeat-pad via ``idxs[i % n_valid]`` when ``pad_last``, else emit
    the bare ragged batch with an all-true mask)."""

    def __init__(self, dataset, order: Sequence[int], batch_size: int,
                 drop_last: bool, pad_last: bool):
        self.dataset = dataset  # exposed for sample_rng.set_epoch walks
        self.order = list(order)
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.pad_last = pad_last

    def __len__(self) -> int:
        n = len(self.order)
        return n // self.batch_size if self.drop_last else -(
            -n // self.batch_size)

    def __getitem__(self, b) -> Dict[str, Any]:
        b = int(b)
        bs = self.batch_size
        idxs: List[int] = self.order[b * bs:(b + 1) * bs]
        n_valid = len(idxs)
        if n_valid < bs and self.pad_last:
            idxs = idxs + [idxs[i % n_valid] for i in range(bs - n_valid)]
        samples = [self.dataset[i] for i in idxs]
        return stack_samples(samples, n_valid)


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
        # Same stateful shuffle stream as ArrayLoader: epoch E's order
        # depends on the E-1 shuffles before it, so the two backends
        # agree on every epoch, not just the first.
        self._seed = seed
        self._order_rng = random.Random(seed)
        self._num_workers = num_workers
        self._round = None
        self._round_k = 0

    def set_round(self, round_n: int) -> None:
        """Round-keyed epoch addressing, mirroring ArrayLoader.set_round
        byte-for-byte so the two backends stay batch-identical in round
        mode too (resume-deterministic epochs)."""
        self._round = int(round_n)
        self._round_k = 0

    def _next_epoch_id(self) -> int:
        from creamfl_tpu.data.loaders import ROUND_EPOCH_STRIDE

        if self._round is None:
            epoch = self._epoch
            self._epoch += 1
            return epoch
        epoch = self._round * ROUND_EPOCH_STRIDE + self._round_k
        self._round_k += 1
        return epoch

    def __len__(self) -> int:
        # Delegate to the batch view so the batch-count arithmetic has
        # one source of truth with what __iter__ actually yields.
        return len(_BatchView(self.dataset, range(len(self.dataset)),
                              self.batch_size, self.drop_last,
                              self.pad_last))

    def _build(self, view: _BatchView):
        sampler = grain.IndexSampler(
            num_records=len(view),
            shuffle=False,  # order is baked into the view
            seed=0,
            num_epochs=1,
            shard_options=grain.NoSharding(),
        )
        return grain.DataLoader(
            data_source=view,
            sampler=sampler,
            operations=[],
            worker_count=self._num_workers,
        )

    def __iter__(self):
        from creamfl_tpu.data.sample_rng import set_epoch

        epoch_id = self._next_epoch_id()
        # Must happen BEFORE _build: worker_count>0 pickles the data
        # source into fresh worker processes at loader construction, so
        # the epoch has to already be baked into the dataset state.
        set_epoch(self.dataset, epoch_id)
        order = list(range(len(self.dataset)))
        if self._shuffle:
            rng = (random.Random(self._seed * 2_147_483_659 + epoch_id)
                   if self._round is not None else self._order_rng)
            rng.shuffle(order)
        view = _BatchView(self.dataset, order, self.batch_size,
                          self.drop_last, self.pad_last)
        loader = self._build(view)
        return iter(loader)


def make_loader(dataset, batch_size: int, backend: str = "array",
                **kwargs):
    """backend: 'array' (in-process) or 'grain' (multi-worker)."""
    if backend == "grain" and HAVE_GRAIN:
        kwargs.pop("collate_fn", None)
        return GrainLoader(dataset, batch_size, **kwargs)
    kwargs.pop("num_workers", None)
    return ArrayLoader(dataset, batch_size, **kwargs)
