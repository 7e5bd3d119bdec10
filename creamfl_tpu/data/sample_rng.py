"""Order-independent per-sample augmentation randomness.

The reference draws augmentations from shared per-worker rng streams, so
sample randomness depends on which worker served which index —
irreproducible across loader backends/worker counts. Here each
``__getitem__`` derives its rng from ``(dataset_seed, index, visit#)``:
deterministic for any service order (grain's reader pool completes
indices slightly out of order even at worker_count=0), identical across
the array and grain backends, and still varying across epochs (the
visit counter advances per index).
"""

from __future__ import annotations

import random
from typing import Dict


class SampleRNG:
    def __init__(self, seed: int = 2021):
        self.seed = seed
        self._counts: Dict[int, int] = {}

    def for_index(self, index: int) -> random.Random:
        n = self._counts.get(index, 0)
        self._counts[index] = n + 1
        # Knuth-multiplicative mix into one stable 64-bit seed
        # (random.Random rejects tuples; hash() would work for ints but
        # explicit mixing documents the stability requirement).
        mixed = (((self.seed * 2654435761 + index) * 2654435761 + n)
                 & 0xFFFFFFFFFFFFFFFF)
        return random.Random(mixed)
