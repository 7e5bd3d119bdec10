"""On-accelerator synthesis of the paper-scale synthetic image sets.

Why this exists: this build VM demand-faults fresh host memory at
~10 MB/s (hypervisor paging; measured — a 30 GB in-RAM image cache
would take an hour to even allocate), and per-sample host generation
costs ~3 ms x 50k x several passes per federated round. TPU-native
answer: the tiny per-caption fields (int32 ids, lengths, bookkeeping)
are pre-rendered on the host, and the 224^2 image tensors are
synthesized INSIDE jit on the device from ``(seed, image_id)`` — the
same distribution as ``SyntheticCaptionDataset._image`` (standard
normal + per-concept low-frequency pattern), at HBM bandwidth instead
of host-RAM-fault bandwidth.

Used by the ``--paper_scale`` pipeline; correctness runs keep the host
path (identical structure, parity-tested loaders).
"""

from __future__ import annotations

from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


class DeviceImageSynth:
    """Jitted ``(image_ids, concepts) -> [B, s, s, 3]`` generator."""

    def __init__(self, image_size: int, seed: int = 0,
                 n_concepts: int = 10, signal: float = 0.8):
        from creamfl_tpu.data.synthetic import concept_pattern

        s = image_size
        pats = np.stack([concept_pattern(s, c, signal)
                         for c in range(n_concepts)])
        patterns = jnp.asarray(pats)  # [C, s, s, 3]
        # Threefry, NOT fast_prng_key/rbg: XLA's RngBitGenerator does
        # not vectorize under vmap (measured 35.5 ms vs 3.2 ms per
        # bs128x224^2 batch on the chip, BENCH.md round-2 probes) —
        # threefry is pure counter-based vector math and batches
        # perfectly across the per-image fold_in.
        base = jax.random.PRNGKey(seed)

        @jax.jit
        def gen(image_ids: jnp.ndarray, concepts: jnp.ndarray):
            def one(iid, concept):
                key = jax.random.fold_in(base, iid)
                img = jax.random.normal(key, (s, s, 3), jnp.float32)
                return img + patterns[concept]

            return jax.vmap(one)(image_ids, concepts)

        self._gen = gen

    def __call__(self, image_ids: np.ndarray,
                 concepts: np.ndarray) -> jax.Array:
        return self._gen(jnp.asarray(image_ids, jnp.int32),
                         jnp.asarray(concepts, jnp.int32))


class DeviceImageBatches:
    """Wrap a captions-only batch loader; attach device images.

    ``concept_fn(image_id) -> int`` is the dataset's concept hash
    (computed host-side in exact Python-int arithmetic)."""

    def __init__(self, base_loader, synth: DeviceImageSynth,
                 concept_fn: Callable[[int], int]):
        self.base = base_loader
        self.synth = synth
        self.concept_fn = concept_fn

    def set_round(self, round_n: int) -> None:
        self.base.set_round(round_n)

    def __len__(self) -> int:
        return len(self.base)

    def __iter__(self) -> Iterator[dict]:
        for batch in self.base:
            iids = np.asarray(batch["image_ids"])
            concepts = np.asarray([self.concept_fn(int(i))
                                   for i in iids], np.int32)
            out = dict(batch)
            out["images"] = self.synth(iids, concepts)
            yield out
