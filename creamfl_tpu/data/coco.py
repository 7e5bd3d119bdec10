"""MS-COCO caption dataset (reference `src/datasets/coco.py:30-148`).

Parses ``captions_train2014.json`` (+ optional extra val-ann file for the
restval ids) without pycocotools, indexes by caption (annotation) id, and
returns the reference's per-sample tuple fields. The frozen 50k public
subset (``coco_subset_idx_file``, a pickled sorted index list into the
566 435-caption train+restval set) is honored verbatim when present —
it is load-bearing for reproducibility (SURVEY.md §7 risks).
"""

from __future__ import annotations

import json
import os
import pickle
import random
from typing import List, Optional, Sequence

import numpy as np

from creamfl_tpu.data.tokenize import caption_to_ids
from creamfl_tpu.data.transforms import imagenet_transform


def _load_annotations(ann_path: str):
    with open(ann_path) as f:
        data = json.load(f)
    imgs = {im["id"]: im["file_name"] for im in data["images"]}
    anns = {a["id"]: a for a in data["annotations"]}
    return imgs, anns


class CocoCaptionsCap:
    """Caption-indexed COCO. ``ids``/``extra_ids`` select annotation ids
    from the primary/extra annotation files respectively."""

    def __init__(self, image_root: str, ann_path: str,
                 ids: Optional[Sequence[int]] = None,
                 extra_ann_path: Optional[str] = None,
                 extra_ids: Optional[Sequence[int]] = None,
                 train: bool = False,
                 vocab=None,
                 max_len: int = 64,
                 caption_drop_prob: float = 0.0,
                 random_erasing_prob: float = 0.0,
                 bert_tokenizer=None,
                 bert_max_len: int = 64,
                 seed: int = 2021,
                 allow_missing_ids: bool = False):
        self.image_root = image_root
        self.vocab = vocab
        self.train = train
        self.max_len = max_len
        # NOT gated on ``train``: the reference passes caption_drop /
        # random_erasing to the eval subset too (load_datasets.py:80-89
        # hands tr_* probs to train_subset_eval_50000; train only
        # selects RandomResizedCrop vs Resize+CenterCrop).
        self.caption_drop_prob = caption_drop_prob
        self.random_erasing_prob = random_erasing_prob
        self.bert_tokenizer = bert_tokenizer
        self.bert_max_len = bert_max_len
        from creamfl_tpu.data.sample_rng import SampleRNG

        # Per-(index, epoch) rng: augmentation is deterministic under
        # any loader service order (array/grain/multi-worker).
        self.rng = SampleRNG(seed)

        imgs, anns = _load_annotations(ann_path)
        if extra_ann_path:
            e_imgs, e_anns = _load_annotations(extra_ann_path)
            imgs.update(e_imgs)
            anns.update(e_anns)
        self._imgs = imgs
        self._anns = anns

        all_ids = list(ids) if ids is not None else list(anns.keys())
        if extra_ids is not None:
            all_ids += list(extra_ids)
        self.ids = [int(i) for i in all_ids]
        if ids is not None or extra_ids is not None:
            present = [i for i in self.ids if i in anns]
            if len(present) != len(self.ids) and not allow_missing_ids:
                # Dropping missing ids COMPACTS positions, so any frozen
                # position-indexed subset (coco_subset_idx) would
                # silently select different captions than the paper — a
                # partial/truncated annotation file must fail loudly
                # (the reference KeyErrors on the first missing id,
                # datasets/coco.py:30-148). Miniature fixtures opt in
                # via allow_missing_ids.
                raise ValueError(
                    f"{len(self.ids) - len(present)} of the "
                    f"{len(self.ids)} requested annotation ids are "
                    f"missing from {ann_path!r} (+extra); partial or "
                    "wrong annotation file?")
            if not present:
                raise ValueError(
                    f"none of the {len(self.ids)} requested annotation "
                    f"ids exist in {ann_path!r} (+extra); wrong "
                    "annotation file?")
            self.ids = present

        self.n_images = len({anns[i]["image_id"] for i in self.ids
                             if i in anns})
        self.iid_to_cls = None  # PMRP class mode unused by CreamFL

        # Native C++ tokenizer for the hot path when the library is
        # built (parity-tested against caption_to_ids in
        # tests/test_native.py); falls back to the Python tokenizer.
        self._native_vocab = None
        if vocab is not None:
            from creamfl_tpu.data import native

            if native.available():
                try:
                    self._native_vocab = native.NativeVocab(vocab)
                except Exception:
                    self._native_vocab = None

    def __len__(self):
        return len(self.ids)

    def _load_image(self, image_id: int, rng) -> np.ndarray:
        from PIL import Image

        path = os.path.join(self.image_root, self._imgs[image_id])
        with Image.open(path) as im:
            return imagenet_transform(
                im, self.train, rng,
                random_erasing_prob=self.random_erasing_prob)

    def __getitem__(self, index: int):
        ann_id = self.ids[index]
        ann = self._anns[ann_id]
        image_id = ann["image_id"]
        caption = ann["caption"]
        rng = self.rng.for_index(index)
        img = self._load_image(image_id, rng)
        if self._native_vocab is not None:
            toks, lens = self._native_vocab.tokenize_batch(
                [str(caption)], self.max_len, self.caption_drop_prob,
                seed=rng.getrandbits(63)
                if self.caption_drop_prob > 0 else 0)
            tokens, n_ids = toks[0], int(lens[0])
        else:
            ids = caption_to_ids(caption, self.vocab,
                                 self.caption_drop_prob,
                                 rng)[: self.max_len]
            tokens = np.zeros((self.max_len,), np.int32)
            tokens[: len(ids)] = ids
            n_ids = len(ids)
        sample = {
            "images": img.astype(np.float32),
            "captions": tokens,
            "lengths": np.int32(n_ids),
            "ann_ids": np.int64(ann_id),
            "image_ids": np.int64(image_id),
            "index": np.int64(index),
        }
        if self.bert_tokenizer is not None:
            bids, bmask = self.bert_tokenizer.encode(str(caption),
                                                     self.bert_max_len)
            sample["bert_ids"] = np.asarray(bids, np.int32)
            sample["bert_mask"] = np.asarray(bmask, np.int32)
        return sample


class SubsetDataset:
    """torch.utils.data.Subset equivalent; re-indexes ``index`` so the
    distill bookkeeping sees subset-relative positions like the
    reference's Subset + enumerate pipeline."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)
        self.iid_to_cls = getattr(dataset, "iid_to_cls", None)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int):
        sample = self.dataset[self.indices[i]]
        sample = dict(sample)
        sample["index"] = np.int64(self.indices[i])
        return sample

    @property
    def n_images(self):
        return getattr(self.dataset, "n_images", None)


def load_or_create_subset_idx(path: str, total: int = 566435,
                              k: int = 50000,
                              seed: int = 2021) -> List[int]:
    """The frozen public-subset indices (reference
    load_datasets.py:148-162). Delegates to
    :mod:`creamfl_tpu.data.frozen` — paper-scale k fails loudly when
    ``path`` is absent instead of silently resampling."""
    from creamfl_tpu.data.frozen import load_subset_idx

    return load_subset_idx(path, pub_data_num=k, total=total, seed=seed)
