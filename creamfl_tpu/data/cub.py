"""CUB-200-2011 caption dataset (reference `src/datasets/cub.py` +
`_dataloader.py:115-207` — dead code for CreamFL, ported for component
completeness).

Layout expected under ``root``: ``images/<class_dir>/<img>.jpg`` and
``captions/<class_dir>/<img>.txt`` (one caption per line), with class
splits given as text files listing class dirs (the CVPR'17 zero-shot
splits). ``omit_ids`` removes seen test images from training.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional, Sequence

import numpy as np

from creamfl_tpu.data.tokenize import caption_to_ids
from creamfl_tpu.data.transforms import imagenet_transform


def _read_lines(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


class CUBCaption:
    def __init__(self, image_root: str, caption_root: str,
                 classes_file: str, vocab=None, train: bool = False,
                 omit_ids: Optional[str] = None, max_len: int = 64,
                 seed: int = 2021):
        self.image_root = image_root
        self.train = train
        self.vocab = vocab
        self.max_len = max_len
        from creamfl_tpu.data.sample_rng import SampleRNG

        self.rng = SampleRNG(seed)
        omit = set(_read_lines(omit_ids)) if omit_ids else set()

        class_dirs = _read_lines(classes_file)
        self.samples = []  # (img_path, caption, class_idx)
        self.class_to_indices = {}
        for cls_idx, cls in enumerate(sorted(class_dirs)):
            img_dir = os.path.join(image_root, cls)
            cap_dir = os.path.join(caption_root, cls)
            if not os.path.isdir(img_dir):
                continue
            for fname in sorted(os.listdir(img_dir)):
                rel = os.path.join(cls, fname)
                if rel in omit:
                    continue
                cap_file = os.path.join(
                    cap_dir, os.path.splitext(fname)[0] + ".txt")
                if not os.path.exists(cap_file):
                    continue
                for caption in _read_lines(cap_file):
                    self.class_to_indices.setdefault(cls_idx, []).append(
                        len(self.samples))
                    self.samples.append((rel, caption, cls_idx))
        self.n_images = len({s[0] for s in self.samples})
        self.iid_to_cls = {i: s[2] for i, s in enumerate(self.samples)}

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int):
        from PIL import Image

        rel, caption, cls_idx = self.samples[index]
        with Image.open(os.path.join(self.image_root, rel)) as im:
            img = imagenet_transform(im, self.train,
                                     self.rng.for_index(index))
        ids = caption_to_ids(caption, self.vocab)[: self.max_len]
        tokens = np.zeros((self.max_len,), np.int32)
        tokens[: len(ids)] = ids
        return {
            "images": img.astype(np.float32),
            "captions": tokens,
            "lengths": np.int32(len(ids)),
            "ann_ids": np.int64(index),
            "image_ids": np.int64(hash(rel) % (2 ** 31)),
            "labels": np.int32(cls_idx),
            "index": np.int64(index),
        }


class CUBSampler:
    """Class-balanced sampling order: each epoch visits every class once
    with one random caption (reference CUBSampler semantics)."""

    def __init__(self, dataset: CUBCaption, seed: int = 0):
        self.dataset = dataset
        self.rng = random.Random(seed)

    def epoch_indices(self) -> Sequence[int]:
        out = []
        for cls, idxs in self.dataset.class_to_indices.items():
            out.append(self.rng.choice(idxs))
        self.rng.shuffle(out)
        return out
