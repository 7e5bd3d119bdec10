"""Host-side image transforms, NumPy/PIL (reference
`src/datasets/_transforms.py` + `src/utils/load_datasets.py:236-274`).

Train: RandomResizedCrop(224) + HFlip (+ RandomErasing p=0.2, const mode).
Eval: Resize(256) + CenterCrop(224). Both end with ImageNet normalize.
Outputs are NHWC float32 (TPU conv layout), not the reference's NCHW.

Client-local CIFAR transforms (`ClientTrainer.py:230-235`,
`load_FL_datasets.py:16-21`): Resize(1.1x) + RandomRotation(10) +
RandomCrop + HFlip + dataset-stat normalize.
"""

from __future__ import annotations

import math
import random
from typing import Optional

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# RGB stats from the reference's color_lib for Cifar100 clients.
CIFAR100_MEAN = np.array([0.5071, 0.4866, 0.4409], np.float32)
CIFAR100_STD = np.array([0.2673, 0.2564, 0.2762], np.float32)


def _to_pil(img):
    from PIL import Image

    if isinstance(img, np.ndarray):
        return Image.fromarray(img.astype(np.uint8))
    return img


def _resize(img, size: int):
    """Resize shorter side to ``size`` (torchvision Resize(int) —
    torchvision defaults to BILINEAR; bare PIL .resize() would use
    BICUBIC and shift every pixel vs the reference preprocessing)."""
    from PIL import Image

    w, h = img.size
    if w <= h:
        return img.resize((size, max(1, round(h * size / w))),
                          resample=Image.BILINEAR)
    return img.resize((max(1, round(w * size / h)), size),
                      resample=Image.BILINEAR)


def normalize(arr: np.ndarray, mean=IMAGENET_MEAN,
              std=IMAGENET_STD) -> np.ndarray:
    return ((arr / 255.0) - mean) / std


def random_resized_crop(img, size: int, rng: random.Random,
                        scale=(0.08, 1.0),
                        ratio=(3 / 4, 4 / 3)):
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            from PIL import Image

            # torchvision RandomResizedCrop defaults to BILINEAR too.
            return img.resize((size, size), resample=Image.BILINEAR,
                              box=(left, top, left + cw, top + ch))
    # Fallback: center crop (torchvision semantics).
    return center_crop(_resize(img, size), size)


def center_crop(img, size: int):
    w, h = img.size
    left = int(round((w - size) / 2))
    top = int(round((h - size) / 2))
    return img.crop((left, top, left + size, top + size))


def random_erasing(arr: np.ndarray, rng: random.Random,
                   probability: float = 0.2, min_area: float = 0.02,
                   max_area: float = 1 / 3,
                   min_aspect: float = 0.3) -> np.ndarray:
    """Const-mode RandomErasing on a normalized HWC array."""
    if rng.random() > probability:
        return arr
    h, w = arr.shape[:2]
    area = h * w
    log_ar = (math.log(min_aspect), math.log(1 / min_aspect))
    for _ in range(10):
        target = rng.uniform(min_area, max_area) * area
        aspect = math.exp(rng.uniform(*log_ar))
        eh = int(round(math.sqrt(target * aspect)))
        ew = int(round(math.sqrt(target / aspect)))
        if ew < w and eh < h:
            top = rng.randint(0, h - eh)
            left = rng.randint(0, w - ew)
            arr[top:top + eh, left:left + ew, :] = 0.0
            break
    return arr


def imagenet_transform(img, train: bool, rng: Optional[random.Random] = None,
                       crop_size: int = 224, resize_size: int = 256,
                       random_erasing_prob: float = 0.0) -> np.ndarray:
    """PIL/array -> normalized float32 HWC."""
    rng = rng or random
    img = _to_pil(img).convert("RGB")
    if train:
        img = random_resized_crop(img, crop_size, rng)
        if rng.random() < 0.5:
            img = img.transpose(0)  # FLIP_LEFT_RIGHT
    else:
        img = center_crop(_resize(img, resize_size), crop_size)
    arr = normalize(np.asarray(img, np.float32))
    # NOT gated on train: the reference appends RandomErasing whenever
    # the prob is set, including the Resize+CenterCrop eval-subset
    # branch (load_datasets.py:267-271).
    if random_erasing_prob > 0:
        arr = random_erasing(arr, rng, random_erasing_prob)
    return arr


def cifar_client_transform(img, train: bool,
                           rng: Optional[random.Random] = None,
                           imgsize: int = 256,
                           mean=CIFAR100_MEAN,
                           std=CIFAR100_STD) -> np.ndarray:
    """Client CIFAR aug: Resize(1.1x)+Rot(10)+Crop+HFlip (train) /
    plain normalize at native size (test, reference test_set transform)."""
    rng = rng or random
    img = _to_pil(img).convert("RGB")
    if train:
        img = _resize(img, int(imgsize * 1.1))
        img = img.rotate(rng.uniform(-10, 10))
        w, h = img.size
        left = rng.randint(0, max(0, w - imgsize))
        top = rng.randint(0, max(0, h - imgsize))
        img = img.crop((left, top, left + imgsize, top + imgsize))
        if rng.random() < 0.5:
            img = img.transpose(0)
    arr = np.asarray(img, np.float32)
    return ((arr / 255.0) - mean) / std
