"""Real-data input-path dress rehearsal (VERDICT r3 next-step #5).

The paper-scale bench synthesizes images on-device because this VM's
single host core cannot decode 224px JPEGs at the chip's consumption
rate; this tool MEASURES that claim instead of asserting it. It
generates a mid-scale on-disk COCO-format tree (>=5k JPEG images, 5
captions each, real annotation-file layout, frozen-format subset idx),
drives the SAME CocoCaptionsCap -> transforms -> collate -> loader path
a real run uses (reference: the 16-worker DataLoader pipeline,
src/coco.yaml:4, load_datasets.py:121-166), and reports sustained
samples/s per backend/worker count next to the chip's measured
consumption rate (~1.25k samples/s for the bs128 server step).

Usage:
  python tools/real_data_rehearsal.py --gen 5000         # build tree
  python tools/real_data_rehearsal.py --measure          # loader rates
  python tools/real_data_rehearsal.py --measure --chip   # + feed 1
      server epoch on the live device (compiles R101+BERT: slow)

The tree lands in /tmp/coco_rehearsal (override --root).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")


def gen_tree(root: str, n_images: int, img_px: int = 256,
             caps_per_image: int = 5, seed: int = 7):
    """COCO-format tree: train2014-named JPEGs + captions_train2014.json
    with real-layout entries + a frozen-format subset idx pickle."""
    import pickle

    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "allimages"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    words = ("a man rides his red bicycle down the busy street two dogs "
             "play with a ball on green grass near the lake an old train "
             "crosses a long bridge over the river at sunset").split()
    images, anns = [], []
    t0 = time.time()
    for i in range(n_images):
        iid = i + 1
        name = f"COCO_train2014_{iid:012d}.jpg"
        # Structured (gradient + noise) content: pure noise JPEGs are
        # pathologically slow to encode and unrealistically slow to
        # decode; this approximates photo entropy.
        base = np.linspace(0, 255, img_px, dtype=np.float32)
        arr = (base[None, :, None] * np.ones((img_px, 1, 3))
               + rng.normal(0, 30, (img_px, img_px, 3))).clip(
                   0, 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "allimages", name), quality=85)
        images.append({"id": iid, "file_name": name})
        for c in range(caps_per_image):
            anns.append({"id": i * caps_per_image + c + 1,
                         "image_id": iid,
                         "caption": " ".join(
                             rng.choice(words, size=9).tolist())})
        if i % 1000 == 999:
            print(f"  {i + 1}/{n_images} images "
                  f"({(i + 1) / (time.time() - t0):.0f}/s)")
    with open(os.path.join(root, "annotations",
                           "captions_train2014.json"), "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    # Frozen-format public subset: all caption positions, shuffled.
    subset = rng.permutation(len(anns)).tolist()
    with open(os.path.join(root, "subset_idx"), "wb") as f:
        pickle.dump(sorted(subset), f)
    print(f"tree: {n_images} images x {caps_per_image} captions "
          f"in {time.time() - t0:.0f}s at {root}")


def build_pub_loader(root: str, backend: str, workers: int,
                     batch_size: int = 128, prefetch: int = 0):
    from creamfl_tpu.data import frozen
    from creamfl_tpu.data.coco import CocoCaptionsCap, SubsetDataset
    from creamfl_tpu.data.grain_loaders import make_loader
    from creamfl_tpu.data.loaders import PrefetchLoader
    from creamfl_tpu.data.vocab import Vocabulary

    vocab = Vocabulary().load_from_pickle(frozen.coco_vocab_path())
    ds = CocoCaptionsCap(
        os.path.join(root, "allimages"),
        os.path.join(root, "annotations", "captions_train2014.json"),
        train=True, vocab=vocab, caption_drop_prob=0.1,
        random_erasing_prob=0.2)
    subset = frozen.load_subset_idx(os.path.join(root, "subset_idx"),
                                    pub_data_num=len(ds), total=len(ds))
    pub = SubsetDataset(ds, subset)
    loader = make_loader(pub, batch_size, backend=backend,
                         num_workers=workers, shuffle=True,
                         drop_last=False, pad_last=False)
    if prefetch:
        loader = PrefetchLoader(loader, depth=prefetch)
    return pub, loader


def measure_loader(loader, n_batches: int, batch_size: int):
    t0 = time.time()
    seen = 0
    for i, batch in enumerate(loader):
        seen += len(np.asarray(batch["captions"]))
        if i + 1 >= n_batches:
            break
    dt = time.time() - t0
    return seen / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/coco_rehearsal")
    ap.add_argument("--gen", type=int, default=0)
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--batches", type=int, default=24)
    args = ap.parse_args()

    if args.gen:
        gen_tree(args.root, args.gen)
    if not args.measure:
        return

    out = {}
    for backend, workers, prefetch in (("array", 0, 0), ("array", 0, 2),
                                       ("grain", 0, 0), ("grain", 2, 0),
                                       ("grain", 4, 0)):
        try:
            _, loader = build_pub_loader(args.root, backend, workers,
                                         prefetch=prefetch)
            rate, dt = measure_loader(loader, args.batches, 128)
        except Exception as e:  # noqa: BLE001 — report and continue
            out[f"{backend}_w{workers}_p{prefetch}"] = f"error: {e}"
            continue
        key = f"{backend}_w{workers}_p{prefetch}"
        out[key] = round(rate, 1)
        print(f"{key}: {rate:.0f} samples/s ({dt:.1f}s)")

    if args.chip:
        import jax
        import jax.numpy as jnp

        from creamfl_tpu.config import default_config_path, parse_config
        from creamfl_tpu.engine.server import ServerEngine
        from creamfl_tpu.models.bert import BertConfig

        cfg = parse_config(default_config_path("coco.yaml"),
                           strict_cast=False)
        cfg.model.embed_dim = 256
        cfg.model.cnn_type = "resnet101"
        cfg.model.not_bert = True  # GRU text path (vocab tokens on disk)
        cfg.train.use_bf16 = True
        _, loader = build_pub_loader(args.root, "array", 0, prefetch=2)
        first = next(iter(loader))
        engine = ServerEngine(cfg, vocab_size=12000)
        state = engine.init_state(jax.random.PRNGKey(0), first)
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        seen = 0
        for i, batch in enumerate(loader):
            if len(batch["captions"]) != len(first["captions"]):
                continue  # trailing partial batch: skip, keep one shape
            images = jnp.asarray(batch["images"])
            captions, lengths, bert_mask = engine._text_inputs(batch)
            key, sub = jax.random.split(key)
            state, _ = engine.train_step(state, images, captions,
                                         lengths, bert_mask, sub)
            seen += len(batch["captions"])
            if i >= args.batches:
                break
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        out["chip_train_samples_per_s"] = round(seen / dt, 1)
        print(f"chip-fed train epoch slice: {seen / dt:.0f} samples/s")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
