"""Dataset pipeline assembly (reference `src/utils/load_datasets.py` +
`src/datasets/load_FL_datasets.py` + MMFL.create_model wiring).

``build_datasets(args, ...)`` returns the loader bundle the federation
layer consumes:
  pub_train / pub_eval  — the 50k-caption public COCO subset with train /
                          eval transforms (load_datasets.py:70-93; eval
                          batch is 2x train batch);
  test                  — COCO 5k retrieval test split;
  img_clients[i] / txt_clients[i] / mm_clients[i] — per-client loaders
                          (Dirichlet-hetero for CIFAR/AG_NEWS, shard
                          partition for F30k);
  img_test / txt_test   — shared local test sets;
  vocab, img_num_class, txt_num_class, crossfold sizes.

When real data roots are absent (this build env has zero egress), the
synthetic twins stand in with identical shapes — flagged by
``datasets['synthetic']``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from creamfl_tpu.data.loaders import ArrayLoader
from creamfl_tpu.data.grain_loaders import make_loader
from creamfl_tpu.data.partition import data_partitioner
from creamfl_tpu.data.synthetic import (SyntheticCaptionDataset,
                                        SyntheticImageClassification,
                                        SyntheticTextClassification)
from creamfl_tpu.data.vocab import Vocabulary


def build_synthetic_datasets(args, vocab: Optional[Vocabulary] = None,
                             pub_size: int = 256,
                             image_size: int = 64,
                             max_len: int = 16,
                             client_data_size: int = 128,
                             test_size: int = 64,
                             retrieval_test_size: int = 100,
                             batch_size: Optional[int] = None,
                             bert_tokenizer=None,
                             cache: bool = False,
                             client_image_size: Optional[int] = None,
                             prefetch: int = 0,
                             mm_client_data_size: Optional[int] = None,
                             device_images: bool = False,
                             pub_batch_size: Optional[int] = None,
                             pub_eval_batch_size: Optional[int] = None
                             ) -> Dict:
    """Shape-faithful synthetic bundle (scaled-down by default).

    ``cache=True`` pre-renders the caption sets into contiguous host
    arrays (paper-scale runs: sample synthesis would otherwise dominate
    the single host core); ``prefetch`` wraps the hot loaders in a
    background-thread prefetcher; ``client_image_size`` lets image
    clients train at CIFAR resolution (32px) while the public set stays
    at COCO resolution, like the reference.
    """
    from creamfl_tpu.data.loaders import CachedDataset, PrefetchLoader

    vocab = vocab or Vocabulary.synthetic(100)
    bs = batch_size or min(args.batch_size, pub_size)
    # Public loaders have their own batch sizes in the reference
    # (coco.yaml dataloader.batch_size=128 train, x2 eval subset;
    # load_datasets.py:59,82) independent of the clients' --batch_size.
    pub_bs = min(pub_batch_size or bs, pub_size)
    pub_ebs = min(pub_eval_batch_size or pub_bs, pub_size)
    client_image_size = client_image_size or image_size

    def _maybe_cache(ds):
        return CachedDataset(ds, verbose=True) if cache else ds

    def _maybe_prefetch(loader):
        return PrefetchLoader(loader, prefetch) if prefetch else loader

    def _caption_loader(base_ds, store, **kw):
        """Loader over a caption dataset; with ``device_images`` the
        images are synthesized on-accelerator per batch
        (data/device_synth.py) and only caption fields live on host."""
        loader = _maybe_prefetch(ArrayLoader(store, **kw))
        if not device_images:
            return loader
        from creamfl_tpu.data.device_synth import (DeviceImageBatches,
                                                   DeviceImageSynth)

        synth = DeviceImageSynth(base_ds.image_size, seed=base_ds.seed,
                                 n_concepts=base_ds.n_concepts,
                                 signal=base_ds.signal)
        return DeviceImageBatches(loader, synth, base_ds._concept)

    pub_ds = SyntheticCaptionDataset(
        n_captions=pub_size, image_size=image_size, max_len=max_len,
        vocab=vocab, seed=1, bert_tokenizer=bert_tokenizer,
        with_images=not device_images)
    test_ds = SyntheticCaptionDataset(
        n_captions=retrieval_test_size, image_size=image_size,
        max_len=max_len, vocab=vocab, seed=2,
        bert_tokenizer=bert_tokenizer, with_images=not device_images)
    pub = _maybe_cache(pub_ds)
    test = _maybe_cache(test_ds)

    datasets: Dict = {
        "vocab": vocab,
        "synthetic": True,
        # Keep the trailing partial public batch like the reference
        # (see the real-data builder below); ragged final shape costs
        # one extra compile per program.
        "pub_train": _caption_loader(pub_ds, pub, batch_size=pub_bs,
                                     shuffle=True, drop_last=False,
                                     pad_last=False, seed=args.seed),
        "pub_eval": _caption_loader(pub_ds, pub, batch_size=pub_ebs,
                                    shuffle=False, pad_last=False),
        "test": _caption_loader(test_ds, test,
                                batch_size=min(bs, retrieval_test_size),
                                shuffle=False, pad_last=True),
        "img_num_class": 100,
        "txt_num_class": 4,
        # Synthetic retrieval test is small: shrink the crossfolds.
        "n_crossfolds": 2,
        "n_images_per_crossfold": max(1, retrieval_test_size // 10),
        "n_captions_per_crossfold": max(1, retrieval_test_size // 2
                                        // 2),
    }

    # -- unimodal clients (Dirichlet hetero partition on labels) -------
    if args.num_img_clients > 0:
        full = SyntheticImageClassification(
            n=client_data_size * args.num_img_clients,
            image_size=client_image_size, num_classes=100, seed=3)
        parts = data_partitioner("cifar100", len(full),
                                 args.num_img_clients, "hetero",
                                 alpha=args.alpha,
                                 y_train=full.targets, seed=args.seed)
        img_bs = _family_batch_size(
            bs, *(len(parts[i]) for i in range(args.num_img_clients)))
        datasets["img_clients"] = [
            ArrayLoader(_Subset(full, parts[i]), img_bs, shuffle=True,
                        drop_last=False, pad_last=True, seed=args.seed)
            for i in range(args.num_img_clients)]
        datasets["img_test"] = ArrayLoader(
            SyntheticImageClassification(n=test_size,
                                         image_size=client_image_size,
                                         num_classes=100, seed=4),
            min(bs, test_size), pad_last=True)
    if args.num_txt_clients > 0:
        full = SyntheticTextClassification(
            n=client_data_size * args.num_txt_clients, num_classes=4,
            max_len=max_len, vocab=vocab, seed=5)
        parts = data_partitioner("AG_NEWS", len(full),
                                 args.num_txt_clients, "hetero",
                                 alpha=args.alpha,
                                 y_train=full.targets, seed=args.seed)
        txt_bs = _family_batch_size(
            bs, *(len(parts[i]) for i in range(args.num_txt_clients)))
        datasets["txt_clients"] = [
            ArrayLoader(_Subset(full, parts[i]), txt_bs, shuffle=True,
                        drop_last=False, pad_last=True, seed=args.seed)
            for i in range(args.num_txt_clients)]
        datasets["txt_test"] = ArrayLoader(
            SyntheticTextClassification(n=test_size, num_classes=4,
                                        max_len=max_len, vocab=vocab,
                                        seed=6),
            min(bs, test_size), pad_last=True)
    if args.num_mm_clients > 0:
        # mm shards are smaller than unimodal ones (the reference's F30k
        # k-split gives ~2k pairs/client vs CIFAR's 5k).
        mm_n = mm_client_data_size or client_data_size
        mm_datasets = [
            SyntheticCaptionDataset(n_captions=mm_n,
                                    image_size=image_size,
                                    max_len=max_len, vocab=vocab,
                                    seed=100 + i,
                                    with_images=not device_images)
            for i in range(args.num_mm_clients)]
        # pad_last + pair masking in local_step: reference DataLoaders
        # keep the trailing partial batch (drop_last=False).
        datasets["mm_clients"] = [
            _caption_loader(ds, _maybe_cache(ds),
                            batch_size=min(bs, mm_n), shuffle=True,
                            drop_last=False, pad_last=True,
                            seed=args.seed)
            for ds in mm_datasets]
    return datasets


def _family_batch_size(cap: int, *sizes: int) -> int:
    """Family-UNIFORM client batch size: the stacked lock-step path
    stacks same-step batches across a family, so per-client batch
    shapes must match; the reference uses one fixed size for every
    client (MMFL.py:128). Clamped to the largest shard so miniature
    (fixture/smoke) data does not pad every batch to the paper cap —
    at real scale the shards exceed the cap and this IS the reference
    value. Undersized shards pad with a valid mask."""
    return min(cap, max(1, max(sizes)))


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)
        self.targets = np.asarray(dataset.targets)[self.indices] \
            if hasattr(dataset, "targets") else None

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def build_real_datasets(args, vocab_path: Optional[str], coco_root: str,
                        cifar_root: str, agnews_root: str,
                        f30k_root: str, bert_vocab: Optional[str] = None,
                        partition_dir: Optional[str] = None) -> Dict:
    """Real-data bundle; mirrors prepare_coco_dataloaders +
    get_FL_trainloader. Raises FileNotFoundError on missing roots so the
    caller can fall back to synthetic.

    The frozen reproducibility artifacts (public-subset indices, COCO
    split id files, vocab, non-IID client partitions) default to the
    packaged copies (`creamfl_tpu/data/frozen.py`) so a paper-scale run
    reproduces the reference's exact subsets by default."""
    from creamfl_tpu.data import frozen
    from creamfl_tpu.data.agnews import Language
    from creamfl_tpu.data.cifar import Cifar
    from creamfl_tpu.data.coco import CocoCaptionsCap, SubsetDataset
    from creamfl_tpu.data.flickr30k import F30kCaptionsCap
    from creamfl_tpu.data.tokenize import BertWordPieceTokenizer

    backend = getattr(args, "data_backend", "array")
    workers = int(getattr(args, "num_workers", 0))

    def _loader(dataset, batch_size, **kw):
        return make_loader(dataset, batch_size, backend=backend,
                           num_workers=workers, **kw)

    vocab = Vocabulary().load_from_pickle(vocab_path
                                          or frozen.coco_vocab_path())
    if partition_dir is None:
        partition_dir = frozen.partitions_dir()
    bert_tok = (BertWordPieceTokenizer.from_vocab_file(bert_vocab)
                if bert_vocab and os.path.exists(bert_vocab) else None)

    ann_dir = os.path.join(coco_root, "annotations")
    image_root = os.path.join(coco_root, "allimages")
    train_ann = os.path.join(ann_dir, "captions_train2014.json")
    val_ann = os.path.join(ann_dir, "captions_val2014.json")
    # Karpathy split ids are packaged artifacts; missing files are a
    # loud error (a silent None would fall back to ALL annotations).
    train_ids = frozen.load_coco_ids("train")
    restval_ids = frozen.load_coco_ids("restval")
    te_ids = frozen.load_coco_ids("test")

    # Miniature --smoke fixtures pair the full-COCO frozen id files with
    # subset annotation files, so missing ids are expected there; at
    # real scale a partial annotation file must fail loudly (it would
    # silently shift the frozen position-indexed public subset).
    allow_missing = bool(getattr(args, "smoke", False))

    def coco(train, ids=train_ids, extra=restval_ids):
        # Both pub splits keep caption-drop 0.1 + random-erasing 0.2:
        # the reference passes the train probs to train_subset_eval too
        # (load_datasets.py:80-89), so con_w weights / distill targets /
        # client reps are computed on augmented inputs every round.
        return CocoCaptionsCap(
            image_root, train_ann, ids=ids, extra_ann_path=val_ann,
            extra_ids=extra, train=train, vocab=vocab,
            caption_drop_prob=0.1,
            random_erasing_prob=0.2,
            bert_tokenizer=bert_tok,
            allow_missing_ids=allow_missing)

    pub_num = getattr(args, "pub_data_num", 50000)
    coco_train = coco(True)
    # total= matters only on the smoke-scale regeneration path: sampling
    # positions from the full-COCO constant against a miniature fixture
    # set would write an index file that cannot index the dataset.
    subset_idx = frozen.load_subset_idx(
        getattr(args, "coco_subset_idx", None), pub_data_num=pub_num,
        total=len(coco_train))
    # Honor --pub_data_num (the reference hardcodes 50000 and crashes on
    # any other value when the frozen file exists — load_datasets.py:
    # 157-162 leaves `idx` unbound; we slice the frozen subset
    # deterministically instead).
    subset_idx = subset_idx[:pub_num]
    coco_client = getattr(args, "coco_client", -1)
    if coco_client > -1:
        # Per-client COCO shard (reference load_datasets.py:164-166:
        # captions [100000 + 10000*client, 110000 + 10000*client)).
        shard = list(range(100000 + coco_client * 10000,
                           110000 + coco_client * 10000))
        pub_train = SubsetDataset(coco_train, shard)
        pub_eval = SubsetDataset(coco(False), shard)
    else:
        pub_train = SubsetDataset(coco_train, subset_idx)
        pub_eval = SubsetDataset(coco(False), subset_idx)
    val_ids = frozen.load_coco_ids("dev")[:5000]
    test_set = CocoCaptionsCap(image_root, val_ann, ids=te_ids,
                               train=False, vocab=vocab,
                               bert_tokenizer=bert_tok,
                               allow_missing_ids=allow_missing)

    bs = args.batch_size
    # Public loaders use the server config's batch size (coco.yaml
    # dataloader.batch_size=128; eval subset x2 — load_datasets.py:59,82),
    # independent of the clients' --batch_size.
    pub_bs = _family_batch_size(128, len(pub_train))
    datasets: Dict = {
        "vocab": vocab,
        "synthetic": False,
        # Reference DataLoaders keep the trailing partial public batch
        # (drop_last defaults False, and the eval subset's last batch is
        # bare, not padded — load_datasets.py:69-89); one extra
        # compiled shape variant per program covers it.
        "pub_train": _loader(pub_train, pub_bs, shuffle=True,
                             drop_last=False, pad_last=False,
                             seed=args.seed),
        "pub_eval": _loader(pub_eval, pub_bs * 2, pad_last=False),
        "test": _loader(test_set, 8, pad_last=True),
        "img_num_class": 100,
        "txt_num_class": 4,
        "n_crossfolds": 5,
        "n_images_per_crossfold": 1000,
        "n_captions_per_crossfold": 5000,
    }
    # load_coco_ids is required=True, so val_ids always exists here.
    val_set = CocoCaptionsCap(image_root, val_ann, ids=val_ids,
                              train=False, vocab=vocab,
                              bert_tokenizer=bert_tok,
                              allow_missing_ids=allow_missing)
    datasets["val"] = _loader(val_set, 8, pad_last=True)

    if args.num_img_clients > 0:
        train = Cifar(cifar_root, "Cifar100", train=True)
        parts = data_partitioner("cifar100", len(train),
                                 args.num_img_clients, "hetero",
                                 check_dir=partition_dir, alpha=0.1,
                                 y_train=train.targets, seed=args.seed)
        img_bs = _family_batch_size(
            512, *(len(parts[i]) for i in range(args.num_img_clients)))
        datasets["img_clients"] = [
            _loader(_Subset(train, parts[i]), img_bs, shuffle=True,
                        pad_last=True, seed=args.seed)
            for i in range(args.num_img_clients)]
        test_set_img = Cifar(cifar_root, "Cifar100", train=False)
        datasets["img_test"] = _loader(
            test_set_img, _family_batch_size(512, len(test_set_img)),
            pad_last=True)
    if args.num_txt_clients > 0:
        train = Language(agnews_root, "AG_NEWS", train=True, vocab=vocab)
        parts = data_partitioner("AG_NEWS", len(train),
                                 args.num_txt_clients, "hetero",
                                 check_dir=partition_dir, alpha=0.1,
                                 y_train=train.targets, seed=args.seed)
        txt_bs = _family_batch_size(
            512, *(len(parts[i]) for i in range(args.num_txt_clients)))
        datasets["txt_clients"] = [
            _loader(_Subset(train, parts[i]), txt_bs, shuffle=True,
                        pad_last=True, seed=args.seed)
            for i in range(args.num_txt_clients)]
        test_set_txt = Language(agnews_root, "AG_NEWS", train=False,
                                vocab=vocab)
        datasets["txt_test"] = _loader(
            test_set_txt, _family_batch_size(512, len(test_set_txt)),
            pad_last=True)
    if args.num_mm_clients > 0:
        pp = os.path.join(partition_dir, "client_noniid_flicker30k.pkl")
        mm_sets = [
            F30kCaptionsCap(f30k_root, "train", train=True,
                            vocab=vocab, caption_drop_prob=0.1,
                            random_erasing_prob=0.2, client=i,
                            partition_pickle=pp)
            for i in range(args.num_mm_clients)]
        mm_bs = _family_batch_size(128, *(len(d) for d in mm_sets))
        datasets["mm_clients"] = [
            # pad_last + MCSoft pair masking == the reference's bare
            # trailing partial batch (drop_last defaults False).
            _loader(d, mm_bs, shuffle=True, drop_last=False,
                    pad_last=True, seed=args.seed)
            for d in mm_sets]
    return datasets
