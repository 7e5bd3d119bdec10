"""Data pipeline tests: vocab, tokenization, partitioner, loaders."""

import numpy as np
import pytest

from creamfl_tpu.data.loaders import ArrayLoader, collate_captions
from creamfl_tpu.data.partition import data_partitioner
from creamfl_tpu.data.synthetic import (SyntheticCaptionDataset,
                                        SyntheticImageClassification,
                                        SyntheticTextClassification)
from creamfl_tpu.data.tokenize import (BertWordPieceTokenizer,
                                       caption_to_ids, treebank_tokenize)
from creamfl_tpu.data.vocab import Vocabulary


def test_vocab_roundtrip(tmp_path):
    v = Vocabulary.build([["a", "cat", "sat"], ["a", "cat", "ran"],
                          ["a", "cat"], ["a", "cat"]], threshold=3)
    assert v("a") != v("<unk>")
    assert v("cat") != v("<unk>")
    assert v("sat") == v("<unk>")  # below threshold
    path = str(tmp_path / "vocab.pkl")
    v.save_to_pickle(path)
    v2 = Vocabulary().load_from_pickle(path)
    assert v2.word2idx == v.word2idx


def test_treebank_tokenize_basics():
    toks = treebank_tokenize("A man, riding his bike.")
    assert "a" in toks and "man" in toks and "," in toks
    assert all(t == t.lower() for t in toks)


def test_caption_to_ids_wraps_and_drops():
    v = Vocabulary.synthetic(10)
    ids = caption_to_ids("word1 word2 word3", v, caption_drop_prob=0.0)
    assert ids[0] == v("<start>") and ids[-1] == v("<end>")
    assert len(ids) == 5

    import random

    rng = random.Random(0)
    # With p=1.0: all tokens -> <unk>, then all are deleted.
    ids = caption_to_ids("word1 word2 word3", v, caption_drop_prob=1.0,
                         rng=rng)
    assert ids == [v("<start>"), v("<end>")]


def test_dirichlet_partition_covers_all_samples():
    y = np.arange(200) % 10
    parts = data_partitioner("cifar100", 200, 4, "hetero", alpha=0.5,
                             y_train=y, seed=0)
    all_idx = sorted(i for p in parts.values() for i in p)
    assert all_idx == list(range(200))
    assert all(len(p) >= 1 for p in parts.values())


def test_partition_pickle_cache(tmp_path):
    y = np.arange(100) % 4
    kwargs = dict(partition="hetero", check_dir=str(tmp_path), alpha=0.5,
                  y_train=y)
    p1 = data_partitioner("AG_NEWS", 100, 2, seed=1, **kwargs)
    p2 = data_partitioner("AG_NEWS", 100, 2, seed=999, **kwargs)
    assert p1 == p2  # second call reads the cached pickle


def test_collate_captions_pads_and_clips():
    out = collate_captions([[1, 2, 3], list(range(1, 30))], max_len=8)
    assert out["captions"].shape == (2, 8)
    assert out["lengths"].tolist() == [3, 8]
    assert out["captions"][0, 3:].tolist() == [0] * 5


def test_array_loader_epochs_and_shuffle():
    ds = SyntheticImageClassification(n=10, image_size=8)
    ld = ArrayLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                     seed=0)
    assert len(ld) == 2
    b1 = [b["labels"].tolist() for b in ld]
    b2 = [b["labels"].tolist() for b in ld]
    assert b1 != b2  # reshuffled between epochs


def test_synthetic_caption_dataset_deterministic():
    ds = SyntheticCaptionDataset(n_captions=10, image_size=16, max_len=8,
                                 captions_per_image=2, seed=3)
    a, b = ds[4], ds[4]
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["captions"], b["captions"])
    # Two captions of one image share the image but not the caption.
    s0, s1 = ds[0], ds[1]
    assert s0["image_ids"] == s1["image_ids"]
    np.testing.assert_array_equal(s0["images"], s1["images"])
    assert not np.array_equal(s0["captions"], s1["captions"])
    assert ds.n_images == 5


def test_synthetic_text_labels_in_range():
    ds = SyntheticTextClassification(n=20, num_classes=4)
    labels = {int(ds[i]["labels"]) for i in range(20)}
    assert labels <= set(range(4))


def test_bert_wordpiece_real_matching():
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
             "ride": 4, "##r": 5, "a": 6, ".": 7}
    tok = BertWordPieceTokenizer(vocab)
    ids, mask = tok.encode("a rider.", max_length=8)
    assert ids[0] == 2  # CLS
    assert ids[1] == 6  # a
    assert ids[2] == 4 and ids[3] == 5  # ride ##r
    assert ids[4] == 7  # .
    assert ids[5] == 3  # SEP
    assert mask == [1] * 6 + [0] * 2

    ids, _ = tok.encode("zzz", max_length=6)
    assert ids[1] == 1  # UNK


def test_cached_dataset_and_prefetch_match_plain():
    """CachedDataset + fancy-index fast path + PrefetchLoader produce
    identical batches to the per-sample path."""
    import types

    import numpy as np

    from creamfl_tpu.data.loaders import (ArrayLoader, CachedDataset,
                                          PrefetchLoader)
    from creamfl_tpu.data.synthetic import SyntheticCaptionDataset

    ds = SyntheticCaptionDataset(n_captions=13, image_size=16, max_len=8)
    plain = ArrayLoader(ds, 4, shuffle=True, pad_last=True, seed=11)
    cached = PrefetchLoader(
        ArrayLoader(CachedDataset(ds), 4, shuffle=True, pad_last=True,
                    seed=11), depth=2)
    assert len(plain) == len(cached)
    batches_a = list(plain)
    batches_b = list(cached)
    assert len(batches_a) == len(batches_b)
    for a, b in zip(batches_a, batches_b):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)
    # Attribute passthrough (vocab etc.).
    assert CachedDataset(ds).vocab is ds.vocab


def test_projected_loader_skips_images_and_filters_fields():
    """ProjectedLoader restricts fields; with a DeviceImageBatches source
    and no 'images' requested it short-circuits to the caption-only base
    loader (no synthesis). Requested image batches match the wrapped
    loader's."""
    from creamfl_tpu.data.device_synth import (DeviceImageBatches,
                                               DeviceImageSynth)
    from creamfl_tpu.data.loaders import ArrayLoader, ProjectedLoader
    from creamfl_tpu.data.synthetic import SyntheticCaptionDataset

    ds = SyntheticCaptionDataset(n_captions=12, image_size=16,
                                 max_len=8, with_images=False)
    base = ArrayLoader(ds, batch_size=4, shuffle=False, pad_last=True)
    synth = DeviceImageSynth(16, seed=ds.seed, n_concepts=ds.n_concepts,
                             signal=ds.signal)
    loader = DeviceImageBatches(base, synth, ds._concept)

    calls = []
    orig = loader.synth

    class Counting:
        def __call__(self, iids, concepts):
            calls.append(len(iids))
            return orig(iids, concepts)

    loader.synth = Counting()

    txt_view = ProjectedLoader(loader, ("captions", "lengths", "index"))
    batches = list(txt_view)
    assert calls == [], "text view must not synthesize images"
    assert set(batches[0]) == {"captions", "lengths", "index"}
    assert len(batches) == len(txt_view) == len(loader)

    img_view = ProjectedLoader(loader, ("images", "index", "valid"))
    b = next(iter(img_view))
    assert calls, "image view synthesizes"
    assert set(b) == {"images", "index", "valid"}
    assert b["images"].shape[1:] == (16, 16, 3)


def test_device_synth_deterministic_per_image_id():
    """Same image_id -> bitwise-identical tensor across batches/epochs
    (global-feature rows must align with distill targets)."""
    import numpy as np

    from creamfl_tpu.data.device_synth import DeviceImageSynth

    synth = DeviceImageSynth(8, seed=3, n_concepts=4)
    a = np.asarray(synth(np.array([5, 9]), np.array([1, 2])))
    b = np.asarray(synth(np.array([9, 5, 7]), np.array([2, 1, 3])))
    np.testing.assert_array_equal(a[0], b[1])
    np.testing.assert_array_equal(a[1], b[0])
    assert not np.array_equal(a[0], a[1])


def test_prefetch_loader_abandoned_iterators_do_not_leak_threads():
    """Abandoning a prefetch iterator early (the next(iter(loader))
    sample-probe pattern, or a pub_data_ratio<1 epoch) must release the
    fill thread — it previously blocked forever on a full queue."""
    import gc
    import threading

    from creamfl_tpu.data.loaders import PrefetchLoader

    src = list(range(200))
    pl = PrefetchLoader(src, depth=1)  # depth=1: tightest queue
    before = threading.active_count()
    for _ in range(20):
        it = iter(pl)
        assert next(it) == 0
        del it
    gc.collect()
    # Fill threads notice the stop signal within ~0.1s each; give slack.
    deadline = 50
    while threading.active_count() > before and deadline:
        threading.Event().wait(0.1)
        deadline -= 1
    assert threading.active_count() <= before, "leaked fill threads"
    # Loader still works after abandonments (fresh iterator state).
    assert list(pl) == src

def test_partition_cache_slices_and_guards(tmp_path):
    """A cached pickle with MORE clients than requested serves the first
    N (reference loads blindly and indexes 0..N-1,
    load_FL_datasets.py:123-129); FEWER than requested is a hard error;
    regenerated partitions are never written into the packaged
    frozen-artifact directory."""
    import os

    import pytest
    from creamfl_tpu.data import frozen

    y = np.arange(100) % 4
    kwargs = dict(partition="hetero", check_dir=str(tmp_path), alpha=0.5,
                  y_train=y)
    p10 = data_partitioner("AG_NEWS", 100, 4, seed=1, **kwargs)
    p2 = data_partitioner("AG_NEWS", 100, 2, seed=999, **kwargs)
    assert sorted(p2) == [0, 1]
    assert p2[0] == p10[0] and p2[1] == p10[1]
    with pytest.raises(ValueError, match="holds 4"):
        data_partitioner("AG_NEWS", 100, 6, seed=1, **kwargs)
    # Packaged dir: the frozen 10-client cifar100 pickle serves a
    # 3-client run, and a dataset with no frozen pickle regenerates
    # WITHOUT writing into the package.
    pkg = frozen.partitions_dir()
    before = sorted(os.listdir(pkg))
    p3 = data_partitioner("cifar100", 50000, 3, "hetero", check_dir=pkg,
                          alpha=0.1, y_train=np.arange(50000) % 100)
    assert sorted(p3) == [0, 1, 2]
    data_partitioner("made_up_ds", 40, 2, "hetero", check_dir=pkg,
                     alpha=0.5, y_train=np.arange(40) % 4, seed=0)
    assert sorted(os.listdir(pkg)) == before


def test_sample_rng_epoch_keying():
    """(seed, index, epoch)-keyed rngs: service-order independent,
    epoch-varying, and loader-driven via set_epoch through wrapper
    chains (the grain multi-worker path re-pickles datasets per epoch,
    so mutable visit counters would freeze augmentations)."""
    from creamfl_tpu.data.loaders import ArrayLoader
    from creamfl_tpu.data.sample_rng import SampleRNG, set_epoch

    r = SampleRNG(7)
    a0 = r.for_index(3).random()
    assert r.for_index(3).random() == a0  # no hidden visit state
    r.set_epoch(1)
    assert r.for_index(3).random() != a0  # epochs vary

    class _DS:
        def __init__(self):
            self.rng = SampleRNG(7)

        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {"x": np.float32(self.rng.for_index(i).random())}

    class _Wrap:
        def __init__(self, ds):
            self.dataset = ds

        def __len__(self):
            return len(self.dataset)

        def __getitem__(self, i):
            return self.dataset[i]

    ds = _DS()
    set_epoch(_Wrap(ds), 4)  # walks wrapper chains
    assert ds.rng.epoch == 4

    # pad_last refetch reproduces the row it duplicates (grain's pad
    # copies arrays; the two backends must agree).
    loader = ArrayLoader(_DS(), batch_size=3, pad_last=True)
    b1, b2 = list(loader)
    # pad repeats idxs[0 % 2] = index 3: row 2 duplicates row 0 exactly
    # (an epoch-keyed refetch draws the same rng as the first fetch).
    assert b2["x"][2] == b2["x"][0]
    # epoch 2 re-augments every index differently
    b1e2, _ = list(loader)
    assert not np.array_equal(b1["x"], b1e2["x"])


def test_coco_partial_annotation_ids_fail_loudly(tmp_path):
    """Missing requested annotation ids compact positions and desync the
    frozen position-indexed public subset — loud by default, opt-in for
    miniature fixtures (coco.py, VERDICT r3 review)."""
    import json as _json

    import pytest
    from creamfl_tpu.data.coco import CocoCaptionsCap

    ann = {"images": [{"id": 1, "file_name": "x.jpg"}],
           "annotations": [{"id": 10, "image_id": 1, "caption": "a cat"},
                           {"id": 11, "image_id": 1, "caption": "a dog"}]}
    p = tmp_path / "captions.json"
    p.write_text(_json.dumps(ann))
    with pytest.raises(ValueError, match="missing"):
        CocoCaptionsCap(str(tmp_path), str(p), ids=[10, 11, 12])
    ds = CocoCaptionsCap(str(tmp_path), str(p), ids=[10, 11, 12],
                         allow_missing_ids=True)
    assert ds.ids == [10, 11]
    with pytest.raises(ValueError, match="none of the"):
        CocoCaptionsCap(str(tmp_path), str(p), ids=[98, 99],
                        allow_missing_ids=True)
