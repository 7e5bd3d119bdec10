"""By-name text-classification corpus registry (reference
``text_cls``, src/datasets/dataset_L.py:60-96 — VERDICT r4 missing #3).
CreamFL trains only on AG_NEWS; the other corpora are parity surface:
same CSV reader (torchtext cache layout), 0-based labels, COCO-vocab
tokenization; IMDB uses the aclImdb folder layout."""

import numpy as np
import pytest

from creamfl_tpu.data.agnews import CORPORA, text_cls
from creamfl_tpu.data.vocab import Vocabulary


@pytest.fixture
def vocab():
    v = Vocabulary()
    for t in ("<pad>", "<start>", "<end>", "<unk>", "good", "bad",
              "news", "sogou", "movie"):
        v.add_word(t)
    return v


def _write_csv(root, name, rows):
    d = root / name
    d.mkdir(parents=True)
    for split in ("train", "test"):
        with open(d / f"{split}.csv", "w", encoding="utf-8") as f:
            for label, text in rows:
                f.write(f'{label},"{text}"\n')


def test_registry_matches_reference_class_counts():
    # dataset_L.py:60-96 comments are the oracle for cls counts.
    assert CORPORA == {
        "AG_NEWS": 4, "SogouNews": 5, "DBpedia": 14,
        "YelpReviewPolarity": 2, "YelpReviewFull": 5,
        "YahooAnswers": 10, "AmazonReviewPolarity": 2,
        "AmazonReviewFull": 5, "IMDB": 2}


@pytest.mark.parametrize("name", ["SogouNews", "DBpedia",
                                  "YelpReviewPolarity"])
def test_csv_corpora_read_by_name(tmp_path, vocab, name):
    _write_csv(tmp_path, name, [(1, "good news"), (2, "bad news"),
                                (1, "sogou news")])
    ds, n_cls = text_cls(name, str(tmp_path), train=True, vocab=vocab,
                         max_len=8)
    assert n_cls == CORPORA[name]
    assert len(ds) == 3
    item = ds[0]
    assert item["labels"] == 0  # 1-based CSV labels shift to 0-base
    assert ds[1]["labels"] == 1
    # <start> good news <end>
    assert item["lengths"] == 4
    assert item["captions"][1] == vocab("good")


def test_imdb_folder_layout(tmp_path, vocab):
    for split in ("train", "test"):
        for sub in ("neg", "pos"):
            d = tmp_path / "IMDB" / "aclImdb" / split / sub
            d.mkdir(parents=True)
            (d / "0_1.txt").write_text(f"{sub} movie", encoding="utf-8")
    ds, n_cls = text_cls("IMDB", str(tmp_path), train=True, vocab=vocab)
    assert n_cls == 2 and len(ds) == 2
    assert sorted(np.asarray(ds.targets).tolist()) == [0, 1]
    # "<start> pos movie <end>": 'pos' is OOV -> <unk>, then 'movie'.
    assert ds[1]["captions"][2] == vocab("movie")


def test_unknown_corpus_raises(tmp_path, vocab):
    with pytest.raises(KeyError):
        text_cls("SST2", str(tmp_path), vocab=vocab)


def test_missing_data_raises_filenotfound(tmp_path, vocab):
    with pytest.raises(FileNotFoundError):
        text_cls("SogouNews", str(tmp_path), vocab=vocab)
