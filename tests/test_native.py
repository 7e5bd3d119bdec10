"""Native C++ data-path kernels: build + parity with Python paths."""

import numpy as np
import pytest

from creamfl_tpu.data import native
from creamfl_tpu.data.vocab import Vocabulary


@pytest.fixture(scope="module")
def lib():
    if not native.available() and not native.build():
        pytest.skip("native toolchain unavailable")
    return True


@pytest.fixture(scope="module")
def vocab():
    v = Vocabulary()
    for tok in ("<pad>", "<start>", "<end>", "<unk>"):
        v.add_word(tok)
    for w in ["a", "man", "riding", "his", "bike", ",", ".", "n't",
              "do", "dog", "'s"]:
        v.add_word(w)
    return v


def test_native_vocab_lookup(lib, vocab):
    nv = native.NativeVocab(vocab)
    assert nv.lookup("bike") == vocab("bike")
    assert nv.lookup("zzz") == vocab("<unk>")


def test_native_tokenize_matches_python(lib, vocab):
    from creamfl_tpu.data.tokenize import caption_to_ids

    nv = native.NativeVocab(vocab)
    texts = ["A man riding his bike.", "a dog, a man", "Do n't."]
    ids, lens = nv.tokenize_batch(texts, max_len=12)
    for i, t in enumerate(texts):
        expected = caption_to_ids(t, vocab)
        got = ids[i, :lens[i]].tolist()
        assert got == expected, (t, got, expected)


def test_native_tokenize_contractions(lib, vocab):
    nv = native.NativeVocab(vocab)
    ids, lens = nv.tokenize_batch(["don't"], max_len=8)
    row = ids[0, 1:lens[0] - 1].tolist()  # strip <start>/<end>
    assert row == [vocab("do"), vocab("n't")]

    ids, lens = nv.tokenize_batch(["dog's"], max_len=8)
    row = ids[0, 1:lens[0] - 1].tolist()
    assert row == [vocab("dog"), vocab("'s")]


def test_native_tokenize_drop_prob_one(lib, vocab):
    nv = native.NativeVocab(vocab)
    ids, lens = nv.tokenize_batch(["a man riding"], max_len=8,
                                  caption_drop_prob=1.0, seed=7)
    # p=1: every token -> unk then all deleted -> just <start><end>.
    assert lens[0] == 2
    assert ids[0, :2].tolist() == [vocab("<start>"), vocab("<end>")]


def test_native_normalize_images(lib):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(2, 5, 5, 3)).astype(np.uint8)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    got = native.normalize_images(imgs, mean, std)
    expected = ((imgs.astype(np.float32) / 255.0) - mean) / std
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_native_pad_collate(lib):
    seqs = [np.asarray([1, 2, 3], np.int32),
            np.asarray([4], np.int32),
            np.asarray(list(range(20)), np.int32)]
    out, lens = native.pad_collate(seqs, max_len=8)
    assert lens.tolist() == [3, 1, 8]
    assert out[0].tolist() == [1, 2, 3, 0, 0, 0, 0, 0]
    assert out[2].tolist() == list(range(8))


def test_native_tokenize_treebank_tricky_cases(lib):
    """Hyphenated compounds, quotes, unicode, abbreviations, ellipsis
    and truncation must match the Python Treebank path token-for-token
    (nltk keeps 't-shirt' whole and rewrites double quotes)."""
    from creamfl_tpu.data.tokenize import caption_to_ids, treebank_tokenize

    texts = [
        "A man in a t-shirt.",
        'he said "hello there" loudly',
        "a café with nice chairs",
        "state-of-the-art u.s. design, really...",
        "it's the dog's toy",
        "over 1,000 people",
        "a man (with a dog.)",
        'he said "hi."',
        "a u.s. flag.",
    ]
    v = Vocabulary()
    for tok in ("<pad>", "<start>", "<end>", "<unk>"):
        v.add_word(tok)
    for t in texts:
        for w in treebank_tokenize(t):
            v.add_word(w)
    nv = native.NativeVocab(v)
    ids, lens = nv.tokenize_batch(texts, max_len=24)
    for i, t in enumerate(texts):
        expected = caption_to_ids(t, v)
        got = ids[i, :lens[i]].tolist()
        assert got == expected, (t, got, expected)

    # Truncation parity: overlong body keeps tokens, <end> falls off
    # (caption_to_ids(...)[:max_len] semantics on both paths).
    long = " ".join(["man"] * 30)
    ids, lens = nv.tokenize_batch([long], max_len=8)
    expected = caption_to_ids(long, v)[:8]
    assert ids[0, :lens[0]].tolist() == expected
