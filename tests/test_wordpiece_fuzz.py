"""Fuzz of BertWordPieceTokenizer vs transformers.BertTokenizer
(VERDICT r4 next-step #4).

The reference runs the real HF ``BertTokenizer`` inside the server
forward (``src/networks/models/pcme.py:32,40-44``); the TPU build
precomputes WordPiece ids in the data pipeline with its own
implementation (creamfl_tpu/data/tokenize.py:BertWordPieceTokenizer).
This test makes the HF slow tokenizer the oracle: a realistic generated
vocab (## continuations, missing pieces forcing [UNK] bail, unicode,
CJK, punctuation) and >=10k adversarial strings must encode to
IDENTICAL padded id/mask rows, mirroring test_native_fuzz.py.

Out of scope (documented): literal special-token strings ("[CLS]" etc.)
inside captions — HF extracts them via a trie before basic
tokenization; COCO captions never contain them.
"""

import random
import string

import pytest

from creamfl_tpu.data.tokenize import BertWordPieceTokenizer

transformers = pytest.importorskip("transformers")

N_STRINGS = 10000
MAX_LEN = 64

STEMS = ("ride skate walk jump play hold stand look surf snowboard "
         "cook eat drink read write paint climb swim run sit").split()
SUFFIXES = ["ing", "ed", "s", "er", "est", "ly", "tion", "es", "e"]
WORDS = ("a the man woman dog cat street bike red blue large small two "
         "three people group plate food table field grass sky water snow "
         "tennis pizza giraffe zebra umbrella kite bench train clock "
         "toilet laptop").split()
ACCENTED = ["café", "naïve", "zürich", "año", "crème", "brûlée",
            "ångström", "TOKYO", "São", "Ĥello", "ÀÉÎÕÜ", "ﬁsh"]
CJK = ["中", "国", "日", "本", "中国", "a中b", "中 国", "日1本"]
PUNCT_CLUSTERS = [".", ",", "!?", "...", "?!?", "--", "&%$", "#@",
                  "(x)", "[y]", "a,b", "x's", "it's!", "\"quoted\"",
                  "semi;colon:", "~tilde~", "«guillemet»", "—emdash—",
                  "…ellipsis…"]
WEIRD_WS = [" ", "　", "\t", "\n", "\r", "  ", " ",
            " "]
CONTROL = ["\x00", "\x07", "�", "\x1b", "​"]


def _rand_word(rng, lo=1, hi=12):
    return "".join(rng.choice(string.ascii_letters)
                   for _ in range(rng.randint(lo, hi)))


def _gen(rng):
    n = rng.randint(0, 14)
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            parts.append(rng.choice(WORDS))
        elif r < 0.45:
            parts.append(rng.choice(STEMS) + rng.choice(SUFFIXES))
        elif r < 0.58:
            parts.append(_rand_word(rng))
        elif r < 0.68:
            parts.append(rng.choice(PUNCT_CLUSTERS))
        elif r < 0.76:
            parts.append(rng.choice(ACCENTED))
        elif r < 0.82:
            parts.append(rng.choice(CJK))
        elif r < 0.88:
            parts.append(str(rng.randint(0, 99999)) +
                         rng.choice(["", ",000", ".5", "km", "%"]))
        elif r < 0.94:
            parts.append(rng.choice(WEIRD_WS))
        else:
            parts.append(rng.choice(CONTROL))
    if n and rng.random() < 0.05:
        parts.append(_rand_word(rng, 101, 140))  # >100-char [UNK] bail
    sep = lambda: rng.choice([" ", " ", " ", "", rng.choice(WEIRD_WS)])
    return sep().join(parts)


def _build_vocab():
    """Realistic partial-coverage WordPiece vocab.

    Gaps are deliberate: 'q'/'##q'/'##z' and digits 6-9 are absent so
    greedy matching must bail to [UNK]; CJK has 中/日 but not 国/本."""
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    letters = [c for c in string.ascii_lowercase if c != "q"]
    toks += letters
    toks += ["##" + c for c in letters if c != "z"]
    toks += list("012345")
    toks += ["##" + d for d in "0123"]
    toks += ["##" + s for s in SUFFIXES]
    toks += STEMS + WORDS
    toks += ["cafe", "naive", "zurich", "ano", "creme", "angstrom",
             "sao", "tokyo", "fi", "##sh"]
    toks += list(".,!?;:()[]\"'-&%$#@~«»—…/")
    toks += ["中", "日"]
    seen, out = set(), []
    for t in toks:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    path = tmp_path_factory.mktemp("wp") / "vocab.txt"
    path.write_text("\n".join(_build_vocab()) + "\n", encoding="utf-8")
    hf = transformers.BertTokenizer(str(path), do_lower_case=True)
    ours = BertWordPieceTokenizer.from_vocab_file(str(path))
    return hf, ours


def test_wordpiece_fuzz_zero_divergence(tokenizers):
    hf, ours = tokenizers
    rng = random.Random(0)
    texts = [_gen(rng) for _ in range(N_STRINGS)]
    texts += ["", " ", " ", "中国日本", "q", "qq qq", "x" * 101,
              "don't stop", "l'étranger", "ﬁsh", "a b",
              "\x00�", "éclair", "MiXeD CaSe WoRds!"]

    mismatches = []
    for t in texts:
        enc = hf(t, truncation=True, max_length=MAX_LEN,
                 padding="max_length")
        ids, mask = ours.encode(t, MAX_LEN)
        if ids != enc["input_ids"] or mask != enc["attention_mask"]:
            mismatches.append((repr(t), ids[:16], enc["input_ids"][:16]))
            if len(mismatches) >= 5:
                break
    assert not mismatches, (
        f"{len(mismatches)}+ diverged of {len(texts)}; first: "
        f"{mismatches[0]}")


def test_wordpiece_fuzz_corpus_is_adversarial(tokenizers):
    """The corpus really exercises [UNK] bail, ## continuations,
    truncation, and unicode (guards against a trivially-easy fuzz)."""
    hf, ours = tokenizers
    rng = random.Random(0)
    texts = [_gen(rng) for _ in range(1000)]
    all_toks = [tok for t in texts for tok in hf.tokenize(t)]
    assert all_toks.count("[UNK]") > 50
    assert sum(tok.startswith("##") for tok in all_toks) > 500
    assert any(len(hf(t)["input_ids"]) > MAX_LEN for t in texts)
    assert "中" in all_toks
