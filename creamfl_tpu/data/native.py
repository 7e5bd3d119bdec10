"""ctypes bindings for the native data-path kernels (native/).

Loads ``libcreamfl_native.so`` when present (build with
``make -C native``); every function has a pure-Python fallback so the
framework runs without the native library. ``available()`` reports which
path is active.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Sequence, Tuple

import numpy as np

_LIB = None


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libcreamfl_native.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.vocab_create.restype = ctypes.c_void_p
    lib.vocab_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.vocab_free.argtypes = [ctypes.c_void_p]
    lib.vocab_lookup.restype = ctypes.c_int32
    lib.vocab_lookup.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.tokenize_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int32, ctypes.c_float, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.normalize_images.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.pad_collate.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree. Returns availability."""
    import subprocess

    native_dir = os.path.dirname(_lib_path())
    try:
        subprocess.run(["make", "-C", native_dir],
                       check=True,
                       capture_output=quiet)
    except (OSError, subprocess.CalledProcessError):
        return False
    global _LIB
    _LIB = None
    return available()


class NativeVocab:
    """Native hash-map vocab bound to a python Vocabulary.

    Picklable: the CDLL handle and the C vocab pointer are process-
    local, so pickling ships only the python Vocabulary and the handle
    rebuilds lazily in the receiving process (grain worker_count>0
    pickles datasets — and through them this object — into fresh
    worker processes at loader construction)."""

    def __init__(self, vocab):
        self._vocab = vocab
        self._bind(vocab)

    def _bind(self, vocab):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        words = list(vocab.word2idx.keys())
        ids = np.asarray([vocab.word2idx[w] for w in words], np.int32)
        arr = (ctypes.c_char_p * len(words))(
            *[w.encode("utf-8") for w in words])
        self._handle = lib.vocab_create(
            arr, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(words), vocab("<start>"), vocab("<end>"), vocab("<unk>"))

    def __getstate__(self):
        return {"_vocab": self._vocab}

    def __setstate__(self, state):
        self._vocab = state["_vocab"]
        self._bind(self._vocab)

    def __del__(self):
        try:
            self._lib.vocab_free(self._handle)
        except Exception:
            pass

    def lookup(self, word: str) -> int:
        return int(self._lib.vocab_lookup(self._handle,
                                          word.encode("utf-8")))

    def tokenize_batch(self, texts: Sequence[str], max_len: int,
                       caption_drop_prob: float = 0.0,
                       seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        n = len(texts)
        out_ids = np.zeros((n, max_len), np.int32)
        out_lens = np.zeros((n,), np.int32)
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        self._lib.tokenize_batch(
            self._handle, arr, n, max_len,
            ctypes.c_float(caption_drop_prob), ctypes.c_uint64(seed),
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out_ids, out_lens


def normalize_images(images_u8: np.ndarray, mean: np.ndarray,
                     std: np.ndarray) -> np.ndarray:
    """uint8 [..., 3] -> float32 normalized; native when available."""
    lib = _load()
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if lib is None:
        return ((images_u8.astype(np.float32) / 255.0) - mean) / std
    images_u8 = np.ascontiguousarray(images_u8, np.uint8)
    out = np.empty(images_u8.shape, np.float32)
    n_pixels = images_u8.size // 3
    lib.normalize_images(
        images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_pixels),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def pad_collate(seqs: List[np.ndarray], max_len: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """List of int32 1-D arrays -> (padded [n, max_len], lengths)."""
    lib = _load()
    n = len(seqs)
    if lib is None:
        out = np.zeros((n, max_len), np.int32)
        lens = np.zeros((n,), np.int32)
        for i, s in enumerate(seqs):
            s = np.asarray(s, np.int32)[:max_len]
            out[i, :len(s)] = s
            lens[i] = len(s)
        return out, lens
    flat = np.ascontiguousarray(np.concatenate(
        [np.asarray(s, np.int32) for s in seqs]) if n else
        np.zeros((0,), np.int32))
    in_lens = np.asarray([len(s) for s in seqs], np.int32)
    out = np.zeros((n, max_len), np.int32)
    out_lens = np.zeros((n,), np.int32)
    lib.pad_collate(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        in_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, max_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, out_lens
