"""Pretrained-weight converters: torch/HF checkpoints -> Flax params.

The reference loads torchvision ImageNet ResNets
(`resnet_client.py:227-231`, `image_encoder.py:24`), HF
``bert-base-uncased`` (`pcme.py:31-33`) and GloVe-840B-300d word vectors
(`caption_encoder.py:60-85`). This environment has no network, so these
converters consume local checkpoint files when present; models fall back
to random init otherwise (flagged by the caller).

All mappings are name-structural (no torchvision/transformers model
objects needed): torch ``state_dict`` tensors are re-laid-out to Flax
conventions (conv OIHW -> HWIO, linear [out,in] -> [in,out], BN
weight/bias/running_* -> scale/bias/mean/var).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _t(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# torchvision ResNet -> ResNetBackbone
# ---------------------------------------------------------------------------

def _conv(sd, key):
    return {"kernel": sd[key + ".weight"].transpose(2, 3, 1, 0)}


def _bn(sd, key):
    params = {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}
    stats = {"mean": sd[key + ".running_mean"],
             "var": sd[key + ".running_var"]}
    return params, stats


def torchvision_resnet_to_flax(sd: Dict[str, np.ndarray]
                               ) -> Tuple[Dict, Dict]:
    """torch state_dict (torchvision naming) -> (params, batch_stats)
    for creamfl_tpu.models.resnet.ResNetBackbone."""
    params: Dict = {}
    stats: Dict = {}
    params["conv1"] = _conv(sd, "conv1")
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    block_re = re.compile(r"^layer(\d+)\.(\d+)\.")
    seen = sorted({m.group(0) for k in sd if (m := block_re.match(k))})
    for prefix in seen:
        stage, block = block_re.match(prefix).groups()
        name = f"layer{stage}_{block}"
        p: Dict = {}
        s: Dict = {}
        for conv_i in (1, 2, 3):
            ck = f"{prefix}conv{conv_i}"
            if ck + ".weight" not in sd:
                continue
            p[f"conv{conv_i}"] = _conv(sd, ck)
            p[f"bn{conv_i}"], s[f"bn{conv_i}"] = _bn(sd,
                                                     f"{prefix}bn{conv_i}")
        if f"{prefix}downsample.0.weight" in sd:
            p["downsample_conv"] = _conv(sd, f"{prefix}downsample.0")
            p["downsample_bn"], s["downsample_bn"] = _bn(
                sd, f"{prefix}downsample.1")
        params[name] = p
        stats[name] = s
    return params, stats


# ---------------------------------------------------------------------------
# HF BERT -> BertEncoder
# ---------------------------------------------------------------------------

def _lin(sd, key):
    return {"kernel": sd[key + ".weight"].T, "bias": sd[key + ".bias"]}


def _ln(sd, key):
    return {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}


def hf_bert_to_flax(sd: Dict[str, np.ndarray], num_layers: int = 12
                    ) -> Dict:
    """HF ``bert-base-uncased`` state_dict -> BertEncoder params."""
    # Strip an optional leading "bert." (BertModel vs BertForX).
    sd = {k[len("bert."):] if k.startswith("bert.") else k: v
          for k, v in sd.items()}
    e = "embeddings."
    params: Dict = {
        "word_embeddings": {
            "embedding": sd[e + "word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd[e + "position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd[e + "token_type_embeddings.weight"]},
        "embeddings_ln": _ln(sd, e + "LayerNorm"),
    }
    for i in range(num_layers):
        b = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "q": _lin(sd, b + "attention.self.query"),
            "k": _lin(sd, b + "attention.self.key"),
            "v": _lin(sd, b + "attention.self.value"),
            "attn_out": _lin(sd, b + "attention.output.dense"),
            "attn_ln": _ln(sd, b + "attention.output.LayerNorm"),
            "ffn_in": _lin(sd, b + "intermediate.dense"),
            "ffn_out": _lin(sd, b + "output.dense"),
            "ffn_ln": _ln(sd, b + "output.LayerNorm"),
        }
    return params


# ---------------------------------------------------------------------------
# GloVe -> word embedding matrix
# ---------------------------------------------------------------------------

def load_glove_embeddings(path: str, vocab, word_dim: int = 300,
                          init: np.ndarray | None = None
                          ) -> Tuple[np.ndarray, int]:
    """Text-format GloVe file -> [V, word_dim] matrix.

    Reproduces the reference's hit-rate trick
    (caption_encoder.py:77-85): on a miss, retry after stripping
    '-', '.', "'" and taking the pre-'/' part. Returns (matrix, n_missing).
    """
    table: Dict[str, np.ndarray] = {}
    wanted = set(vocab.word2idx.keys())
    variants = set()
    for w in wanted:
        v = w.replace("-", "").replace(".", "").replace("'", "")
        if "/" in v:
            v = v.split("/")[0]
        variants.add(v)
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            word = parts[0]
            if word in wanted or word in variants:
                table[word] = np.asarray(parts[1:], np.float32)

    if init is None:
        rng = np.random.default_rng(0)
        mat = rng.normal(0, 0.02,
                         (len(vocab), word_dim)).astype(np.float32)
    else:
        mat = np.array(init, np.float32, copy=True)
    missing = 0
    for word, idx in vocab.word2idx.items():
        key = word
        if key not in table:
            key = word.replace("-", "").replace(".", "").replace("'", "")
            if "/" in key:
                key = key.split("/")[0]
        if key in table:
            mat[idx] = table[key]
        else:
            missing += 1
    return mat, missing
