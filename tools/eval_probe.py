"""Pin the paper-round retrieval-eval phase (VERDICT r2 weak #5).

PAPER_ROUND.json showed an unexplained 8.7 s vs 19.6 s swing on the
eval phase between otherwise comparable paper-round columns. This probe
re-measures the phase in isolation at the exact paper geometry
(R101+BERT server, 25k-caption / 5k-image retrieval test set,
device-synthesized 224px images, bf16) >=5 times on the live chip and
attributes the cost:

  extract — the eval_step loop over the test loader (chip compute +
            per-batch dispatch on the tunnel)
  align   — host-side dedup/ordering of the extracted features
  rank    — crossfold + full recall ranking (chip matmuls + host argsort)
  rtt     — the tunnel round-trip floor (bench._rtt), for attribution

Reference scope: eval_coco.py:392-448 (COCOEvaluator.evaluate inside
the round schedule).

Usage: python tools/eval_probe.py [--reps 6] [--test_size 25000]
Writes eval_pinned into PAPER_ROUND.json unless --no_write.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types

import jax
import numpy as np

sys.path.insert(0, ".")

from bench import _rtt  # noqa: E402


def build(test_size: int):
    from creamfl_tpu.config import default_config_path, parse_config
    from creamfl_tpu.data.pipelines import build_synthetic_datasets
    from creamfl_tpu.engine.server import ServerEngine
    from creamfl_tpu.engine.evaluator import RetrievalEvaluator
    from creamfl_tpu.models.bert import BertConfig

    from creamfl_tpu.data.tokenize import BertWordPieceTokenizer

    args = types.SimpleNamespace(batch_size=64, num_img_clients=0,
                                 num_txt_clients=0, num_mm_clients=0,
                                 seed=0, not_bert=False)
    # Paper-scale test split only (main.py paper_scale dict); the public
    # set is shrunk to keep probe startup cheap — eval never touches it.
    datasets = build_synthetic_datasets(
        args, pub_size=256, image_size=224, max_len=32,
        client_data_size=1, test_size=64, retrieval_test_size=test_size,
        cache=True, prefetch=2, device_images=True,
        pub_batch_size=128, pub_eval_batch_size=256,
        bert_tokenizer=BertWordPieceTokenizer.synthetic())

    cfg = parse_config(default_config_path("coco.yaml"), strict_cast=False)
    cfg.model.embed_dim = 256
    cfg.model.cnn_type = "resnet101"
    cfg.model.not_bert = False
    cfg.train.use_bf16 = True
    server = ServerEngine(cfg, vocab_size=30522, bert_config=BertConfig())
    sample = next(iter(datasets["test"]))
    state = server.init_state(jax.random.PRNGKey(0), sample)
    evaluator = RetrievalEvaluator(
        n_crossfolds=datasets.get("n_crossfolds", 5),
        n_images_per_crossfold=datasets.get("n_images_per_crossfold",
                                            1000),
        n_captions_per_crossfold=datasets.get("n_captions_per_crossfold",
                                              5000))
    return datasets, server, state, evaluator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--test_size", type=int, default=25000)
    ap.add_argument("--no_write", action="store_true")
    ap.add_argument("--no_chunked", action="store_true",
                    help="bypass the chunked extractor (round-3 path)")
    ap.add_argument("--key", default="eval_pinned_r5",
                    help="PAPER_ROUND.json key to write")
    a = ap.parse_args()

    datasets, server, state, ev = build(a.test_size)

    def extract_fn(batch):
        captions, lengths, bert_mask = server._text_inputs(batch)
        return server.eval_step(state, batch["images"], captions,
                                lengths, bert_mask)

    def extract_chunk_fn(group):
        # Mirrors MMFL._extract_eval_chunk (rounds.py): stack k uniform
        # batches, one eval_chunk dispatch, flatten.
        import jax.numpy as jnp
        imgs = [b["images"] for b in group]
        images = (jnp.stack(imgs) if isinstance(imgs[0], jax.Array)
                  else np.stack(imgs))
        caps, lens, masks = zip(*(server._text_inputs_host(b)
                                  for b in group))
        bert_mask = np.stack(masks) if masks[0] is not None else None
        fi, ft = server.eval_chunk(state, images, np.stack(caps),
                                   np.stack(lens), bert_mask)
        dim = fi.shape[-1]
        return fi.reshape(-1, dim), ft.reshape(-1, dim)

    chunk_fn = None if a.no_chunked else extract_chunk_fn

    reps = []
    for rep in range(a.reps):
        t0 = time.perf_counter()
        feats = ev.extract_features(datasets["test"], extract_fn,
                                    extract_chunk_fn=chunk_fn)
        t1 = time.perf_counter()
        scores = {}
        if len(feats["image_features"]) >= (ev.n_crossfolds
                                            * ev.n_images_per_crossfold):
            scores["n_fold"] = ev.evaluate_n_fold(feats)
        scores["i2t"] = ev.evaluate_recall(
            feats["image_features"], feats["caption_features"],
            feats["image_classes"], feats["caption_classes"])
        scores["t2i"] = ev.evaluate_recall(
            feats["caption_features"], feats["image_features"],
            feats["caption_classes"], feats["image_classes"])
        t2 = time.perf_counter()
        reps.append({"extract_s": round(t1 - t0, 3),
                     "rank_s": round(t2 - t1, 3),
                     "total_s": round(t2 - t0, 3)})
        print(f"rep {rep}: {reps[-1]}  rsum="
              f"{scores['i2t']['rsum'] + scores['t2i']['rsum']:.1f}",
              flush=True)

    steady = reps[1:] if len(reps) > 1 else reps  # rep 0 pays compiles
    totals = sorted(r["total_s"] for r in steady)
    payload = {
        "reps": reps,
        "median_total_s": totals[len(totals) // 2],
        "min_total_s": totals[0],
        "max_total_s": totals[-1],
        "median_extract_s": sorted(
            r["extract_s"] for r in steady)[len(steady) // 2],
        "median_rank_s": sorted(
            r["rank_s"] for r in steady)[len(steady) // 2],
        "tunnel_rtt_s": round(_rtt(), 4),
        "test_size": a.test_size,
        "chunked_extract": not a.no_chunked,
        "note": "rep 0 includes compiles and is excluded from the "
                "medians; extract = eval_step loop + host dedup, rank = "
                "crossfolds + full recalls",
    }
    print(json.dumps(payload))
    if not a.no_write:
        with open("PAPER_ROUND.json") as f:
            pr = json.load(f)
        pr[a.key] = payload
        with open("PAPER_ROUND.json", "w") as f:
            json.dump(pr, f, indent=1)


if __name__ == "__main__":
    main()
