"""Stacked (client-parallel) execution of the public-set phases.

The dominant round cost is each selected client re-walking the 50k
public set for contrast regularization and representation upload
(reference HOT LOOPs 4-5, SURVEY.md §3.2) — the reference runs clients
*sequentially*, swapping models on/off the GPU. Clients of one family
share an architecture and see the *same* public batches, so here their
states stack on a leading [C, ...] axis and one vmapped program advances
all of them per batch — semantics identical to the sequential loop
(client updates are data-independent), wall-clock divided by C on one
chip's utilization headroom and sharded over the mesh's ``client`` axis
on a slice.

Local task epochs stack too (``stacked_task_epoch``): per-client loaders
differ in data and batch count, so clients advance in lock-step over
their own streams and exhausted clients are masked out — a
``jnp.where`` select keeps their state frozen, which is exactly what
the sequential loop computes (client states are independent).
``--no_client_parallel`` remains the sequential parity oracle.

Client-axis lowering (``_client_map``): with a multi-device ``client``
mesh axis the per-client map is a ``jax.vmap`` — one batched program
XLA partitions across devices. On a single device the same map lowers
better as a ``lax.scan`` over the client axis: vmapping per-client conv
*weights* turns every conv into a batch-grouped conv that tiles worse
on the MXU (measured ~25% slower on the img family at paper shapes,
BENCH.md), while scan keeps each client's step a plain dense-conv
program. Both run inside one dispatch; the choice is purely a lowering
decision driven by ``sharding is None``.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from creamfl_tpu.data.loaders import suffix_valid as _suffix_valid
from creamfl_tpu.engine.state import EngineState
from creamfl_tpu.parallel.client_parallel import (_stack_prog,
                                                  stack_states,
                                                  unstack_states)
from creamfl_tpu.parallel.mesh import put_global


def _stack_trees(trees):
    """Stack a list of same-structure pytrees on a new leading axis as
    ONE jitted dispatch (see client_parallel._stack_prog), or pass an
    already-stacked tree through (round-constant trees — MOON old
    params — are stacked once per round by the caller)."""
    if isinstance(trees, (list, tuple)):
        return _stack_prog(tuple(trees))
    return trees

# Batches chained per device dispatch in the contrast epochs. Each
# dispatch of a vmapped client step pays host-side pytree flattening +
# (on a remote device) transport latency; at paper scale that overhead
# dominates the cheap text-client steps (BENCH.md). A lax.scan over a
# chunk amortizes it k-fold; chunking is math-neutral (same step
# sequence).
SCAN_CHUNK = 8


def _uniform_batches(group) -> bool:
    """True iff every batch in the group has the same leading dim —
    the bare ragged final batch (public loaders keep the reference's
    trailing partial batch) must take the per-batch path even when it
    lands inside a full-sized chunk (pub batches % scan_chunk == 0)."""
    def rows(b):
        for v in b.values():
            if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
                return v.shape[0]
        return None

    first = rows(group[0])
    return all(rows(b) == first for b in group[1:])


def _chunks(iterable, k):
    buf = []
    for x in iterable:
        buf.append(x)
        if len(buf) == k:
            yield buf
            buf = []
    if buf:
        yield buf


def _stack_chunk(batches: List[Dict]) -> Dict:
    """[k] list of RAW batch dicts -> dict of [k, ...] arrays.

    Host fields stack on host and cross to the device as ONE transfer
    per field per chunk (a per-batch ``jnp.asarray`` costs ~2 ms of
    dispatch each through the remote-TPU tunnel — 24 of them per chunk
    dominated the text-client sweeps, BENCH.md round-2 probes); device
    fields (device-synthesized images) stack on device. Non-array
    fields (raw caption strings etc.) are dropped, mirroring
    ``rounds._device_batch``."""
    first = batches[0]
    out = {}
    for key in first:
        vals = [b[key] for b in batches]
        if isinstance(first[key], jax.Array):
            out[key] = jnp.stack(vals)
        elif (isinstance(first[key], np.ndarray)
              and first[key].dtype != object):
            out[key] = np.stack(vals)
    return out


def _client_map(fn, in_axes, lowering: str):
    """Map ``fn`` over the stacked [C, ...] client axis.

    ``"vmap"``: one batched program (required for XLA to partition the
    client axis over a multi-device mesh). ``"scan"``: ``lax.scan``
    over clients — still one dispatch, but each iteration is a plain
    per-client program, avoiding the batch-grouped conv lowering that
    costs ~25% on a single chip (module docstring). Arguments whose
    ``in_axes`` entry is 0 are scanned over; everything else is closed
    over (broadcast), matching vmap's ``None`` axes. Outputs stack on a
    leading client axis either way.
    """
    if lowering == "vmap":
        return jax.vmap(fn, in_axes=in_axes)
    assert lowering == "scan", lowering

    def mapped(*args):
        assert len(args) == len(in_axes)
        xs = tuple(a for a, ax in zip(args, in_axes) if ax == 0)

        def body(_, slices):
            it = iter(slices)
            full = [next(it) if ax == 0 else a
                    for a, ax in zip(args, in_axes)]
            return None, fn(*full)

        _, ys = lax.scan(body, None, xs)
        return ys

    return mapped


def _lowering_for(sharding) -> str:
    return "scan" if sharding is None else "vmap"


@functools.lru_cache(maxsize=None)
def _chunk_prog(engine, do_inter: bool, do_intra: bool,
                has_old_bs: bool, lowering: str, g_keys: Tuple[str, str]):
    """Jitted program advancing the stacked clients over one chunk of
    batches (outer ``lax.scan``), the client axis mapped per
    ``lowering``. ``g_keys`` names the two global feature matrices in
    the per-batch globals dict — ``("same","other")`` for uni engines,
    ``("img","txt")`` for mm (the only difference between families)."""
    k0, k1 = g_keys

    def run(stacked, old_params, old_bs, batches, idxs, g0, g1):
        def one(state, old_p, old_b, batch, globals_):
            return engine.contrast_step(state, old_p, old_b, batch,
                                        globals_, do_inter, do_intra)

        vstep = _client_map(one,
                            (0, 0, 0 if has_old_bs else None,
                             None, {k0: None, k1: None,
                                    "index": None}), lowering)

        def body(st, inp):
            batch, idx = inp
            st, loss = vstep(st, old_params, old_bs, batch,
                             {k0: g0, k1: g1, "index": idx})
            return st, loss

        return lax.scan(body, stacked, (batches, idxs))

    return jax.jit(run)


def _uni_chunk_prog(engine, do_inter: bool, do_intra: bool,
                    has_old_bs: bool, lowering: str = "scan"):
    return _chunk_prog(engine, do_inter, do_intra, has_old_bs, lowering,
                       ("same", "other"))


def _mm_chunk_prog(engine, do_inter: bool, do_intra: bool,
                   has_old_bs: bool, lowering: str = "scan"):
    return _chunk_prog(engine, do_inter, do_intra, has_old_bs, lowering,
                       ("img", "txt"))


def _place(tree, sharding):
    """Shard a stacked pytree's leading client axis over the mesh (jit
    then partitions the vmapped program; single-device = no-op)."""
    if sharding is None or tree is None or tree == {}:
        return tree
    return put_global(tree, sharding)


def _place_stacked_batch(batch, sharding):
    """Shard a [C, ...] stacked batch's client axis like the states.
    Off-mesh arrays (committed default-device jax.Arrays, e.g.
    device-synthesized images) alongside mesh-resident states would be
    an incompatible-devices error; host np arrays would work uncommitted
    but an explicit put keeps the transfer deterministic."""
    if sharding is None:
        return batch
    return {k: (put_global(v, sharding)
                if hasattr(v, "ndim") and v.ndim >= 1 else v)
            for k, v in batch.items()}


def _replicate_committed(batch, sharding):
    """Broadcast (client-axis-free) batches: committed jax.Arrays must
    move onto the mesh device set; host np stays uncommitted (jit
    transfers it to whatever layout the program wants)."""
    if sharding is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(sharding.mesh, P())
    return {k: (put_global(v, repl) if isinstance(v, jax.Array)
                else v)
            for k, v in batch.items()}


def _select_state(active, new_state, old_state):
    """Keep ``new_state`` where ``active`` (a scalar bool per vmapped
    client), else freeze the old state — the masked equivalent of 'this
    client's loader is exhausted, skip it'."""
    return jax.tree.map(lambda n, o: jnp.where(active, n, o),
                        new_state, old_state)


@functools.lru_cache(maxsize=None)
def _task_step_prog(engine, mm: bool, lowering: str):
    """Jitted lock-step task program, cached per (engine, mm, lowering)
    — a fresh jit wrapper per epoch would re-trace the client-sized
    program every call (5 epochs x 3 families x N rounds). For mm the
    per-step dropout key is derived INSIDE the program
    (``fold_in(epoch_key, step)``) so the host issues zero extra
    dispatches per step."""
    if mm:
        def one(state, batch, active, ek, step):
            new_state, _ = engine.local_step(
                state, batch, jax.random.fold_in(ek, step))
            return _select_state(active, new_state, state)

        return jax.jit(_client_map(one, (0, 0, 0, 0, None), lowering))

    def one(state, batch, active):
        new_state, _ = engine.task_step(state, batch)
        return _select_state(active, new_state, state)

    return jax.jit(_client_map(one, (0, 0, 0), lowering))


def stacked_task_epoch(engine, states: Sequence[EngineState], loaders,
                       device_batch_fn, mm: bool = False, epoch_keys=None,
                       sharding=None) -> List[EngineState]:
    """One local task epoch for C stacked clients of one family, each on
    its OWN loader (reference HOT LOOP 3, ClientTrainer.py:322-367 /
    MMClientTrainer.py:112-142 run these sequentially per client).

    Clients advance in lock-step; when a client's stream runs out before
    the family max, its slot replays its last batch with ``active=False``
    so the vmapped program keeps a static shape while the select freezes
    its state. ``states`` may be LONGER than ``loaders``: the excess
    slots are sharding pad (a family smaller than the mesh client axis
    pads to it, rounds._group_sharding) and stay permanently inactive.
    ``epoch_keys`` ([C_slots] PRNG keys) seeds per-client dropout
    for mm clients; the per-step key folds in the lock-step index, which
    equals each active client's own batch index, so the sequential
    oracle derives identical keys (rounds._client_epoch_keys).
    ``device_batch_fn`` is kept for API compatibility; batches now stack
    host-side and cross as one transfer per field per step.
    """
    del device_batch_fn
    n_slots = len(states)
    stacked = _place(stack_states(list(states)), sharding)
    iters = [iter(loader) for loader in loaders]
    n_pad = n_slots - len(iters)
    assert n_pad >= 0, (n_slots, len(iters))
    if epoch_keys is not None and sharding is not None:
        epoch_keys = put_global(epoch_keys, sharding)
    vstep = _task_step_prog(engine, mm, _lowering_for(sharding))

    last = [None] * len(iters)
    step = 0
    while True:
        batches, active = [], []
        for i, it in enumerate(iters):
            b = next(it, None)
            if b is None:
                active.append(False)
                batches.append(last[i])
            else:
                active.append(True)
                last[i] = b
                batches.append(b)
        if not any(active):
            break
        # Pad slots replay slot 0's batch, always inactive (select
        # freezes their state; they only exist to even the shard).
        batches += [batches[0]] * n_pad
        active += [False] * n_pad
        if any(b is None for b in batches):  # client with an empty loader
            filler = next(b for b in batches if b is not None)
            batches = [filler if b is None else b for b in batches]
        # Host fields stack on host -> ONE transfer per field per step
        # (per-client jnp.asarray costs ~2 ms dispatch each on a remote
        # device); device fields stack on device.
        stacked_batch = _place_stacked_batch(_stack_chunk(batches),
                                             sharding)
        amask = np.asarray(active)
        if mm:
            stacked = vstep(stacked, stacked_batch, amask, epoch_keys,
                            np.int32(step))
        else:
            stacked = vstep(stacked, stacked_batch, amask)
        step += 1
    return unstack_states(stacked, n_slots)


@functools.lru_cache(maxsize=None)
def _batch_step_prog(engine, do_inter: bool, do_intra: bool,
                     has_old_bs: bool, lowering: str,
                     g_keys: Tuple[str, str]):
    """Jitted single-batch contrast program (the trailing-partial-chunk
    path), cached like ``_chunk_prog`` so per-epoch calls don't
    re-trace."""
    k0, k1 = g_keys

    def one(state, old_p, old_b, batch, globals_):
        return engine.contrast_step(state, old_p, old_b, batch,
                                    globals_, do_inter, do_intra)

    return jax.jit(_client_map(
        one, (0, 0, 0 if has_old_bs else None, None,
              {k0: None, k1: None, "index": None}), lowering))


def _contrast_epoch(engine, states, old_params_list, old_bs_list,
                    pub_loader, g0, g1, batch_rows_fn,
                    do_inter: bool, do_intra: bool, device_batch_fn,
                    sharding, scan_chunk: int,
                    g_keys: Tuple[str, str]) -> List[EngineState]:
    """One contrast epoch for C stacked clients of one family. Full
    chunks of ``scan_chunk`` batches run as one scanned dispatch; the
    trailing partial chunk runs per-batch (identical math). ``g_keys``
    names the global feature mats ``(g0, g1)`` in the engine's globals
    dict — the only uni/mm difference."""
    stacked = _place(stack_states(list(states)), sharding)
    old_params = _place(_stack_trees(old_params_list), sharding)
    has_old_bs = (bool(old_bs_list)
                  and (not isinstance(old_bs_list, (list, tuple))
                       or bool(old_bs_list[0])))
    old_bs = _stack_trees(old_bs_list) if has_old_bs else {}
    old_bs = _place(old_bs, sharding) if old_bs else old_bs

    lowering = _lowering_for(sharding)
    k0, k1 = g_keys
    vstep = _batch_step_prog(engine, do_inter, do_intra, bool(old_bs),
                             lowering, g_keys)
    chunk_prog = _chunk_prog(engine, do_inter, do_intra, bool(old_bs),
                             lowering, g_keys)

    for group in _chunks(pub_loader, max(1, scan_chunk)):
        if (len(group) == scan_chunk and scan_chunk > 1
                and _uniform_batches(group)):
            batches = _replicate_committed(_stack_chunk(group), sharding)
            idxs = np.stack([np.asarray(batch_rows_fn(b)) for b in group])
            stacked, _ = chunk_prog(stacked, old_params,
                                    old_bs if old_bs else None,
                                    batches, idxs, g0, g1)
            continue
        for batch in group:
            globals_ = {k0: g0, k1: g1, "index": batch_rows_fn(batch)}
            stacked, _ = vstep(stacked, old_params,
                               old_bs if old_bs else None,
                               _replicate_committed(device_batch_fn(batch),
                                                    sharding), globals_)
    return unstack_states(stacked, len(states))


def stacked_uni_contrast_epoch(engine, states: Sequence[EngineState],
                               old_params_list, old_bs_list,
                               pub_loader, same, other, batch_rows_fn,
                               do_inter: bool, do_intra: bool,
                               device_batch_fn, sharding=None,
                               scan_chunk: int = SCAN_CHUNK
                               ) -> List[EngineState]:
    return _contrast_epoch(engine, states, old_params_list, old_bs_list,
                           pub_loader, same, other, batch_rows_fn,
                           do_inter, do_intra, device_batch_fn, sharding,
                           scan_chunk, ("same", "other"))


def stacked_mm_contrast_epoch(engine, states: Sequence[EngineState],
                              old_params_list, old_bs_list,
                              pub_loader, g_img, g_txt, batch_rows_fn,
                              do_inter: bool, do_intra: bool,
                              device_batch_fn, sharding=None,
                              scan_chunk: int = SCAN_CHUNK
                              ) -> List[EngineState]:
    return _contrast_epoch(engine, states, old_params_list, old_bs_list,
                           pub_loader, g_img, g_txt, batch_rows_fn,
                           do_inter, do_intra, device_batch_fn, sharding,
                           scan_chunk, ("img", "txt"))


@functools.lru_cache(maxsize=None)
def _feat_prog(engine, lowering: str, uni: bool):
    """Uni rep extraction persists the BN running-stat update
    (features_step returns (feats, new_batch_stats) — reference leaves
    the model in train() mode for this sweep), so the program carries
    the stacked state. mm features are eval-mode and stateless."""
    if uni:
        def one(st, b):
            feats, bs = engine.features_step(st, b)
            return feats, st.replace(batch_stats=bs)

        return jax.jit(_client_map(one, (0, None), lowering))
    return jax.jit(_client_map(engine.features_step, (0, None), lowering))


@functools.lru_cache(maxsize=None)
def _feat_chunk_prog(engine, lowering: str, uni: bool):
    """k stacked batches -> ONE dispatch for the rep sweeps (forward-
    only and dispatch-bound exactly like the contrast chunks; the
    per-step math is ``_feat_prog``'s). Features come back client-major
    ([C, k*B, d]) so callers concatenate chunked and per-batch parts on
    the same axis. Uni threads the stacked states (BN running stats)
    through the scan carry."""
    def fold(f):  # [k, C, B, d] -> [C, k*B, d]
        return jnp.moveaxis(f, 0, 1).reshape(
            f.shape[1], -1, f.shape[-1])

    if uni:
        def one(st, b):
            feats, bs = engine.features_step(st, b)
            return feats, st.replace(batch_stats=bs)

        mapped = _client_map(one, (0, None), lowering)

        def chunk(stacked, batches):
            def body(carry, b):
                feats, new_stacked = mapped(carry, b)
                return new_stacked, feats

            stacked, feats = jax.lax.scan(body, stacked, batches)
            return fold(feats), stacked

        return jax.jit(chunk)

    mapped = _client_map(engine.features_step, (0, None), lowering)

    def chunk(stacked, batches):
        def body(_, b):
            return None, mapped(stacked, b)

        _, (fi, ft) = jax.lax.scan(body, None, batches)
        return fold(fi), fold(ft)

    return jax.jit(chunk)


def _stacked_feats(engine, states, pub_loader, device_batch_fn, sharding,
                   uni: bool):
    """Shared sweep for rep extraction: [list of per-batch stacked
    features], valid-row dataset indices (uni), valid count, and the
    final stacked states (BN stats advance during the uni sweep).
    Uniform multi-batch groups run as one scanned dispatch."""
    stacked = _place(stack_states(list(states)), sharding)
    lowering = _lowering_for(sharding)
    vfeat = _feat_prog(engine, lowering, uni)
    chunk_prog = _feat_chunk_prog(engine, lowering, uni)
    parts, idx_parts, n_valid = [], [], 0

    def meta(batch):
        nonlocal n_valid
        valid = np.asarray(batch["valid"])
        n_valid += _suffix_valid(valid)
        if uni:
            idx_parts.append(np.asarray(batch["index"])[valid])

    for group in _chunks(iter(pub_loader), SCAN_CHUNK):
        if len(group) > 1 and _uniform_batches(group):
            batches = _replicate_committed(_stack_chunk(group), sharding)
            if uni:
                feats, stacked = chunk_prog(stacked, batches)
            else:
                feats = chunk_prog(stacked, batches)
            parts.append(feats)
            for b in group:
                meta(b)
            continue
        for batch in group:
            out = vfeat(stacked,
                        _replicate_committed(device_batch_fn(batch),
                                             sharding))
            if uni:
                feats, stacked = out
            else:
                feats = out
            parts.append(feats)
            meta(batch)
    return parts, idx_parts, n_valid, stacked


def stacked_uni_reps(engine, states: Sequence[EngineState], pub_loader,
                     device_batch_fn, sharding=None
                     ) -> Tuple[jnp.ndarray, np.ndarray,
                                List[EngineState]]:
    """[C, N, d] representations (device-resident — con_w consumes them
    on device; per-batch host fetches would cost a transfer round-trip
    each) + [N] dataset indices + the post-sweep client states (BN
    running stats persist, ClientTrainer.py:552/584)."""
    parts, idx_parts, n_valid, stacked = _stacked_feats(
        engine, states, pub_loader, device_batch_fn, sharding, uni=True)
    reps = jnp.concatenate(parts, axis=1)[:, :n_valid]
    return (reps, np.concatenate(idx_parts),
            unstack_states(stacked, len(states)))


def stacked_mm_reps(engine, states: Sequence[EngineState], pub_loader,
                    device_batch_fn, sharding=None):
    parts, _, n_valid, _ = _stacked_feats(
        engine, states, pub_loader, device_batch_fn, sharding, uni=False)
    img_parts = [fi for fi, _ in parts]
    txt_parts = [ft for _, ft in parts]
    return (jnp.concatenate(img_parts, axis=1)[:, :n_valid],
            jnp.concatenate(txt_parts, axis=1)[:, :n_valid])
