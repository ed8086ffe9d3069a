"""Out-of-core NALP training: host-resident features streamed per batch.

The MAG240M regime (BASELINE.md; SURVEY §7.4 "Out-of-core graphs"): node
features at 244M x 768 fp32 = 750 GB dwarf a chip's HBM. The reference
holds features in cluster RAM behind GLT's C++ RPC feature store and
fetches per sampled batch (ref: python/gigl/distributed/
dist_link_prediction_dataset.py:428-436 Feature stores; lookups inside the
C++ sampling workers). The TPU-native equivalent here:

  - topology (CSR) + per-node tables stay HOST-side in a HostGraphStore;
    features live in the C++ threaded feature store (gigl_tpu/native/),
    RAM- or mmap-backed (out-of-core);
  - per batch, the HOST builds the tabularized fanout tree and gathers the
    needed feature/aggregate rows (the host sampler is bit-identical to the
    device counter-RNG, so host and device draws coincide);
  - the jit train step takes the gathered arrays as ARGUMENTS — no device
    feature table exists at all;
  - a prefetch pool prepares batch t+1..t+depth while the device runs
    batch t (jax async dispatch overlaps host gather with device compute).

Exact parity: for the same seeds, StreamingNALPTrainer computes the SAME
losses as the device-resident NALPTrainer in tabularized mode
(tests/test_streaming.py) — the streamed arrays are the rows the device
path would have gathered from HBM.

Scope: tabularized mode only (hop cache + frozen sample tables — the
regime where host-side tree construction is deterministic). Hard negatives
stream like the other groups when the store is built with
``hard_neg_edges`` (device-parity draws on the hard-negative CSR).
"""

from __future__ import annotations

import concurrent.futures
from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigl_tpu import native
from gigl_tpu.losses.metrics import hits_at_k, mean_reciprocal_rank
from gigl_tpu.training.dataset import NALPBatch
from gigl_tpu.training.trainer import (
    NALPTrainerConfig,
    TrainState,
    make_optimizer,
    nalp_loss_from_embeddings,
)
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# numpy mirrors of the device counter-RNG (bit-identical)
# ---------------------------------------------------------------------------

def _np_mix32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint32(16)
        x *= np.uint32(0x7FEB352D)
        x ^= x >> np.uint32(15)
        x *= np.uint32(0x846CA68B)
        x ^= x >> np.uint32(16)
    return x


def np_counter_rng_uniform(node_ids: np.ndarray, seed: int, hop: int,
                           num_slots: int) -> np.ndarray:
    """numpy mirror of neighbor_sampler.counter_rng_uniform."""
    node_ids = np.asarray(node_ids)
    slots = np.broadcast_to(
        np.arange(num_slots, dtype=np.uint32),
        node_ids.shape + (num_slots,))
    with np.errstate(over="ignore"):
        base = (node_ids.astype(np.uint32)[..., None] * np.uint32(0x9E3779B9)
                + np.uint32(seed & 0xFFFFFFFF) * np.uint32(0x85EBCA6B)
                + np.uint32(hop & 0xFFFFFFFF) * np.uint32(0xC2B2AE35))
        return _np_mix32(base ^ _np_mix32(slots + np.uint32(0x27220A95)))


def np_sample_fanout(indptr: np.ndarray, indices: np.ndarray,
                     roots: np.ndarray, fanout: int, *, seed: int,
                     hop: int, return_slots: bool = False):
    """numpy mirror of the device uniform sampler (neighbor_sampler.
    sample_neighbors, method="uniform"); used when the C++ engine is
    unavailable. Returns (neighbor_ids [R, fanout], mask [R, fanout])."""
    roots = np.asarray(roots, np.int64)
    start = indptr[roots]
    deg = indptr[roots + 1] - start
    slot_iota = np.broadcast_to(np.arange(fanout, dtype=np.int64),
                                (len(roots), fanout))
    bits = np_counter_rng_uniform(roots, seed, hop, fanout)
    rand_off = (bits % np.maximum(deg, 1)[:, None].astype(np.uint32)).astype(
        np.int64)
    take_all = (deg <= fanout)[:, None]
    offsets = np.where(
        take_all,
        np.minimum(slot_iota, np.maximum(deg - 1, 0)[:, None]),
        rand_off)
    mask = np.where(take_all, slot_iota < deg[:, None], (deg > 0)[:, None])
    slots = np.clip(start[:, None] + offsets, 0, max(len(indices) - 1, 0))
    nbr = indices[slots] if len(indices) else np.zeros_like(slots, np.int32)
    if return_slots:
        return np.where(mask, nbr, 0).astype(np.int32), mask, slots
    return np.where(mask, nbr, 0).astype(np.int32), mask


class _HostTable:
    """Feature rows on host: C++ threaded store when available, numpy
    fallback otherwise; optionally mmap-backed (out-of-core)."""

    def __init__(self, table: np.ndarray):
        self._np = np.ascontiguousarray(table, np.float32)
        self._store = (native.HostFeatureStore(self._np)
                       if native.available() else None)

    @property
    def shape(self):
        return self._np.shape

    def gather(self, idx: np.ndarray) -> np.ndarray:
        if self._store is not None:
            return self._store.gather(idx)
        return self._np[idx]


@dataclass
class HostGraphStore:
    """Host-side graph bundle for streamed training (built once).

    All tables mirror the device tabularized mode: ``agg`` is the hopcache
    aggregate table (ops/hopcache.py semantics), ``sample_tables[k]`` the
    frozen per-node hop samples.
    """

    message_indptr: np.ndarray        # [N+1] int64
    message_indices: np.ndarray       # [E] int32
    supervision_indptr: np.ndarray
    supervision_indices: np.ndarray
    features: _HostTable              # [N, D]
    agg: _HostTable                   # [N, D]
    degrees: np.ndarray               # [N] float32
    sample_tables: Dict[int, Tuple[np.ndarray, np.ndarray]]
    num_nodes: int
    # Optional user-defined hard-negative CSR (ref UDL hard negs,
    # training_samples_schema.proto hard_neg edges).
    hard_neg_indptr: Optional[np.ndarray] = None
    hard_neg_indices: Optional[np.ndarray] = None
    # Supervision / hard-negative LABEL edge features in CSR slot order
    # (ref nalp_data_loader.py:44-46 label_edge_features): hydrated per
    # sampled positive/hard negative into the streamed batch.
    sup_edge_features: Optional[np.ndarray] = None
    hard_neg_edge_features: Optional[np.ndarray] = None
    # Node labels [N] int (supervised node classification over the
    # streamed store; stay DEVICE-side row-sharded — label bytes are
    # O(N), adjacency-scale, not feature-scale).
    node_labels: Optional[np.ndarray] = None

    @classmethod
    def build(
        cls,
        *,
        message_edges: np.ndarray,       # [2, E] (src, dst); sampled on dst
        supervision_edges: np.ndarray,   # [2, Es]
        features: np.ndarray,            # [N, D] (may be np.memmap)
        num_nodes: int,
        fanouts: Sequence[int],
        seed: int = 0,
        agg: str = "mean",
        hard_neg_edges: Optional[np.ndarray] = None,  # [2, Eh]
        supervision_edge_features: Optional[np.ndarray] = None,  # [Es, De]
        hard_neg_edge_features: Optional[np.ndarray] = None,     # [Eh, De]
        node_labels: Optional[np.ndarray] = None,                # [N] int
    ) -> "HostGraphStore":
        from gigl_tpu.graph.csr import build_csr

        msg = build_csr(message_edges[0], message_edges[1],
                        num_anchor_nodes=num_nodes,
                        num_neighbor_nodes=num_nodes, anchor="dst")
        sup = build_csr(supervision_edges[0], supervision_edges[1],
                        num_anchor_nodes=num_nodes,
                        num_neighbor_nodes=num_nodes, anchor="dst")
        sup_ef = None
        if supervision_edge_features is not None:
            sup_ef = np.ascontiguousarray(
                np.asarray(supervision_edge_features, np.float32)[
                    sup.edge_ids])
        hn_ip = hn_ix = None
        hn_ef = None
        if hard_neg_edges is not None:
            hn = build_csr(hard_neg_edges[0], hard_neg_edges[1],
                           num_anchor_nodes=num_nodes,
                           num_neighbor_nodes=num_nodes, anchor="dst")
            hn_ip = hn.indptr.astype(np.int64)
            hn_ix = hn.indices.astype(np.int32)
            if hard_neg_edge_features is not None:
                hn_ef = np.ascontiguousarray(
                    np.asarray(hard_neg_edge_features, np.float32)[
                        hn.edge_ids])
        elif hard_neg_edge_features is not None:
            raise ValueError("hard_neg_edge_features needs hard_neg_edges")
        degrees = np.diff(msg.indptr).astype(np.float32)
        store = cls(
            node_labels=(np.asarray(node_labels, np.int32)
                         if node_labels is not None else None),
            hard_neg_indptr=hn_ip,
            hard_neg_indices=hn_ix,
            sup_edge_features=sup_ef,
            hard_neg_edge_features=hn_ef,
            message_indptr=msg.indptr.astype(np.int64),
            message_indices=msg.indices.astype(np.int32),
            supervision_indptr=sup.indptr.astype(np.int64),
            supervision_indices=sup.indices.astype(np.int32),
            features=_HostTable(features),
            agg=_HostTable(np.zeros((num_nodes, features.shape[1]),
                                    np.float32)),
            degrees=degrees,
            sample_tables={},
            num_nodes=num_nodes,
        )
        store.refresh(fanouts=fanouts, seed=seed, agg=agg)
        return store

    # -- tabularized tables (host-built, device-parity draws) ----------------
    def _sample(self, roots, fanout, seed, hop):
        if native.available():
            nbr, mask, _ = native.sample_fanout_native(
                self.message_indptr, self.message_indices,
                np.asarray(roots, np.int32), fanout, seed=seed, hop=hop)
            return nbr, mask
        return np_sample_fanout(self.message_indptr, self.message_indices,
                                roots, fanout, seed=seed, hop=hop)

    def refresh(self, *, fanouts: Sequence[int], seed: int,
                agg: str = "mean", chunk: int = 65536) -> None:
        """(Re)build hopcache aggregate + frozen sample tables — host
        analog of DeviceGraph.with_neighbor_cache."""
        self.agg_kind = agg  # recorded so refresh_cache(epoch) re-uses it
        n, k_deep = self.num_nodes, int(fanouts[-1])
        hop_key = len(fanouts)
        d = self.features.shape[1]
        out = np.empty((n, d), np.float32)
        for s in range(0, n, chunk):
            ids = np.arange(s, min(s + chunk, n), dtype=np.int32)
            nbr, mask = self._sample(ids, k_deep, seed, hop_key)
            x = self.features.gather(nbr)                      # [C, k, D]
            m = mask[..., None].astype(np.float32)
            if agg == "mean":
                cnt = np.maximum(m.sum(1), 1.0)
                out[s: s + len(ids)] = (x * m).sum(1) / cnt
            elif agg == "sum":
                out[s: s + len(ids)] = (x * m).sum(1)
            elif agg == "gcn":
                w = 1.0 / np.sqrt(self.degrees[nbr] + 1.0)
                out[s: s + len(ids)] = (x * w[..., None] * m).sum(1)
            else:
                raise ValueError(f"unknown agg {agg!r}")
        self.agg = _HostTable(out)
        self.sample_tables = {}
        for k in sorted(set(int(k) for k in fanouts[:-1])):
            ids_t = np.empty((n, k), np.int32)
            mask_t = np.empty((n, k), bool)
            for s in range(0, n, chunk):
                ids = np.arange(s, min(s + chunk, n), dtype=np.int32)
                ids_t[s: s + len(ids)], mask_t[s: s + len(ids)] = (
                    self._sample(ids, k, seed, 1))
            self.sample_tables[k] = (ids_t, mask_t)


class GroupArrays(NamedTuple):
    """Per-encode-group streamed inputs (one tree of L levels)."""

    feats: Tuple[np.ndarray, ...]    # level d: [M, k1..kd, D]
    cached: Tuple[np.ndarray, ...]
    masks: Tuple[np.ndarray, ...]
    degs: Tuple[np.ndarray, ...]


class StreamedBatch(NamedTuple):
    ids: NALPBatch
    q: GroupArrays
    pos: GroupArrays
    rand: GroupArrays
    hard: Optional[GroupArrays] = None


class StreamingNALPTrainer:
    """NALP trainer over a HostGraphStore (features never resident on
    device). Same config/loss/eval semantics as NALPTrainer in tabularized
    mode; exact loss parity tested."""

    def __init__(self, model, store: HostGraphStore,
                 config: NALPTrainerConfig,
                 optimizer_args: Optional[Dict[str, Any]] = None,
                 stream_dtype: Optional[str] = None,
                 mesh=None, axis: Optional[str] = None):
        """``stream_dtype``: "bfloat16" halves the host->device feature
        transfer (the streamed-path bottleneck: PCIe on real hosts); the
        encoder upcasts to its compute dtype. Default: float32 (exact
        parity with the device-resident path).

        ``mesh``: optional jax.sharding.Mesh — MULTI-CHIP streamed
        training (the MAG240M recipe: cluster-RAM features + a whole pod
        slice, the analog of GLT's feature store feeding torch-DDP
        workers, ref dist_link_prediction_dataset.py:428-436). Every
        streamed batch array is device_put sharded over ``axis`` on its
        leading (root) dim — anchors, positives, hard negatives AND the
        shared random negatives (each chip encodes its R/P slice); params
        replicated. The loss stays the single global-batch computation, so
        XLA inserts the candidate all-gather and the gradient all-reduce
        (DDP analog) automatically. Loss trajectories are EXACTLY the
        single-chip streamed ones (same host draws, same math, sharded
        execution) — tested in tests/test_streaming.py."""
        if config.num_hard_negs and store.hard_neg_indptr is None:
            raise ValueError("num_hard_negs > 0 needs a store built with "
                             "hard_neg_edges")
        self.model = model
        self.store = store
        self.cfg = config
        from gigl_tpu.utils.cast import answer_cast_from_str

        # Vectorized f32->bf16 (ml_dtypes astype is a scalar loop).
        self._stream_np_dtype, self._stream_cast = answer_cast_from_str(
            stream_dtype)
        self.mesh = mesh
        self._data_sh = self._repl_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gigl_tpu.parallel.mesh import DATA_AXIS

            axis = axis or DATA_AXIS
            self._n_shards = int(mesh.shape[axis])
            if config.num_random_negs % self._n_shards:
                raise ValueError("num_random_negs must divide the mesh "
                                 "axis size")
            self._data_sh = NamedSharding(mesh, P(axis))
            self._repl_sh = NamedSharding(mesh, P())
        self.tx = make_optimizer(optimizer_args or {})
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    def _put_batch(self, batch: StreamedBatch) -> StreamedBatch:
        """Shard every streamed array over the mesh data axis (leading =
        root dim); no-op without a mesh (jit moves host arrays itself)."""
        if self.mesh is None:
            return batch
        b = int(np.asarray(batch.ids.anchors).shape[0])
        if b % self._n_shards:
            raise ValueError(
                f"batch size {b} not divisible by the {self._n_shards}-"
                f"shard mesh axis (streamed arrays are sharded on the "
                f"root dim)")

        def put(x):
            return jax.device_put(np.asarray(x), self._data_sh)

        def put_group(g: Optional[GroupArrays]):
            if g is None:
                return None
            return GroupArrays(
                feats=tuple(put(x) for x in g.feats),
                cached=tuple(put(x) for x in g.cached),
                masks=tuple(put(x) for x in g.masks),
                degs=tuple(put(x) for x in g.degs))

        ids = batch.ids
        h = ids.hard_neg
        ids = NALPBatch(
            anchors=put(ids.anchors), pos=put(ids.pos),
            pos_mask=put(ids.pos_mask),
            hard_neg=put(h) if h.shape[-1] else jax.device_put(
                np.asarray(h), self._repl_sh),
            hard_neg_mask=put(ids.hard_neg_mask) if h.shape[-1]
            else jax.device_put(np.asarray(ids.hard_neg_mask),
                                self._repl_sh),
            random_neg=put(ids.random_neg),
            pos_edge_feats=(put(ids.pos_edge_feats)
                            if ids.pos_edge_feats is not None else None),
            hard_neg_edge_feats=(put(ids.hard_neg_edge_feats)
                                 if ids.hard_neg_edge_feats is not None
                                 else None))
        return StreamedBatch(ids=ids, q=put_group(batch.q),
                             pos=put_group(batch.pos),
                             rand=put_group(batch.rand),
                             hard=put_group(batch.hard))

    # -- host batch assembly --------------------------------------------------
    def _tree(self, roots: np.ndarray) -> GroupArrays:
        fanouts = self.cfg.fanouts[:-1]
        dt = self._stream_np_dtype
        if native.available():
            # Fused native assembly (native gigl_expand_gather — the GLT
            # async-worker analog): each level's frontier expansion AND the
            # three table gathers (features / hopcache aggregate / degrees)
            # happen in one threaded C++ pass, no numpy temporaries.
            feats_np = self.store.features._np
            agg_np = self.store.agg._np
            degs_np = self.store.degrees
            frontier = roots.reshape(-1).astype(np.int32)
            ids, mask, f, a, d = native.expand_gather(
                frontier, None, None, None, feats_np, agg_np, degs_np)
            feats, cached, masks, degs = [f], [a], [mask], [d]
            levels = [ids]
            parent = mask
            for k in fanouts:
                ids_t, mask_t = self.store.sample_tables[int(k)]
                ids, mask, f, a, d = native.expand_gather(
                    levels[-1], parent, ids_t, mask_t,
                    feats_np, agg_np, degs_np)
                levels.append(ids)
                masks.append(mask)
                feats.append(f)
                cached.append(a)
                degs.append(d)
                parent = mask
            return GroupArrays(
                feats=tuple(self._stream_cast(x) for x in feats),
                cached=tuple(self._stream_cast(x) for x in cached),
                masks=tuple(masks),
                degs=tuple(degs),
            )
        levels = [roots.reshape(-1).astype(np.int32)]
        masks = [np.ones(levels[0].shape, bool)]
        frontier, parent = levels[0], masks[0]
        for k in fanouts:
            ids_t, mask_t = self.store.sample_tables[int(k)]
            nbr = ids_t[frontier]
            m = mask_t[frontier] & parent[..., None]
            nbr = np.where(m, nbr, 0)
            levels.append(nbr)
            masks.append(m)
            frontier, parent = nbr, m
        return GroupArrays(
            feats=tuple(self._stream_cast(self.store.features.gather(l))
                        for l in levels),
            cached=tuple(self._stream_cast(self.store.agg.gather(l))
                         for l in levels),
            masks=tuple(masks),
            degs=tuple(self.store.degrees[l] for l in levels),
        )

    def prepare_batch(self, anchors: np.ndarray, step: int) -> StreamedBatch:
        """Host-side batch assembly: positives + shared random negatives
        (device-parity counter-RNG draws) and the three streamed trees."""
        cfg = self.cfg
        anchors = np.asarray(anchors, np.int32)
        if native.available():
            pos, pos_mask, pos_slots = native.sample_fanout_native(
                self.store.supervision_indptr, self.store.supervision_indices,
                anchors, cfg.num_positives,
                seed=cfg.seed, hop=1_000_003 + step)
        else:
            pos, pos_mask, pos_slots = np_sample_fanout(
                self.store.supervision_indptr, self.store.supervision_indices,
                anchors, cfg.num_positives,
                seed=cfg.seed, hop=1_000_003 + step, return_slots=True)
        pos_ef = None
        if self.store.sup_edge_features is not None:
            pos_ef = np.where(
                pos_mask[..., None],
                self.store.sup_edge_features[pos_slots], 0.0
            ).astype(self._stream_np_dtype, copy=False)
        bits = np_counter_rng_uniform(
            np.arange(cfg.num_random_negs, dtype=np.int32),
            cfg.seed, 3_000_017 + step, 1)[:, 0]
        rand = (bits % np.uint32(self.store.num_nodes)).astype(np.int32)
        hard_tree = None
        hard_ef = None
        if cfg.num_hard_negs > 0:
            # Device-parity draw (dataset.py sample_batch: hop 2_000_003+step
            # on the hard-negative CSR).
            if native.available():
                h, h_mask, h_slots = native.sample_fanout_native(
                    self.store.hard_neg_indptr, self.store.hard_neg_indices,
                    anchors, cfg.num_hard_negs,
                    seed=cfg.seed, hop=2_000_003 + step)
            else:
                h, h_mask, h_slots = np_sample_fanout(
                    self.store.hard_neg_indptr, self.store.hard_neg_indices,
                    anchors, cfg.num_hard_negs,
                    seed=cfg.seed, hop=2_000_003 + step, return_slots=True)
            if self.store.hard_neg_edge_features is not None:
                hard_ef = np.where(
                    h_mask[..., None],
                    self.store.hard_neg_edge_features[h_slots], 0.0
                ).astype(self._stream_np_dtype, copy=False)
            h = np.where(h_mask, h, 0)
            hard_tree = self._tree(h)
        else:
            h = np.zeros((len(anchors), 0), np.int32)
            h_mask = h.astype(bool)
        ids = NALPBatch(anchors=anchors, pos=pos, pos_mask=pos_mask,
                        hard_neg=h, hard_neg_mask=h_mask,
                        random_neg=rand, pos_edge_feats=pos_ef,
                        hard_neg_edge_feats=hard_ef)
        return StreamedBatch(ids=ids, q=self._tree(anchors),
                             pos=self._tree(pos), rand=self._tree(rand),
                             hard=hard_tree)

    # -- device steps ---------------------------------------------------------
    def _encode_group(self, params, g: GroupArrays, out_shape, train, rng):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        emb = self.model.apply(
            params, [jnp.asarray(f) for f in g.feats],
            [jnp.asarray(m) for m in g.masks], None, train=train,
            hop_degrees=[jnp.asarray(d) for d in g.degs],
            cached_agg=[jnp.asarray(c) for c in g.cached], rngs=rngs)
        return emb.reshape(out_shape + (emb.shape[-1],))

    def _train_step_impl(self, state: TrainState, batch: StreamedBatch,
                         rng: jax.Array):
        ids = batch.ids
        B, P = ids.pos.shape

        def loss_fn(p):
            q = self._encode_group(p, batch.q, (B,), True, rng)
            pos = self._encode_group(p, batch.pos, (B, P), True, rng)
            rand = self._encode_group(
                p, batch.rand, (ids.random_neg.shape[0],), True, rng)
            hard = None
            if batch.hard is not None:
                hard = self._encode_group(
                    p, batch.hard, ids.hard_neg.shape, True, rng)
            return nalp_loss_from_embeddings(
                self.model, p, self.cfg, ids, q, pos, hard, rand, state.cms)

        (loss, cms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, cms=cms), loss

    def _eval_step_impl(self, params, batch: StreamedBatch):
        """Same ranking semantics as NALPTrainer._eval_step_impl."""
        ids = batch.ids
        B, P = ids.pos.shape
        q = self._encode_group(params, batch.q, (B,), False, None)
        pos = self._encode_group(params, batch.pos, (B, P), False, None)
        rand = self._encode_group(
            params, batch.rand, (ids.random_neg.shape[0],), False, None)
        pos_scores = self.model.apply(
            params, q[:, None, :], pos, method="decode")
        rand_scores = self.model.apply(
            params, q, rand, method="decode_all_pairs")
        pos_flat = pos_scores.reshape(-1)
        mask_flat = ids.pos_mask.reshape(-1)
        neg_rep = jnp.repeat(rand_scores, P, axis=0)
        acc = (ids.pos.reshape(-1)[:, None] == ids.random_neg[None, :])
        rr_sum, rr_cnt = mean_reciprocal_rank(
            pos_flat, neg_rep, pos_mask=mask_flat, neg_mask=~acc)
        hits, _ = hits_at_k(pos_flat, neg_rep, self.cfg.eval_ks,
                            pos_mask=mask_flat, neg_mask=~acc)
        return rr_sum, hits, rr_cnt

    # -- public API -----------------------------------------------------------
    def init_state(self, rng: jax.Array, batch_size: int) -> TrainState:
        batch = self.prepare_batch(
            np.zeros((batch_size,), np.int32), step=0)
        init_kwargs = dict(
            hop_degrees=[jnp.asarray(d) for d in batch.q.degs],
            cached_agg=[jnp.asarray(c) for c in batch.q.cached])
        if hasattr(type(self.model), "warmup"):
            init_kwargs["method"] = "warmup"
            if self.store.sup_edge_features is not None:
                init_kwargs["label_edge_feats"] = jnp.zeros(
                    (1, self.store.sup_edge_features.shape[-1]),
                    jnp.float32)
        params = self.model.init(
            rng, [jnp.asarray(f) for f in batch.q.feats],
            [jnp.asarray(m) for m in batch.q.masks], None, **init_kwargs)
        from gigl_tpu.losses.count_min_sketch import cms_init

        cms = cms_init() if self.cfg.use_cms_correction else None
        state = TrainState(params=params, opt_state=self.tx.init(params),
                           step=jnp.zeros((), jnp.int32), cms=cms)
        if self.mesh is not None:
            from gigl_tpu.parallel.mesh import put_replicated

            state = put_replicated(state, self.mesh)
        return state

    def train_step(self, state, batch: StreamedBatch, rng):
        return self._train_step(state, self._put_batch(batch), rng)

    def run_steps(self, state: TrainState, anchor_batches: np.ndarray,
                  rng: jax.Array, *, start_step: int = 0,
                  prefetch: int = 2) -> Tuple[TrainState, np.ndarray]:
        """Run len(anchor_batches) steps with host-side prefetch: batch
        t+1..t+prefetch are assembled (sample + gather) in a worker pool
        while the device executes batch t (jax async dispatch)."""
        K = len(anchor_batches)
        rngs = jax.random.split(rng, K)
        losses = []
        with concurrent.futures.ThreadPoolExecutor(
                max_workers=max(prefetch, 1)) as pool:
            futs = {
                i: pool.submit(self.prepare_batch, anchor_batches[i],
                               start_step + i)
                for i in range(min(prefetch + 1, K))
            }
            for i in range(K):
                batch = futs.pop(i).result()
                nxt = i + prefetch + 1
                if nxt < K:
                    futs[nxt] = pool.submit(
                        self.prepare_batch, anchor_batches[nxt],
                        start_step + nxt)
                state, loss = self._train_step(state, self._put_batch(batch),
                                               rngs[i])
                losses.append(loss)
        return state, np.asarray(
            [float(l) for l in jax.device_get(losses)])

    def evaluate(self, params, anchor_batches, *, step: int = 0):
        rr_total = cnt_total = 0.0
        hits_total = {k: 0.0 for k in self.cfg.eval_ks}
        for i, anchors in enumerate(anchor_batches):
            batch = self.prepare_batch(np.asarray(anchors, np.int32),
                                       step=7_777_777 + step + i)
            rr, hits, cnt = self._eval_step(params, self._put_batch(batch))
            rr_total += float(rr)
            cnt_total += float(cnt)
            for k in self.cfg.eval_ks:
                hits_total[k] += float(hits[int(k)])
        cnt_total = max(cnt_total, 1.0)
        out = {"mrr": rr_total / cnt_total}
        for k in self.cfg.eval_ks:
            out[f"hits@{k}"] = hits_total[k] / cnt_total
        return out
