"""Sampled NALP training over a graph PARTITIONED across the device mesh.

This is the TPU-native equivalent of the reference's v2 "GLT" distributed
regime (SURVEY.md §2.2): there, the graph is partitioned across machines'
RAM (dist_link_prediction_data_partitioner.py:78), live neighbor sampling
runs in GLT's C++ RPC workers, and feature rows owned by other machines are
fetched over torch RPC during every batch
(distributed_neighborloader.py:26, dist_link_prediction_dataset.py:31).

Here every per-chip HBM holds only its 1/P range of the graph —
feature rows, message/supervision CSR adjacency — and each training step is
one SPMD program under ``shard_map``:

  - frontier expansion = ``routed_sample_neighbors`` (frontier ids all_to_all
    to their owner shard, owner draws fanout slots with the SAME counter RNG
    as the single-chip sampler, results all_to_all back),
  - feature hydration = ONE ``routed_gather`` over the union of all three
    encode trees (anchors / positives / shared random negatives) — the
    analog of GLT's per-batch feature RPC burst, but as two all_to_all
    collectives riding ICI,
  - random negatives are drawn identically on every shard (counter RNG keyed
    by step), each shard ENCODES its R/P slice, and the candidate embeddings
    are all_gathered — batch-shared negatives across the global batch,
    matching the reference contract (Appendix A.2),
  - gradients/metrics are ``pmean``-reduced (the DDP all-reduce).

Parity: with capacity sized so no request overflows, a P-shard step computes
the same per-shard sample trees (bit-identical counter RNG) as P independent
single-chip NALPTrainer steps on the per-shard anchor slices with shared
random negatives; tests/test_dist_sampled.py asserts loss parity vs the
replicated-graph trainer.

HBM scaling: feature table, adjacency, and optimizer state are all O(N/P)
per chip — the property that lets MAG240M-scale graphs (244M nodes x 768
features) fit a TPU pod the way GLT fits a CPU cluster's RAM.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigl_tpu.parallel.feature_lookup import (
    request_capacity,
    routed_gather,
    routed_sample_neighbors,
)
from gigl_tpu.losses.losses import cross_entropy_loss
from gigl_tpu.losses.metrics import accuracy, hits_at_k, mean_reciprocal_rank
from gigl_tpu.parallel.mesh import DATA_AXIS
from gigl_tpu.sampling.neighbor_sampler import counter_rng_uniform
from gigl_tpu.training.dataset import NALPBatch
from gigl_tpu.training.trainer import (
    NALPTrainerConfig,
    TrainState,
    make_optimizer,
    nalp_loss_from_embeddings,
)
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def _shard_csr(indptr: np.ndarray, indices: np.ndarray, num_shards: int,
               rows_per_shard: int) -> Tuple[np.ndarray, np.ndarray]:
    """Split a global CSR into per-shard row-range blocks.

    Returns (local_indptr [P, rows+1] int32 rebased per shard,
    local_indices [P, E_pad] int32 global neighbor ids, zero-padded).
    The partition-book analog (ref partition_book.py) is implicit: global
    row r lives on shard r // rows_per_shard.
    """
    n = indptr.shape[0] - 1
    blocks_ip, blocks_ix = [], []
    for p in range(num_shards):
        lo = min(p * rows_per_shard, n)
        hi = min(lo + rows_per_shard, n)
        ip = indptr[lo: hi + 1].astype(np.int64)
        # pad the row range when N doesn't divide P (empty trailing rows)
        if hi - lo < rows_per_shard:
            ip = np.concatenate(
                [ip, np.full(rows_per_shard - (hi - lo), ip[-1], np.int64)])
        ix = indices[indptr[lo]: indptr[hi]]
        blocks_ip.append((ip - ip[0]).astype(np.int32))
        blocks_ix.append(np.asarray(ix, np.int32))
    e_pad = max(max(len(b) for b in blocks_ix), 1)
    ix_arr = np.zeros((num_shards, e_pad), np.int32)
    for p, b in enumerate(blocks_ix):
        ix_arr[p, : len(b)] = b
    return np.stack(blocks_ip), ix_arr


@dataclass
class PartitionedGraph:
    """Device arrays of a range-partitioned graph, sharded over a mesh axis.

    feat_deg: [P*rows, D+1] — feature rows with the node's message in-degree
    fused as the LAST column, so hydration + degree lookup is one routed
    gather (same fused-table trick as DeviceGraph.fused_table).
    With ``quantized``: [P*rows, D+8] int8 — per-row symmetric int8 features
    with the fp32 scale and fp32 degree BIT-PACKED into the last 8 bytes
    (little-endian, matching XLA bitcast_convert_type), so hydration stays
    ONE routed gather while rows shrink ~4x — both the per-chip HBM
    footprint and the all_to_all payload (the ICI bytes GLT would move as
    RPC responses). The MAG240M capacity lever: 244M x 768 fp32 = 750 GB
    total; int8 over a pod slice fits where fp32 does not.
    msg_*/sup_*/hard_*: per-shard CSR blocks (see _shard_csr).
    """

    feat_deg: jax.Array
    msg_indptr: jax.Array
    msg_indices: jax.Array
    sup_indptr: Optional[jax.Array]
    sup_indices: Optional[jax.Array]
    hard_indptr: Optional[jax.Array]
    hard_indices: Optional[jax.Array]
    num_nodes: int
    rows_per_shard: int
    feat_dim: int
    quantized: bool = False
    # Row-sharded node labels [P*rows, 1] int32 (supervised node
    # classification over the partitioned graph; None for NALP graphs).
    labels: Optional[jax.Array] = None

    @classmethod
    def build(cls, device_graph, mesh, axis: str = DATA_AXIS,
              quantize_features: bool = False) -> "PartitionedGraph":
        """Partition a (host-assembled) DeviceGraph across ``mesh[axis]``."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        dg = device_graph
        num_shards = int(mesh.shape[axis])
        n = dg.num_nodes
        rows = -(-n // num_shards)  # ceil
        feats = np.asarray(dg.node_features, np.float32)
        d = feats.shape[1]
        deg = (np.asarray(dg.degrees, np.float32) if dg.degrees is not None
               else np.zeros((n,), np.float32))
        if quantize_features:
            absmax = np.maximum(np.abs(feats).max(axis=1, keepdims=True),
                                1e-12)
            scale = (absmax / 127.0).astype(np.float32)          # [n, 1]
            q = np.clip(np.rint(feats / scale), -127, 127).astype(np.int8)
            tail = np.concatenate(
                [scale.view(np.uint8).reshape(n, 4),
                 deg.astype(np.float32).reshape(n, 1).view(
                     np.uint8).reshape(n, 4)],
                axis=1).view(np.int8)                            # [n, 8]
            fd = np.zeros((num_shards * rows, d + 8), np.int8)
            fd[:n, :d] = q
            fd[:n, d:] = tail
        else:
            fd = np.zeros((num_shards * rows, d + 1), np.float32)
            fd[:n, :d] = feats
            fd[:n, d] = deg
        row_sh = NamedSharding(mesh, P(axis))
        blk_sh = NamedSharding(mesh, P(axis, None))
        msg_ip, msg_ix = _shard_csr(np.asarray(dg.message_csr.indptr),
                                    np.asarray(dg.message_csr.indices),
                                    num_shards, rows)
        sup_ip = sup_ix = hard_ip = hard_ix = None
        if dg.supervision_csr is not None:
            a, b = _shard_csr(np.asarray(dg.supervision_csr.indptr),
                              np.asarray(dg.supervision_csr.indices),
                              num_shards, rows)
            sup_ip = jax.device_put(a, blk_sh)
            sup_ix = jax.device_put(b, blk_sh)
        if dg.hard_neg_csr is not None:
            a, b = _shard_csr(np.asarray(dg.hard_neg_csr.indptr),
                              np.asarray(dg.hard_neg_csr.indices),
                              num_shards, rows)
            hard_ip = jax.device_put(a, blk_sh)
            hard_ix = jax.device_put(b, blk_sh)
        labels = None
        if dg.node_labels is not None:
            lab = np.zeros((num_shards * rows, 1), np.int32)
            lab[:n, 0] = np.asarray(dg.node_labels, np.int32)
            labels = jax.device_put(lab, row_sh)
        return cls(
            feat_deg=jax.device_put(fd, row_sh),
            msg_indptr=jax.device_put(msg_ip, blk_sh),
            msg_indices=jax.device_put(msg_ix, blk_sh),
            sup_indptr=sup_ip, sup_indices=sup_ix,
            hard_indptr=hard_ip, hard_indices=hard_ix,
            num_nodes=n, rows_per_shard=rows, feat_dim=d,
            quantized=quantize_features,
            labels=labels,
        )

    def decode_rows(self, rows: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Gathered table rows -> (features [G, D] f32, degrees [G] f32).

        Quantized rows dequantize via the bit-packed per-row scale; the
        byte order of the pack (little-endian) matches XLA's
        bitcast_convert_type contract (minor-most index = low-order bits).
        """
        d = self.feat_dim
        if not self.quantized:
            return rows[:, :d], rows[:, d]
        q = rows[:, :d].astype(jnp.float32)
        tail = jax.lax.bitcast_convert_type(
            rows[:, d:].reshape(rows.shape[0], 2, 4), jnp.float32)  # [G, 2]
        return q * tail[:, 0:1], tail[:, 1]


class PartitionedNALPTrainer:
    """NALP trainer where graph + features live sharded across the mesh.

    Single-controller API mirroring NALPTrainer: ``train_steps`` runs K
    steps as one scanned SPMD program; anchors arrive as global [K, B]
    batches and are split over the mesh axis (B % P == 0 required).
    """

    def __init__(self, model, pgraph: PartitionedGraph, mesh,
                 config: NALPTrainerConfig,
                 optimizer_args: Optional[Dict[str, Any]] = None,
                 axis: str = DATA_AXIS,
                 capacity_factor: float = 4.0):
        if config.cached_hop:
            raise ValueError("hop caching is a replicated-graph optimization;"
                             " PartitionedNALPTrainer samples live")
        if config.use_cms_correction:
            raise ValueError("CMS correction keeps per-shard sketch state; "
                             "not supported in the partitioned trainer")
        if config.num_random_negs % int(mesh.shape[axis]):
            raise ValueError("num_random_negs must divide the mesh axis size")
        self.model = model
        self.pg = pgraph
        self.mesh = mesh
        self.axis = axis
        self.cfg = config
        self.num_shards = int(mesh.shape[axis])
        self.capacity_factor = capacity_factor
        self.tx = make_optimizer(optimizer_args or {})
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._P = P
        pspec_graph = (P(axis), P(axis, None), P(axis, None),
                       P(axis, None), P(axis, None),
                       P(axis, None), P(axis, None))
        self._train_steps = jax.jit(jax.shard_map(
            self._steps_local,
            mesh=mesh,
            in_specs=pspec_graph + (P(), P(None, axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ), donate_argnums=(7,))
        self._eval_step = jax.jit(jax.shard_map(
            self._eval_local,
            mesh=mesh,
            in_specs=pspec_graph + (P(), P(axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ))
        self._encode = jax.jit(jax.shard_map(
            self._encode_local,
            mesh=mesh,
            in_specs=(P(axis), P(axis, None), P(axis, None), P(), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        ))

    # -- SPMD bodies (run per shard under shard_map) -----------------------
    def _graph_args(self):
        pg = self.pg
        sup_ip = pg.sup_indptr if pg.sup_indptr is not None else pg.msg_indptr
        sup_ix = pg.sup_indices if pg.sup_indices is not None else pg.msg_indices
        hard_ip = pg.hard_indptr
        hard_ix = pg.hard_indices
        if hard_ip is None:
            # Degenerate all-degree-0 CSR: hard draws mask to empty.
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(self.axis, None))
            hard_ip = jax.device_put(
                np.zeros((self.num_shards, self.pg.rows_per_shard + 1),
                         np.int32), sh)
            hard_ix = jax.device_put(
                np.zeros((self.num_shards, 1), np.int32), sh)
        return (pg.feat_deg, pg.msg_indptr, pg.msg_indices, sup_ip, sup_ix,
                hard_ip, hard_ix)

    def _sample_tree(self, msg_ip, msg_ix, roots, seed_offset):
        """Frontier expansion via owner-routed sampling; mirrors
        sample_blocks (same per-hop RNG keying: hop index from 1)."""
        node_ids: List[jnp.ndarray] = [roots.astype(jnp.int32)]
        masks: List[jnp.ndarray] = [jnp.ones(roots.shape, bool)]
        frontier, pmask = node_ids[0], masks[0]
        for hop, k in enumerate(self.cfg.fanouts, start=1):
            flat = frontier.reshape(-1)
            nbr, m = routed_sample_neighbors(
                msg_ip, msg_ix, flat, int(k), axis=self.axis,
                seed=self.cfg.seed + seed_offset, hop=hop,
                capacity_factor=self.capacity_factor)
            nbr = nbr.reshape(frontier.shape + (int(k),))
            m = m.reshape(frontier.shape + (int(k),)) & pmask[..., None]
            nbr = jnp.where(m, nbr, 0)
            node_ids.append(nbr)
            masks.append(m)
            frontier, pmask = nbr, m
        return node_ids, masks

    def _encode_groups(self, feat_deg_l, msg_ip, msg_ix, params, groups,
                       train: bool, rng=None):
        """Sample trees for every (roots, seed_offset) group, hydrate the
        UNION of their node ids with one routed gather, and encode."""
        trees = [self._sample_tree(msg_ip, msg_ix, r, off)
                 for (r, off) in groups]
        flats, sizes = [], []
        for ids, _ in trees:
            for lvl in ids:
                flats.append(lvl.reshape(-1))
                sizes.append(lvl.size)
        all_ids = jnp.concatenate(flats)
        rows, _ok = routed_gather(
            feat_deg_l, all_ids, axis=self.axis,
            capacity_factor=self.capacity_factor)
        feat_rows, deg_rows = self.pg.decode_rows(rows)
        d = self.pg.feat_dim
        outs = []
        offset = 0
        rngs = {"dropout": rng} if (train and rng is not None) else None
        for (ids, masks), (roots, _off) in zip(trees, groups):
            feats, degs = [], []
            for lvl in ids:
                sl = slice(offset, offset + lvl.size)
                offset += lvl.size
                feats.append(feat_rows[sl].reshape(lvl.shape + (d,)))
                degs.append(deg_rows[sl].reshape(lvl.shape))
            emb = self.model.apply(params, feats, masks, None, train=train,
                                   hop_degrees=degs, rngs=rngs)
            outs.append(emb.reshape(roots.shape + (emb.shape[-1],)))
        return outs

    def _make_batch(self, sup_ip, sup_ix, hard_ip, hard_ix, anchors, step):
        cfg = self.cfg
        pos, pos_mask = routed_sample_neighbors(
            sup_ip, sup_ix, anchors, cfg.num_positives, axis=self.axis,
            seed=cfg.seed, hop=1_000_003 + step,
            capacity_factor=self.capacity_factor)
        # Shared random negatives: the SAME global draw on every shard
        # (counter RNG keyed by step only) — batch-shared negatives across
        # the global batch, the reference's random-negative contract.
        bits = counter_rng_uniform(
            jnp.arange(cfg.num_random_negs, dtype=jnp.int32),
            seed=cfg.seed, hop=3_000_017 + step, num_slots=1)[:, 0]
        rand = (bits % jnp.uint32(self.pg.num_nodes)).astype(jnp.int32)
        h = cfg.num_hard_negs
        if h > 0:
            hard, hard_mask = routed_sample_neighbors(
                hard_ip, hard_ix, anchors, h, axis=self.axis,
                seed=cfg.seed, hop=2_000_003 + step,
                capacity_factor=self.capacity_factor)
        else:
            hard = jnp.zeros(anchors.shape + (h,), jnp.int32)
            hard_mask = jnp.zeros(anchors.shape + (h,), bool)
        return NALPBatch(anchors=anchors.astype(jnp.int32), pos=pos,
                         pos_mask=pos_mask, hard_neg=hard,
                         hard_neg_mask=hard_mask, random_neg=rand)

    def _loss_local(self, feat_deg_l, msg_ip, msg_ix, sup_ip, sup_ix,
                    hard_ip, hard_ix, params, cms, anchors, step, rng):
        batch = self._make_batch(sup_ip, sup_ix, hard_ip, hard_ix,
                                 anchors, step)
        r_per = self.cfg.num_random_negs // self.num_shards
        shard = jax.lax.axis_index(self.axis)
        rand_local = jax.lax.dynamic_slice_in_dim(
            batch.random_neg, shard * r_per, r_per)
        groups = [(batch.anchors, 0), (batch.pos, 1), (rand_local, 2)]
        if self.cfg.num_hard_negs > 0:
            groups.append((batch.hard_neg, 3))
        embs = self._encode_groups(feat_deg_l, msg_ip, msg_ix, params,
                                   groups, train=True, rng=rng)
        q, pos, rand_l = embs[0], embs[1], embs[2]
        hard = embs[3] if self.cfg.num_hard_negs > 0 else None
        # Candidate embeddings shared across the global batch.
        rand = jax.lax.all_gather(rand_l, self.axis, axis=0, tiled=True)
        loss, cms = nalp_loss_from_embeddings(
            self.model, params, self.cfg, batch, q, pos, hard, rand, cms)
        return loss, cms

    def _step_local(self, feat_deg_l, msg_ip, msg_ix, sup_ip, sup_ix,
                    hard_ip, hard_ix, state: TrainState, anchors, rng):
        (loss, cms), grads = jax.value_and_grad(
            lambda p: self._loss_local(feat_deg_l, msg_ip, msg_ix, sup_ip,
                                       sup_ix, hard_ip, hard_ix, p,
                                       state.cms, anchors,
                                       state.step, rng),
            has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, self.axis)
        loss = jax.lax.pmean(loss, self.axis)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, cms=cms), loss

    def _steps_local(self, feat_deg_l, msg_ip, msg_ix, sup_ip, sup_ix,
                     hard_ip, hard_ix, state, anchors_kb, rngs):
        msg_ip, msg_ix = msg_ip[0], msg_ix[0]
        sup_ip, sup_ix = sup_ip[0], sup_ix[0]
        hard_ip, hard_ix = hard_ip[0], hard_ix[0]

        def body(st, xs):
            a, r = xs
            return self._step_local(feat_deg_l, msg_ip, msg_ix,
                                    sup_ip, sup_ix, hard_ip, hard_ix,
                                    st, a, r)

        return jax.lax.scan(body, state, (anchors_kb, rngs))

    def _eval_local(self, feat_deg_l, msg_ip, msg_ix, sup_ip, sup_ix,
                    hard_ip, hard_ix, params, anchors, step):
        """Ref parity eval (modeling_task_spec:534-546): positives ranked
        against the shared random negatives; (rr_sum, hits_sums, count)
        psum-reduced across shards."""
        msg_ip, msg_ix = msg_ip[0], msg_ix[0]
        sup_ip, sup_ix = sup_ip[0], sup_ix[0]
        hard_ip, hard_ix = hard_ip[0], hard_ix[0]

        batch = self._make_batch(sup_ip, sup_ix, hard_ip, hard_ix,
                                 anchors, step)
        r_per = self.cfg.num_random_negs // self.num_shards
        shard = jax.lax.axis_index(self.axis)
        rand_local = jax.lax.dynamic_slice_in_dim(
            batch.random_neg, shard * r_per, r_per)
        q, pos, rand_l = self._encode_groups(
            feat_deg_l, msg_ip, msg_ix, params,
            [(batch.anchors, 0), (batch.pos, 1), (rand_local, 2)],
            train=False)
        rand = jax.lax.all_gather(rand_l, self.axis, axis=0, tiled=True)
        b, p_, d_ = pos.shape
        pos_scores = self.model.apply(params, q[:, None, :], pos,
                                      method="decode")
        rand_scores = self.model.apply(params, q, rand,
                                       method="decode_all_pairs")
        pos_flat = pos_scores.reshape(-1)
        mask_flat = batch.pos_mask.reshape(-1)
        neg_rep = jnp.repeat(rand_scores, p_, axis=0)
        acc = (batch.pos.reshape(-1)[:, None] == batch.random_neg[None, :])
        rr_sum, rr_cnt = mean_reciprocal_rank(
            pos_flat, neg_rep, pos_mask=mask_flat, neg_mask=~acc)
        hits, _ = hits_at_k(pos_flat, neg_rep, self.cfg.eval_ks,
                            pos_mask=mask_flat, neg_mask=~acc)
        hits_arr = jnp.stack([hits[int(k)] for k in self.cfg.eval_ks])
        return (jax.lax.psum(rr_sum, self.axis),
                jax.lax.psum(hits_arr, self.axis),
                jax.lax.psum(rr_cnt, self.axis))

    def _encode_local(self, feat_deg_l, msg_ip, msg_ix, params, node_ids):
        msg_ip, msg_ix = msg_ip[0], msg_ix[0]
        (emb,) = self._encode_groups(feat_deg_l, msg_ip, msg_ix, params,
                                     [(node_ids, 0)], train=False)
        return emb

    # -- public API --------------------------------------------------------
    def init_state(self, rng: jax.Array, batch_size: int,
                   params: Optional[Any] = None) -> TrainState:
        if params is None:
            d = self.pg.feat_dim
            feats, masks = [], []
            shape = (max(batch_size // self.num_shards, 1),)
            for k in self.cfg.fanouts:
                feats.append(jnp.zeros(shape + (d,), jnp.float32))
                masks.append(jnp.ones(shape, bool))
                shape = shape + (int(k),)
            feats.append(jnp.zeros(shape + (d,), jnp.float32))
            masks.append(jnp.ones(shape, bool))
            params = self.model.init(rng, feats, masks)
        from gigl_tpu.losses.count_min_sketch import cms_init

        cms = cms_init() if self.cfg.use_cms_correction else None
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32), cms=cms)

    def train_steps(self, state: TrainState, anchors_kb,
                    rng: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        anchors_kb = jnp.asarray(anchors_kb, jnp.int32)
        if anchors_kb.shape[1] % self.num_shards:
            raise ValueError(
                f"batch size {anchors_kb.shape[1]} not divisible by "
                f"{self.num_shards} shards")
        rngs = jax.random.split(rng, anchors_kb.shape[0])
        return self._train_steps(*self._graph_args(), state, anchors_kb,
                                 rngs)

    def evaluate(self, params, anchor_batches, step: int = 0
                 ) -> Dict[str, float]:
        rr_t, hits_t, cnt_t = 0.0, None, 0.0
        for i, a in enumerate(anchor_batches):
            a = np.asarray(a)
            a = a[: len(a) // self.num_shards * self.num_shards]
            if len(a) == 0:
                continue
            rr, hits, cnt = self._eval_step(
                *self._graph_args(), params,
                jnp.asarray(a, jnp.int32),
                jnp.asarray(step + i, jnp.int32))
            rr_t += float(rr)
            cnt_t += float(cnt)
            h = np.asarray(hits)
            hits_t = h if hits_t is None else hits_t + h
        cnt_t = max(cnt_t, 1.0)
        if hits_t is None:
            hits_t = np.zeros(len(self.cfg.eval_ks))
        out = {"mrr": rr_t / cnt_t}
        for i, k in enumerate(self.cfg.eval_ks):
            out[f"hits@{k}"] = float(hits_t[i]) / cnt_t
        return out

    def encode_batch(self, params, node_ids) -> jnp.ndarray:
        """Sharded inference encode over the partitioned graph (input
        padded to a multiple of the shard count; pad rows dropped)."""
        pg = self.pg
        node_ids = jnp.asarray(node_ids, jnp.int32)
        m = node_ids.shape[0]
        m_pad = -(-m // self.num_shards) * self.num_shards
        padded = jnp.pad(node_ids, (0, m_pad - m))
        out = self._encode(pg.feat_deg, pg.msg_indptr, pg.msg_indices,
                           params, padded)
        return out[:m]

    def fit(
        self,
        state: TrainState,
        train_anchors: np.ndarray,
        val_anchors: np.ndarray,
        *,
        batch_size: int,
        num_epochs: int = 1,
        val_every_n_batches: int = 100,
        num_val_batches: int = 8,
        early_stop_patience: int = 5,
        log_every: int = 50,
        scalar_logger=None,
        checkpoint_dir: Optional[str] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """Training loop with val cadence + early stopping on val MRR —
        the NALPTrainer.fit contract (ref modeling_task_spec:334+) over the
        partitioned graph. Checkpoints save the full TrainState at every
        validation point and auto-resume (training/checkpoint.py)."""
        import time

        from gigl_tpu.training.dataset import AnchorBatchIterator
        from gigl_tpu.training.early_stop import EarlyStopper

        if batch_size % self.num_shards:
            raise ValueError(f"batch_size {batch_size} must divide the "
                             f"{self.num_shards}-shard mesh axis")
        if checkpoint_dir is not None:
            from gigl_tpu.training.checkpoint import (
                latest_step,
                restore_train_state,
            )

            resume_step = latest_step(checkpoint_dir)
            if resume_step is not None:
                state = restore_train_state(checkpoint_dir, state)
                logger.info("resumed from %s at step %d", checkpoint_dir,
                            resume_step)
        it = AnchorBatchIterator(train_anchors, batch_size,
                                 seed=self.cfg.seed)
        val_bs = max(self.num_shards,
                     min(batch_size, len(val_anchors))
                     // self.num_shards * self.num_shards)
        val_it = AnchorBatchIterator(
            np.resize(np.asarray(val_anchors), max(len(val_anchors),
                                                   val_bs)),
            val_bs, seed=self.cfg.seed + 1)
        stopper = EarlyStopper(patience=early_stop_patience)
        rng = jax.random.PRNGKey(self.cfg.seed)
        global_step = 0
        resume_past = int(state.step)
        t0 = time.time()
        stop = False
        for epoch in range(num_epochs):
            batches = np.stack(list(it.epoch(epoch)))
            for start in range(0, len(batches), val_every_n_batches):
                chunk = batches[start: start + val_every_n_batches]
                rng, chunk_rng = jax.random.split(rng)
                if global_step + len(chunk) <= resume_past:
                    global_step += len(chunk)
                    continue
                state, losses = self.train_steps(state, chunk, chunk_rng)
                global_step += len(chunk)
                if log_every:
                    logger.info(
                        "epoch %d step %d loss %.4f (%.1f steps/s)",
                        epoch, global_step, float(losses[-1]),
                        len(chunk) / max(time.time() - t0, 1e-9))
                    t0 = time.time()
                if scalar_logger is not None:
                    scalar_logger.log(global_step, loss=float(losses[-1]))
                if len(chunk) == val_every_n_batches:
                    val_batches = []
                    for i, b in enumerate(val_it.epoch(global_step)):
                        if i >= num_val_batches:
                            break
                        val_batches.append(b)
                    metrics = self.evaluate(state.params, val_batches,
                                            step=global_step)
                    logger.info("eval @%d: %s", global_step, metrics)
                    if scalar_logger is not None:
                        scalar_logger.log(global_step, **metrics)
                    if checkpoint_dir is not None:
                        from gigl_tpu.training.checkpoint import (
                            save_train_state,
                        )

                        snap_full = jax.tree_util.tree_map(
                            lambda x: (jnp.copy(x)
                                       if hasattr(x, "dtype") else x),
                            state)
                        save_train_state(checkpoint_dir, snap_full,
                                         step=global_step)
                    # state buffers are donated into the next chunk.
                    snap = jax.tree_util.tree_map(jnp.copy, state.params)
                    if stopper.update(metrics["mrr"], snap):
                        logger.info("early stop at step %d (best mrr %.4f)",
                                    global_step, stopper.best_value)
                        stop = True
                        break
            if stop:
                break
        if stopper.best_state is not None:
            state = state._replace(params=stopper.best_state)
        final_batches = []
        for i, b in enumerate(val_it.epoch(10 ** 6)):
            if i >= num_val_batches:
                break
            final_batches.append(b)
        return state, self.evaluate(state.params, final_batches)


class PartitionedNodeClassificationTrainer(PartitionedNALPTrainer):
    """Supervised node classification over the PARTITIONED graph.

    The reference's v2 loader serves node classification through the same
    distributed dataset/neighbor-loader stack as link prediction
    (distributed_neighborloader.py:26 + NodeClassificationModelingTaskSpec
    semantics: CE loss on labeled anchors, accuracy eval). Here the same
    owner-routed sampling + one routed feature gather encode the anchor
    trees; anchor labels ride a second tiny routed gather over the
    row-sharded label column; grads/metrics are pmean/psum-reduced.

    Sampling RNG keying matches the replicated NodeClassificationTrainer
    (seed, hop) — per-shard logits are bit-compatible with single-chip
    encodes of the same anchor slices.
    """

    def __init__(self, model, pgraph: PartitionedGraph, mesh,
                 config, optimizer_args: Optional[Dict[str, Any]] = None,
                 axis: str = DATA_AXIS, capacity_factor: float = 4.0):
        if pgraph.labels is None:
            raise ValueError("PartitionedGraph has no labels; build from a "
                             "DeviceGraph with node_labels")
        self.model = model
        self.pg = pgraph
        self.mesh = mesh
        self.axis = axis
        self.cfg = config
        self.num_shards = int(mesh.shape[axis])
        self.capacity_factor = capacity_factor
        self.tx = make_optimizer(optimizer_args or {})
        from jax.sharding import PartitionSpec as P

        self._P = P
        pspec_graph = (P(axis), P(axis, None), P(axis, None), P(axis))
        self._train_steps = jax.jit(jax.shard_map(
            self._nc_steps_local,
            mesh=mesh,
            in_specs=pspec_graph + (P(), P(None, axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ), donate_argnums=(4,))
        self._eval_step = jax.jit(jax.shard_map(
            self._nc_eval_local,
            mesh=mesh,
            in_specs=pspec_graph + (P(), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        self._encode = jax.jit(jax.shard_map(
            self._encode_local,
            mesh=mesh,
            in_specs=(P(axis), P(axis, None), P(axis, None), P(), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        ))

    def _nc_graph_args(self):
        pg = self.pg
        return (pg.feat_deg, pg.msg_indptr, pg.msg_indices, pg.labels)

    # -- SPMD bodies -------------------------------------------------------
    def _nc_loss_local(self, feat_deg_l, msg_ip, msg_ix, labels_l, params,
                       nodes, rng):
        (logits,) = self._encode_groups(
            feat_deg_l, msg_ip, msg_ix, params, [(nodes, 0)],
            train=True, rng=rng)
        lab_rows, _ok = routed_gather(
            labels_l, nodes.astype(jnp.int32), axis=self.axis,
            capacity_factor=self.capacity_factor)
        labels = lab_rows[:, 0].astype(jnp.int32)
        s, c = cross_entropy_loss(logits, labels)
        return s / jnp.maximum(c.astype(jnp.float32), 1.0)

    def _nc_step_local(self, feat_deg_l, msg_ip, msg_ix, labels_l,
                       state: TrainState, nodes, rng):
        loss, grads = jax.value_and_grad(
            lambda p: self._nc_loss_local(feat_deg_l, msg_ip, msg_ix,
                                          labels_l, p, nodes, rng)
        )(state.params)
        grads = jax.lax.pmean(grads, self.axis)
        loss = jax.lax.pmean(loss, self.axis)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, cms=state.cms), loss

    def _nc_steps_local(self, feat_deg_l, msg_ip, msg_ix, labels_l, state,
                        nodes_kb, rngs):
        msg_ip, msg_ix = msg_ip[0], msg_ix[0]

        def body(st, xs):
            nb, r = xs
            return self._nc_step_local(feat_deg_l, msg_ip, msg_ix,
                                       labels_l, st, nb, r)

        return jax.lax.scan(body, state, (nodes_kb, rngs))

    def _nc_eval_local(self, feat_deg_l, msg_ip, msg_ix, labels_l, params,
                       nodes):
        msg_ip, msg_ix = msg_ip[0], msg_ix[0]
        (logits,) = self._encode_groups(
            feat_deg_l, msg_ip, msg_ix, params, [(nodes, 0)], train=False)
        lab_rows, _ok = routed_gather(
            labels_l, nodes.astype(jnp.int32), axis=self.axis,
            capacity_factor=self.capacity_factor)
        labels = lab_rows[:, 0].astype(jnp.int32)
        correct, count = accuracy(logits, labels)
        return (jax.lax.psum(correct, self.axis),
                jax.lax.psum(count, self.axis))

    # -- public API --------------------------------------------------------
    def init_state(self, rng: jax.Array, batch_size: int,
                   params: Optional[Any] = None) -> TrainState:
        if params is None:
            d = self.pg.feat_dim
            feats, masks = [], []
            shape = (max(batch_size // self.num_shards, 1),)
            for k in self.cfg.fanouts:
                feats.append(jnp.zeros(shape + (d,), jnp.float32))
                masks.append(jnp.ones(shape, bool))
                shape = shape + (int(k),)
            feats.append(jnp.zeros(shape + (d,), jnp.float32))
            masks.append(jnp.ones(shape, bool))
            params = self.model.init(rng, feats, masks)
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32), cms=None)

    def train_steps(self, state: TrainState, nodes_kb,
                    rng: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        nodes_kb = jnp.asarray(nodes_kb, jnp.int32)
        if nodes_kb.shape[1] % self.num_shards:
            raise ValueError(
                f"batch size {nodes_kb.shape[1]} not divisible by "
                f"{self.num_shards} shards")
        rngs = jax.random.split(rng, nodes_kb.shape[0])
        return self._train_steps(*self._nc_graph_args(), state, nodes_kb,
                                 rngs)

    def evaluate(self, params, node_batches) -> float:
        """Global accuracy over the given batches (psum-reduced)."""
        correct, total = 0.0, 0.0
        for b in node_batches:
            b = np.asarray(b)
            b = b[: len(b) // self.num_shards * self.num_shards]
            if len(b) == 0:
                continue
            c, n = self._eval_step(*self._nc_graph_args(), params,
                                   jnp.asarray(b, jnp.int32))
            correct += float(c)
            total += float(n)
        return correct / max(total, 1.0)

    def predict_batch(self, params, node_ids) -> jnp.ndarray:
        """Sharded logits for arbitrary node ids (inference path)."""
        return self.encode_batch(params, node_ids)

    def fit(self, state: TrainState, train_nodes, val_nodes, *,
            batch_size: int, num_epochs: int = 10,
            early_stop_patience: int = 5,
            log_every: int = 50) -> Tuple[TrainState, Dict[str, float]]:
        """Per-epoch loop: K-step scan chunks + accuracy val + early stop
        (the replicated NodeClassificationTrainer.fit contract)."""
        from gigl_tpu.training.dataset import AnchorBatchIterator
        from gigl_tpu.training.early_stop import EarlyStopper

        if batch_size % self.num_shards:
            raise ValueError(f"batch_size {batch_size} must divide the "
                             f"{self.num_shards}-shard mesh axis")
        it = AnchorBatchIterator(train_nodes, batch_size, seed=self.cfg.seed)
        stopper = EarlyStopper(patience=early_stop_patience)
        rng = jax.random.PRNGKey(self.cfg.seed)
        step = 0
        val = np.asarray(val_nodes)
        val = val[: max(len(val) // self.num_shards, 1) * self.num_shards]
        for epoch in range(num_epochs):
            batches = np.stack(list(it.epoch(epoch)))
            rng, erng = jax.random.split(rng)
            state, losses = self.train_steps(state, batches, erng)
            step += len(batches)
            if log_every:
                logger.info("epoch %d step %d loss %.4f", epoch, step,
                            float(losses[-1]))
            acc = self.evaluate(state.params, [val])
            logger.info("epoch %d val acc %.4f", epoch, acc)
            snap = jax.tree_util.tree_map(jnp.copy, state.params)
            if stopper.update(acc, snap):
                break
        if stopper.best_state is not None:
            state = state._replace(params=stopper.best_state)
        return state, {"accuracy": stopper.best_value or 0.0}
