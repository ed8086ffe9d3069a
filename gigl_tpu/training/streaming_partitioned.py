"""Streaming + partitioned composed: per-shard HOST feature store with
routed device lookups — graphs beyond pod HBM (the GLT cluster-RAM regime
proper).

The reference's scale design holds the graph partitioned across the
cluster's host RAM and fetches remote feature rows per batch over RPC
(ref python/gigl/distributed/dist_link_prediction_dataset.py:428-439
Feature stores; distributed_neighborloader.py:26-120). Round-3's two
halves — `PartitionedGraph` (HBM-resident, O(N/P) per chip) and
`StreamingNALPTrainer` (host features, but the FULL table per host) —
compose here:

  - each PROCESS's host RAM holds only its shards' rows of the fused
    [features | degree | hop-cache aggregate] table (`ShardedHostStore`);
    device HBM holds only the O(N/P) integer adjacency (frozen sample
    tables + supervision/hard-negative CSR blocks) and the per-batch
    working set;
  - a train step is the HBM-partitioned step split at the feature
    hydration's routed gather into two SPMD programs:
      plan:  batch draws + joint tree expansion (routed over HBM tables)
             + counting-sort routing + the request all_to_all — ends with
             each shard holding the ids IT OWNS (`recv`),
      host:  the owner-side row gather runs on HOST (threaded C++ store),
             answers re-enter the mesh as one sharded array,
      apply: the answer all_to_all + un-permute (the back half of
             routed_gather), encode, loss, grads, pmean, update;
  - draws are bit-identical to `PartitionedNALPTrainer` in tabularized
    mode (same counter-RNG keying, same frozen-table semantics), so the
    loss trajectories match exactly (tests/test_streaming_partitioned.py).

Capacity math (docs/performance.md "beyond-HBM capacity"): MAG240M at
244M nodes x 768 fp32 features is ~750 GB of fused table — per 64-host
pod that is ~12 GB host RAM per process, while per-chip HBM carries only
the adjacency ints (~60 B/node at fanouts 15/10) plus the per-batch
working set.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigl_tpu import native
from gigl_tpu.parallel.feature_lookup import (
    _route_requests,
    _unroute,
    request_capacity,
    routed_sample_neighbors,
)
from gigl_tpu.parallel.mesh import DATA_AXIS, put_replicated
from gigl_tpu.sampling.neighbor_sampler import counter_rng_uniform
from gigl_tpu.training.dataset import NALPBatch
from gigl_tpu.training.dist_hetero import PartitionedHeteroNALPTrainer
from gigl_tpu.training.dist_sampled import _shard_csr, apply_overflow_policy
from gigl_tpu.training.streaming import HostGraphStore
from gigl_tpu.training.trainer import (
    NALPTrainerConfig,
    TrainState,
    make_optimizer,
    nalp_loss_from_embeddings,
)
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class ShardedHostStore:
    """This process's rows of the fused [feat | deg | agg] host table.

    ``local_shards`` are the global shard indices whose rows this process
    holds (each shard = ``rows_per_shard`` consecutive global rows) — the
    per-host partition of the reference's cluster-RAM feature store.
    """

    def __init__(self, fused_local: np.ndarray, rows_per_shard: int,
                 local_shards: Sequence[int]):
        self.rows_per_shard = rows_per_shard
        self.local_shards = tuple(int(s) for s in local_shards)
        self._lo = {s: i * rows_per_shard
                    for i, s in enumerate(self.local_shards)}
        self._table = (native.HostFeatureStore(fused_local)
                       if native.available() else None)
        self._np = fused_local

    @property
    def width(self) -> int:
        return self._np.shape[1]

    @classmethod
    def from_host_store(cls, store: HostGraphStore, *, num_shards: int,
                        local_shards: Optional[Sequence[int]] = None
                        ) -> "ShardedHostStore":
        """Fuse features + degree + hop-cache aggregate and keep only the
        local shards' rows (default: all shards — single-process)."""
        n = store.num_nodes
        rows = -(-n // num_shards)
        if local_shards is None:
            local_shards = range(num_shards)
        local_shards = tuple(int(s) for s in local_shards)
        d = store.features.shape[1]
        w = 2 * d + 1
        fused = np.zeros((len(local_shards) * rows, w), np.float32)
        for i, s in enumerate(local_shards):
            lo, hi = s * rows, min((s + 1) * rows, n)
            if hi <= lo:
                continue
            blk = fused[i * rows: i * rows + (hi - lo)]
            ids = np.arange(lo, hi)
            blk[:, :d] = store.features.gather(ids)
            blk[:, d] = store.degrees[lo:hi]
            blk[:, d + 1:] = store.agg.gather(ids)
        return cls(fused, rows, local_shards)

    @classmethod
    def from_array(cls, arr: np.ndarray, *, num_shards: int,
                   local_shards: Optional[Sequence[int]] = None
                   ) -> "ShardedHostStore":
        """Shard a plain [N, W] host table (no fusion) — the per-node-type
        feature stores of the TYPED beyond-HBM path (ref
        dist_link_prediction_dataset.py:428-439 per-type Feature stores)."""
        arr = np.asarray(arr, np.float32)
        n, w = arr.shape
        rows = -(-n // num_shards)
        if local_shards is None:
            local_shards = range(num_shards)
        local_shards = tuple(int(s) for s in local_shards)
        fused = np.zeros((len(local_shards) * rows, w), np.float32)
        for i, s in enumerate(local_shards):
            lo, hi = s * rows, min((s + 1) * rows, n)
            if hi > lo:
                fused[i * rows: i * rows + (hi - lo)] = arr[lo:hi]
        return cls(fused, rows, local_shards)

    def answer_shard(self, shard: int, global_ids: np.ndarray) -> np.ndarray:
        """Owner-side gather for one of this process's shards: fused rows
        for ``global_ids`` (all owned by ``shard``; padding slots id 0 may
        fall outside — clipped, their answers are never read back)."""
        lo = self._lo[shard]
        local = (np.asarray(global_ids, np.int64).reshape(-1)
                 - shard * self.rows_per_shard)
        local = np.clip(local, 0, self.rows_per_shard - 1) + lo
        if self._table is not None:
            out = self._table.gather(local)
        else:
            out = self._np[local]
        return out.reshape(np.asarray(global_ids).shape + (self.width,))



class _StreamedStepDriver:
    """Shared plan/host/apply DRIVER for the streamed-partitioned
    trainers (homogeneous + typed) — one implementation of the
    double-buffered step loop, deferred-overflow fold, pipelined eval,
    wrap-pad inference encode, and the fit contract (r5 review: these
    ~150 lines were previously near-duplicated per trainer, the same
    drift risk fit_loop.py exists to prevent).

    Subclasses provide: ``batch_size``, ``cfg``, ``num_shards``,
    ``_put``, ``_plan_step(anchors, step)`` (async plan dispatch whose
    first output is the routed request array(s)), ``_host_answers``,
    the compiled ``_apply`` / ``_apply_eval`` / ``_encode`` programs,
    and ``_grow_rebuild``. Step shapes are compiled for exactly ONE
    batch size (``_fixed_batch``): callers wrap-pad partial batches.
    """

    _fixed_batch = True

    def train_step(self, state: TrainState, anchors, rng: jax.Array,
                   step: int, *, defer_overflow: bool = False):
        """One plan -> host-gather -> apply round; ``step`` must be the
        global step index (drives the draw RNG, matching the HBM
        trainers' in-scan state.step). ``defer_overflow=True`` returns
        ``(state, loss, ovf)`` with the overflow count left ON DEVICE
        (no sync) — used by the pipelined ``run_steps``."""
        plan_out = self._plan_step(anchors, step)
        ans = self._host_answers(plan_out[0])
        state, loss, ovf_t = self._apply(
            state, ans, *plan_out[1:], self._put(np.asarray(rng)))
        if defer_overflow:
            return state, loss, ovf_t
        apply_overflow_policy(self, int(np.asarray(ovf_t)),
                              grow_rebuild=self._grow_rebuild)
        return state, loss

    def run_steps(self, state: TrainState, anchor_batches, rng: jax.Array,
                  *, start_step: int = 0):
        """Software-pipelined steps (double-buffered host round trip).

        Step t+1's plan program is dispatched BEFORE step t's host
        gather, so on the single device queue the order is
        ``plan_t, plan_{t+1}, apply_t, plan_{t+2}, apply_{t+1}, ...`` —
        the host gathers step t's answers while the device runs
        plan_{t+1}, and gathers step t+1's answers while the device
        runs apply_t. Steady-state step time is max(host_gather,
        plan+apply) instead of their sum (r4 VERDICT weak 6). Overflow
        counts stay on device and are folded ONCE at the end of the
        chunk; losses are likewise fetched once."""
        n = len(anchor_batches)
        if n == 0:
            return state, np.zeros(0, np.float32)
        rngs = np.asarray(jax.random.split(rng, n))
        losses, ovfs = [], []
        plans: List[Any] = [None] * n
        plans[0] = self._plan_step(anchor_batches[0], start_step)
        for t in range(n):
            if t + 1 < n:
                plans[t + 1] = self._plan_step(anchor_batches[t + 1],
                                               start_step + t + 1)
            ans = self._host_answers(plans[t][0])
            state, loss, ovf = self._apply(
                state, ans, *plans[t][1:], self._put(rngs[t]))
            plans[t] = None
            losses.append(loss)
            ovfs.append(ovf)
        total_ovf = int(np.asarray(jax.device_get(ovfs)).sum())
        apply_overflow_policy(self, total_ovf,
                              grow_rebuild=self._grow_rebuild)
        return state, np.asarray([float(x) for x in jax.device_get(losses)])

    def train_steps(self, state: TrainState, anchors_kb, rng: jax.Array
                    ) -> Tuple[TrainState, np.ndarray]:
        """Chunked-steps adapter matching the HBM trainers'
        ``train_steps(state, [K, B] anchors, rng)`` contract (used by
        the shared fit loop); the global step index resumes from
        ``state.step`` — one device sync per chunk."""
        anchors_kb = np.asarray(anchors_kb, np.int32)
        start = int(np.asarray(state.step))
        return self.run_steps(state, list(anchors_kb), rng,
                              start_step=start)

    def evaluate(self, params, anchor_batches, step: int = 0
                 ) -> Dict[str, float]:
        """Ranking eval (MRR + hits@k vs the shared random negatives),
        psum-reduced across shards — same double-buffered pipeline as
        run_steps; results fetched once at the end."""
        batches = [np.asarray(a, np.int32) for a in anchor_batches]
        n = len(batches)
        rr_t, hits_t, cnt_t, ovf_t = 0.0, None, 0.0, 0
        if n:
            plans: List[Any] = [None] * n
            plans[0] = self._plan_step(batches[0], step)
            results = []
            for i in range(n):
                if i + 1 < n:
                    plans[i + 1] = self._plan_step(batches[i + 1],
                                                   step + i + 1)
                ans = self._host_answers(plans[i][0])
                results.append(self._apply_eval(
                    params, ans, *plans[i][1:]))
                plans[i] = None
            for rr, hits, cnt, ovf_n in jax.device_get(results):
                rr_t += float(rr)
                cnt_t += float(cnt)
                ovf_t += int(ovf_n)
                h = np.asarray(hits)
                hits_t = h if hits_t is None else hits_t + h
        apply_overflow_policy(self, ovf_t,
                              grow_rebuild=self._grow_rebuild)
        cnt_t = max(cnt_t, 1.0)
        if hits_t is None:
            hits_t = np.zeros(len(self.cfg.eval_ks))
        out = {"mrr": rr_t / cnt_t}
        for i, k in enumerate(self.cfg.eval_ks):
            out[f"hits@{k}"] = float(hits_t[i]) / cnt_t
        return out

    def encode_batch(self, params, node_ids) -> np.ndarray:
        """Streamed-partitioned inference encode: pad to the configured
        batch size, run plan/host/apply-encode rounds, drop pad rows."""
        node_ids = np.asarray(node_ids, np.int32)
        m = node_ids.shape[0]
        if m == 0:
            d = getattr(self.model, "encoder", self.model).out_dim
            return np.zeros((0, d), np.float32)
        bs = self.batch_size
        out = []
        for s in range(0, m, bs):
            chunk = node_ids[s: s + bs]
            pad = np.resize(chunk, bs)
            # Anchors-only plan (r5 review): inference routes and ships
            # ONLY the anchor tree's rows through the host round trip —
            # the full training plan would gather ~3x the rows
            # (positives + random negatives) and discard them.
            plan_out = self._plan_encode_step(pad)
            ans = self._host_answers_enc(plan_out[0])
            z = self._encode(params, ans, *plan_out[1:])
            out.append(np.asarray(z)[: len(chunk)])
        return np.concatenate(out, axis=0)

    def _host_answers_enc(self, recv):
        """Owner-side host gather for the encode plan (same as training
        by default; the typed trainer narrows to the anchor tree's node
        types)."""
        return self._host_answers(recv)

    def fit(
        self,
        state: TrainState,
        train_anchors: np.ndarray,
        val_anchors: np.ndarray,
        *,
        batch_size: Optional[int] = None,
        num_epochs: int = 1,
        val_every_n_batches: int = 100,
        num_val_batches: int = 8,
        early_stop_patience: int = 5,
        log_every: int = 50,
        scalar_logger=None,
        checkpoint_dir: Optional[str] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """Training loop with val cadence + early stopping + checkpoint/
        auto-resume — the NALP fit contract (ref training_process.py:
        204-251 semantics) over the beyond-HBM backends, shared with the
        replicated/HBM-partitioned trainers (training/fit_loop.py).
        Train AND val batches wrap-pad to ``self.batch_size``."""
        from gigl_tpu.training.fit_loop import nalp_fit_loop

        if batch_size is not None and batch_size != self.batch_size:
            raise ValueError(
                f"batch_size {batch_size} != the compiled batch_size "
                f"{self.batch_size} (fixed at construction)")
        return nalp_fit_loop(
            self, state, train_anchors, val_anchors,
            batch_size=self.batch_size, num_epochs=num_epochs,
            val_every_n_batches=val_every_n_batches,
            num_val_batches=num_val_batches,
            early_stop_patience=early_stop_patience, log_every=log_every,
            scalar_logger=scalar_logger, checkpoint_dir=checkpoint_dir,
            num_shards=self.num_shards,
            fixed_val_batch_size=self.batch_size)


class StreamingPartitionedNALPTrainer(_StreamedStepDriver):
    """NALP trainer: sharded HOST features + routed device lookups.

    ``_fixed_batch``: step shapes are compiled for exactly one batch size
    (callers wrap-pad partial batches — task_specs.eval, fit_loop).

    API mirrors PartitionedNALPTrainer where applicable; the K-step scan
    is replaced by per-step plan/host/apply because the owner-side gather
    leaves the device. Scope: tabularized mode only; per-shard candidate
    pool by default or the ring global pool
    (``cfg.global_candidate_pool``); CMS logQ correction
    (``cfg.use_cms_correction``) with psum-reduced sketch deltas;
    ``answer_dtype="bfloat16"`` halves the host->device answer payload;
    label-edge features (ref nalp_data_loader.py:44-46) hydrate
    owner-side along the routed positive/hard-negative draws — the
    supervision/hard-neg edge features stay sharded in device HBM with
    their CSR blocks (edge-feature bytes are adjacency-scale, not
    node-feature-scale) and ride the ring loss as the own-block bias.
    """

    def __init__(self, model, store: HostGraphStore, mesh,
                 config: NALPTrainerConfig, *, batch_size: int,
                 optimizer_args: Optional[Dict[str, Any]] = None,
                 axis: str = DATA_AXIS, capacity_factor: float = 4.0,
                 overflow_policy: str = "warn",
                 host_store: Optional[ShardedHostStore] = None,
                 answer_dtype: str = "float32"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = config
        if not getattr(cfg, "cached_hop", False):
            raise ValueError("StreamingPartitionedNALPTrainer is "
                             "tabularized-only: set cached_hop=True")
        if (getattr(cfg, "global_candidate_pool", False)
                and getattr(cfg, "loss_type", "retrieval") != "retrieval"):
            raise ValueError("global_candidate_pool is a retrieval-loss "
                             "contract (ring sampled softmax)")
        if overflow_policy not in ("warn", "raise", "silent", "grow"):
            raise ValueError(
                "overflow_policy must be warn | raise | silent | grow")
        if cfg.num_hard_negs and store.hard_neg_indptr is None:
            raise ValueError("num_hard_negs > 0 needs a store built with "
                             "hard_neg_edges")
        self.model = model
        self.store = store
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self._P = P
        self._NS = NamedSharding
        self.num_shards = p = int(mesh.shape[axis])
        if batch_size % p:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"{p} shards")
        if cfg.num_random_negs % p:
            raise ValueError("num_random_negs must divide the mesh axis "
                             "size")
        self.batch_size = batch_size
        self.capacity_factor = capacity_factor
        self.overflow_policy = overflow_policy
        self.overflow_total = 0
        self.tx = make_optimizer(optimizer_args or {})
        n = store.num_nodes
        self.rows_per_shard = rows = -(-n // p)
        self.feat_dim = store.features.shape[1]
        blk_sh = NamedSharding(mesh, P(axis, None))
        row_sh = NamedSharding(mesh, P(axis))
        # Device-side adjacency: frozen sample tables (packed, -1 invalid)
        # + supervision / hard-negative CSR blocks — O(N/P) ints per chip.
        self._tab_ks = tuple(sorted({int(k) for k in cfg.fanouts[:-1]}))
        if any(int(k) not in store.sample_tables for k in self._tab_ks):
            raise ValueError(
                f"store lacks sample tables for fanouts {self._tab_ks}; "
                f"build/refresh the HostGraphStore with fanouts="
                f"{tuple(cfg.fanouts)}")
        tabs = []
        for k in self._tab_ks:
            ids_t, mask_t = store.sample_tables[int(k)]
            packed = np.where(mask_t, ids_t, -1).astype(np.int32)
            pad = np.full((p * rows, packed.shape[1]), -1, np.int32)
            pad[: packed.shape[0]] = packed
            tabs.append(jax.device_put(pad, row_sh))
        self._tabs = tuple(tabs)
        self._tab_index = {k: i for i, k in enumerate(self._tab_ks)}
        # Supervision / hard-neg CSR blocks; label-edge features (when the
        # store carries them) are sharded CSR-slot-aligned in device HBM —
        # same placement as the HBM PartitionedGraph (dist_sampled
        # .build:239-258) — and hydrated owner-side by the routed draws.
        ef_sh = NamedSharding(mesh, P(axis, None, None))
        self._has_sup_ef = store.sup_edge_features is not None
        if self._has_sup_ef:
            a, b, ef = _shard_csr(
                store.supervision_indptr, store.supervision_indices, p,
                rows, weights=np.asarray(store.sup_edge_features,
                                         np.float32))
            self._sup_ef = jax.device_put(ef, ef_sh)
        else:
            a, b = _shard_csr(store.supervision_indptr,
                              store.supervision_indices, p, rows)
            self._sup_ef = jax.device_put(
                np.zeros((p, 1, 0), np.float32), ef_sh)
        self._sup = (jax.device_put(a, blk_sh), jax.device_put(b, blk_sh))
        self._has_hard_ef = (store.hard_neg_indptr is not None
                             and store.hard_neg_edge_features is not None)
        if store.hard_neg_indptr is not None:
            if self._has_hard_ef:
                a, b, ef = _shard_csr(
                    store.hard_neg_indptr, store.hard_neg_indices, p, rows,
                    weights=np.asarray(store.hard_neg_edge_features,
                                       np.float32))
                self._hard_ef = jax.device_put(ef, ef_sh)
            else:
                a, b = _shard_csr(store.hard_neg_indptr,
                                  store.hard_neg_indices, p, rows)
                self._hard_ef = jax.device_put(
                    np.zeros((p, 1, 0), np.float32), ef_sh)
            self._hard = (jax.device_put(a, blk_sh),
                          jax.device_put(b, blk_sh))
        else:
            self._hard = (jax.device_put(
                np.zeros((p, rows + 1), np.int32), blk_sh),
                jax.device_put(np.zeros((p, 1), np.int32), blk_sh))
            self._hard_ef = jax.device_put(
                np.zeros((p, 1, 0), np.float32), ef_sh)
        # Host store: this process's shards only.
        self._host_auto = host_store is None
        if host_store is None:
            local = sorted({d.process_index for d in mesh.devices.flat})
            if len(local) > 1:
                # Multi-process: each process holds ITS devices' shards.
                mine = [i for i, d in enumerate(mesh.devices.flat)
                        if d.process_index == jax.process_index()]
            else:
                mine = list(range(p))
            host_store = ShardedHostStore.from_host_store(
                store, num_shards=p, local_shards=mine)
        self.host = host_store
        # Static per-shard tree shapes -> union size + routing capacity.
        bb = batch_size // p
        self._group_shapes = self._build_group_shapes(bb)
        self._union = sum(int(np.prod(s)) for shapes in self._group_shapes
                          for s in shapes)
        self.capacity = request_capacity(self._union, p, capacity_factor)
        # Anchors-only inference plan: routes just the anchor tree.
        self._enc_shapes = self._group_shapes[0]
        self._enc_union = sum(int(np.prod(s)) for s in self._enc_shapes)
        self.capacity_enc = request_capacity(self._enc_union, p,
                                             capacity_factor)
        # "bfloat16" halves the host->device answer payload (the streamed
        # path's PCIe bound); the encoder upcasts. Degree counts > 256
        # round in bf16 (only the gcn-normalization weights notice).
        from gigl_tpu.utils.cast import answer_cast_from_str

        self._answer_np_dtype, self._answer_cast = answer_cast_from_str(
            answer_dtype)
        self._global_pool = bool(getattr(cfg, "global_candidate_pool",
                                         False))
        self._build_programs()

    # -- static shape bookkeeping -----------------------------------------
    def _build_group_shapes(self, bb: int) -> List[List[Tuple[int, ...]]]:
        """Per-group per-level shapes (shard-local), in flattening order:
        anchors, positives, local random negatives[, hard negatives]."""
        cfg = self.cfg
        roots = [(bb,), (bb, cfg.num_positives),
                 (cfg.num_random_negs // self.num_shards,)]
        if cfg.num_hard_negs > 0:
            roots.append((bb, cfg.num_hard_negs))
        out = []
        for r in roots:
            shapes = [r]
            for k in cfg.fanouts[:-1]:
                shapes.append(shapes[-1] + (int(k),))
            out.append(shapes)
        return out

    # -- SPMD program bodies ----------------------------------------------
    def _expand_joint(self, tabs, roots_concat):
        """Joint tabularized tree expansion (one routed gather per hop for
        the concat of ALL groups' frontiers) — same table keying/flattening
        as PartitionedNALPTrainer._sample_trees_joint."""
        from gigl_tpu.parallel.feature_lookup import routed_gather

        frontier = roots_concat.astype(jnp.int32)
        pmask = jnp.ones(frontier.shape, bool)
        levels = [(frontier, pmask)]
        ovf = jnp.zeros((), jnp.int32)
        for k in self.cfg.fanouts[:-1]:
            row, ok = routed_gather(
                tabs[self._tab_index[int(k)]], frontier, axis=self.axis,
                capacity_factor=self.capacity_factor)
            ovf += jnp.sum(~ok, dtype=jnp.int32)
            m = (row >= 0) & pmask[:, None] & ok[:, None]
            nbr = jnp.where(m, row, 0)
            frontier, pmask = nbr.reshape(-1), m.reshape(-1)
            levels.append((frontier, pmask))
        return levels, ovf

    def _plan_local(self, tabs, sup_ip, sup_ix, hard_ip, hard_ix,
                    sup_ef, hard_ef, anchors, step):
        """Batch draws + tree expansion + routing; ends at the request
        all_to_all (the front half of routed_gather). Label-edge features
        hydrate owner-side along the routed positive/hard-neg draws (ref
        nalp_data_loader.py:44-46); zero-width placeholders keep the SPMD
        arity fixed when the store carries none."""
        cfg = self.cfg
        anchors = anchors.astype(jnp.int32)
        if self._has_sup_ef:
            pos, pos_mask, ok_p, pos_ef = routed_sample_neighbors(
                sup_ip[0], sup_ix[0], anchors, cfg.num_positives,
                axis=self.axis, seed=cfg.seed, hop=1_000_003 + step,
                capacity_factor=self.capacity_factor,
                local_edge_feats=sup_ef[0])
        else:
            pos, pos_mask, ok_p = routed_sample_neighbors(
                sup_ip[0], sup_ix[0], anchors, cfg.num_positives,
                axis=self.axis, seed=cfg.seed, hop=1_000_003 + step,
                capacity_factor=self.capacity_factor)
            pos_ef = jnp.zeros(pos.shape + (0,), jnp.float32)
        ovf = jnp.sum(~ok_p, dtype=jnp.int32)
        bits = counter_rng_uniform(
            jnp.arange(cfg.num_random_negs, dtype=jnp.int32),
            seed=cfg.seed, hop=3_000_017 + step, num_slots=1)[:, 0]
        rand = (bits % jnp.uint32(self.store.num_nodes)).astype(jnp.int32)
        r_per = cfg.num_random_negs // self.num_shards
        shard = jax.lax.axis_index(self.axis)
        rand_local = jax.lax.dynamic_slice_in_dim(rand, shard * r_per,
                                                  r_per)
        h = cfg.num_hard_negs
        if h > 0:
            if self._has_hard_ef:
                hard, hard_mask, ok_h, hn_ef = routed_sample_neighbors(
                    hard_ip[0], hard_ix[0], anchors, h, axis=self.axis,
                    seed=cfg.seed, hop=2_000_003 + step,
                    capacity_factor=self.capacity_factor,
                    local_edge_feats=hard_ef[0])
            else:
                hard, hard_mask, ok_h = routed_sample_neighbors(
                    hard_ip[0], hard_ix[0], anchors, h, axis=self.axis,
                    seed=cfg.seed, hop=2_000_003 + step,
                    capacity_factor=self.capacity_factor)
                hn_ef = jnp.zeros(hard.shape + (0,), jnp.float32)
            ovf += jnp.sum(~ok_h, dtype=jnp.int32)
        else:
            hard = jnp.zeros(anchors.shape + (0,), jnp.int32)
            hard_mask = jnp.zeros(anchors.shape + (0,), bool)
            hn_ef = jnp.zeros(hard.shape + (0,), jnp.float32)
        groups = [anchors, pos, rand_local] + ([hard] if h > 0 else [])
        roots_concat = jnp.concatenate([g.reshape(-1) for g in groups])
        levels, ovf2 = self._expand_joint(tabs, roots_concat)
        ovf += ovf2
        # Flatten in PartitionedNALPTrainer._encode_groups order: per
        # group, all its levels consecutively.
        per_group = self._split_levels(levels)
        all_ids = jnp.concatenate(
            [ids.reshape(-1) for ids_l, _ in per_group for ids in ids_l])
        masks_flat = tuple(m for _, m_l in per_group for m in m_l)
        req, owner, pos_idx, ok = _route_requests(
            all_ids.astype(jnp.int32), self.rows_per_shard,
            self.num_shards, self.capacity)
        recv = jax.lax.all_to_all(req, self.axis, 0, 0, tiled=True)
        return (recv, owner, pos_idx, ok, masks_flat, anchors, pos,
                pos_mask, hard, hard_mask, pos_ef, hn_ef, rand, ovf)

    def _split_levels(self, levels):
        """Un-concat the joint levels back into per-group trees of
        (ids, masks) with static shapes (_group_shapes)."""
        out = []
        offs = [0] * len(levels)
        for shapes in self._group_shapes:
            ids_l, m_l = [], []
            for li, (flat, fmask) in enumerate(levels):
                n_elem = int(np.prod(shapes[li]))
                sl = slice(offs[li], offs[li] + n_elem)
                offs[li] += n_elem
                ids_l.append(flat[sl].reshape(shapes[li]))
                m_l.append(fmask[sl].reshape(shapes[li]))
            out.append((ids_l, m_l))
        return out

    def _embed_groups(self, params, rows, masks_flat, train, rng,
                      group_shapes=None):
        """Split the un-routed fused rows per group/level and encode."""
        d = self.feat_dim
        rows = rows.astype(jnp.float32)
        feats = rows[:, :d]
        degs = rows[:, d]
        cache = rows[:, d + 1:]
        rngs = {"dropout": rng} if (train and rng is not None) else None
        embs = []
        offset = 0
        mi = 0
        for shapes in (group_shapes if group_shapes is not None
                       else self._group_shapes):
            f_l, c_l, m_l, g_l = [], [], [], []
            for s in shapes:
                n_elem = int(np.prod(s))
                sl = slice(offset, offset + n_elem)
                offset += n_elem
                f_l.append(feats[sl].reshape(s + (d,)))
                c_l.append(cache[sl].reshape(s + (d,)))
                g_l.append(degs[sl].reshape(s))
                m_l.append(masks_flat[mi].reshape(s))
                mi += 1
            emb = self.model.apply(params, f_l, m_l, None, train=train,
                                   hop_degrees=g_l, cached_agg=c_l,
                                   rngs=rngs)
            embs.append(emb.reshape(shapes[0] + (emb.shape[-1],)))
        return embs

    def _apply_local(self, state, ans, owner, pos_idx, ok, masks_flat,
                     anchors, pos, pos_mask, hard, hard_mask, pos_ef,
                     hard_ef, rand, ovf, rng):
        """Answer all_to_all + un-permute (the back half of routed_gather)
        -> encode -> loss -> pmean'd grads -> update."""
        back = jax.lax.all_to_all(ans, self.axis, 0, 0, tiled=True)
        rows, ok_req = _unroute(back, owner, pos_idx, ok)
        ovf = ovf + jnp.sum(~ok_req, dtype=jnp.int32)
        batch = NALPBatch(anchors=anchors, pos=pos, pos_mask=pos_mask,
                          hard_neg=hard, hard_neg_mask=hard_mask,
                          random_neg=rand,
                          pos_edge_feats=(pos_ef if self._has_sup_ef
                                          else None),
                          hard_neg_edge_feats=(hard_ef if self._has_hard_ef
                                               else None))

        def loss_fn(p):
            embs = self._embed_groups(p, rows, masks_flat, True, rng)
            q, pos_e, rand_l = embs[0], embs[1], embs[2]
            hard_e = embs[3] if self.cfg.num_hard_negs > 0 else None
            if self._global_pool:
                # Ring/streaming-logsumexp retrieval over the GLOBAL pool
                # with candidates kept sharded (same contract as
                # PartitionedNALPTrainer._ring_loss_local, incl. the
                # label-edge score terms as the own-block bias).
                from gigl_tpu.losses.sharded_retrieval import (
                    ring_candidate_pool,
                    ring_own_block_edge_bias,
                    ring_retrieval_loss,
                )

                cfg = self.cfg
                b, p_, _d = pos_e.shape
                r_per = cfg.num_random_negs // self.num_shards
                shard = jax.lax.axis_index(self.axis)
                rand_ids_local = jax.lax.dynamic_slice_in_dim(
                    batch.random_neg, shard * r_per, r_per)
                q_rows = jnp.repeat(q, p_, axis=0)
                cand_local, cand_ids, cmask, pos_qids = ring_candidate_pool(
                    batch, pos_e, hard_e, rand_l, rand_ids_local)
                bias = None
                if getattr(self.model, "edge_scorer", None) is not None:
                    bias = ring_own_block_edge_bias(
                        lambda ef: self.model.apply(p, ef,
                                                    method="edge_score"),
                        batch, cand_local.shape[0])
                cms = state.cms
                log_q = None
                if cms is not None:
                    # Global counts: each shard's local candidates appear
                    # once in the global pool -> one psum of the delta
                    # (same contract as the HBM ring path).
                    from gigl_tpu.losses.count_min_sketch import (
                        CountMinSketch,
                        cms_add,
                        cms_sampling_probability,
                    )

                    zero = CountMinSketch(jnp.zeros_like(cms.table),
                                          jnp.zeros_like(cms.total))
                    delta = cms_add(zero, cand_ids)
                    cms = CountMinSketch(
                        table=cms.table + jax.lax.psum(delta.table,
                                                       self.axis),
                        total=cms.total + jax.lax.psum(delta.total,
                                                       self.axis))
                    log_q = jnp.log(jnp.clip(
                        cms_sampling_probability(cms, cand_ids), 1e-10,
                        None)).astype(jnp.float32)
                ce_sum, count = ring_retrieval_loss(
                    q_rows, cand_local, axis=self.axis,
                    temperature=cfg.temperature,
                    decode_all_pairs=lambda a, c: self.model.apply(
                        p, a, c, method="decode_all_pairs"),
                    label_local_cols=jnp.arange(b * p_, dtype=jnp.int32),
                    query_ids=jnp.repeat(batch.anchors, p_, axis=0),
                    own_pos_ids=batch.pos.reshape(-1),
                    candidate_ids=cand_ids,
                    pos_col_query_ids=pos_qids,
                    candidate_mask=cmask,
                    candidate_log_q=log_q,
                    query_mask=batch.pos_mask.reshape(-1),
                    remove_accidental_hits=cfg.remove_accidental_hits,
                    own_block_bias=bias)
                total = jax.lax.psum(count, self.axis).astype(jnp.float32)
                loss = ce_sum * self.num_shards / jnp.maximum(total, 1.0)
                return loss, cms
            rand_emb = jax.lax.all_gather(rand_l, self.axis, axis=0,
                                          tiled=True)
            loss, cms = nalp_loss_from_embeddings(
                self.model, p, self.cfg, batch, q, pos_e, hard_e,
                rand_emb, state.cms,
                cms_reduce=(lambda x: jax.lax.psum(x, self.axis))
                if state.cms is not None else None)
            return loss, cms

        (loss, cms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.pmean(grads, self.axis)
        loss = jax.lax.pmean(loss, self.axis)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, cms=cms)
        return new_state, loss, jax.lax.psum(ovf, self.axis)

    def _apply_eval_local(self, params, ans, owner, pos_idx, ok,
                          masks_flat, anchors, pos, pos_mask, hard,
                          hard_mask, pos_ef, hard_ef, rand, ovf):
        """Eval counterpart of _apply_local: same un-route + encode, then
        the reference ranking metrics (positives vs shared random
        negatives), psum-reduced — mirrors
        PartitionedNALPTrainer._eval_local."""
        from gigl_tpu.losses.metrics import hits_at_k, mean_reciprocal_rank

        back = jax.lax.all_to_all(ans, self.axis, 0, 0, tiled=True)
        rows, ok_req = _unroute(back, owner, pos_idx, ok)
        ovf = ovf + jnp.sum(~ok_req, dtype=jnp.int32)
        embs = self._embed_groups(params, rows, masks_flat, False, None)
        q, pos_e, rand_l = embs[0], embs[1], embs[2]
        rand_emb = jax.lax.all_gather(rand_l, self.axis, axis=0,
                                     tiled=True)
        b, p_, _ = pos_e.shape
        pos_scores = self.model.apply(params, q[:, None, :], pos_e,
                                      method="decode")
        rand_scores = self.model.apply(params, q, rand_emb,
                                       method="decode_all_pairs")
        pos_flat = pos_scores.reshape(-1)
        mask_flat = pos_mask.reshape(-1)
        neg_rep = jnp.repeat(rand_scores, p_, axis=0)
        acc = (pos.reshape(-1)[:, None] == rand[None, :])
        rr_sum, rr_cnt = mean_reciprocal_rank(
            pos_flat, neg_rep, pos_mask=mask_flat, neg_mask=~acc)
        hits, _ = hits_at_k(pos_flat, neg_rep, self.cfg.eval_ks,
                            pos_mask=mask_flat, neg_mask=~acc)
        hits_arr = jnp.stack([hits[int(k)] for k in self.cfg.eval_ks])
        return (jax.lax.psum(rr_sum, self.axis),
                jax.lax.psum(hits_arr, self.axis),
                jax.lax.psum(rr_cnt, self.axis),
                jax.lax.psum(ovf, self.axis))

    def _plan_enc_local(self, tabs, anchors):
        """Anchors-only plan: tree expansion + routing for the ANCHOR
        group alone — no batch draws, no negative trees (inference ships
        ~3x fewer rows through the host round trip than the train plan)."""
        levels, ovf = self._expand_joint(tabs, anchors.astype(jnp.int32)
                                         .reshape(-1))
        del ovf  # dropped expansion rows also zero-mask below
        ids_flat = jnp.concatenate([l.reshape(-1) for l, _m in levels])
        masks_flat = tuple(m for _l, m in levels)
        req, owner, pos_idx, ok = _route_requests(
            ids_flat.astype(jnp.int32), self.rows_per_shard,
            self.num_shards, self.capacity_enc)
        recv = jax.lax.all_to_all(req, self.axis, 0, 0, tiled=True)
        return recv, owner, pos_idx, ok, masks_flat

    def _encode_local(self, params, ans, owner, pos_idx, ok, masks_flat):
        """Inference encode of the anchor group (plan/host/apply split of
        PartitionedNALPTrainer.encode_batch; fed by _plan_enc_local)."""
        back = jax.lax.all_to_all(ans, self.axis, 0, 0, tiled=True)
        rows, _ok_req = _unroute(back, owner, pos_idx, ok)
        embs = self._embed_groups(params, rows, masks_flat, False, None,
                                  group_shapes=[self._enc_shapes])
        return embs[0]

    def _plan_encode_step(self, anchors):
        anchors = np.asarray(anchors, np.int32)
        return self._plan_enc(self._tabs, self._put(anchors, self.axis))

    def _build_programs(self) -> None:
        P, mesh, axis = self._P, self.mesh, self.axis
        n_levels = len(self.cfg.fanouts)
        n_groups = len(self._group_shapes)
        masks_spec = tuple(P(axis) for _ in range(n_groups * n_levels))
        tabs_spec = tuple(P(axis) for _ in self._tabs)
        self._plan = jax.jit(jax.shard_map(
            self._plan_local, mesh=mesh,
            in_specs=(tabs_spec, P(axis, None), P(axis, None),
                      P(axis, None), P(axis, None), P(axis, None, None),
                      P(axis, None, None), P(axis), P()),
            out_specs=(P(axis, None), P(axis), P(axis), P(axis),
                       masks_spec, P(axis), P(axis), P(axis),
                       P(axis), P(axis), P(axis), P(axis), P(), P()),
            check_vma=False))
        self._apply = jax.jit(jax.shard_map(
            self._apply_local, mesh=mesh,
            in_specs=(P(), P(axis, None, None), P(axis), P(axis), P(axis),
                      masks_spec, P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False), donate_argnums=(0,))
        self._apply_eval = jax.jit(jax.shard_map(
            self._apply_eval_local, mesh=mesh,
            in_specs=(P(), P(axis, None, None), P(axis), P(axis), P(axis),
                      masks_spec, P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False))
        enc_masks_spec = tuple(P(axis) for _ in range(n_levels))
        self._plan_enc = jax.jit(jax.shard_map(
            self._plan_enc_local, mesh=mesh,
            in_specs=(tabs_spec, P(axis)),
            out_specs=(P(axis, None), P(axis), P(axis), P(axis),
                       enc_masks_spec),
            check_vma=False))
        self._encode = jax.jit(jax.shard_map(
            self._encode_local, mesh=mesh,
            in_specs=(P(), P(axis, None, None), P(axis), P(axis), P(axis),
                      enc_masks_spec),
            out_specs=P(axis),
            check_vma=False))

    # -- host round --------------------------------------------------------
    def _host_answers(self, recv) -> jax.Array:
        """Owner-side gather on HOST: each addressable shard's received
        request ids are answered from this process's host store rows; the
        answers re-enter the mesh as one [P*P, C, W] sharded array."""
        p, w = self.num_shards, self.host.width
        cap = recv.shape[1]
        blocks: Dict[int, np.ndarray] = {}
        for sh in recv.addressable_shards:
            # A 1-device mesh yields the full array as one shard with
            # index slice(None) — start is None, meaning 0.
            s = int(sh.index[0].start or 0) // p
            ids = np.asarray(sh.data)          # [P, C] global ids
            blocks[s] = self._answer_cast(self.host.answer_shard(s, ids))
        sharding = self._NS(self.mesh, self._P(self.axis, None, None))

        def cb(index):
            s = int(index[0].start or 0) // p
            return blocks[s]

        return jax.make_array_from_callback(
            (p * p, cap, w), sharding, cb)

    # -- public API --------------------------------------------------------
    def init_state(self, rng: jax.Array, batch_size: Optional[int] = None,
                   params: Optional[Any] = None) -> TrainState:
        if batch_size is not None and batch_size != self.batch_size:
            raise ValueError(
                f"batch_size {batch_size} != the compiled batch_size "
                f"{self.batch_size} (fixed at construction)")
        if params is None:
            d = self.feat_dim
            feats, masks = [], []
            shape = (max(self.batch_size // self.num_shards, 1),)
            for k in self.cfg.fanouts:
                feats.append(jnp.zeros(shape + (d,), jnp.float32))
                masks.append(jnp.ones(shape, bool))
                shape = shape + (int(k),)
            feats.append(jnp.zeros(shape + (d,), jnp.float32))
            masks.append(jnp.ones(shape, bool))
            if hasattr(type(self.model), "warmup"):
                # Touch every parameterized submodule (edge scorer, MLP
                # decoders) at init — same as the HBM partitioned trainer.
                lef = None
                if self._has_sup_ef:
                    lef = jnp.zeros(
                        (1, self.store.sup_edge_features.shape[-1]),
                        jnp.float32)
                params = self.model.init(rng, feats, masks,
                                         label_edge_feats=lef,
                                         method="warmup")
            else:
                params = self.model.init(rng, feats, masks)
        from gigl_tpu.losses.count_min_sketch import cms_init

        cms = (cms_init()
               if getattr(self.cfg, "use_cms_correction", False) else None)
        return put_replicated(
            TrainState(params=params, opt_state=self.tx.init(params),
                       step=jnp.zeros((), jnp.int32), cms=cms), self.mesh)

    def _put(self, x, *cols):
        return jax.device_put(np.asarray(x),
                              self._NS(self.mesh, self._P(*cols)))

    def _plan_step(self, anchors, step: int):
        """Dispatch the plan program (async): batch draws + tree expansion
        + routing, ending at the request all_to_all."""
        anchors = np.asarray(anchors, np.int32)
        if anchors.shape[0] != self.batch_size:
            raise ValueError(f"anchors batch {anchors.shape[0]} != "
                             f"configured batch_size {self.batch_size}")
        return self._plan(
            self._tabs, self._sup[0], self._sup[1], self._hard[0],
            self._hard[1], self._sup_ef, self._hard_ef,
            self._put(anchors, self.axis),
            self._put(np.asarray(step, np.int32)))

    def _grow_rebuild(self) -> None:
        self.capacity = request_capacity(self._union, self.num_shards,
                                         self.capacity_factor)
        self.capacity_enc = request_capacity(self._enc_union,
                                             self.num_shards,
                                             self.capacity_factor)
        self._build_programs()

    def refresh_cache(self, epoch: int = 0) -> None:
        """Resample the frozen tabularized tables + hop-cache aggregate
        (the analog of re-running the reference's Subgraph Sampler) — same
        seed schedule as the HBM trainers (dist_sampled.py refresh_cache).
        Rebuilds the device sample tables AND the fused host store; array
        shapes are unchanged, so no recompile."""
        if not self._host_auto:
            raise ValueError(
                "refresh_cache over a constructor-supplied host_store "
                "would rebuild it from store.refresh() and discard the "
                "custom layout; rebuild the ShardedHostStore yourself "
                "and construct a new trainer (or pass host_store=None)")
        self.store.refresh(
            fanouts=tuple(self.cfg.fanouts),
            seed=self.cfg.seed + 1_299_709 * epoch,
            agg=getattr(self.store, "agg_kind", "mean"))
        from jax.sharding import NamedSharding, PartitionSpec as P

        p, rows = self.num_shards, self.rows_per_shard
        row_sh = NamedSharding(self.mesh, P(self.axis))
        tabs = []
        for k in self._tab_ks:
            ids_t, mask_t = self.store.sample_tables[int(k)]
            packed = np.where(mask_t, ids_t, -1).astype(np.int32)
            pad = np.full((p * rows, packed.shape[1]), -1, np.int32)
            pad[: packed.shape[0]] = packed
            tabs.append(jax.device_put(pad, row_sh))
        self._tabs = tuple(tabs)
        self.host = ShardedHostStore.from_host_store(
            self.store, num_shards=p, local_shards=self.host.local_shards)

class StreamingPartitionedHeteroNALPTrainer(_StreamedStepDriver,
                                            PartitionedHeteroNALPTrainer):
    """TYPED beyond-HBM composition: per-NODE-TYPE sharded HOST feature
    stores + routed device lookups (the typed analog of
    StreamingPartitionedNALPTrainer; ref per-type Feature stores,
    dist_link_prediction_dataset.py:428-439).

    Device HBM holds only the typed adjacency: per-edge-type CSR blocks,
    frozen sample tables, supervision/hard-neg CSRs (build the
    PartitionedHeteroGraph with ``features_on_device=False``). Each
    process's host RAM holds ITS shards' rows of every node type's
    feature table. A step splits the HBM typed step
    (PartitionedHeteroNALPTrainer) at the per-node-type hydration
    gathers:

      plan:  batch draws + op-tree expansion (device, routed) + one
             counting-sort routing + request all_to_all PER NODE TYPE,
      host:  per node type, the owner-side feature-row gather runs on
             host from that type's ShardedHostStore,
      apply: per-type answer all_to_alls + un-permute -> typed encode ->
             loss (per-shard pool or ring global pool) -> pmean'd grads.

    Draws are bit-identical to PartitionedHeteroNALPTrainer (same
    counter-RNG keying, same frozen tables), so loss trajectories match
    exactly (tests/test_streaming_partitioned.py typed parity)."""

    def __init__(self, model, pgraph, paths, config, mesh, *,
                 batch_size: int,
                 host_features: Optional[Dict[str, np.ndarray]] = None,
                 host_stores: Optional[Dict[str, ShardedHostStore]] = None,
                 optimizer_args: Optional[Dict[str, Any]] = None,
                 axis: str = DATA_AXIS, capacity_factor: float = 4.0,
                 overflow_policy: str = "warn",
                 answer_dtype: str = "float32"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        super().__init__(model, pgraph, paths, config, mesh,
                         optimizer_args=optimizer_args, axis=axis,
                         capacity_factor=capacity_factor,
                         overflow_policy=overflow_policy)
        self._P, self._NS = P, NamedSharding
        p = self.num_shards
        if batch_size % p:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"{p} shards")
        self.batch_size = batch_size
        from gigl_tpu.utils.cast import answer_cast_from_str

        self._answer_np_dtype, self._answer_cast = answer_cast_from_str(
            answer_dtype)
        # Static per-group tree structure (flat-rooted level shapes) and
        # the per-node-type level bucketing — MUST be identical between
        # the plan's routing and the apply's un-slicing.
        cfg = config
        bb = batch_size // p
        a_nt, c_nt = str(cfg.anchor_node_type), str(cfg.candidate_node_type)
        roots = [((bb,), a_nt), ((bb, cfg.num_positives), c_nt),
                 ((cfg.num_random_negs // p,), c_nt)]
        if cfg.num_hard_negs > 0:
            roots.append(((bb, cfg.num_hard_negs), c_nt))
        self._groups_static = []
        for root_shape, nt in roots:
            spec = self.paths[nt]
            shapes = [(int(np.prod(root_shape)),)]
            types = [nt]
            for op in spec:
                shapes.append(shapes[op.parent + 1] + (int(op.fanout),))
                types.append(str(op.neighbor_node_type))
            self._groups_static.append((nt, spec, shapes, types,
                                        root_shape))
        by_type: Dict[str, List[Tuple[int, int]]] = {}
        for t_i, (_nt, _sp, shapes, types, _rs) in enumerate(
                self._groups_static):
            for l_i, lt in enumerate(types):
                by_type.setdefault(lt, []).append((t_i, l_i))
        self._nt_order = tuple(sorted(by_type))
        self._nt_levels = {nt: tuple(by_type[nt]) for nt in self._nt_order}
        self._union = {
            nt: sum(int(np.prod(self._groups_static[t][2][l]))
                    for (t, l) in self._nt_levels[nt])
            for nt in self._nt_order}
        self._cap = {nt: request_capacity(self._union[nt], p,
                                          capacity_factor)
                     for nt in self._nt_order}
        # Anchors-only inference plan: bucket just group 0's levels.
        enc_types = self._groups_static[0][3]
        by_type_enc: Dict[str, List[Tuple[int, int]]] = {}
        for l_i, lt in enumerate(enc_types):
            by_type_enc.setdefault(lt, []).append((0, l_i))
        self._enc_nt_order = tuple(sorted(by_type_enc))
        self._enc_nt_levels = {nt: tuple(by_type_enc[nt])
                               for nt in self._enc_nt_order}
        self._enc_union = {
            nt: sum(int(np.prod(self._groups_static[t][2][l]))
                    for (t, l) in self._enc_nt_levels[nt])
            for nt in self._enc_nt_order}
        self._enc_cap = {nt: request_capacity(self._enc_union[nt], p,
                                              capacity_factor)
                         for nt in self._enc_nt_order}
        # Per-node-type host stores: this process's shards only.
        if host_stores is None:
            if host_features is None:
                raise ValueError("pass host_features={node_type: [N, D]} "
                                 "or host_stores")
            procs = sorted({d.process_index for d in mesh.devices.flat})
            if len(procs) > 1:
                mine = [i for i, d in enumerate(mesh.devices.flat)
                        if d.process_index == jax.process_index()]
            else:
                mine = list(range(p))
            host_stores = {
                str(nt): ShardedHostStore.from_array(
                    f, num_shards=p, local_shards=mine)
                for nt, f in host_features.items()}
        self._host = host_stores
        for nt in self._nt_order:
            if nt not in self._host:
                raise ValueError(f"no host store for node type {nt!r}")
        self._build_sp_programs()

    # -- SPMD bodies -------------------------------------------------------
    def _sp_plan_local(self, ip_l, ix_l, w_l, sup_ip, sup_ix, hard_ip,
                       hard_ix, sup_ef_l, hard_ef_l, tabs, anchors, step):
        cfg = self.cfg
        ip_l = self._squeeze_csr(ip_l)
        ix_l = self._squeeze_csr(ix_l)
        w_l = self._squeeze_csr(w_l)
        sup_ip, sup_ix = sup_ip[0], sup_ix[0]
        hard_ip, hard_ix = hard_ip[0], hard_ix[0]
        sup_ef_l, hard_ef_l = sup_ef_l[0], hard_ef_l[0]
        batch, ovf = self._make_batch(sup_ip, sup_ix, hard_ip, hard_ix,
                                      sup_ef_l, hard_ef_l,
                                      anchors.astype(jnp.int32), step)
        r_per = cfg.num_random_negs // self.num_shards
        shard = jax.lax.axis_index(self.axis)
        rand_local = jax.lax.dynamic_slice_in_dim(
            batch.random_neg, shard * r_per, r_per)
        group_roots = [batch.anchors, batch.pos, rand_local]
        if cfg.num_hard_negs > 0:
            group_roots.append(batch.hard_neg)
        trees = []
        for off, (roots, (nt, spec, _sh, _ty, _rs)) in enumerate(
                zip(group_roots, self._groups_static)):
            blocks, o = self._sample_tree(
                ip_l, ix_l, w_l, tabs, roots.reshape(-1), nt, spec,
                cfg.seed + off)
            trees.append(blocks)
            ovf += o
        ids_flat = tuple(lvl for b in trees for lvl in b.node_ids)
        masks_flat = tuple(m for b in trees for m in b.masks)
        recvs, owners, poss, oks = [], [], [], []
        for nt in self._nt_order:
            flat = jnp.concatenate(
                [trees[t].node_ids[l].reshape(-1)
                 for (t, l) in self._nt_levels[nt]])
            req, owner, pos_idx, ok = _route_requests(
                flat.astype(jnp.int32), self.pg.rows[nt],
                self.num_shards, self._cap[nt])
            recvs.append(jax.lax.all_to_all(req, self.axis, 0, 0,
                                            tiled=True))
            owners.append(owner)
            poss.append(pos_idx)
            oks.append(ok)
        pos_ef = (batch.pos_edge_feats
                  if batch.pos_edge_feats is not None
                  else jnp.zeros(batch.pos.shape + (0,), jnp.float32))
        hard_ef = (batch.hard_neg_edge_feats
                   if batch.hard_neg_edge_feats is not None
                   else jnp.zeros(batch.hard_neg.shape + (0,),
                                  jnp.float32))
        return (tuple(recvs), tuple(owners), tuple(poss), tuple(oks),
                ids_flat, masks_flat, batch.anchors, batch.pos,
                batch.pos_mask, batch.hard_neg, batch.hard_neg_mask,
                pos_ef, hard_ef, batch.random_neg, ovf)

    def _sp_embed_groups(self, params, rows_by_nt, ids_flat, masks_flat,
                         train, rng, groups_static=None, nt_order=None,
                         nt_levels=None):
        from gigl_tpu.sampling.hetero_sampler import TypedBlocks

        groups_static = (groups_static if groups_static is not None
                         else self._groups_static)
        nt_order = nt_order if nt_order is not None else self._nt_order
        nt_levels = nt_levels if nt_levels is not None else self._nt_levels
        gathered: Dict[Tuple[int, int], jnp.ndarray] = {}
        for i, nt in enumerate(nt_order):
            rows = rows_by_nt[i].astype(jnp.float32)
            d = self.pg.feat_dims[nt]
            off = 0
            for (t, l) in nt_levels[nt]:
                shape = groups_static[t][2][l]
                n_elem = int(np.prod(shape))
                gathered[(t, l)] = rows[off: off + n_elem].reshape(
                    shape + (d,))
                off += n_elem
        rngs = {"dropout": rng} if (train and rng is not None) else None
        embs = []
        idx = 0
        for t, (nt, spec, shapes, _types, root_shape) in enumerate(
                groups_static):
            n_l = len(spec) + 1
            blocks = TypedBlocks(
                root_node_type=nt, spec=spec,
                node_ids=list(ids_flat[idx: idx + n_l]),
                masks=list(masks_flat[idx: idx + n_l]),
                edge_slots=[None] * n_l)
            idx += n_l
            feats = [gathered[(t, l)] for l in range(n_l)]
            emb = self.model.apply(params, blocks, feats, train=train,
                                   rngs=rngs)
            embs.append(emb.reshape(root_shape + (emb.shape[-1],)))
        return embs

    def _sp_unroute(self, answers, owners, poss, oks, ovf):
        rows_by_nt = []
        for i in range(len(answers)):
            back = jax.lax.all_to_all(answers[i], self.axis, 0, 0,
                                      tiled=True)
            rows, ok_req = _unroute(back, owners[i], poss[i], oks[i])
            ovf = ovf + jnp.sum(~ok_req, dtype=jnp.int32)
            rows_by_nt.append(rows)
        return rows_by_nt, ovf

    def _sp_apply_local(self, state, answers, owners, poss, oks, ids_flat,
                        masks_flat, anchors, pos, pos_mask, hard,
                        hard_mask, pos_ef, hard_ef, rand, ovf, rng):
        cfg = self.cfg
        rows_by_nt, ovf = self._sp_unroute(answers, owners, poss, oks, ovf)
        batch = NALPBatch(
            anchors=anchors, pos=pos, pos_mask=pos_mask, hard_neg=hard,
            hard_neg_mask=hard_mask, random_neg=rand,
            pos_edge_feats=pos_ef if self._has_sup_ef else None,
            hard_neg_edge_feats=hard_ef if self._has_hard_ef else None)

        def loss_fn(p):
            embs = self._sp_embed_groups(p, rows_by_nt, ids_flat,
                                         masks_flat, True, rng)
            q, pos_e, rand_l = embs[0], embs[1], embs[2]
            hard_e = embs[3] if cfg.num_hard_negs > 0 else None
            if getattr(cfg, "global_candidate_pool", False):
                return self._ring_loss_local(p, batch, q, pos_e, hard_e,
                                             rand_l)
            rand_g = jax.lax.all_gather(rand_l, self.axis, axis=0,
                                        tiled=True)
            loss, _ = nalp_loss_from_embeddings(
                self.model, p, cfg, batch, q, pos_e, hard_e, rand_g, None)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.pmean(grads, self.axis)
        loss = jax.lax.pmean(loss, self.axis)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, cms=state.cms)
        return new_state, loss, jax.lax.psum(ovf, self.axis)

    def _sp_eval_local(self, params, answers, owners, poss, oks, ids_flat,
                       masks_flat, anchors, pos, pos_mask, hard,
                       hard_mask, pos_ef, hard_ef, rand, ovf):
        from gigl_tpu.losses.metrics import hits_at_k, mean_reciprocal_rank

        cfg = self.cfg
        rows_by_nt, ovf = self._sp_unroute(answers, owners, poss, oks, ovf)
        embs = self._sp_embed_groups(params, rows_by_nt, ids_flat,
                                     masks_flat, False, None)
        q, pos_e, rand_l = embs[0], embs[1], embs[2]
        rand_g = jax.lax.all_gather(rand_l, self.axis, axis=0, tiled=True)
        b, p_, _d = pos_e.shape
        if (getattr(self.model, "edge_scorer", None) is not None
                and self._has_sup_ef):
            pos_scores = self.model.apply(params, q[:, None, :], pos_e,
                                          pos_ef, method="decode")
        else:
            pos_scores = self.model.apply(params, q[:, None, :], pos_e,
                                          method="decode")
        rand_scores = self.model.apply(params, q, rand_g,
                                       method="decode_all_pairs")
        pos_flat = pos_scores.reshape(-1)
        mask_flat = pos_mask.reshape(-1)
        neg_rep = jnp.repeat(rand_scores, p_, axis=0)
        acc = (pos.reshape(-1)[:, None] == rand[None, :])
        rr_sum, rr_cnt = mean_reciprocal_rank(
            pos_flat, neg_rep, pos_mask=mask_flat, neg_mask=~acc)
        hits, _ = hits_at_k(pos_flat, neg_rep, cfg.eval_ks,
                            pos_mask=mask_flat, neg_mask=~acc)
        hits_arr = jnp.stack([hits[int(k)] for k in cfg.eval_ks])
        return (jax.lax.psum(rr_sum, self.axis),
                jax.lax.psum(hits_arr, self.axis),
                jax.lax.psum(rr_cnt, self.axis),
                jax.lax.psum(ovf, self.axis))

    # -- programs ----------------------------------------------------------
    def _build_sp_programs(self) -> None:
        from jax.sharding import PartitionSpec as P

        mesh, axis, pg = self.mesh, self.axis, self.pg
        n_ids = sum(len(sp) + 1 for (_n, sp, _s, _t, _r)
                    in self._groups_static)
        ids_spec = tuple(P(axis) for _ in range(n_ids))
        n_nt = len(self._nt_order)
        plan_in = ({k: P(axis, None) for k in pg.csr_ip},
                   {k: P(axis, None) for k in pg.csr_ix},
                   {k: P(axis, None) for k in (pg.csr_w or {})},
                   P(axis, None), P(axis, None), P(axis, None),
                   P(axis, None), P(axis, None, None),
                   P(axis, None, None),
                   {k: P(axis) for k in (pg.sample_tables or {})},
                   P(axis), P())
        plan_out = (tuple(P(axis, None) for _ in range(n_nt)),
                    tuple(P(axis) for _ in range(n_nt)),
                    tuple(P(axis) for _ in range(n_nt)),
                    tuple(P(axis) for _ in range(n_nt)),
                    ids_spec, ids_spec,
                    P(axis), P(axis), P(axis), P(axis), P(axis),
                    P(axis), P(axis), P(), P())
        self._sp_plan = jax.jit(jax.shard_map(
            self._sp_plan_local, mesh=mesh, in_specs=plan_in,
            out_specs=plan_out, check_vma=False))
        ans_spec = tuple(P(axis, None, None) for _ in range(n_nt))
        meta_spec = tuple(P(axis) for _ in range(n_nt))
        common = (ans_spec, meta_spec, meta_spec, meta_spec, ids_spec,
                  ids_spec, P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(), P())
        self._apply = jax.jit(jax.shard_map(
            self._sp_apply_local, mesh=mesh,
            in_specs=(P(),) + common + (P(),),
            out_specs=(P(), P(), P()),
            check_vma=False), donate_argnums=(0,))
        self._apply_eval = jax.jit(jax.shard_map(
            self._sp_eval_local, mesh=mesh,
            in_specs=(P(),) + common,
            out_specs=(P(), P(), P(), P()),
            check_vma=False))

        n_enc_ids = len(self._groups_static[0][1]) + 1
        enc_ids_spec = tuple(P(axis) for _ in range(n_enc_ids))
        n_enc_nt = len(self._enc_nt_order)
        enc_meta = tuple(P(axis) for _ in range(n_enc_nt))
        self._plan_enc = jax.jit(jax.shard_map(
            self._sp_plan_enc_local, mesh=mesh,
            in_specs=({k: P(axis, None) for k in pg.csr_ip},
                      {k: P(axis, None) for k in pg.csr_ix},
                      {k: P(axis, None) for k in (pg.csr_w or {})},
                      {k: P(axis) for k in (pg.sample_tables or {})},
                      P(axis)),
            out_specs=(tuple(P(axis, None) for _ in range(n_enc_nt)),
                       enc_meta, enc_meta, enc_meta,
                       enc_ids_spec, enc_ids_spec),
            check_vma=False))
        self._encode = jax.jit(jax.shard_map(
            self._sp_encode_local, mesh=mesh,
            in_specs=(P(),
                      tuple(P(axis, None, None) for _ in range(n_enc_nt)),
                      enc_meta, enc_meta, enc_meta,
                      enc_ids_spec, enc_ids_spec),
            out_specs=P(axis),
            check_vma=False))

    def _grow_rebuild(self) -> None:
        self._cap = {nt: request_capacity(self._union[nt],
                                          self.num_shards,
                                          self.capacity_factor)
                     for nt in self._nt_order}
        self._enc_cap = {nt: request_capacity(self._enc_union[nt],
                                              self.num_shards,
                                              self.capacity_factor)
                         for nt in self._enc_nt_order}
        self._build_sp_programs()

    # -- host round + drivers ----------------------------------------------
    def _plan_step(self, anchors, step: int):
        anchors = np.asarray(anchors, np.int32)
        if anchors.shape[0] != self.batch_size:
            raise ValueError(f"anchors batch {anchors.shape[0]} != "
                             f"configured batch_size {self.batch_size}")
        ga = self._graph_args()[1:]  # drop the (empty) device feats
        return self._sp_plan(*ga, self._put(anchors, self.axis),
                             self._put(np.asarray(step, np.int32)))

    def _host_answers(self, recvs, nt_order=None) -> Tuple[jax.Array, ...]:
        p = self.num_shards
        outs = []
        sharding = self._NS(self.mesh, self._P(self.axis, None, None))
        for i, nt in enumerate(nt_order if nt_order is not None
                               else self._nt_order):
            host = self._host[nt]
            cap = recvs[i].shape[1]
            blocks: Dict[int, np.ndarray] = {}
            for sh in recvs[i].addressable_shards:
                s = int(sh.index[0].start or 0) // p
                blocks[s] = self._answer_cast(
                    host.answer_shard(s, np.asarray(sh.data)))
            outs.append(jax.make_array_from_callback(
                (p * p, cap, host.width), sharding,
                (lambda idx, b=blocks: b[int(idx[0].start or 0) // p])))
        return tuple(outs)

    def _sp_plan_enc_local(self, ip_l, ix_l, w_l, tabs, anchors):
        """Anchors-only typed plan: one tree, routed per node type —
        inference ships only the anchor tree's rows host-side."""
        ip_l = self._squeeze_csr(ip_l)
        ix_l = self._squeeze_csr(ix_l)
        w_l = self._squeeze_csr(w_l)
        nt0, spec, _sh, _ty, _rs = self._groups_static[0]
        blocks, _ovf = self._sample_tree(
            ip_l, ix_l, w_l, tabs, anchors.astype(jnp.int32).reshape(-1),
            nt0, spec, self.cfg.seed)
        ids_flat = tuple(blocks.node_ids)
        masks_flat = tuple(blocks.masks)
        recvs, owners, poss, oks = [], [], [], []
        for nt in self._enc_nt_order:
            flat = jnp.concatenate(
                [blocks.node_ids[l].reshape(-1)
                 for (_t, l) in self._enc_nt_levels[nt]])
            req, owner, pos_idx, ok = _route_requests(
                flat.astype(jnp.int32), self.pg.rows[nt],
                self.num_shards, self._enc_cap[nt])
            recvs.append(jax.lax.all_to_all(req, self.axis, 0, 0,
                                            tiled=True))
            owners.append(owner)
            poss.append(pos_idx)
            oks.append(ok)
        return (tuple(recvs), tuple(owners), tuple(poss), tuple(oks),
                ids_flat, masks_flat)

    def _sp_encode_local(self, params, answers, owners, poss, oks,
                         ids_flat, masks_flat):
        """Inference encode of the anchor group (fed by the anchors-only
        plan)."""
        rows_by_nt, _ovf = self._sp_unroute(
            answers, owners, poss, oks, jnp.zeros((), jnp.int32))
        embs = self._sp_embed_groups(
            params, rows_by_nt, ids_flat, masks_flat, False, None,
            groups_static=self._groups_static[:1],
            nt_order=self._enc_nt_order, nt_levels=self._enc_nt_levels)
        return embs[0]

    def _plan_encode_step(self, anchors):
        anchors = np.asarray(anchors, np.int32)
        ga = self._graph_args()
        return self._plan_enc(ga[1], ga[2], ga[3], ga[10],
                              self._put(anchors, self.axis))

    def _host_answers_enc(self, recvs):
        return self._host_answers(recvs, nt_order=self._enc_nt_order)

    def encode_batch(self, params, node_ids,
                     node_type: Optional[str] = None) -> np.ndarray:
        """Streamed-partitioned typed inference encode of the ANCHOR node
        type (other node types: run a trainer configured with that type
        as anchor — the plan program's group structure is anchored);
        loop shared with the homogeneous trainer (_StreamedStepDriver)."""
        nt = str(node_type or self.cfg.anchor_node_type)
        if nt != str(self.cfg.anchor_node_type):
            raise ValueError(
                f"encode_batch over the streamed-partitioned backend "
                f"serves the anchor node type "
                f"{self.cfg.anchor_node_type!r}; got {nt!r}")
        return _StreamedStepDriver.encode_batch(self, params, node_ids)



class StreamingPartitionedNodeClassificationTrainer(
        StreamingPartitionedNALPTrainer):
    """Supervised node classification over the beyond-HBM backend.

    The reference's v2 loader serves node classification through the
    same distributed dataset stack as link prediction
    (distributed_neighborloader.py:26 + NodeClassificationModelingTaskSpec
    semantics) — here the same plan/host/apply split: each step routes
    only the ANCHOR tree through the sharded HOST feature store; anchor
    LABELS stay device-side row-sharded (O(N) int bytes — adjacency
    scale) and ride a routed gather inside the plan; apply encodes and
    takes masked-CE grads, pmean-reduced. Bit-compatible draws with
    PartitionedNodeClassificationTrainer in tabularized mode.

    Reuses StreamingPartitionedNALPTrainer's machinery (tables, host
    store, expansion, embed, encode plan, refresh) via a custom __init__
    that skips the NALP-specific supervision plumbing.
    """

    def __init__(self, model, store: HostGraphStore, mesh,
                 config, *, batch_size: int,
                 optimizer_args: Optional[Dict[str, Any]] = None,
                 axis: str = DATA_AXIS, capacity_factor: float = 4.0,
                 overflow_policy: str = "warn",
                 host_store: Optional[ShardedHostStore] = None,
                 answer_dtype: str = "float32"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = config
        if not getattr(cfg, "cached_hop", False):
            raise ValueError(
                "StreamingPartitionedNodeClassificationTrainer is "
                "tabularized-only: set cached_hop=True")
        if store.node_labels is None:
            raise ValueError("store has no node_labels; build the "
                             "HostGraphStore with node_labels=")
        if overflow_policy not in ("warn", "raise", "silent", "grow"):
            raise ValueError(
                "overflow_policy must be warn | raise | silent | grow")
        self.model = model
        self.store = store
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self._P, self._NS = P, NamedSharding
        self.num_shards = p = int(mesh.shape[axis])
        if batch_size % p:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"{p} shards")
        self.batch_size = batch_size
        self.capacity_factor = capacity_factor
        self.overflow_policy = overflow_policy
        self.overflow_total = 0
        self.tx = make_optimizer(optimizer_args or {})
        n = store.num_nodes
        self.rows_per_shard = rows = -(-n // p)
        self.feat_dim = store.features.shape[1]
        row_sh = NamedSharding(mesh, P(axis))
        # Device arrays: frozen sample tables + row-sharded labels.
        self._tab_ks = tuple(sorted({int(k) for k in cfg.fanouts[:-1]}))
        if any(int(k) not in store.sample_tables for k in self._tab_ks):
            raise ValueError(
                f"store lacks sample tables for fanouts {self._tab_ks}")
        tabs = []
        for k in self._tab_ks:
            ids_t, mask_t = store.sample_tables[int(k)]
            packed = np.where(mask_t, ids_t, -1).astype(np.int32)
            pad = np.full((p * rows, packed.shape[1]), -1, np.int32)
            pad[: packed.shape[0]] = packed
            tabs.append(jax.device_put(pad, row_sh))
        self._tabs = tuple(tabs)
        self._tab_index = {k: i for i, k in enumerate(self._tab_ks)}
        lab = np.zeros((p * rows, 1), np.int32)
        lab[: n, 0] = np.asarray(store.node_labels, np.int32)
        self._labels = jax.device_put(lab, NamedSharding(mesh,
                                                         P(axis, None)))
        # Host store: this process's shards only.
        self._host_auto = host_store is None
        if host_store is None:
            procs = sorted({d.process_index for d in mesh.devices.flat})
            if len(procs) > 1:
                mine = [i for i, d in enumerate(mesh.devices.flat)
                        if d.process_index == jax.process_index()]
            else:
                mine = list(range(p))
            host_store = ShardedHostStore.from_host_store(
                store, num_shards=p, local_shards=mine)
        self.host = host_store
        from gigl_tpu.utils.cast import answer_cast_from_str

        self._answer_np_dtype, self._answer_cast = answer_cast_from_str(
            answer_dtype)
        # Single (anchor) group: tree shapes + routing capacity.
        bb = batch_size // p
        shapes = [(bb,)]
        for k in cfg.fanouts[:-1]:
            shapes.append(shapes[-1] + (int(k),))
        self._enc_shapes = shapes
        self._group_shapes = [shapes]   # _embed_groups default
        self._enc_union = sum(int(np.prod(s)) for s in shapes)
        self._union = self._enc_union
        self.capacity = request_capacity(self._union, p, capacity_factor)
        self.capacity_enc = self.capacity
        self._build_programs()

    # -- SPMD bodies -------------------------------------------------------
    def _nc_plan_local(self, tabs, labels_l, anchors):
        """Anchor tree expansion + routing + the device-side routed label
        gather — everything before the host round trip."""
        from gigl_tpu.parallel.feature_lookup import routed_gather

        anchors = anchors.astype(jnp.int32)
        levels, ovf = self._expand_joint(tabs, anchors.reshape(-1))
        ids_flat = jnp.concatenate([l.reshape(-1) for l, _m in levels])
        masks_flat = tuple(m for _l, m in levels)
        req, owner, pos_idx, ok = _route_requests(
            ids_flat.astype(jnp.int32), self.rows_per_shard,
            self.num_shards, self.capacity)
        recv = jax.lax.all_to_all(req, self.axis, 0, 0, tiled=True)
        lab_rows, lab_ok = routed_gather(
            labels_l, anchors, axis=self.axis,
            capacity_factor=self.capacity_factor)
        ovf = ovf + jnp.sum(~lab_ok, dtype=jnp.int32)
        labels = lab_rows[:, 0].astype(jnp.int32)
        return (recv, owner, pos_idx, ok, masks_flat, labels, lab_ok,
                ovf)

    def _nc_apply_local(self, state, ans, owner, pos_idx, ok, masks_flat,
                        labels, lab_ok, ovf, rng):
        from gigl_tpu.losses.losses import cross_entropy_loss

        back = jax.lax.all_to_all(ans, self.axis, 0, 0, tiled=True)
        rows, ok_req = _unroute(back, owner, pos_idx, ok)
        ovf = ovf + jnp.sum(~ok_req, dtype=jnp.int32)

        def loss_fn(p):
            (logits,) = self._embed_groups(p, rows, masks_flat, True, rng)
            # Dropped label requests zero-fill: mask them out of the CE
            # (same contract as the HBM partitioned NC trainer).
            s, c = cross_entropy_loss(logits, labels, mask=lab_ok)
            return s / jnp.maximum(c.astype(jnp.float32), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.pmean(grads, self.axis)
        loss = jax.lax.pmean(loss, self.axis)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, cms=state.cms)
        return new_state, loss, jax.lax.psum(ovf, self.axis)

    def _nc_eval_local(self, params, ans, owner, pos_idx, ok, masks_flat,
                       labels, lab_ok, ovf):
        from gigl_tpu.losses.metrics import accuracy

        back = jax.lax.all_to_all(ans, self.axis, 0, 0, tiled=True)
        rows, ok_req = _unroute(back, owner, pos_idx, ok)
        ovf = ovf + jnp.sum(~ok_req, dtype=jnp.int32)
        (logits,) = self._embed_groups(params, rows, masks_flat, False,
                                       None)
        correct, count = accuracy(logits, labels, mask=lab_ok)
        return (jax.lax.psum(correct, self.axis),
                jax.lax.psum(count, self.axis),
                jax.lax.psum(ovf, self.axis))

    def _build_programs(self) -> None:
        from jax.sharding import PartitionSpec as P

        mesh, axis = self.mesh, self.axis
        n_levels = len(self.cfg.fanouts)
        masks_spec = tuple(P(axis) for _ in range(n_levels))
        tabs_spec = tuple(P(axis) for _ in self._tabs)
        self._nc_plan = jax.jit(jax.shard_map(
            self._nc_plan_local, mesh=mesh,
            in_specs=(tabs_spec, P(axis, None), P(axis)),
            out_specs=(P(axis, None), P(axis), P(axis), P(axis),
                       masks_spec, P(axis), P(axis), P()),
            check_vma=False))
        self._apply = jax.jit(jax.shard_map(
            self._nc_apply_local, mesh=mesh,
            in_specs=(P(), P(axis, None, None), P(axis), P(axis), P(axis),
                      masks_spec, P(axis), P(axis), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False), donate_argnums=(0,))
        self._apply_eval = jax.jit(jax.shard_map(
            self._nc_eval_local, mesh=mesh,
            in_specs=(P(), P(axis, None, None), P(axis), P(axis), P(axis),
                      masks_spec, P(axis), P(axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False))
        # Inference encode: the anchors-only plan pair (no labels).
        self._plan_enc = jax.jit(jax.shard_map(
            self._plan_enc_local, mesh=mesh,
            in_specs=(tabs_spec, P(axis)),
            out_specs=(P(axis, None), P(axis), P(axis), P(axis),
                       masks_spec),
            check_vma=False))
        self._encode = jax.jit(jax.shard_map(
            self._encode_local, mesh=mesh,
            in_specs=(P(), P(axis, None, None), P(axis), P(axis), P(axis),
                      masks_spec),
            out_specs=P(axis),
            check_vma=False))

    def _grow_rebuild(self) -> None:
        self.capacity = request_capacity(self._union, self.num_shards,
                                         self.capacity_factor)
        self.capacity_enc = self.capacity
        self._build_programs()

    # -- drivers -----------------------------------------------------------
    def _plan_step(self, anchors, step: int):
        anchors = np.asarray(anchors, np.int32)
        if anchors.shape[0] != self.batch_size:
            raise ValueError(f"anchors batch {anchors.shape[0]} != "
                             f"configured batch_size {self.batch_size}")
        del step  # frozen tables: draws are step-independent
        return self._nc_plan(self._tabs, self._labels,
                             self._put(anchors, self.axis))

    def init_state(self, rng: jax.Array, batch_size: Optional[int] = None,
                   params: Optional[Any] = None) -> TrainState:
        if batch_size is not None and batch_size != self.batch_size:
            raise ValueError(
                f"batch_size {batch_size} != the compiled batch_size "
                f"{self.batch_size} (fixed at construction)")
        if params is None:
            d = self.feat_dim
            feats, masks = [], []
            shape = (max(self.batch_size // self.num_shards, 1),)
            for k in self.cfg.fanouts:
                feats.append(jnp.zeros(shape + (d,), jnp.float32))
                masks.append(jnp.ones(shape, bool))
                shape = shape + (int(k),)
            feats.append(jnp.zeros(shape + (d,), jnp.float32))
            masks.append(jnp.ones(shape, bool))
            params = self.model.init(rng, feats, masks)
        return put_replicated(
            TrainState(params=params, opt_state=self.tx.init(params),
                       step=jnp.zeros((), jnp.int32), cms=None), self.mesh)

    def evaluate(self, params, node_batches, step: int = 0) -> float:
        """Global accuracy (psum-reduced) — pipelined like run_steps;
        returns a float, matching the HBM NC trainers' contract. Batches
        are wrap-padded to the compiled batch size (duplicated nodes
        count twice — the same wrap bias as the HBM fit-loop padding)."""
        batches = [np.resize(np.asarray(b, np.int32), self.batch_size)
                   for b in node_batches if len(b)]
        n = len(batches)
        correct, total, ovf_t = 0.0, 0.0, 0
        if n:
            plans: List[Any] = [None] * n
            plans[0] = self._plan_step(batches[0], step)
            results = []
            for i in range(n):
                if i + 1 < n:
                    plans[i + 1] = self._plan_step(batches[i + 1],
                                                   step + i + 1)
                ans = self._host_answers(plans[i][0])
                results.append(self._apply_eval(
                    params, ans, *plans[i][1:]))
                plans[i] = None
            for c, cnt, ovf_n in jax.device_get(results):
                correct += float(c)
                total += float(cnt)
                ovf_t += int(ovf_n)
        apply_overflow_policy(self, ovf_t,
                              grow_rebuild=self._grow_rebuild)
        return correct / max(total, 1.0)

    def predict_batch(self, params, node_ids) -> np.ndarray:
        """Sharded logits for arbitrary node ids (inference path)."""
        return self.encode_batch(params, node_ids)

    def fit(self, state: TrainState, train_nodes, val_nodes, *,
            batch_size: Optional[int] = None, num_epochs: int = 10,
            early_stop_patience: int = 5,
            log_every: int = 50, **_ignored
            ) -> Tuple[TrainState, Dict[str, float]]:
        """Per-epoch loop + accuracy val + early stop — the NC fit
        contract (mirrors PartitionedNodeClassificationTrainer.fit);
        batches wrap-pad to the compiled batch size."""
        from gigl_tpu.training.dataset import AnchorBatchIterator
        from gigl_tpu.training.early_stop import EarlyStopper

        if batch_size is not None and batch_size != self.batch_size:
            raise ValueError(
                f"batch_size {batch_size} != the compiled batch_size "
                f"{self.batch_size} (fixed at construction)")
        train_nodes = np.resize(np.asarray(train_nodes),
                                max(len(train_nodes), self.batch_size))
        it = AnchorBatchIterator(train_nodes, self.batch_size,
                                 seed=self.cfg.seed)
        stopper = EarlyStopper(patience=early_stop_patience)
        rng = jax.random.PRNGKey(self.cfg.seed)
        val = np.asarray(val_nodes)
        if len(val) == 0:
            raise ValueError("val_nodes is empty")
        val = np.resize(val, max(len(val), self.batch_size))
        step = 0
        for epoch in range(num_epochs):
            batches = np.stack(list(it.epoch(epoch)))
            rng, erng = jax.random.split(rng)
            state, losses = self.run_steps(state, list(batches), erng,
                                           start_step=step)
            step += len(batches)
            if log_every:
                logger.info("epoch %d step %d loss %.4f", epoch, step,
                            float(losses[-1]))
            acc = self.evaluate(state.params, [val[: self.batch_size]])
            logger.info("epoch %d val acc %.4f", epoch, acc)
            snap = jax.tree_util.tree_map(jnp.copy, state.params)
            if stopper.update(acc, snap):
                break
        if stopper.best_state is not None:
            state = state._replace(params=stopper.best_state)
        return state, {"accuracy": stopper.best_value or 0.0}
