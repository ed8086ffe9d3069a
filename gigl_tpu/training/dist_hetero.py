"""Heterogeneous NALP training over a graph partitioned across the mesh.

Typed extension of training/dist_sampled.py — the reference's v2 GLT
distributed path is heterogeneous-first (one CSR per edge type + one
feature store per node type, partitioned across machines:
python/gigl/distributed/dist_link_prediction_dataset.py:428-439), so the
partitioned TPU regime must be too. Per chip, HBM holds a 1/P node-range
slice of EVERY node type's feature table and EVERY edge type's CSR (each
partitioned by its anchor node type's id range). SubgraphSamplingStrategy
op trees execute with ``routed_sample_neighbors`` per op (frontier routed
to the owner shard of that op's anchor node type; same counter-RNG keying
as sample_typed_blocks — hop = depth * 1_000_003 + op_index — so sampling
is bit-identical to the replicated-graph hetero trainer), and hydration is
ONE routed gather per node type over the union of that type's tree levels.

Losses/eval mirror HeteroNALPTrainer (anchor and candidate node types may
differ — bipartite link prediction); random negatives are drawn in the
candidate type's id space, encoded 1/P per shard, and all_gathered.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigl_tpu.parallel.feature_lookup import (
    routed_gather,
    routed_sample_neighbors,
)
from gigl_tpu.parallel.mesh import DATA_AXIS
from gigl_tpu.sampling.hetero_sampler import OpSpec, TypedBlocks
from gigl_tpu.sampling.neighbor_sampler import counter_rng_uniform
from gigl_tpu.training.dataset import NALPBatch
from gigl_tpu.training.dist_sampled import _shard_csr
from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph
from gigl_tpu.training.hetero_trainer import HeteroNALPTrainerConfig
from gigl_tpu.training.trainer import (
    TrainState,
    make_optimizer,
    nalp_loss_from_embeddings,
)
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


@dataclass
class PartitionedHeteroGraph:
    """Per-node-type feature shards + per-edge-type CSR shards.

    feats[nt]: [P*rows_nt, D_nt] sharded over the mesh axis.
    csr_ip/csr_ix[key]: [P, rows_anchor+1] / [P, E_pad] blocks of the CSR
    keyed like HeteroDeviceGraph.csrs ("{edge_type}|{anchor}"), partitioned
    by the ANCHOR node type's range (the frontier side of the op).
    sup_*/hard_*: supervision / hard-negative CSRs partitioned by the
    anchor node type's range (positives/negatives live in the candidate
    type's id space).
    """

    feats: Dict[str, jax.Array]
    csr_ip: Dict[str, jax.Array]
    csr_ix: Dict[str, jax.Array]
    sup_ip: Optional[jax.Array]
    sup_ix: Optional[jax.Array]
    hard_ip: Optional[jax.Array]
    hard_ix: Optional[jax.Array]
    num_nodes: Dict[str, int]
    rows: Dict[str, int]
    feat_dims: Dict[str, int]
    anchor_node_type: str
    # Frozen per-node sample tables OpSpec.table_key -> [P*rows_anchor, k]
    # int32 row-sharded (-1 = invalid slot): the typed tabularized fast
    # path over the partitioned graph (with_sample_tables).
    sample_tables: Optional[Dict[str, jax.Array]] = None
    # csr_key -> per-shard CSR-slot-aligned edge weights [P, E_pad] fp32
    # for CSRs any op samples weighted/top_k (LIVE typed weighted sampling
    # over the partitioned graph; owner-side bounded-window draws).
    csr_w: Optional[Dict[str, jax.Array]] = None
    # Per-shard supervision / hard-negative LABEL edge features
    # [P, E_pad, De] in CSR slot order (hydrated owner-side in the same
    # routed round trip as the positive / hard-negative draw — the typed
    # analog of PartitionedGraph.sup_edge_feats).
    sup_ef: Optional[jax.Array] = None
    hard_ef: Optional[jax.Array] = None

    def with_sample_tables(
        self,
        hdg: HeteroDeviceGraph,
        paths: Dict[str, Tuple[OpSpec, ...]],
        mesh,
        *,
        seed: int = 0,
        axis: str = DATA_AXIS,
    ) -> "PartitionedHeteroGraph":
        """Freeze one packed per-node sample table per (csr, fanout,
        method) used by ``paths`` and ROW-SHARD it by the op's anchor
        node type — the partitioned analog of
        HeteroDeviceGraph.with_sample_tables. Tables are drawn by the
        SAME replicated builder (build_sample_table: counter RNG keyed by
        global anchor id), so partitioned-tabularized draws are
        bit-identical to the replicated hetero tabularized path.
        ``hdg`` supplies the full CSRs at build time (this builder is
        host-side one-time work, like PartitionedHeteroGraph.build
        itself). Rebuild with a new seed = Subgraph Sampler re-run."""
        import dataclasses

        from jax.sharding import NamedSharding, PartitionSpec as P

        row_sh = NamedSharding(mesh, P(axis))
        num_shards = int(mesh.shape[axis])
        anchor_by_key: Dict[str, str] = {}
        for ops in paths.values():
            for op in ops:
                anchor_by_key[op.table_key] = str(op.frontier_node_type)
        # Delegate the draws to the REPLICATED builder (single source of
        # the OpSpec.table_key keying / hop_key / method semantics — the
        # bit-identical-parity guarantee), then pad + row-shard each
        # table by its op's anchor node type.
        tabbed = hdg.with_sample_tables(paths, seed=seed)
        tables: Dict[str, jax.Array] = dict(self.sample_tables or {})
        for key, packed_dev in tabbed.sample_tables.items():
            if key in tables:
                continue
            if key not in anchor_by_key:
                continue  # table not used by these paths
            packed = np.asarray(packed_dev)
            nt = anchor_by_key[key]
            pad = np.full((num_shards * self.rows[nt], packed.shape[1]),
                          -1, np.int32)
            pad[: packed.shape[0]] = packed
            tables[key] = jax.device_put(pad, row_sh)
        return dataclasses.replace(self, sample_tables=tables)

    @classmethod
    def build(
        cls,
        hdg: HeteroDeviceGraph,
        paths: Dict[str, Tuple[OpSpec, ...]],
        mesh,
        *,
        anchor_node_type: str,
        axis: str = DATA_AXIS,
        features_on_device: bool = True,
    ) -> "PartitionedHeteroGraph":
        """``features_on_device=False`` skips the per-type feature upload
        entirely (feat_dims still recorded) — the beyond-HBM typed regime
        where features live in per-process sharded HOST stores
        (StreamingPartitionedHeteroNALPTrainer) and device HBM holds only
        the adjacency ints + frozen sample tables."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        num_shards = int(mesh.shape[axis])
        row_sh = NamedSharding(mesh, P(axis))
        blk_sh = NamedSharding(mesh, P(axis, None))
        rows = {nt: -(-n // num_shards) for nt, n in hdg.num_nodes.items()}
        feats, dims = {}, {}
        for nt, f in hdg.node_features.items():
            f = np.asarray(f, np.float32)
            d = f.shape[1]
            dims[nt] = d
            if not features_on_device:
                continue
            pad = np.zeros((num_shards * rows[nt], d), np.float32)
            pad[: f.shape[0]] = f
            feats[nt] = jax.device_put(pad, row_sh)
        # csr_key -> anchor node type, from the op specs that use it.
        anchor_of: Dict[str, str] = {}
        for ops in paths.values():
            for op in ops:
                anchor_of[op.csr_key] = str(op.frontier_node_type)
        csr_ip, csr_ix = {}, {}
        csr_w: Dict[str, jax.Array] = {}
        for key, csr in hdg.csrs.items():
            if key not in anchor_of:
                continue  # CSR not used by any path
            nt = anchor_of[key]
            if getattr(csr, "edge_weights", None) is not None:
                ip, ix, w = _shard_csr(np.asarray(csr.indptr),
                                       np.asarray(csr.indices),
                                       num_shards, rows[nt],
                                       weights=np.asarray(csr.edge_weights))
                csr_w[key] = jax.device_put(w, blk_sh)
            else:
                ip, ix = _shard_csr(np.asarray(csr.indptr),
                                    np.asarray(csr.indices),
                                    num_shards, rows[nt])
            csr_ip[key] = jax.device_put(ip, blk_sh)
            csr_ix[key] = jax.device_put(ix, blk_sh)
        sup_ip = sup_ix = hard_ip = hard_ix = None
        sup_ef = hard_ef = None
        if hdg.supervision_csr is not None:
            if hdg.sup_edge_features is not None:
                a, b, ef = _shard_csr(
                    np.asarray(hdg.supervision_csr.indptr),
                    np.asarray(hdg.supervision_csr.indices),
                    num_shards, rows[str(anchor_node_type)],
                    weights=np.asarray(hdg.sup_edge_features))
                sup_ef = jax.device_put(ef, blk_sh)
            else:
                a, b = _shard_csr(np.asarray(hdg.supervision_csr.indptr),
                                  np.asarray(hdg.supervision_csr.indices),
                                  num_shards, rows[str(anchor_node_type)])
            sup_ip = jax.device_put(a, blk_sh)
            sup_ix = jax.device_put(b, blk_sh)
        if hdg.hard_neg_csr is not None:
            if hdg.hard_neg_edge_features is not None:
                a, b, ef = _shard_csr(
                    np.asarray(hdg.hard_neg_csr.indptr),
                    np.asarray(hdg.hard_neg_csr.indices),
                    num_shards, rows[str(anchor_node_type)],
                    weights=np.asarray(hdg.hard_neg_edge_features))
                hard_ef = jax.device_put(ef, blk_sh)
            else:
                a, b = _shard_csr(np.asarray(hdg.hard_neg_csr.indptr),
                                  np.asarray(hdg.hard_neg_csr.indices),
                                  num_shards, rows[str(anchor_node_type)])
            hard_ip = jax.device_put(a, blk_sh)
            hard_ix = jax.device_put(b, blk_sh)
        return cls(feats=feats, csr_ip=csr_ip, csr_ix=csr_ix,
                   sup_ip=sup_ip, sup_ix=sup_ix,
                   hard_ip=hard_ip, hard_ix=hard_ix,
                   num_nodes=dict(hdg.num_nodes), rows=rows,
                   feat_dims=dims, anchor_node_type=str(anchor_node_type),
                   csr_w=csr_w or None, sup_ef=sup_ef, hard_ef=hard_ef)


class PartitionedHeteroNALPTrainer:
    """Typed partitioned trainer; API mirrors HeteroNALPTrainer."""

    def __init__(
        self,
        model,  # HeteroLinkPredictionGNN
        pgraph: PartitionedHeteroGraph,
        paths: Dict[str, Tuple[OpSpec, ...]],
        config: HeteroNALPTrainerConfig,
        mesh,
        optimizer_args: Optional[Dict[str, Any]] = None,
        axis: str = DATA_AXIS,
        capacity_factor: float = 4.0,
        overflow_policy: str = "warn",
    ):
        if config.tabularized and pgraph.sample_tables is None:
            raise ValueError(
                "tabularized=True needs frozen tables: build the graph "
                "with pgraph.with_sample_tables(hdg, paths, mesh) first")
        for nt in (config.anchor_node_type, config.candidate_node_type):
            if str(nt) not in paths:
                raise ValueError(f"no sampling path for node type {nt!r}")
        if not config.tabularized:
            # LIVE weighted/top-k ops draw owner-side over sharded edge
            # weights: the graph must carry them (built from a
            # HeteroDeviceGraph whose weighted CSRs have edge_weights).
            for ops in paths.values():
                for op in ops:
                    if (op.method != "uniform"
                            and op.csr_key not in (pgraph.csr_w or {})):
                        raise ValueError(
                            f"op {op.name!r} samples {op.method!r} but the "
                            f"partitioned graph has no edge weights for "
                            f"{op.csr_key!r}; build from a "
                            "HeteroDeviceGraph with weighted CSRs (the op "
                            "must be declared in `paths` at from_hetero "
                            "time) or use tabularized=True")
        if config.num_random_negs % int(mesh.shape[axis]):
            raise ValueError("num_random_negs must divide the mesh axis size")
        self.model = model
        self.pg = pgraph
        self.paths = {k: tuple(v) for k, v in paths.items()}
        self.cfg = config
        self.mesh = mesh
        self.axis = axis
        self.num_shards = int(mesh.shape[axis])
        self.capacity_factor = capacity_factor
        if overflow_policy not in ("warn", "raise", "silent", "grow"):
            raise ValueError(
                "overflow_policy must be warn | raise | silent | grow")
        self.overflow_policy = overflow_policy
        # Cumulative routed-lookup requests dropped by capacity overflow
        # (surfaced per chunk; same contract as PartitionedNALPTrainer).
        self.overflow_total = 0
        self._has_sup_ef = pgraph.sup_ef is not None
        self._has_hard_ef = pgraph.hard_ef is not None
        self.tx = make_optimizer(optimizer_args or {})
        self._build_programs()

    def _build_programs(self) -> None:
        """(Re)compile the SPMD programs — also the grow-policy rebuild
        hook (capacity_factor changes recompile on the next chunk)."""
        from jax.sharding import PartitionSpec as P

        mesh, axis, pgraph = self.mesh, self.axis, self.pg
        graph_specs = (P(axis), P(axis, None), P(axis, None),
                       {k: P(axis, None) for k in (pgraph.csr_w or {})},
                       P(axis, None), P(axis, None),
                       P(axis, None), P(axis, None),
                       P(axis, None, None), P(axis, None, None),
                       {k: P(axis) for k in (pgraph.sample_tables or {})})
        self._train_steps = jax.jit(jax.shard_map(
            self._steps_local, mesh=mesh,
            in_specs=graph_specs + (P(), P(None, axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ), donate_argnums=(11,))
        self._eval_step = jax.jit(jax.shard_map(
            self._eval_local, mesh=mesh,
            in_specs=graph_specs + (P(), P(axis), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        ))
        # Per-node-type encode programs (node type is a static trace-time
        # choice; strings cannot pass through shard_map).
        self._encode_fns: Dict[str, Any] = {}
        self._graph_specs = graph_specs

    # -- graph arg plumbing ------------------------------------------------
    def _graph_args(self):
        pg = self.pg

        def dummy_csr(nt):
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(self.axis, None))
            return (jax.device_put(
                np.zeros((self.num_shards, pg.rows[nt] + 1), np.int32), sh),
                jax.device_put(
                    np.zeros((self.num_shards, 1), np.int32), sh))

        a_nt = pg.anchor_node_type
        sup_ip, sup_ix = pg.sup_ip, pg.sup_ix
        if sup_ip is None:
            sup_ip, sup_ix = dummy_csr(a_nt)
        hard_ip, hard_ix = pg.hard_ip, pg.hard_ix
        if hard_ip is None:
            hard_ip, hard_ix = dummy_csr(a_nt)
        from jax.sharding import NamedSharding, PartitionSpec as P

        blk = NamedSharding(self.mesh, P(self.axis, None, None))
        sup_ef = pg.sup_ef
        if sup_ef is None:
            sup_ef = jax.device_put(
                np.zeros((self.num_shards, 1, 1), np.float32), blk)
        hard_ef = pg.hard_ef
        if hard_ef is None:
            hard_ef = jax.device_put(
                np.zeros((self.num_shards, 1, 1), np.float32), blk)
        return (pg.feats, pg.csr_ip, pg.csr_ix, dict(pg.csr_w or {}),
                sup_ip, sup_ix, hard_ip, hard_ix, sup_ef, hard_ef,
                dict(pg.sample_tables or {}))

    @staticmethod
    def _squeeze_csr(d):
        return {k: v[0] for k, v in d.items()}

    # -- SPMD bodies -------------------------------------------------------
    def _sample_tree(self, ip_l, ix_l, w_l, tabs, roots, root_nt: str,
                     spec: Tuple[OpSpec, ...], seed: int):
        """Op-tree expansion; live mode = owner-routed sampling (RNG keying
        matches sample_typed_blocks: hop = depth * 1_000_003 + op index);
        tabularized mode = one routed gather per op over the frozen
        row-sharded table (draws bit-identical to the replicated
        sample_tabularized — same builder)."""
        node_ids: List[jnp.ndarray] = [roots.astype(jnp.int32)]
        masks: List[jnp.ndarray] = [jnp.ones(roots.shape, bool)]
        ovf = jnp.zeros((), jnp.int32)
        if self.cfg.tabularized:
            for op in spec:
                key = op.table_key
                frontier = node_ids[op.parent + 1]
                pmask = masks[op.parent + 1]
                row, ok = routed_gather(
                    tabs[key], frontier.reshape(-1), axis=self.axis,
                    capacity_factor=self.capacity_factor)
                ovf += jnp.sum(~ok, dtype=jnp.int32)
                row = row.reshape(frontier.shape + (op.fanout,))
                okr = ok.reshape(frontier.shape)
                m = (row >= 0) & pmask[..., None] & okr[..., None]
                node_ids.append(jnp.where(m, row, 0))
                masks.append(m)
            return TypedBlocks(root_node_type=root_nt, spec=spec,
                               node_ids=node_ids, masks=masks,
                               edge_slots=[None] * (len(spec) + 1)), ovf
        for i, op in enumerate(spec):
            frontier = node_ids[op.parent + 1]
            pmask = masks[op.parent + 1]
            # Per-op method: weighted/top-k draw owner-side over this
            # shard's slot-aligned weights (RNG keying identical to the
            # replicated sample_typed_blocks draw).
            nbr, m, ok = routed_sample_neighbors(
                ip_l[op.csr_key], ix_l[op.csr_key],
                frontier.reshape(-1), op.fanout, axis=self.axis,
                seed=seed, hop=op.depth * 1_000_003 + i,
                capacity_factor=self.capacity_factor,
                method=op.method,
                local_weights=(w_l[op.csr_key]
                               if op.method != "uniform" else None))
            ovf += jnp.sum(~ok, dtype=jnp.int32)
            nbr = nbr.reshape(frontier.shape + (op.fanout,))
            m = m.reshape(frontier.shape + (op.fanout,)) & pmask[..., None]
            node_ids.append(jnp.where(m, nbr, 0))
            masks.append(m)
        return TypedBlocks(root_node_type=root_nt, spec=spec,
                           node_ids=node_ids, masks=masks,
                           edge_slots=[None] * (len(spec) + 1)), ovf

    def _encode_groups(self, feats_l, ip_l, ix_l, w_l, tabs, params,
                       groups, train: bool, rng=None):
        """groups: [(node_ids, node_type, seed_offset)]. One routed gather
        PER NODE TYPE over the union of that type's tree levels."""
        trees = []
        ovf = jnp.zeros((), jnp.int32)
        for (ids, nt, off) in groups:
            blocks, o = self._sample_tree(
                ip_l, ix_l, w_l, tabs, ids.reshape(-1), str(nt),
                self.paths[str(nt)], self.cfg.seed + off)
            trees.append(blocks)
            ovf += o
        # Level (tree_i, level_i) -> node type; bucket by type.
        by_type: Dict[str, List[Tuple[int, int]]] = {}
        for t_i, blocks in enumerate(trees):
            types = [blocks.root_node_type] + [
                op.neighbor_node_type for op in blocks.spec]
            for l_i, nt in enumerate(types):
                by_type.setdefault(str(nt), []).append((t_i, l_i))
        gathered: Dict[Tuple[int, int], jnp.ndarray] = {}
        for nt, levels in sorted(by_type.items()):
            flat = jnp.concatenate(
                [trees[t].node_ids[l].reshape(-1) for (t, l) in levels])
            rows, ok = routed_gather(
                feats_l[nt], flat, axis=self.axis,
                capacity_factor=self.capacity_factor)
            ovf += jnp.sum(~ok, dtype=jnp.int32)
            off = 0
            d = self.pg.feat_dims[nt]
            for (t, l) in levels:
                lvl = trees[t].node_ids[l]
                gathered[(t, l)] = rows[off: off + lvl.size].reshape(
                    lvl.shape + (d,))
                off += lvl.size
        rngs = {"dropout": rng} if (train and rng is not None) else None
        outs = []
        for t_i, (blocks, (ids, _nt, _off)) in enumerate(zip(trees, groups)):
            feats = [gathered[(t_i, l)]
                     for l in range(len(blocks.node_ids))]
            emb = self.model.apply(params, blocks, feats, train=train,
                                   rngs=rngs)
            outs.append(emb.reshape(ids.shape + (emb.shape[-1],)))
        return outs, ovf

    def _make_batch(self, sup_ip, sup_ix, hard_ip, hard_ix, sup_ef_l,
                    hard_ef_l, anchors, step):
        cfg = self.cfg
        pos_ef = hard_ef = None
        if self._has_sup_ef:
            # Label-edge-feature hydration rides the routed positive draw
            # owner-side (same contract as PartitionedNALPTrainer).
            pos, pos_mask, ok_p, pos_ef = routed_sample_neighbors(
                sup_ip, sup_ix, anchors, cfg.num_positives, axis=self.axis,
                seed=cfg.seed, hop=1_000_003 + step,
                capacity_factor=self.capacity_factor,
                local_edge_feats=sup_ef_l)
        else:
            pos, pos_mask, ok_p = routed_sample_neighbors(
                sup_ip, sup_ix, anchors, cfg.num_positives, axis=self.axis,
                seed=cfg.seed, hop=1_000_003 + step,
                capacity_factor=self.capacity_factor)
        bits = counter_rng_uniform(
            jnp.arange(cfg.num_random_negs, dtype=jnp.int32),
            seed=cfg.seed, hop=3_000_017 + step, num_slots=1)[:, 0]
        n_cand = self.pg.num_nodes[str(cfg.candidate_node_type)]
        rand = (bits % jnp.uint32(n_cand)).astype(jnp.int32)
        h = cfg.num_hard_negs
        if h > 0:
            if self._has_hard_ef:
                hard, hard_mask, ok_h, hard_ef = routed_sample_neighbors(
                    hard_ip, hard_ix, anchors, h, axis=self.axis,
                    seed=cfg.seed, hop=2_000_003 + step,
                    capacity_factor=self.capacity_factor,
                    local_edge_feats=hard_ef_l)
            else:
                hard, hard_mask, ok_h = routed_sample_neighbors(
                    hard_ip, hard_ix, anchors, h, axis=self.axis,
                    seed=cfg.seed, hop=2_000_003 + step,
                    capacity_factor=self.capacity_factor)
        else:
            hard = jnp.zeros(anchors.shape + (h,), jnp.int32)
            hard_mask = jnp.zeros(anchors.shape + (h,), bool)
        ovf = jnp.sum(~ok_p, dtype=jnp.int32)
        if h > 0:
            ovf += jnp.sum(~ok_h, dtype=jnp.int32)
        return NALPBatch(anchors=anchors.astype(jnp.int32), pos=pos,
                         pos_mask=pos_mask, hard_neg=hard,
                         hard_neg_mask=hard_mask, random_neg=rand,
                         pos_edge_feats=pos_ef,
                         hard_neg_edge_feats=hard_ef), ovf

    def _loss_local(self, feats_l, ip_l, ix_l, w_l, sup_ip, sup_ix,
                    hard_ip, hard_ix, sup_ef_l, hard_ef_l, tabs, params,
                    anchors, step, rng):
        cfg = self.cfg
        batch, ovf = self._make_batch(sup_ip, sup_ix, hard_ip, hard_ix,
                                      sup_ef_l, hard_ef_l, anchors, step)
        r_per = cfg.num_random_negs // self.num_shards
        shard = jax.lax.axis_index(self.axis)
        rand_local = jax.lax.dynamic_slice_in_dim(
            batch.random_neg, shard * r_per, r_per)
        a_nt, c_nt = cfg.anchor_node_type, cfg.candidate_node_type
        groups = [(batch.anchors, a_nt, 0), (batch.pos, c_nt, 1),
                  (rand_local, c_nt, 2)]
        if cfg.num_hard_negs > 0:
            groups.append((batch.hard_neg, c_nt, 3))
        embs, ovf2 = self._encode_groups(feats_l, ip_l, ix_l, w_l, tabs,
                                         params, groups, train=True,
                                         rng=rng)
        ovf += ovf2
        q, pos, rand_l = embs[0], embs[1], embs[2]
        hard = embs[3] if cfg.num_hard_negs > 0 else None
        if getattr(cfg, "global_candidate_pool", False):
            loss = self._ring_loss_local(params, batch, q, pos, hard,
                                         rand_l)
            return loss, ovf
        rand = jax.lax.all_gather(rand_l, self.axis, axis=0, tiled=True)
        loss, _ = nalp_loss_from_embeddings(
            self.model, params, cfg, batch, q, pos, hard, rand, None)
        return loss, ovf

    def _ring_loss_local(self, params, batch, q, pos, hard, rand_emb_l):
        """Typed global-candidate-pool retrieval loss (see the homogeneous
        PartitionedNALPTrainer._ring_loss_local; shared candidate-pool
        assembly in losses/sharded_retrieval.ring_candidate_pool)."""
        from gigl_tpu.losses.sharded_retrieval import (
            ring_candidate_pool,
            ring_retrieval_loss,
        )

        cfg = self.cfg
        b, p_, d = pos.shape
        r_per = cfg.num_random_negs // self.num_shards
        shard = jax.lax.axis_index(self.axis)
        rand_ids_local = jax.lax.dynamic_slice_in_dim(
            batch.random_neg, shard * r_per, r_per)
        q_rows = jnp.repeat(q, p_, axis=0)
        cand_local, cand_ids, cmask, pos_qids = ring_candidate_pool(
            batch, pos, hard, rand_emb_l, rand_ids_local)
        bias = None
        if getattr(self.model, "edge_scorer", None) is not None:
            from gigl_tpu.losses.sharded_retrieval import (
                ring_own_block_edge_bias,
            )

            bias = ring_own_block_edge_bias(
                lambda ef: self.model.apply(params, ef,
                                            method="edge_score"),
                batch, cand_local.shape[0])
        ce_sum, count = ring_retrieval_loss(
            q_rows, cand_local, axis=self.axis,
            temperature=cfg.temperature,
            decode_all_pairs=lambda a, c: self.model.apply(
                params, a, c, method="decode_all_pairs"),
            label_local_cols=jnp.arange(b * p_, dtype=jnp.int32),
            query_ids=jnp.repeat(batch.anchors, p_, axis=0),
            own_pos_ids=batch.pos.reshape(-1),
            candidate_ids=cand_ids,
            pos_col_query_ids=pos_qids,
            candidate_mask=cmask,
            query_mask=batch.pos_mask.reshape(-1),
            remove_accidental_hits=cfg.remove_accidental_hits,
            own_block_bias=bias)
        total = jax.lax.psum(count, self.axis).astype(jnp.float32)
        return ce_sum * self.num_shards / jnp.maximum(total, 1.0)

    def _step_local(self, feats_l, ip_l, ix_l, w_l, sup_ip, sup_ix,
                    hard_ip, hard_ix, sup_ef_l, hard_ef_l, tabs,
                    state: TrainState, anchors, rng):
        (loss, ovf), grads = jax.value_and_grad(
            lambda p: self._loss_local(feats_l, ip_l, ix_l, w_l, sup_ip,
                                       sup_ix, hard_ip, hard_ix, sup_ef_l,
                                       hard_ef_l, tabs, p,
                                       anchors, state.step, rng),
            has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, self.axis)
        loss = jax.lax.pmean(loss, self.axis)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, cms=state.cms), (loss, ovf)

    def _steps_local(self, feats_l, ip_l, ix_l, w_l, sup_ip, sup_ix,
                     hard_ip, hard_ix, sup_ef_l, hard_ef_l, tabs, state,
                     anchors_kb, rngs):
        ip_l = self._squeeze_csr(ip_l)
        ix_l = self._squeeze_csr(ix_l)
        w_l = self._squeeze_csr(w_l)
        sup_ip, sup_ix = sup_ip[0], sup_ix[0]
        hard_ip, hard_ix = hard_ip[0], hard_ix[0]
        sup_ef_l, hard_ef_l = sup_ef_l[0], hard_ef_l[0]

        def body(st, xs):
            a, r = xs
            return self._step_local(feats_l, ip_l, ix_l, w_l, sup_ip,
                                    sup_ix, hard_ip, hard_ix, sup_ef_l,
                                    hard_ef_l, tabs, st, a, r)

        state, (losses, ovfs) = jax.lax.scan(body, state,
                                             (anchors_kb, rngs))
        return state, losses, jax.lax.psum(ovfs, self.axis)

    def _eval_local(self, feats_l, ip_l, ix_l, w_l, sup_ip, sup_ix,
                    hard_ip, hard_ix, sup_ef_l, hard_ef_l, tabs, params,
                    anchors, step):
        from gigl_tpu.losses.metrics import hits_at_k, mean_reciprocal_rank

        ip_l = self._squeeze_csr(ip_l)
        ix_l = self._squeeze_csr(ix_l)
        w_l = self._squeeze_csr(w_l)
        sup_ip, sup_ix = sup_ip[0], sup_ix[0]
        hard_ip, hard_ix = hard_ip[0], hard_ix[0]
        sup_ef_l, hard_ef_l = sup_ef_l[0], hard_ef_l[0]
        cfg = self.cfg
        batch, ovf = self._make_batch(sup_ip, sup_ix, hard_ip, hard_ix,
                                      sup_ef_l, hard_ef_l, anchors, step)
        r_per = cfg.num_random_negs // self.num_shards
        shard = jax.lax.axis_index(self.axis)
        rand_local = jax.lax.dynamic_slice_in_dim(
            batch.random_neg, shard * r_per, r_per)
        a_nt, c_nt = cfg.anchor_node_type, cfg.candidate_node_type
        (q, pos, rand_l), ovf2 = self._encode_groups(
            feats_l, ip_l, ix_l, w_l, tabs, params,
            [(batch.anchors, a_nt, 0), (batch.pos, c_nt, 1),
             (rand_local, c_nt, 2)], train=False)
        ovf += ovf2
        rand = jax.lax.all_gather(rand_l, self.axis, axis=0, tiled=True)
        b, p_, d_ = pos.shape
        if (getattr(self.model, "edge_scorer", None) is not None
                and batch.pos_edge_feats is not None):
            pos_scores = self.model.apply(
                params, q[:, None, :], pos, batch.pos_edge_feats,
                method="decode")
        else:
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
        hits, _ = hits_at_k(pos_flat, neg_rep, cfg.eval_ks,
                            pos_mask=mask_flat, neg_mask=~acc)
        hits_arr = jnp.stack([hits[int(k)] for k in cfg.eval_ks])
        return (jax.lax.psum(rr_sum, self.axis),
                jax.lax.psum(hits_arr, self.axis),
                jax.lax.psum(rr_cnt, self.axis),
                jax.lax.psum(ovf, self.axis))

    def _encode_local(self, feats_l, ip_l, ix_l, w_l, tabs, params,
                      node_ids, *, node_type: str):
        ip_l = self._squeeze_csr(ip_l)
        ix_l = self._squeeze_csr(ix_l)
        w_l = self._squeeze_csr(w_l)
        (emb,), _ovf = self._encode_groups(feats_l, ip_l, ix_l, w_l, tabs,
                                           params,
                                           [(node_ids, node_type, 0)],
                                           train=False)
        return emb

    def _get_encode_fn(self, node_type: str):
        if node_type not in self._encode_fns:
            from functools import partial

            from jax.sharding import PartitionSpec as P

            self._encode_fns[node_type] = jax.jit(jax.shard_map(
                partial(self._encode_local, node_type=node_type),
                mesh=self.mesh,
                in_specs=self._graph_specs[:4]
                + (self._graph_specs[10], P(), P(self.axis)),
                out_specs=P(self.axis),
                check_vma=False,
            ))
        return self._encode_fns[node_type]

    # -- public API --------------------------------------------------------
    def refresh_tables(self, hdg: HeteroDeviceGraph, epoch: int = 0) -> None:
        """Re-freeze the sharded sample tables with a new seed (the
        Subgraph Sampler re-run analog; mirrors HeteroNALPTrainer
        .refresh_tables). Needs the source HeteroDeviceGraph."""
        if not self.cfg.tabularized:
            return
        import dataclasses

        self.pg = dataclasses.replace(
            self.pg, sample_tables=None
        ).with_sample_tables(hdg, self.paths, self.mesh,
                             seed=self.cfg.seed + 1_299_709 * epoch,
                             axis=self.axis)

    def _put(self, x, *cols):
        """device_put a host batch onto the global mesh (multi-process
        safe: numpy can't ride a non-trivial in_sharding directly)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            np.asarray(x), NamedSharding(self.mesh, P(*cols)))

    def init_state(self, rng: jax.Array, batch_size: int,
                   params: Optional[Any] = None) -> TrainState:
        """Initialize params by tracing every distinct root path + decoder
        over dummy static-shape blocks (no graph access needed)."""
        if params is None:
            b = max(batch_size // self.num_shards, 1)
            node_types = []
            for nt in (self.cfg.anchor_node_type,
                       self.cfg.candidate_node_type):
                if str(nt) not in node_types:
                    node_types.append(str(nt))
            samples = []
            for nt in node_types:
                spec = self.paths[nt]
                node_ids = [jnp.zeros((b,), jnp.int32)]
                masks = [jnp.ones((b,), bool)]
                for op in spec:
                    shape = node_ids[op.parent + 1].shape + (op.fanout,)
                    node_ids.append(jnp.zeros(shape, jnp.int32))
                    masks.append(jnp.ones(shape, bool))
                blocks = TypedBlocks(root_node_type=nt, spec=spec,
                                     node_ids=node_ids, masks=masks,
                                     edge_slots=[None] * (len(spec) + 1))
                types = [nt] + [op.neighbor_node_type for op in spec]
                feats = [jnp.zeros(ids.shape + (self.pg.feat_dims[str(t)],),
                                   jnp.float32)
                         for ids, t in zip(node_ids, types)]
                samples.append((blocks, feats))

            def init_all(mdl):
                embs = [mdl(bk, f) for bk, f in samples]
                mdl.decode(embs[0], embs[-1])
                mdl.decode_all_pairs(embs[0], embs[-1])
                if getattr(mdl, "edge_scorer", None) is not None:
                    de = (self.pg.sup_ef.shape[-1]
                          if self.pg.sup_ef is not None else 1)
                    mdl.edge_score(jnp.zeros((1, de), jnp.float32))
                return embs[0]

            params = self.model.init(rng, method=init_all)
        from gigl_tpu.parallel.mesh import put_replicated

        return put_replicated(
            TrainState(params=params, opt_state=self.tx.init(params),
                       step=jnp.zeros((), jnp.int32)), self.mesh)

    def train_steps(self, state: TrainState, anchors_kb,
                    rng: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        anchors_kb = np.asarray(anchors_kb, np.int32)
        if anchors_kb.shape[1] % self.num_shards:
            raise ValueError(
                f"batch size {anchors_kb.shape[1]} not divisible by "
                f"{self.num_shards} shards")
        rngs = np.asarray(jax.random.split(rng, anchors_kb.shape[0]))
        state, losses, ovfs = self._train_steps(
            *self._graph_args(), state,
            self._put(anchors_kb, None, self.axis), self._put(rngs))
        from gigl_tpu.training.dist_sampled import apply_overflow_policy

        apply_overflow_policy(self, int(np.asarray(ovfs).sum()),
                              grow_rebuild=self._build_programs)
        return state, losses

    def evaluate(self, params, anchor_batches, step: int = 0
                 ) -> Dict[str, float]:
        rr_t, hits_t, cnt_t = 0.0, None, 0.0
        for i, a in enumerate(anchor_batches):
            a = np.asarray(a)
            a = a[: len(a) // self.num_shards * self.num_shards]
            if len(a) == 0:
                continue
            rr, hits, cnt, ovf = self._eval_step(
                *self._graph_args(), params,
                self._put(np.asarray(a, np.int32), self.axis),
                self._put(np.asarray(step + i, np.int32)))
            from gigl_tpu.training.dist_sampled import (
                apply_overflow_policy,
            )

            apply_overflow_policy(self, int(ovf),
                                  grow_rebuild=self._build_programs)
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
        the SHARED fit loop (training/fit_loop.py) over the typed
        partitioned backend (frozen tabularized tables stay fixed for the
        run; call refresh_tables(hdg, epoch) between fits to resample)."""
        from gigl_tpu.training.fit_loop import nalp_fit_loop

        return nalp_fit_loop(
            self, state, train_anchors, val_anchors,
            batch_size=batch_size, num_epochs=num_epochs,
            val_every_n_batches=val_every_n_batches,
            num_val_batches=num_val_batches,
            early_stop_patience=early_stop_patience, log_every=log_every,
            scalar_logger=scalar_logger, checkpoint_dir=checkpoint_dir,
            num_shards=self.num_shards)

    def encode_batch(self, params, node_ids,
                     node_type: Optional[str] = None) -> jnp.ndarray:
        nt = str(node_type or self.cfg.anchor_node_type)
        pg = self.pg
        node_ids = np.asarray(node_ids, np.int32)
        m = node_ids.shape[0]
        m_pad = -(-m // self.num_shards) * self.num_shards
        out = self._get_encode_fn(nt)(
            pg.feats, pg.csr_ip, pg.csr_ix, dict(pg.csr_w or {}),
            dict(pg.sample_tables or {}), params,
            self._put(np.pad(node_ids, (0, m_pad - m)), self.axis))
        return out[:m]
