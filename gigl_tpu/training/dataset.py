"""Device-resident training dataset: graph + features + splits + loaders.

TPU-native replacement for the reference's two data paths:
  - v1: precomputed TFRecord sample protos + CPU collation
    (training/v1/lib/data_loaders/), and
  - v2: GLT DistDataset + DistNeighborLoader (distributed/).

Here the (preprocessed) graph lives on device as CSR + feature tables;
*everything per-batch* — neighbor sampling, positive/hard-negative lookup,
feature hydration — is jit-compiled device work. Host code only iterates
anchor-id permutations (cheap NumPy), mirroring the reference's seed-node
sharding (`distributed_neighborloader.py:195 _shard_nodes_by_process`).

Positive sampling uses the same on-device CSR sampler over the *supervision*
edge CSR — the NALP sample contract of SGS
(NodeAnchorBasedLinkPredictionBaseTask.scala:19-388: per root, sample
numPositiveSamples pos edges + user-defined hard negatives).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gigl_tpu.graph.csr import CSR, HeteroGraph, build_csr
from gigl_tpu.graph.splitters import HashedNodeAnchorLinkSplitter
from gigl_tpu.sampling.neighbor_sampler import (
    DeviceCSR,
    SampledBlocks,
    sample_blocks,
    sample_neighbors,
)
from gigl_tpu.types.graph import (
    DEFAULT_HOMOGENEOUS_EDGE_TYPE,
    DEFAULT_HOMOGENEOUS_NODE_TYPE,
    EdgeType,
    NodeType,
)


class NALPBatch(NamedTuple):
    """Node-anchor link prediction batch (device arrays).

    Ref parity: the (main_batch, random_negative_batch) pair contract of
    Appendix A.2 (task_inputs.py:16-58): anchors with per-anchor positives
    and hard negatives + batch-shared random negatives.
    """

    anchors: jnp.ndarray      # [B] int32
    pos: jnp.ndarray          # [B, P] int32
    pos_mask: jnp.ndarray     # [B, P] bool
    hard_neg: jnp.ndarray     # [B, H] int32 (H may be 0)
    hard_neg_mask: jnp.ndarray  # [B, H] bool
    random_neg: jnp.ndarray   # [R] int32
    # Per-supervision-edge (label) features, hydrated from the supervision /
    # hard-negative CSRs' edge ids when the graph carries them — the
    # reference's ``label_edge_features`` batch slots
    # (ref nalp_data_loader.py:44-46,184-192). None when absent.
    pos_edge_feats: Optional[jnp.ndarray] = None       # [B, P, De]
    hard_neg_edge_feats: Optional[jnp.ndarray] = None  # [B, H, De]


class NodeClassificationBatch(NamedTuple):
    nodes: jnp.ndarray   # [B] int32
    labels: jnp.ndarray  # [B] int32
    mask: jnp.ndarray    # [B] bool (padding)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceGraph:
    """Homogeneous device-side graph bundle for training/inference.

    message_csr: adjacency used for message passing (sampling direction
    "in": anchored on dst). supervision_csr: positive-label edges anchored
    on the anchor side. hard_neg_csr: user-defined negatives (optional).

    Registered as a pytree so it is passed to jit-compiled steps as an
    ARGUMENT (device buffers stay XLA parameters). Closing over the graph
    inside jit would bake every array into the HLO as a constant — slow to
    lower (device→host fetch per array) and duplicated into the executable.
    """

    message_csr: DeviceCSR
    node_features: jnp.ndarray          # [N, D]
    num_nodes: int
    supervision_csr: Optional[DeviceCSR] = None
    hard_neg_csr: Optional[DeviceCSR] = None
    node_labels: Optional[jnp.ndarray] = None
    edge_features: Optional[jnp.ndarray] = None  # [E, De] in CSR slot order
    degrees: Optional[jnp.ndarray] = None        # [N] float32 in-degrees
    nbr_cache: Optional[jnp.ndarray] = None      # [N, D] hopcache table
    # Frozen per-node hop samples, one packed ids table [N, k] per fanout k
    # used by in-tree hops (tabularized mode; ops/hopcache.py). Invalid
    # slots are -1 (mask = ids >= 0, recovered elementwise so each hop
    # expansion is a single row gather).
    sample_tables: Optional[Dict[int, jnp.ndarray]] = None
    # Fused [N, D + Dc] table of concat(node_features, nbr_cache): one row
    # gather hydrates BOTH layer-1 inputs (measured ~13% cheaper than two
    # separate gathers over the same index set on v5e — gather cost is
    # near width-insensitive, so halving the gather count wins).
    fused_table: Optional[jnp.ndarray] = None
    # Supervision / hard-negative LABEL edge features in CSR slot order
    # ([Es, De] / [Eh, De]) — hydrated per sampled positive/hard negative
    # into NALPBatch (ref nalp_data_loader.py:44-46,184-192).
    sup_edge_features: Optional[jnp.ndarray] = None
    hard_neg_edge_features: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        children = (self.message_csr, self.node_features,
                    self.supervision_csr, self.hard_neg_csr,
                    self.node_labels, self.edge_features, self.degrees,
                    self.nbr_cache, self.sample_tables, self.fused_table,
                    self.sup_edge_features, self.hard_neg_edge_features)
        return children, self.num_nodes

    @classmethod
    def tree_unflatten(cls, num_nodes, children):
        (message_csr, node_features, supervision_csr, hard_neg_csr,
         node_labels, edge_features, degrees, nbr_cache,
         sample_tables, fused_table, sup_edge_features,
         hard_neg_edge_features) = children
        return cls(message_csr=message_csr, node_features=node_features,
                   num_nodes=num_nodes, supervision_csr=supervision_csr,
                   hard_neg_csr=hard_neg_csr, node_labels=node_labels,
                   edge_features=edge_features, degrees=degrees,
                   nbr_cache=nbr_cache, sample_tables=sample_tables,
                   fused_table=fused_table,
                   sup_edge_features=sup_edge_features,
                   hard_neg_edge_features=hard_neg_edge_features)

    @classmethod
    def from_hetero(
        cls,
        graph: HeteroGraph,
        *,
        supervision_edges: Optional[np.ndarray] = None,  # [2, Es]
        hard_neg_edges: Optional[np.ndarray] = None,
        edge_type: Optional[EdgeType] = None,
        sampling_direction: str = "in",
        quantize_features: bool = False,
        sampling_weight_index: Optional[int] = None,
        supervision_edge_features: Optional[np.ndarray] = None,  # [Es, De]
        hard_neg_edge_features: Optional[np.ndarray] = None,     # [Eh, De]
    ) -> "DeviceGraph":
        """``quantize_features``: store node features as an int8
        per-row-scaled QuantizedTable (ops/quantized.py, int32-packed rows) — 4x less
        HBM; gathers dequantize on the fly. Throughput is unchanged
        (gathers are row-count bound, docs/performance.md); this is a
        CAPACITY lever for the MAG240M regime.

        ``sampling_weight_index``: column of the edge features to use as
        per-edge sampling weights, enabling method="weighted"/"top_k"
        neighbor sampling (ref: RandomWeighted/TopK sampling ops,
        subgraph_sampling_strategy.proto:11-19)."""
        et = edge_type or graph.metadata.edge_types[0]
        nt = et.dst_node_type if sampling_direction == "in" else et.src_node_type
        anchor = "dst" if sampling_direction == "in" else "src"
        csr = graph.csr(et, anchor=anchor)
        n = graph.num_nodes[nt]
        feats = (
            graph.node_features[nt]
            if nt in graph.node_features
            else np.zeros((n, 1), np.float32)
        )
        ef_key = str(et)
        edge_features = None
        if ef_key in graph.edge_features:
            # reorder raw COO edge features into CSR slot order
            edge_features = jnp.asarray(
                graph.edge_features[ef_key][csr.edge_ids], dtype=jnp.float32)
        sup_csr = None
        sup_ef = None
        if supervision_edges is not None:
            sup = build_csr(
                supervision_edges[0], supervision_edges[1],
                num_anchor_nodes=n, num_neighbor_nodes=n,
                anchor=anchor,
            )
            sup_csr = DeviceCSR.from_csr(sup)
            if supervision_edge_features is not None:
                # raw rows are aligned to supervision_edges COLUMNS;
                # reorder into CSR slot order via edge_ids.
                sup_ef = jnp.asarray(
                    np.asarray(supervision_edge_features)[sup.edge_ids],
                    jnp.float32)
        elif supervision_edge_features is not None:
            raise ValueError(
                "supervision_edge_features needs supervision_edges")
        hn_csr = None
        hn_ef = None
        if hard_neg_edges is not None:
            hn = build_csr(
                hard_neg_edges[0], hard_neg_edges[1],
                num_anchor_nodes=n, num_neighbor_nodes=n, anchor=anchor,
            )
            hn_csr = DeviceCSR.from_csr(hn)
            if hard_neg_edge_features is not None:
                hn_ef = jnp.asarray(
                    np.asarray(hard_neg_edge_features)[hn.edge_ids],
                    jnp.float32)
        elif hard_neg_edge_features is not None:
            raise ValueError("hard_neg_edge_features needs hard_neg_edges")
        labels = graph.node_labels.get(nt)
        deg = np.diff(csr.indptr).astype(np.float32)
        if quantize_features:
            from gigl_tpu.ops.quantized import QuantizedTable

            feats_dev = QuantizedTable.quantize(np.asarray(feats))
        else:
            feats_dev = jnp.asarray(np.asarray(feats), dtype=jnp.float32)
        sampling_weights = None
        if sampling_weight_index is not None:
            if edge_features is None:
                raise ValueError(
                    "sampling_weight_index requires edge features")
            sampling_weights = np.asarray(
                edge_features[:, sampling_weight_index])
            # Sort every CSR row by DESCENDING edge weight: the bounded
            # weighted/top-k window (neighbor_sampler.weighted_offsets)
            # then sees the heaviest edges first — top-k becomes EXACT for
            # fanout <= window even on hubs whose degree exceeds the
            # window, and Gumbel weighted sampling draws from the
            # maximum-mass prefix. One-time host work; edge features and
            # edge ids stay slot-aligned.
            from gigl_tpu.graph.csr import CSR as _CSR

            row_of = np.repeat(np.arange(len(csr.indptr) - 1),
                               np.diff(csr.indptr))
            order = np.lexsort((-sampling_weights, row_of))
            csr = _CSR(indptr=csr.indptr,
                       indices=np.asarray(csr.indices)[order],
                       edge_ids=(np.asarray(csr.edge_ids)[order]
                                 if csr.edge_ids is not None else None),
                       num_neighbor_nodes=csr.num_neighbor_nodes)
            edge_features = jnp.asarray(np.asarray(edge_features)[order])
            sampling_weights = sampling_weights[order]
        return cls(
            message_csr=DeviceCSR.from_csr(csr, edge_weights=sampling_weights),
            node_features=feats_dev,
            num_nodes=n,
            supervision_csr=sup_csr,
            hard_neg_csr=hn_csr,
            node_labels=(
                jnp.asarray(labels, dtype=jnp.int32) if labels is not None else None
            ),
            edge_features=edge_features,
            degrees=jnp.asarray(deg),
            sup_edge_features=sup_ef,
            hard_neg_edge_features=hn_ef,
        )

    # -- device-side batch assembly -------------------------------------------
    def sample_nalp_batch(
        self,
        anchors: jnp.ndarray,
        *,
        num_positives: int,
        num_hard_negs: int = 0,
        num_random_negs: int = 512,
        seed: int = 0,
        step: int = 0,
    ) -> NALPBatch:
        """jit-safe: draw positives/hard negs from supervision CSRs and
        batch-shared uniform random negatives."""
        if self.supervision_csr is None:
            raise ValueError("No supervision CSR registered for NALP sampling")
        pos, pos_mask, pos_slots = sample_neighbors(
            self.supervision_csr, anchors, num_positives,
            seed=seed, hop=1_000_003 + step)
        pos_ef = None
        if self.sup_edge_features is not None:
            # Label edge features of each sampled positive (CSR slot ->
            # feature row; padded slots hydrate row 0 and are masked by
            # pos_mask downstream). Ref nalp_data_loader.py:44-46.
            pos_ef = self.sup_edge_features[pos_slots]
        hard_ef = None
        if num_hard_negs > 0 and self.hard_neg_csr is not None:
            hard, hard_mask, hard_slots = sample_neighbors(
                self.hard_neg_csr, anchors, num_hard_negs,
                seed=seed, hop=2_000_003 + step)
            if self.hard_neg_edge_features is not None:
                hard_ef = self.hard_neg_edge_features[hard_slots]
        else:
            hard = jnp.zeros(anchors.shape + (num_hard_negs,), jnp.int32)
            hard_mask = jnp.zeros(anchors.shape + (num_hard_negs,), bool)
        # Batch-shared random negatives: uniform over all nodes, counter-RNG
        # keyed by step so the draw is deterministic per step.
        from gigl_tpu.sampling.neighbor_sampler import counter_rng_uniform

        bits = counter_rng_uniform(
            jnp.arange(num_random_negs, dtype=jnp.int32),
            seed=seed, hop=3_000_017 + step, num_slots=1)[:, 0]
        rand = (bits % jnp.uint32(self.num_nodes)).astype(jnp.int32)
        return NALPBatch(
            anchors=anchors.astype(jnp.int32),
            pos=pos, pos_mask=pos_mask,
            hard_neg=hard, hard_neg_mask=hard_mask,
            random_neg=rand,
            pos_edge_feats=pos_ef,
            hard_neg_edge_feats=hard_ef,
        )

    def sample_hop_blocks(
        self,
        node_ids: jnp.ndarray,
        fanouts: Sequence[int],
        *,
        seed: int = 0,
        method: str = "uniform",
    ) -> SampledBlocks:
        return sample_blocks(self.message_csr, node_ids.reshape(-1),
                             fanouts, seed=seed, method=method)

    def hydrate(self, blocks: SampledBlocks):
        """Gather hop features (+ per-hop degrees) for encoder input."""
        feats = [self.node_features[ids] for ids in blocks.node_ids]
        degs = None
        if self.degrees is not None:
            degs = [self.degrees[ids] for ids in blocks.node_ids]
        return feats, blocks.masks, degs

    def with_neighbor_cache(
        self,
        *,
        fanout: int,
        seed: int = 0,
        hop_key: int = 1,
        agg: str = "mean",
        table_fanouts: Optional[Sequence[int]] = None,
        quantize: bool = False,
        fuse_features: bool = False,
        method: str = "uniform",
    ) -> "DeviceGraph":
        """Return a copy with the v1 "tabularized" sampling tables
        precomputed (ops/hopcache.py — one frozen sample per node per
        refresh): the deepest-hop AGGREGATE table (layer-1 input) and, when
        ``table_fanouts`` is given (the in-tree hop fanouts), one frozen
        hop-sample id/mask table per distinct fanout, turning in-step hop
        sampling into one dense row gather per hop. ``hop_key`` must equal
        the hop index the live sampler uses for the cached hop
        (len(fanouts))."""
        import dataclasses

        from gigl_tpu.ops.hopcache import (
            build_neighbor_cache,
            build_sample_table,
        )

        cache = build_neighbor_cache(
            self.message_csr, self.node_features,
            fanout=fanout, seed=seed, hop_key=hop_key, agg=agg,
            degrees=self.degrees, method=method)
        if quantize:
            from gigl_tpu.ops.quantized import QuantizedTable

            cache = QuantizedTable.quantize(np.asarray(cache))
        tables = None
        if table_fanouts:
            # Pack validity into the id table as -1 sentinels: the in-step
            # hop expansion then needs ONE row gather per hop instead of two
            # (ids + bool mask) — mask is recomputed as ids >= 0 (free
            # elementwise vs a second [N, k] table gather).
            def packed(k: int):
                ids_t, mask_t = build_sample_table(
                    self.message_csr, fanout=int(k), seed=seed, hop_key=1,
                    method=method)
                return jnp.where(mask_t, ids_t, -1)

            tables = {
                int(k): packed(k)
                for k in sorted(set(int(k) for k in table_fanouts))
            }
        fused = None
        if fuse_features:
            if quantize:
                raise ValueError("fuse_features requires an unquantized cache")
            fused = jnp.concatenate(
                [self.node_features.astype(cache.dtype), cache], axis=-1)
        return dataclasses.replace(self, nbr_cache=cache,
                                   sample_tables=tables, fused_table=fused)

    def sample_hop_blocks_tabularized(
        self,
        node_ids: jnp.ndarray,
        fanouts: Sequence[int],
    ) -> SampledBlocks:
        """Build a fanout tree from the frozen sample tables (one dense row
        gather per hop). Frozen semantics: a node reuses its one
        per-fanout sample at every depth — the v1 precomputed-subgraph
        regime (ops/hopcache.py docstring)."""
        if self.sample_tables is None:
            raise ValueError("no sample tables; with_neighbor_cache(..., "
                             "table_fanouts=...) first")
        roots = node_ids.reshape(-1).astype(jnp.int32)
        node_ids_l = [roots]
        masks = [jnp.ones(roots.shape, dtype=bool)]
        edge_slots: List[Optional[jnp.ndarray]] = [None]
        frontier, parent_mask = roots, masks[0]
        for k in fanouts:
            if int(k) not in self.sample_tables:
                raise ValueError(
                    f"no sample table for fanout {k}; have "
                    f"{sorted(self.sample_tables)}")
            row = self.sample_tables[int(k)][frontier]  # -1 = invalid slot
            m = (row >= 0) & parent_mask[..., None]
            nbr = jnp.where(m, row, 0)
            node_ids_l.append(nbr)
            masks.append(m)
            edge_slots.append(None)
            frontier, parent_mask = nbr, m
        return SampledBlocks(node_ids=node_ids_l, masks=masks,
                             edge_slots=edge_slots)

    def hydrate_fused(self, blocks: SampledBlocks):
        """One row gather per tree level hydrating BOTH layer-1 inputs:
        returns (feats, masks, degrees, cached) with feats[l]/cached[l]
        views into the same gathered [..., D + Dc] rows. Requires
        with_neighbor_cache(..., fuse_features=True)."""
        if self.fused_table is None:
            raise ValueError("no fused table; with_neighbor_cache(..., "
                             "fuse_features=True) first")
        d = self.node_features.shape[-1]
        rows = [self.fused_table[ids] for ids in blocks.node_ids]
        feats = [r[..., :d] for r in rows]
        cached = [r[..., d:] for r in rows]
        degs = None
        if self.degrees is not None:
            degs = [self.degrees[ids] for ids in blocks.node_ids]
        return feats, blocks.masks, degs, cached

    def hydrate_cached(self, blocks: SampledBlocks):
        """Gather the hopcache rows for every tree node ([..., D] per
        level); requires with_neighbor_cache() first."""
        if self.nbr_cache is None:
            raise ValueError("no neighbor cache; call with_neighbor_cache()")
        return [self.nbr_cache[ids] for ids in blocks.node_ids]

    def hydrate_edges(self, blocks: SampledBlocks):
        """Per-hop edge features aligned to block slots (or None)."""
        if self.edge_features is None:
            return None
        out = [None]
        for es in blocks.edge_slots[1:]:
            out.append(self.edge_features[es])
        return out


@dataclass
class AnchorBatchIterator:
    """Host-side iterator over shuffled anchor-node batches (drops remainder
    to keep shapes static; epochs reshuffle deterministically by epoch)."""

    anchor_ids: np.ndarray
    batch_size: int
    seed: int = 0
    drop_remainder: bool = True

    def num_batches(self) -> int:
        n = len(self.anchor_ids) // self.batch_size
        if not self.drop_remainder and len(self.anchor_ids) % self.batch_size:
            n += 1
        return n

    def epoch(self, epoch_idx: int) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(self.seed * 1_000_003 + epoch_idx)
        perm = rng.permutation(self.anchor_ids)
        n_full = len(perm) // self.batch_size
        for i in range(n_full):
            yield perm[i * self.batch_size: (i + 1) * self.batch_size]
        rem = len(perm) % self.batch_size
        if rem and not self.drop_remainder:
            # Pad the tail batch by wrapping (callers mask by position).
            tail = perm[-rem:]
            pad = perm[: self.batch_size - rem]
            yield np.concatenate([tail, pad])
