"""Device-resident heterogeneous graph bundle for typed training/inference.

TPU-native replacement for the reference's heterogeneous data path: GLT
builds one CSR topology per edge type plus per-node-type feature stores
(`python/gigl/distributed/dist_link_prediction_dataset.py:428-439`), and the
hetero loaders take per-edge-type fanouts
(`distributed/distributed_neighborloader.py:26`). Here every edge type's
adjacency is a DeviceCSR and per-node-type feature tables are dense device
arrays; typed sampling executes SubgraphSamplingStrategy-style op trees
(gigl_tpu.sampling.hetero_sampler).

Registered as a pytree: passed to jitted steps as an ARGUMENT (buffers stay
XLA parameters rather than baked-in HLO constants).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gigl_tpu.graph.csr import HeteroGraph, build_csr
from gigl_tpu.sampling.hetero_sampler import (
    OpSpec,
    TypedBlocks,
    chain_path,
    resolve_path,
    sample_typed_blocks,
)
from gigl_tpu.sampling.neighbor_sampler import (
    DeviceCSR,
    counter_rng_uniform,
    sample_neighbors,
)
from gigl_tpu.types.graph import EdgeType, NodeType


class HeteroNALPBatch:
    """See dataset.NALPBatch; candidates live in the candidate node type's
    id space (bipartite link prediction: anchors user-type, candidates
    item-type)."""


@jax.tree_util.register_pytree_node_class
@dataclass
class HeteroDeviceGraph:
    """Typed device graph: per-edge-type CSRs + per-node-type features."""

    csrs: Dict[str, DeviceCSR]                 # key: "{edge_type}|{anchor}"
    node_features: Dict[str, jnp.ndarray]      # key: node type -> [N_t, D_t]
    num_nodes: Dict[str, int]                  # static
    supervision_csr: Optional[DeviceCSR] = None
    hard_neg_csr: Optional[DeviceCSR] = None
    node_labels: Optional[Dict[str, jnp.ndarray]] = None
    # Frozen per-node sample tables for tabularized typed sampling, keyed
    # OpSpec.table_key ("{csr_key}#{fanout}#{method}") -> packed ids
    # [N_anchor, fanout] with -1 for
    # invalid slots (same frozen-sample semantics as DeviceGraph's tables).
    sample_tables: Optional[Dict[str, jnp.ndarray]] = None
    # Supervision / hard-negative LABEL edge features [Es, De] in CSR slot
    # order (ref nalp_data_loader.py:44-46 label_edge_features for typed
    # batches): hydrated per sampled positive / hard negative.
    sup_edge_features: Optional[jnp.ndarray] = None
    hard_neg_edge_features: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        csr_keys = tuple(sorted(self.csrs))
        feat_keys = tuple(sorted(self.node_features))
        label_keys = (tuple(sorted(self.node_labels))
                      if self.node_labels is not None else None)
        table_keys = (tuple(sorted(self.sample_tables))
                      if self.sample_tables is not None else None)
        children = (
            tuple(self.csrs[k] for k in csr_keys)
            + tuple(self.node_features[k] for k in feat_keys)
            + (self.supervision_csr, self.hard_neg_csr,
               self.sup_edge_features, self.hard_neg_edge_features)
            + (tuple(self.node_labels[k] for k in label_keys)
               if label_keys else ())
            + (tuple(self.sample_tables[k] for k in table_keys)
               if table_keys else ())
        )
        aux = (csr_keys, feat_keys, label_keys, table_keys,
               tuple(sorted(self.num_nodes.items())))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        csr_keys, feat_keys, label_keys, table_keys, num_nodes_items = aux
        nc, nf = len(csr_keys), len(feat_keys)
        csrs = dict(zip(csr_keys, children[:nc]))
        feats = dict(zip(feat_keys, children[nc: nc + nf]))
        sup, hard = children[nc + nf], children[nc + nf + 1]
        sup_ef, hard_ef = children[nc + nf + 2], children[nc + nf + 3]
        pos = nc + nf + 4
        labels = None
        if label_keys is not None:
            labels = dict(zip(label_keys, children[pos: pos + len(label_keys)]))
            pos += len(label_keys)
        tables = None
        if table_keys is not None:
            tables = dict(zip(table_keys, children[pos:]))
        return cls(csrs=csrs, node_features=feats,
                   num_nodes=dict(num_nodes_items), supervision_csr=sup,
                   hard_neg_csr=hard, node_labels=labels,
                   sample_tables=tables, sup_edge_features=sup_ef,
                   hard_neg_edge_features=hard_ef)

    # -- construction ----------------------------------------------------------
    @classmethod
    def from_hetero(
        cls,
        graph: HeteroGraph,
        paths: Dict[str, Tuple[OpSpec, ...]],
        *,
        supervision_edge_type: Optional[EdgeType] = None,
        supervision_edges: Optional[np.ndarray] = None,  # [2, Es] src,dst
        hard_neg_edges: Optional[np.ndarray] = None,
        supervision_anchor: str = "dst",
        supervision_edge_features: Optional[np.ndarray] = None,  # [Es, De]
        hard_neg_edge_features: Optional[np.ndarray] = None,     # [Eh, De]
        features_on_device: bool = True,
    ) -> "HeteroDeviceGraph":
        """``features_on_device=False`` keeps the per-type feature tables
        as HOST numpy arrays (dims intact, nothing uploaded) — for
        builders that only need topology + dims, e.g. the typed
        beyond-HBM route (PartitionedHeteroGraph.build(
        features_on_device=False) + per-type ShardedHostStores)."""
        needed = {op.csr_key for ops in paths.values() for op in ops}
        # CSRs whose ops sample weighted/top_k carry per-slot edge weights
        # (from the edge-feature column named by the op; ref: weighted
        # sampling in the GraphDB variant, NebulaHeteroKHopSampler).
        weighted_keys = {
            op.csr_key for ops in paths.values() for op in ops
            if getattr(op, "method", "uniform") in ("weighted", "top_k")}
        csrs: Dict[str, DeviceCSR] = {}
        for key in sorted(needed):
            et_str, anchor = key.rsplit("|", 1)
            et = next(e for e in graph.metadata.edge_types if str(e) == et_str)
            csr = graph.csr(et, anchor=anchor)
            weights = None
            if key in weighted_keys:
                ef = graph.edge_features.features.get(et_str)
                if ef is None:
                    raise ValueError(
                        f"edge type {et_str!r} sampled weighted/top_k but "
                        "has no edge features to use as weights")
                weights = np.asarray(ef)[csr.edge_ids, 0]
            csrs[key] = DeviceCSR.from_csr(csr, edge_weights=weights)
        feats = {}
        for nt in graph.metadata.node_types:
            n = graph.num_nodes[nt]
            f = (graph.node_features[nt] if nt in graph.node_features
                 else np.zeros((n, 1), np.float32))
            feats[str(nt)] = (jnp.asarray(np.asarray(f), dtype=jnp.float32)
                              if features_on_device
                              else np.asarray(f, np.float32))
        sup_csr = None
        sup_ef = hn_ef = None
        if supervision_edge_features is not None and supervision_edges is None:
            raise ValueError("supervision_edge_features needs "
                             "supervision_edges")
        if hard_neg_edge_features is not None and hard_neg_edges is None:
            raise ValueError("hard_neg_edge_features needs hard_neg_edges")
        if supervision_anchor not in ("src", "dst"):
            raise ValueError(f"bad supervision_anchor {supervision_anchor!r}")
        if supervision_edges is not None:
            if supervision_edge_type is None:
                raise ValueError("supervision_edges needs an edge type")
            # Anchored on the anchor side: positives for anchor v are the
            # opposite endpoints of its supervision edges (anchor "dst" =
            # the reference's sampling_direction "in"; "src" = "out").
            anchor_nt = (supervision_edge_type.dst_node_type
                         if supervision_anchor == "dst"
                         else supervision_edge_type.src_node_type)
            cand_nt = (supervision_edge_type.src_node_type
                       if supervision_anchor == "dst"
                       else supervision_edge_type.dst_node_type)
            sup_raw = build_csr(
                supervision_edges[0], supervision_edges[1],
                num_anchor_nodes=graph.num_nodes[anchor_nt],
                num_neighbor_nodes=graph.num_nodes[cand_nt],
                anchor=supervision_anchor)
            if supervision_edge_features is not None:
                sup_ef = jnp.asarray(np.ascontiguousarray(
                    np.asarray(supervision_edge_features,
                               np.float32)[sup_raw.edge_ids]))
            sup_csr = DeviceCSR.from_csr(sup_raw)
        hn_csr = None
        if hard_neg_edges is not None and supervision_edge_type is not None:
            anchor_nt = (supervision_edge_type.dst_node_type
                         if supervision_anchor == "dst"
                         else supervision_edge_type.src_node_type)
            cand_nt = (supervision_edge_type.src_node_type
                       if supervision_anchor == "dst"
                       else supervision_edge_type.dst_node_type)
            hn_raw = build_csr(
                hard_neg_edges[0], hard_neg_edges[1],
                num_anchor_nodes=graph.num_nodes[anchor_nt],
                num_neighbor_nodes=graph.num_nodes[cand_nt],
                anchor=supervision_anchor)
            if hard_neg_edge_features is not None:
                hn_ef = jnp.asarray(np.ascontiguousarray(
                    np.asarray(hard_neg_edge_features,
                               np.float32)[hn_raw.edge_ids]))
            hn_csr = DeviceCSR.from_csr(hn_raw)
        labels = {str(nt): jnp.asarray(lab, jnp.int32)
                  for nt, lab in graph.node_labels.items()} or None
        return cls(sup_edge_features=sup_ef, hard_neg_edge_features=hn_ef,
                   csrs=csrs, node_features=feats,
                   num_nodes={str(nt): int(n)
                              for nt, n in graph.num_nodes.items()},
                   supervision_csr=sup_csr, hard_neg_csr=hn_csr,
                   node_labels=labels)

    # -- tabularized sampling ---------------------------------------------------
    def with_sample_tables(
        self,
        paths: Dict[str, Tuple[OpSpec, ...]],
        *,
        seed: int = 0,
    ) -> "HeteroDeviceGraph":
        """Return a copy with frozen per-node sample tables for every
        (csr, fanout, method) any op in ``paths`` uses — the typed analog of
        DeviceGraph.with_neighbor_cache(table_fanouts=...): in-step hop
        expansion becomes ONE packed row gather per op (measured 8x over
        per-slot CSR element gathers on v5e, docs/performance.md). Frozen
        semantics: a node reuses its one per-(csr, fanout) sample at every
        tree position — the reference v1 precomputed-sample regime.
        Rebuilding with a new seed is the Subgraph Sampler re-run analog."""
        import dataclasses

        from gigl_tpu.ops.hopcache import build_sample_table

        tables: Dict[str, jnp.ndarray] = dict(self.sample_tables or {})
        for ops in paths.values():
            for op in ops:
                key = op.table_key
                if key in tables:
                    continue
                ids_t, mask_t = build_sample_table(
                    self.csrs[op.csr_key], fanout=int(op.fanout), seed=seed,
                    hop_key=1, method=op.method)
                tables[key] = jnp.where(mask_t, ids_t, -1)
        return dataclasses.replace(self, sample_tables=tables)

    def sample_tabularized(self, roots: jnp.ndarray, root_node_type: str,
                           spec: Tuple[OpSpec, ...]) -> TypedBlocks:
        """Execute the op tree against the frozen sample tables (one packed
        row gather per op). Requires with_sample_tables(paths) first."""
        if self.sample_tables is None:
            raise ValueError("no sample tables; with_sample_tables() first")
        roots = roots.reshape(-1).astype(jnp.int32)
        node_ids = [roots]
        masks = [jnp.ones(roots.shape, dtype=bool)]
        edge_slots: List[Optional[jnp.ndarray]] = [None]
        for op in spec:
            key = op.table_key
            if key not in self.sample_tables:
                raise ValueError(f"no sample table {key!r}; have "
                                 f"{sorted(self.sample_tables)}")
            frontier = node_ids[op.parent + 1]
            parent_mask = masks[op.parent + 1]
            row = self.sample_tables[key][frontier]   # -1 = invalid slot
            m = (row >= 0) & parent_mask[..., None]
            node_ids.append(jnp.where(m, row, 0))
            masks.append(m)
            edge_slots.append(None)
        return TypedBlocks(root_node_type=str(root_node_type),
                           spec=tuple(spec), node_ids=node_ids, masks=masks,
                           edge_slots=edge_slots)

    # -- device-side ops -------------------------------------------------------
    def sample(self, roots: jnp.ndarray, root_node_type: str,
               spec: Tuple[OpSpec, ...], *, seed: int = 0) -> TypedBlocks:
        return sample_typed_blocks(self.csrs, roots.reshape(-1),
                                   str(root_node_type), spec, seed=seed)

    def hydrate(self, blocks: TypedBlocks):
        """Gather per-op features: entry 0 is the root frontier (root node
        type), entry i+1 is spec[i]'s neighbor node type."""
        feats = [self.node_features[blocks.root_node_type][blocks.node_ids[0]]]
        for i, op in enumerate(blocks.spec):
            feats.append(
                self.node_features[op.neighbor_node_type][
                    blocks.node_ids[i + 1]])
        return feats, blocks.masks

    def sample_positives(self, anchors: jnp.ndarray, num_positives: int,
                         *, seed: int, step) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.supervision_csr is None:
            raise ValueError("no supervision CSR registered")
        pos, mask, _ = sample_neighbors(
            self.supervision_csr, anchors, num_positives,
            seed=seed, hop=1_000_003 + step)
        return pos, mask

    def sample_positives_with_feats(self, anchors, num_positives, *,
                                    seed: int, step):
        """(pos, mask, edge_feats-or-None): the sampled positives plus
        their slot-aligned label-edge features (same draw as
        sample_positives — identical RNG keying)."""
        if self.supervision_csr is None:
            raise ValueError("no supervision CSR registered")
        pos, mask, slots = sample_neighbors(
            self.supervision_csr, anchors, num_positives,
            seed=seed, hop=1_000_003 + step)
        ef = None
        if self.sup_edge_features is not None:
            ef = jnp.where(mask[..., None],
                           self.sup_edge_features[slots], 0.0)
        return pos, mask, ef

    def sample_hard_negatives_with_feats(self, anchors, num_hard_negs, *,
                                         seed: int, step):
        if num_hard_negs <= 0 or self.hard_neg_csr is None:
            z = jnp.zeros(anchors.shape + (max(num_hard_negs, 0),),
                          jnp.int32)
            return z, z.astype(bool), None
        hard, mask, slots = sample_neighbors(
            self.hard_neg_csr, anchors, num_hard_negs,
            seed=seed, hop=2_000_003 + step)
        ef = None
        if self.hard_neg_edge_features is not None:
            ef = jnp.where(mask[..., None],
                           self.hard_neg_edge_features[slots], 0.0)
        return hard, mask, ef

    def sample_hard_negatives(self, anchors, num_hard_negs, *, seed, step):
        if num_hard_negs <= 0 or self.hard_neg_csr is None:
            z = jnp.zeros(anchors.shape + (max(num_hard_negs, 0),), jnp.int32)
            return z, jnp.zeros(z.shape, bool)
        hard, mask, _ = sample_neighbors(
            self.hard_neg_csr, anchors, num_hard_negs,
            seed=seed, hop=2_000_003 + step)
        return hard, mask

    def sample_random_negatives(self, num: int, candidate_node_type: str,
                                *, seed: int, step) -> jnp.ndarray:
        bits = counter_rng_uniform(
            jnp.arange(num, dtype=jnp.int32),
            seed=seed, hop=3_000_017 + step, num_slots=1)[:, 0]
        n = self.num_nodes[str(candidate_node_type)]
        return (bits % jnp.uint32(n)).astype(jnp.int32)


def paths_from_config(
    graph: HeteroGraph,
    sampling_cfg,
    root_node_types: Sequence[str],
    *,
    default_fanouts: Tuple[int, ...] = (10, 5),
) -> Dict[str, Tuple[OpSpec, ...]]:
    """Resolve per-root-node-type op trees from the task config's
    SubgraphSamplingStrategy (message_passing_paths), or expand uniform
    fanouts into chain DAGs over each root type's incident edge types
    (the reference's simple per-hop fanout mode)."""
    paths: Dict[str, Tuple[OpSpec, ...]] = {}
    mpp = getattr(sampling_cfg, "message_passing_paths", {}) or {}
    fanouts = tuple(getattr(sampling_cfg, "fanouts", ()) or default_fanouts)
    for nt in root_node_types:
        nt = str(nt)
        if nt in mpp:
            paths[nt] = resolve_path(nt, mpp[nt])
            continue
        # Chain over the unique edge type whose dst is this node type; if
        # several, build a tree: one root op per incident edge type, each
        # extended chain-wise with the remaining fanouts along reachable
        # in-edges (greedy; explicit DAGs cover anything fancier).
        incident = [e for e in graph.metadata.edge_types
                    if str(e.dst_node_type) == nt]
        if not incident:
            raise ValueError(f"no in-edge types for root node type {nt!r}")
        if len(incident) == 1 and len(
                {str(e) for e in graph.metadata.edge_types}) == 1:
            paths[nt] = chain_path(nt, incident[0], fanouts)
            continue
        ops: List = []
        from gigl_tpu.config.task_config import SamplingOp

        def extend(frontier_nt: str, parent_names: Tuple[str, ...],
                   depth: int, prefix: str):
            if depth >= len(fanouts):
                return
            inc = [e for e in graph.metadata.edge_types
                   if str(e.dst_node_type) == frontier_nt]
            for e in inc:
                name = f"{prefix}/{e.relation}@{depth + 1}"
                ops.append(SamplingOp(
                    op_name=name, edge_type=e,
                    num_nodes_to_sample=fanouts[depth],
                    input_op_names=parent_names,
                    sampling_direction="INCOMING"))
                extend(str(e.src_node_type), (name,), depth + 1, name)

        extend(nt, (), 0, nt)
        paths[nt] = resolve_path(nt, ops)
    return paths
