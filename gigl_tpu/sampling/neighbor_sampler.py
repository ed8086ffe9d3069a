"""On-device layerwise neighbor sampling over CSR → dense fanout blocks.

TPU-native replacement for BOTH generations of the reference's sampling:

  - v1 Spark Subgraph Sampler (`scala/subgraph_sampler/.../SGSPureSparkV1Task.scala`
    sampleOnehopSrcNodesUniformly:313 / sampleTwohopSrcNodesUniformly:390):
    there, k-hop subgraphs are *precomputed* per root node as protos.
  - v2 GLT C++ RPC engine (`python/gigl/distributed/distributed_neighborloader.py`):
    live ragged sampling on CPU workers.

Here sampling is a **jit-compiled device computation**: for each hop, every
frontier node draws exactly ``fanout`` neighbor slots from the CSR adjacency
(uniform with replacement when degree > fanout; all neighbors + mask
otherwise), producing a *tree* of static-shape index blocks. No raggedness,
no host round-trips, compiles once per (batch_size, fanouts) signature.

Determinism: offsets come from a counter-based integer hash keyed by
(seed, node_id, hop, slot) — the same draw for a node regardless of batch
composition, reproducing the *spirit* of v1's deterministic
hash-permutation sampling (`SamplingStrategy.hashBasedUniformPermutation`,
libs/task/SamplingStrategy.scala:16). Divergence from reference noted: for
degree > fanout we sample with replacement (the reference permutes and takes
the first k, i.e. without replacement); with-replacement is the standard
TPU/GraphSAGE trade for O(1) per-slot work.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gigl_tpu.graph.csr import CSR


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32-style integer finalizer on uint32 (counter-based RNG core)."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def counter_rng_uniform(
    node_ids: jnp.ndarray, seed: int, hop: int, num_slots: int
) -> jnp.ndarray:
    """Deterministic uniform uint32 per (seed, node, hop, slot): [..., num_slots]."""
    slots = jax.lax.broadcasted_iota(
        jnp.uint32, node_ids.shape + (num_slots,), len(node_ids.shape)
    )
    base = (
        node_ids.astype(jnp.uint32)[..., None] * jnp.uint32(0x9E3779B9)
        + jnp.uint32(seed) * jnp.uint32(0x85EBCA6B)
        + jnp.uint32(hop) * jnp.uint32(0xC2B2AE35)
    )
    return _mix32(base ^ _mix32(slots + jnp.uint32(0x27220A95)))


def uniform_offsets(
    deg: jnp.ndarray, node_ids: jnp.ndarray, seed, hop, fanout: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared uniform-draw core: per-node CSR slice offsets + validity mask.

    Keyed by GLOBAL node id, so every caller — the replicated sampler
    (sample_neighbors), the owner side of the routed distributed sampler
    (parallel/feature_lookup.routed_sample_neighbors), and the sharded
    tabularized table builders (parallel/partition + dist_sampled) — draws
    bit-identical samples for the same (seed, node, hop, slot). deg/node_ids
    may have any matching shape; returns ([..., fanout] int32 offsets,
    [..., fanout] bool mask). Nodes with deg <= fanout take all neighbors
    in slot order (mask marks the first deg slots); larger degrees sample
    with replacement.
    """
    slot_iota = jax.lax.broadcasted_iota(
        jnp.int32, deg.shape + (fanout,), deg.ndim)
    bits = counter_rng_uniform(node_ids, seed, hop, fanout)
    rand_off = (bits % jnp.maximum(deg, 1)[..., None].astype(jnp.uint32)
                ).astype(jnp.int32)
    take_all = (deg <= fanout)[..., None]
    offsets = jnp.where(
        take_all,
        jnp.minimum(slot_iota, jnp.maximum(deg - 1, 0)[..., None]),
        rand_off)
    mask = jnp.where(take_all, slot_iota < deg[..., None],
                     deg[..., None] > 0)
    return offsets, mask


def weighted_offsets(
    edge_weights: jnp.ndarray, start: jnp.ndarray, deg: jnp.ndarray,
    node_ids: jnp.ndarray, seed, hop, fanout: int, method: str,
    window: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared weighted / top-k draw core over a bounded per-node window.

    Considers the FIRST ``window`` CSR slots of each node; DeviceGraph
    sorts every row by descending edge weight at build time
    (dataset.py from_hetero), so the window holds the heaviest edges —
    top-k is EXACT whenever fanout <= window, and Gumbel-top-k weighted
    sampling covers the maximum-mass prefix. Used by both the replicated
    sampler (sample_neighbors) and the owner side of the routed
    distributed sampler — same counter-RNG keying by GLOBAL node id, so
    draws are bit-identical across the two.
    """
    win_iota = jax.lax.broadcasted_iota(
        jnp.int32, deg.shape + (window,), deg.ndim)
    win_valid = win_iota < deg[..., None]
    win_slots = start[..., None] + jnp.minimum(
        win_iota, jnp.maximum(deg - 1, 0)[..., None])
    win_slots = jnp.clip(win_slots, 0, edge_weights.shape[0] - 1)
    w = edge_weights[win_slots]
    neg = jnp.finfo(jnp.float32).min
    logw = jnp.where(win_valid, jnp.log(jnp.maximum(w, 1e-30)), neg)
    if method == "weighted":
        bits = counter_rng_uniform(node_ids, seed, hop, window)
        u = (bits.astype(jnp.float32) + 0.5) / 4294967296.0
        scores = jnp.where(win_valid, logw - jnp.log(-jnp.log(u)), neg)
    elif method == "top_k":
        scores = logw
    else:
        raise ValueError(f"Unknown weighted method {method!r}")
    _, top_idx = jax.lax.top_k(scores, fanout)  # [..., fanout] window offs
    offsets = jnp.minimum(top_idx, jnp.maximum(deg - 1, 0)[..., None])
    slot_iota = jax.lax.broadcasted_iota(
        jnp.int32, deg.shape + (fanout,), deg.ndim)
    mask = slot_iota < jnp.minimum(deg, fanout)[..., None]
    return offsets, mask


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceCSR:
    """CSR adjacency resident on device (jnp arrays)."""

    indptr: jnp.ndarray  # [N+1] int32
    indices: jnp.ndarray  # [E] int32
    edge_ids: Optional[jnp.ndarray] = None  # [E] int32 (original COO rows)
    edge_weights: Optional[jnp.ndarray] = None  # [E] float32 (weighted sampling)

    def tree_flatten(self):
        return (self.indptr, self.indices, self.edge_ids, self.edge_weights), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_csr(cls, csr: CSR, edge_weights: Optional[np.ndarray] = None) -> "DeviceCSR":
        return cls(
            indptr=jnp.asarray(csr.indptr, dtype=jnp.int32),
            indices=jnp.asarray(csr.indices, dtype=jnp.int32),
            edge_ids=(
                jnp.asarray(csr.edge_ids, dtype=jnp.int32)
                if csr.edge_ids is not None
                else None
            ),
            edge_weights=(
                jnp.asarray(edge_weights, dtype=jnp.float32)
                if edge_weights is not None
                else None
            ),
        )

    @property
    def num_anchor_nodes(self) -> int:
        return self.indptr.shape[0] - 1


def sample_neighbors(
    csr: DeviceCSR,
    frontier: jnp.ndarray,
    fanout: int,
    *,
    seed: int,
    hop: int,
    method: str = "uniform",
    weight_window: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Sample ``fanout`` neighbor slots for each frontier node.

    frontier: [...] int32 node ids (any leading shape).
    Returns (neighbor_ids [..., fanout], mask [..., fanout], edge_slots) where
    edge_slots indexes ``csr.indices``/``csr.edge_ids`` rows (for edge-feature
    hydration); padded slots point at offset 0 of the node's slice and are
    masked out.
    """
    start = csr.indptr[frontier]  # [...]
    deg = csr.indptr[frontier + 1] - start
    if method == "uniform":
        offsets, mask = uniform_offsets(deg, frontier, seed, hop, fanout)
    elif method in ("weighted", "top_k"):
        # Bounded-window weighted sampling (weighted_offsets): the first
        # ``weight_window`` CSR slots per node — DeviceGraph sorts rows by
        # descending weight at build time, so the window holds the
        # heaviest edges (top-k exact for fanout <= window). The
        # reference's weighted sampling lives in its GraphDB nGQL variant
        # (NebulaHeteroKHopSampler) and the RandomWeighted/TopK proto ops.
        if csr.edge_weights is None:
            raise ValueError(f"method={method!r} requires edge_weights")
        offsets, mask = weighted_offsets(
            csr.edge_weights, start, deg, frontier, seed, hop, fanout,
            method, window=weight_window)
    else:
        raise ValueError(f"Unknown sampling method {method!r}")

    edge_slots = start[..., None] + offsets
    # Clamp for safety on isolated nodes (deg 0 -> slot start, masked).
    edge_slots = jnp.clip(edge_slots, 0, csr.indices.shape[0] - 1)
    neighbor_ids = csr.indices[edge_slots]
    neighbor_ids = jnp.where(mask, neighbor_ids, 0)
    return neighbor_ids, mask, edge_slots


@jax.tree_util.register_pytree_node_class
@dataclass
class SampledBlocks:
    """A k-hop sampled neighborhood tree with static shapes.

    node_ids[0] = roots [B]; node_ids[l] = [B, K1, ..., Kl].
    The bipartite block for layer l aggregation is implicit: node at
    multi-index (b, k1..k_{l-1}) in hop l-1 has its sampled neighbors at
    (b, k1..k_{l-1}, :) in hop l. ``masks[l]`` marks valid slots; a slot is
    valid only if its parent was valid. ``edge_slots[l]`` indexes the CSR
    adjacency rows used (for edge features / edge ids).
    """

    node_ids: List[jnp.ndarray]
    masks: List[jnp.ndarray]  # masks[0] is all-True [B]
    edge_slots: List[Optional[jnp.ndarray]]  # edge_slots[0] is None

    def tree_flatten(self):
        n = len(self.node_ids)
        return tuple(self.node_ids) + tuple(self.masks) + tuple(self.edge_slots), n

    @classmethod
    def tree_unflatten(cls, n, children):
        return cls(
            node_ids=list(children[:n]),
            masks=list(children[n: 2 * n]),
            edge_slots=list(children[2 * n:]),
        )

    @property
    def num_hops(self) -> int:
        return len(self.node_ids) - 1

    @property
    def batch_size(self) -> int:
        return self.node_ids[0].shape[0]

    def all_node_ids_flat(self) -> jnp.ndarray:
        """Concatenated flattened node ids across hops (for feature gather)."""
        return jnp.concatenate([ids.reshape(-1) for ids in self.node_ids])


def sample_blocks(
    csr: DeviceCSR,
    roots: jnp.ndarray,
    fanouts: Sequence[int],
    *,
    seed: int = 0,
    method: str = "uniform",
) -> SampledBlocks:
    """Layerwise-sample a fanout tree from ``roots`` ([B] int32).

    jit-compatible: shapes depend only on (len(roots), fanouts).
    """
    node_ids = [roots.astype(jnp.int32)]
    masks = [jnp.ones(roots.shape, dtype=bool)]
    edge_slots: List[Optional[jnp.ndarray]] = [None]
    frontier = node_ids[0]
    parent_mask = masks[0]
    for hop, k in enumerate(fanouts, start=1):
        nbr, m, es = sample_neighbors(
            csr, frontier, int(k), seed=seed, hop=hop, method=method
        )
        m = m & parent_mask[..., None]
        nbr = jnp.where(m, nbr, 0)
        node_ids.append(nbr)
        masks.append(m)
        edge_slots.append(es)
        frontier, parent_mask = nbr, m
    return SampledBlocks(node_ids=node_ids, masks=masks, edge_slots=edge_slots)
