"""Graph partitioning across shards: partition books + sharded placement.

TPU-native replacement for the reference's partition layer
(`python/gigl/distributed/dist_link_prediction_data_partitioner.py`):
  - Partition books: 1-D rank-per-id arrays, dtype-minimized
    (uint8/16/32 per the shard count — ref :29-76 and
    `distributed/utils/partition_book.py`).
  - Chunk/range or hash node partitioning; edges co-located with the src
    or dst endpoint per ``edge_dir`` (ref `dataset_factory.py:100-112`);
    per-entity partition fns for nodes, edges, features, label edges
    (ref partitioner :560-1045).

Where the reference scatters tensors with chunked torch-RPC, here
placement is jax.sharding: each host feeds its own shard
(`jax.make_array_from_single_device_arrays` in the multi-host runtime) and
**remote feature access inside the step is XLA's job** — a gather from a
row-sharded table lowers to the appropriate collectives over ICI/DCN
(all_gather / collective-permute), the halo exchange of SURVEY.md §5.
``shard_features_rowwise`` below wires that for single-controller use.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gigl_tpu.parallel.mesh import DATA_AXIS


def minimal_uint_dtype(num_shards: int):
    """Ref parity: dtype-minimized partition books (partitioner :29-76)."""
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    if num_shards <= 2 ** 8:
        return np.uint8
    if num_shards <= 2 ** 16:
        return np.uint16
    return np.uint32


@dataclass
class PartitionBook:
    """rank-per-id array: book[i] = shard owning entity i."""

    book: np.ndarray  # [num_ids] minimal uint
    num_shards: int

    @classmethod
    def by_range(cls, num_ids: int, num_shards: int) -> "PartitionBook":
        """Contiguous range partitioning (the chunk-based scheme of the
        reference's partitioner; ids are already randomized by the
        enumeration stage, ref lib/enumerate ROW_NUMBER assignment)."""
        per = -(-num_ids // num_shards)
        book = (np.arange(num_ids) // per).astype(
            minimal_uint_dtype(num_shards))
        return cls(book=book, num_shards=num_shards)

    @classmethod
    def by_hash(cls, ids_hash: np.ndarray, num_shards: int) -> "PartitionBook":
        book = (ids_hash % num_shards).astype(minimal_uint_dtype(num_shards))
        return cls(book=book, num_shards=num_shards)

    def shard_of(self, ids: np.ndarray) -> np.ndarray:
        return self.book[ids]

    def ids_of_shard(self, shard: int) -> np.ndarray:
        return np.nonzero(self.book == shard)[0]

    @property
    def num_ids(self) -> int:
        return len(self.book)


@dataclass
class GraphPartition:
    """One shard's slice of the graph (ref types/distributed.py:20-77
    GraphPartitionData/FeaturePartitionData/PartitionOutput)."""

    shard: int
    edges: np.ndarray                 # [2, E_s] global src/dst ids
    edge_ids: np.ndarray              # [E_s] original edge rows
    node_ids: np.ndarray              # [N_s] global node ids owned
    node_features: Optional[np.ndarray] = None  # [N_s, D] owned rows
    node_labels: Optional[np.ndarray] = None


def partition_edges(
    edges: np.ndarray,            # [2, E]
    node_book: PartitionBook,
    *,
    edge_dir: str = "in",
) -> List[np.ndarray]:
    """Assign each edge to the shard owning its anchor endpoint — dst for
    edge_dir "in", src for "out" (ref dataset_factory.py:100-112). Returns
    per-shard edge-row index arrays."""
    anchor = edges[1] if edge_dir == "in" else edges[0]
    owner = node_book.shard_of(anchor)
    return [np.nonzero(owner == s)[0] for s in range(node_book.num_shards)]


def partition_graph(
    edges: np.ndarray,
    num_nodes: int,
    num_shards: int,
    *,
    node_features: Optional[np.ndarray] = None,
    node_labels: Optional[np.ndarray] = None,
    edge_dir: str = "in",
    node_book: Optional[PartitionBook] = None,
) -> Tuple[PartitionBook, List[GraphPartition]]:
    """Full single-call partition: nodes by range (or provided book),
    edges by anchor co-location, features/labels row-partitioned with
    their nodes (the reference's partition_node/edge/feature fns,
    partitioner :560-1045, without the RPC scatter)."""
    book = node_book or PartitionBook.by_range(num_nodes, num_shards)
    per_shard_edges = partition_edges(edges, book, edge_dir=edge_dir)
    out = []
    for s in range(num_shards):
        rows = per_shard_edges[s]
        owned = book.ids_of_shard(s)
        out.append(GraphPartition(
            shard=s,
            edges=edges[:, rows],
            edge_ids=rows,
            node_ids=owned,
            node_features=(node_features[owned]
                           if node_features is not None else None),
            node_labels=(node_labels[owned]
                         if node_labels is not None else None),
        ))
    return book, out


# ---------------------------------------------------------------------------
# Device placement: row-sharded feature tables (halo exchange via XLA)
# ---------------------------------------------------------------------------

def shard_features_rowwise(
    features: jnp.ndarray, mesh: Mesh, axis: str = DATA_AXIS,
) -> jnp.ndarray:
    """Place a [N, D] feature table row-sharded over the mesh axis (padding
    N up to a multiple of the axis size). Gathers from the sharded table
    inside jit lower to XLA collectives — the boundary/halo feature
    exchange rides ICI instead of explicit RPC."""
    n = features.shape[0]
    parts = mesh.shape[axis]
    n_pad = -(-n // parts) * parts
    # Stay in numpy when given numpy: device_put across a real process
    # boundary accepts host arrays, not committed single-device ones.
    if n_pad != n:
        pad = np.pad if isinstance(features, np.ndarray) else jnp.pad
        features = pad(features, ((0, n_pad - n), (0, 0)))
    return jax.device_put(features, NamedSharding(mesh, P(axis, None)))


def shard_graph_features(graph, mesh: Mesh, axis: str = DATA_AXIS):
    """Return a copy of a DeviceGraph with node features row-sharded over
    the mesh (graph partition parallelism: HBM capacity scales with the
    number of chips; CSR stays replicated for on-device sampling).

    NOTE on padding: feature row count may exceed num_nodes after padding;
    all lookups go through node ids < num_nodes so padded rows are inert.
    """
    import dataclasses

    return dataclasses.replace(
        graph,
        node_features=shard_features_rowwise(graph.node_features, mesh, axis),
    )
