"""Materialized sampled-subgraph artifacts (the v1 "tabularized" contract).

Ref parity: the Subgraph Sampler's primary outputs
(`scala/subgraph_sampler/.../SGSPureSparkV1Task.scala`
createRootedNodeNeighborhoodSubgraph:973 and
`training_samples_schema.proto` RootedNodeNeighborhood): for every node, a
precomputed k-hop sampled neighborhood serialized to TFRecord shards,
consumed as random negatives and inference inputs.

TPU-native form: the on-device sampler generates the SAME neighborhoods
live (counter-RNG determinism), so materialization is an *optional* export
— enabled by the ``should_materialize_subgraphs`` feature flag — that runs
the device sampler over all nodes in batches and writes TFRecord shards of
tf.train.Example rows:

    root_id        : int64[1]
    hop{h}_ids     : int64[B_h]   flattened sampled node ids of hop h
    hop{h}_mask    : int64[B_h]   1/0 valid-slot mask
    fanouts        : int64[H]

Determinism guarantee: a materialized row equals a fresh device sample with
the same (seed, fanouts) — tested in tests/test_materialize.py.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gigl_tpu.data.tfexample import encode_example, read_examples
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def materialize_rooted_neighborhoods(
    graph: DeviceGraph,
    out_dir: str,
    *,
    fanouts: Sequence[int],
    seed: int = 0,
    batch_size: int = 1024,
    rows_per_shard: int = 8192,
) -> List[str]:
    """Sample every node's k-hop neighborhood on device and write TFRecord
    shards. Returns the shard paths."""
    from gigl_tpu import native

    os.makedirs(out_dir, exist_ok=True)
    n = graph.num_nodes
    fanouts = tuple(int(f) for f in fanouts)

    sample = jax.jit(
        lambda g, roots: g.sample_hop_blocks(roots, fanouts, seed=seed))

    shards: List[str] = []
    buf: List[bytes] = []
    shard_idx = 0

    def flush():
        nonlocal shard_idx
        if not buf:
            return
        path = os.path.join(
            out_dir, f"rooted_neighborhoods-{shard_idx:05d}.tfrecord")
        native.tfrecord_write(path, buf)
        shards.append(path)
        shard_idx += 1
        buf.clear()

    for start in range(0, n, batch_size):
        ids = np.arange(start, min(start + batch_size, n), dtype=np.int32)
        pad = batch_size - len(ids)
        roots = np.pad(ids, (0, pad))
        blocks = sample(graph, jnp.asarray(roots))
        hop_ids = [np.asarray(x) for x in blocks.node_ids]
        hop_masks = [np.asarray(m) for m in blocks.masks]
        for bi in range(len(ids)):
            row: Dict[str, np.ndarray] = {
                "root_id": np.asarray([ids[bi]], np.int64),
                "fanouts": np.asarray(fanouts, np.int64),
            }
            for h in range(1, len(hop_ids)):
                row[f"hop{h}_ids"] = hop_ids[h][bi].reshape(-1).astype(
                    np.int64)
                row[f"hop{h}_mask"] = hop_masks[h][bi].reshape(-1).astype(
                    np.int64)
            buf.append(encode_example(row))
            if len(buf) >= rows_per_shard:
                flush()
    flush()
    logger.info("materialized %d-node rooted neighborhoods into %d shards "
                "under %s", n, len(shards), out_dir)
    return shards


def read_rooted_neighborhoods(
    out_dir: str,
) -> Iterator[Tuple[int, Tuple[int, ...], List[np.ndarray], List[np.ndarray]]]:
    """Yield (root_id, fanouts, hop_ids, hop_masks) rows, hop arrays
    reshaped to their fanout-tree shapes."""
    paths = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.startswith("rooted_neighborhoods-"))
    for path in paths:
        for row in read_examples(path):
            fanouts = tuple(int(f) for f in row["fanouts"])
            hop_ids: List[np.ndarray] = []
            hop_masks: List[np.ndarray] = []
            shape: Tuple[int, ...] = ()
            for h, k in enumerate(fanouts, start=1):
                shape = shape + (k,)
                hop_ids.append(
                    np.asarray(row[f"hop{h}_ids"], np.int64).reshape(shape))
                hop_masks.append(
                    np.asarray(row[f"hop{h}_mask"],
                               np.int64).reshape(shape).astype(bool))
            yield int(row["root_id"][0]), fanouts, hop_ids, hop_masks


def materialize_graphdb_neighborhoods(
    client,
    roots: Sequence[int],
    metapaths,
    *,
    num_neighbors: Sequence[int],
    out_dir: str,
    rows_per_shard: int = 8192,
) -> List[str]:
    """Materialize rooted neighborhoods SAMPLED THROUGH A GRAPH DATABASE —
    the reference's GraphDB Subgraph Sampler variant
    (GraphDBUnsupervisedNodeAnchorBasedLinkPredictionTask: nGQL GO queries
    per root via NebulaHeteroKHopSampler, serialized as
    RootedNodeNeighborhood samples). ``client`` is any
    data/graphdb.GraphDBClient (the in-memory reference backend or a real
    cluster); rows are edge-list structured (the DB returns edges, not
    dense fanout trees):

        root_id        : int64[1]
        node_ids       : int64[Nr]   neighborhood nodes (root included)
        edge_src/dst   : int64[Er]
        edge_type_idx  : int64[Er]   index into the edge-type vocabulary

    An ``edge_types.txt`` sidecar records the edge-type vocabulary.
    Returns the shard paths.
    """
    from gigl_tpu import native
    from gigl_tpu.data.graphdb import GraphDBKHopSampler

    os.makedirs(out_dir, exist_ok=True)
    sampler = GraphDBKHopSampler(client, num_neighbors=num_neighbors)
    et_vocab: Dict[str, int] = {}
    shards: List[str] = []
    buf: List[bytes] = []
    shard_idx = 0

    def flush():
        nonlocal shard_idx
        if not buf:
            return
        path = os.path.join(
            out_dir, f"graphdb_neighborhoods-{shard_idx:05d}.tfrecord")
        native.tfrecord_write(path, buf)
        shards.append(path)
        shard_idx += 1
        buf.clear()

    for root in roots:
        nodes, edges = sampler.k_hop_subgraph(int(root), metapaths)
        for (_s, _d, et) in edges:
            et_vocab.setdefault(et, len(et_vocab))
        buf.append(encode_example({
            "root_id": np.asarray([int(root)], np.int64),
            "node_ids": np.asarray(nodes, np.int64),
            "edge_src": np.asarray([e[0] for e in edges], np.int64),
            "edge_dst": np.asarray([e[1] for e in edges], np.int64),
            "edge_type_idx": np.asarray(
                [et_vocab[e[2]] for e in edges], np.int64),
        }))
        if len(buf) >= rows_per_shard:
            flush()
    flush()
    with open(os.path.join(out_dir, "edge_types.txt"), "w") as f:
        for et, _ in sorted(et_vocab.items(), key=lambda kv: kv[1]):
            f.write(et + "\n")
    logger.info("materialized %d graphdb-sampled neighborhoods into %d "
                "shards under %s", len(roots), len(shards), out_dir)
    return shards


def read_graphdb_neighborhoods(out_dir: str):
    """Yield (root_id, node_ids, edges[src,dst,type_idx]) per materialized
    graphdb-sampled row."""
    import glob as _glob

    for path in sorted(_glob.glob(
            os.path.join(out_dir, "graphdb_neighborhoods-*.tfrecord"))):
        for row in read_examples(path):
            yield (int(row["root_id"][0]), row["node_ids"],
                   np.stack([row["edge_src"], row["edge_dst"],
                             row["edge_type_idx"]]))
