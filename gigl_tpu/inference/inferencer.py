"""Batch embedding/prediction inference over the whole graph.

Ref parity: the Inferencer component (dispatcher `inference/inferencer.py:49-59`;
v1 Beam batch inference `v1/gnn_inferencer.py:59-344`; v2 GLT flow
`examples/distributed/homogeneous_inference.py:1-100`): iterate all nodes of
each inference node type in batches, run the trained model's ``infer_batch``,
export (node_id, embedding) rows, then load them into the warehouse.

TPU-native design: node-id ranges are iterated host-side; each batch is a
jit-compiled sample+encode on device; export shards are written by the
EmbeddingExporter (gigl_tpu.data.export). No Beam/Dataflow — the batch loop
is trivially shardable across hosts by node-range (rank-strided), mirroring
the v1 per-node-type fan-out (gnn_inferencer.py:142-234).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

from gigl_tpu.data.export import EmbeddingExporter
from gigl_tpu.training.base import BaseInferencer
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


@dataclass
class InferenceConfig:
    batch_size: int = 512  # ref gbml_config.proto:206-208 inference_batch_size
    # Rank-strided sharding of the node range across workers (host-level DP).
    worker_rank: int = 0
    num_workers: int = 1
    log_every_n_batches: int = 50


def node_batches(
    num_nodes: int, cfg: InferenceConfig
) -> Iterator[np.ndarray]:
    """Static-size batches of node ids for this worker (tail padded by
    wrapping; exporter callers drop dup ids via the returned valid counts)."""
    ids = np.arange(cfg.worker_rank, num_nodes, cfg.num_workers)
    for i in range(0, len(ids), cfg.batch_size):
        chunk = ids[i: i + cfg.batch_size]
        if len(chunk) < cfg.batch_size:
            pad = np.zeros(cfg.batch_size - len(chunk), dtype=chunk.dtype)
            yield np.concatenate([chunk, pad]), len(chunk)
        else:
            yield chunk, cfg.batch_size


def run_full_graph_inference(
    encoder,
    params,
    graph,  # HeteroGraph (homogeneous) or (features, CSR) via kwargs
    exporter: EmbeddingExporter,
    *,
    edge_attr=None,
    export_batch: int = 65536,
) -> int:
    """Layerwise FULL-neighborhood inference in one device program.

    Instead of per-node sampled trees, encode the whole graph through the
    degree-bucketed ELL path (ops/ell.py) — every node's embedding uses
    its exact full neighborhood, the reference's RootedNodeNeighborhood
    inference semantics without per-root materialization. Preferred for
    graphs that fit on device; fall back to run_inference (sampled,
    batched) otherwise. Returns row count."""
    import jax
    import jax.numpy as jnp

    from gigl_tpu.ops.ell import EllGraph

    nt = graph.metadata.node_types[0]
    et = graph.metadata.edge_types[0]
    n = graph.num_nodes[nt]
    if nt not in graph.node_features:
        # A config mistake (wrong node-type name) must not silently yield
        # the embeddings of a zeros-feature graph.
        raise ValueError(
            f"node type {nt!r} has no feature table (have "
            f"{sorted(graph.node_features)}); fix the graph's node_features"
            f" or pass features explicitly")
    feats = graph.node_features[nt]
    ell = EllGraph.from_csr(graph.csr(et, anchor="dst"))
    x = jnp.asarray(np.asarray(feats), jnp.float32)
    emb = jax.jit(
        lambda p, x_, e, ea: encoder.apply(p, x_, e, ea,
                                           method="encode_ell")
    )(params, x, ell, edge_attr)
    emb = np.asarray(emb)
    for s in range(0, n, export_batch):
        ids = np.arange(s, min(s + export_batch, n))
        exporter.add_embeddings(ids, emb[ids])
    exporter.flush()
    return n


def run_inference(
    inferencer: BaseInferencer,
    num_nodes: int,
    exporter: EmbeddingExporter,
    cfg: Optional[InferenceConfig] = None,
) -> int:
    """Embed every node (this worker's shard) and export. Returns row count."""
    cfg = cfg or InferenceConfig()
    total = 0
    t0 = time.time()
    for batch_idx, (ids, valid) in enumerate(node_batches(num_nodes, cfg)):
        emb = np.asarray(inferencer.infer_batch(ids))
        exporter.add_embeddings(ids[:valid], emb[:valid])
        total += valid
        if (batch_idx + 1) % cfg.log_every_n_batches == 0:
            rate = total / max(time.time() - t0, 1e-9)
            logger.info("inference: %d nodes embedded (%.0f nodes/s)",
                        total, rate)
    exporter.flush()
    return total
