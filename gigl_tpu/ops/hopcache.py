"""Cached deepest-hop neighbor aggregates ("tabularized" hop caching).

Motivation (measured on TPU v5e, this repo's bench): the NALP train step is
gather-bound — XLA's row gather costs ~8.7 ns/row regardless of dtype
(59 GB/s at D=128 fp32), and the deepest hop contributes ~90% of gathered
rows (B*k1*k2 of B*(1+k1+k1*k2)). The first GNN layer's neighbor
aggregation (mean/sum) is WEIGHT-INDEPENDENT, so the deepest hop's gather +
aggregate can be precomputed once per refresh as a per-node table
M[v] = agg({x_u : u in sampled_nbrs(v)}) and the training step gathers M
instead of resampling/regathering k2 neighbor rows per occurrence — a
~5x reduction in gather rows per step for fanouts (15, 10).

Semantics: this reproduces the reference's v1 "tabularized" path, where
subgraphs are PRECOMPUTED by the Spark Subgraph Sampler before training and
every occurrence of node v reuses the same frozen sample
(ref: scala/subgraph_sampler/.../SGSPureSparkV1Task.scala
sampleOnehopSrcNodesUniformly:313 — one sampled neighborhood per node per
job, not per batch). `refresh` (resample with a new seed) is the analog of
re-running SGS; the reference's deterministic-permutation mode
(SamplingStrategy.hashBasedUniformPermutation, libs/task/
SamplingStrategy.scala:16) corresponds to never refreshing.

Exact parity: the cache draws neighbors with the SAME counter-based RNG
keys (seed, node, hop, slot) as the live sampler, so for a given (seed,
hop_key) the cached aggregate equals what the on-the-fly path would
compute — tested to numerical tolerance in tests/test_hopcache.py.

Cacheable aggregations (weight-independent):
  - "mean":     masked mean of neighbor features          (GraphSAGE)
  - "sum":      masked sum of neighbor features           (GIN)
  - "gcn":      sum of x_u / sqrt(deg_u + 1)              (GCN symmetric norm;
                the dst-side rsqrt factor is applied in GCNConv.block_cached)
Attention convs (GAT/GATv2/Transformer) aggregate with weight-DEPENDENT
coefficients and cannot be cached; the encoder rejects them.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gigl_tpu.ops.fanout import masked_mean, masked_sum
from gigl_tpu.sampling.neighbor_sampler import DeviceCSR, sample_neighbors

CACHEABLE_AGGS = ("mean", "sum", "gcn")


@partial(jax.jit, static_argnames=("fanout", "agg", "chunk", "method"))
def build_neighbor_cache(
    csr: DeviceCSR,
    features: jnp.ndarray,          # [N, D]
    *,
    fanout: int,
    seed=0,      # traced: refresh with a new seed must NOT recompile
    hop_key=1,   # traced for the same reason
    agg: str = "mean",
    degrees: Optional[jnp.ndarray] = None,  # [N] float (for agg="gcn")
    chunk: int = 8192,
    method: str = "uniform",  # uniform | weighted | top_k (needs weights)
) -> jnp.ndarray:
    """Per-node sampled-neighbor aggregate table M [N, D].

    ``hop_key`` must match the hop index the live sampler would use for the
    cached hop (len(fanouts) for the deepest hop) so draws coincide.
    Chunked with lax.map so peak memory is O(chunk * fanout * D).
    """
    if agg not in CACHEABLE_AGGS:
        raise ValueError(f"agg={agg!r} not in {CACHEABLE_AGGS}")
    if agg == "gcn" and degrees is None:
        raise ValueError('agg="gcn" requires true node degrees')
    n = csr.num_anchor_nodes
    n_pad = -(-n // chunk) * chunk
    ids = jnp.arange(n_pad, dtype=jnp.int32).reshape(-1, chunk)
    ids = jnp.minimum(ids, n - 1)  # padded tail re-reads real nodes

    def one_chunk(node_ids):
        nbr, mask, _ = sample_neighbors(
            csr, node_ids, fanout, seed=seed, hop=hop_key, method=method)
        x = features[nbr]                                     # [C, k, D]
        if agg == "mean":
            return masked_mean(x, mask)
        if agg == "sum":
            return masked_sum(x, mask)
        # "gcn": sum_j x_j * rsqrt(deg_j + 1); dst factor applied in conv.
        d = degrees if degrees is not None else jnp.zeros((n,), jnp.float32)
        w = jax.lax.rsqrt(d[nbr].astype(x.dtype) + 1.0)       # [C, k]
        return masked_sum(x * w[..., None], mask)

    out = jax.lax.map(one_chunk, ids)                         # [n_pad/chunk, chunk, D]
    return out.reshape(n_pad, -1)[:n]


@partial(jax.jit, static_argnames=("fanout", "chunk", "method"))
def build_sample_table(
    csr: DeviceCSR,
    *,
    fanout: int,
    seed=0,      # traced: refresh must not recompile
    hop_key=1,   # traced
    chunk: int = 16384,
    method: str = "uniform",  # uniform | weighted | top_k (needs weights)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frozen per-node neighbor-sample table: (ids [N, fanout] int32,
    mask [N, fanout] bool).

    Row v holds the SAME draw sample_neighbors would produce for node v at
    (seed, hop_key) — so in tabularized mode the in-step hop sampling
    becomes ONE dense row gather instead of per-slot CSR element gathers
    (measured 6.6 ns per random s32 element on v5e; the dominant remaining
    step cost once features are hop-cached). Rows of isolated nodes are
    fully masked.
    """
    n = csr.num_anchor_nodes
    n_pad = -(-n // chunk) * chunk
    ids = jnp.arange(n_pad, dtype=jnp.int32).reshape(-1, chunk)
    ids = jnp.minimum(ids, n - 1)

    def one_chunk(node_ids):
        nbr, mask, _ = sample_neighbors(
            csr, node_ids, fanout, seed=seed, hop=hop_key, method=method)
        return nbr, mask

    nbr, mask = jax.lax.map(one_chunk, ids)
    return (nbr.reshape(n_pad, fanout)[:n],
            mask.reshape(n_pad, fanout)[:n])
