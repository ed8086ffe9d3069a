"""Ring-pipelined halo exchange: edge-partitioned SpMM over a device mesh.

This is the explicit multi-chip aggregation design of SURVEY.md §5
("edge-partitioned CSR shards with halo (boundary-node) feature exchange via
all_to_all/ppermute over ICI/DCN, overlapping collective steps with local
SpMM — the place where ring-style software pipelining does appear") and the
TPU-native replacement for the reference's cross-machine feature RPC
(GraphLearn-for-PyTorch torch-RPC feature lookup,
`python/gigl/distributed/distributed_neighborloader.py:26-120`): instead of
per-id RPC fetches of remote features, every shard's feature block rotates
around the ring once per layer and each shard consumes the block in place.

Layout (matches `gigl_tpu.parallel.partition`):
  - Node rows are RANGE-partitioned over the P mesh shards: shard ``s`` owns
    rows ``[s*per, (s+1)*per)`` of the (padded) feature table — the
    chunk-based partition-book scheme of the reference partitioner
    (`dist_link_prediction_data_partitioner.py:29-76`).
  - Edges are co-located with their DESTINATION (``edge_dir="in"``, ref
    `dataset_factory.py:100-112`), so each dst row's full in-neighborhood is
    reduced locally and no cross-shard reduction of partial sums is needed;
    only source FEATURES move, and they move as dense blocks over the ring.

Ring schedule: at step k, shard ``s`` holds the feature block originally
owned by shard ``(s+k) % P`` and applies exactly its edges whose source lies
in that block, accumulating into its own dst rows; one `lax.ppermute` per
step rotates the blocks. The permute for step k+1 is issued BEFORE the step-k
compute so XLA overlaps the ICI transfer with the local gather+scatter
(double buffering). P steps visit every block: a full SpMM with each feature
block crossing each link exactly once — the bandwidth-optimal halo exchange.

All shapes are static: per-(shard, step) edge lists are padded to the global
max bucket size with weight-0 edges, so the program compiles once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gigl_tpu.parallel.mesh import DATA_AXIS


@dataclass
class RingSchedule:
    """Static per-(shard, ring-step) edge buckets for `ring_spmm`.

    src_local: [P, P, E_max] offset of the edge's source row within the
        feature block held at that step (i.e. ``src % per``).
    dst_local: [P, P, E_max] offset of the edge's destination within the
        shard's own rows (``dst % per``).
    weight:    [P, P, E_max] float32 edge weight; 0.0 marks padding slots.
    inv_deg:   [P, per] 1/max(in_degree, 1) per owned row (for mean).
    """

    src_local: np.ndarray
    dst_local: np.ndarray
    weight: np.ndarray
    inv_deg: np.ndarray
    per: int
    num_nodes: int
    num_shards: int

    @property
    def padded_num_nodes(self) -> int:
        return self.per * self.num_shards


def build_ring_schedule(
    edges: np.ndarray,
    num_nodes: int,
    num_shards: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
) -> RingSchedule:
    """Bucket edges by (dst-owner shard, ring step) and pad to a static size.

    Ring step of an edge (src, dst) is ``(src_owner - dst_owner) % P``: the
    step at which the dst's shard holds the block containing src.
    """
    if edges.ndim != 2 or edges.shape[0] != 2:
        raise ValueError(f"edges must be [2, E], got {edges.shape}")
    p = int(num_shards)
    per = -(-num_nodes // p)
    src = np.asarray(edges[0], dtype=np.int64)
    dst = np.asarray(edges[1], dtype=np.int64)
    w = (np.ones(src.shape, np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32))

    src_owner = src // per
    dst_owner = dst // per
    step = (src_owner - dst_owner) % p
    bucket = dst_owner * p + step  # flat [P*P] bucket id
    order = np.argsort(bucket, kind="stable")
    src, dst, w, bucket = src[order], dst[order], w[order], bucket[order]
    counts = np.bincount(bucket, minlength=p * p)
    e_max = max(int(counts.max()) if counts.size else 0, 1)

    src_l = np.zeros((p * p, e_max), np.int32)
    dst_l = np.zeros((p * p, e_max), np.int32)
    w_pad = np.zeros((p * p, e_max), np.float32)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    for b in range(p * p):
        lo, hi = offsets[b], offsets[b + 1]
        n = hi - lo
        src_l[b, :n] = (src[lo:hi] % per).astype(np.int32)
        dst_l[b, :n] = (dst[lo:hi] % per).astype(np.int32)
        w_pad[b, :n] = w[lo:hi]

    deg = np.zeros(p * per, np.float32)
    np.add.at(deg, dst, 1.0)
    inv_deg = (1.0 / np.maximum(deg, 1.0)).reshape(p, per)

    return RingSchedule(
        src_local=src_l.reshape(p, p, e_max),
        dst_local=dst_l.reshape(p, p, e_max),
        weight=w_pad.reshape(p, p, e_max),
        inv_deg=inv_deg,
        per=per,
        num_nodes=num_nodes,
        num_shards=p,
    )


def put_ring_schedule(sched: RingSchedule, mesh: Mesh, axis: str = DATA_AXIS):
    """Place schedule arrays with their leading (shard) axis on the mesh, so
    each device receives exactly its own buckets inside `shard_map`."""
    row = NamedSharding(mesh, P(axis, None, None))
    return (
        jax.device_put(np.asarray(sched.src_local), row),
        jax.device_put(np.asarray(sched.dst_local), row),
        jax.device_put(np.asarray(sched.weight), row),
        jax.device_put(np.asarray(sched.inv_deg),
                       NamedSharding(mesh, P(axis, None))),
    )


def ring_spmm(
    x: jnp.ndarray,
    sched_arrays,
    mesh: Mesh,
    *,
    axis: str = DATA_AXIS,
    reduce: str = "sum",
) -> jnp.ndarray:
    """Edge-partitioned SpMM with a ppermute ring over the mesh.

    x: [P*per, D] feature table row-sharded over ``axis`` (see
       `shard_features_rowwise`). Returns [P*per, D], identically sharded:
       out[d] = reduce over in-edges (s, d) of weight * x[s].
    """
    src_l, dst_l, w, inv_deg = sched_arrays
    p = mesh.shape[axis]
    perm = [(i, (i - 1) % p) for i in range(p)]  # rotate blocks downward

    def local(block, s_l, d_l, w_t, idg):
        # block: [per, D]; s_l/d_l/w_t: [1, P, E_max]; idg: [1, per]
        s_l, d_l, w_t = s_l[0], d_l[0], w_t[0]
        per = block.shape[0]
        acc = jnp.zeros_like(block)

        def body(carry, xs):
            blk, acc = carry
            s_t, d_t, wt = xs
            # Issue the rotation for the NEXT step first so XLA overlaps the
            # ICI transfer with this step's gather + scatter-add.
            nxt = jax.lax.ppermute(blk, axis, perm)
            msgs = blk[s_t] * wt[:, None]
            acc = acc.at[d_t].add(msgs)
            return (nxt, acc), None

        (_, acc), _ = jax.lax.scan(
            body, (block, acc),
            (s_l.astype(jnp.int32), d_l.astype(jnp.int32), w_t))
        if reduce == "mean":
            acc = acc * idg[0][:, None]
        return acc

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    if reduce not in ("sum", "mean"):
        raise ValueError(f"ring_spmm reduce must be sum|mean, got {reduce!r}")
    return fn(x, src_l, dst_l, w, inv_deg)


def ring_sharded_aggregate(
    edges: np.ndarray,
    features,
    num_nodes: int,
    mesh: Mesh,
    *,
    axis: str = DATA_AXIS,
    reduce: str = "sum",
    edge_weight: Optional[np.ndarray] = None,
):
    """One-call convenience: build + place the schedule, shard the feature
    table, run the ring SpMM, return ([num_nodes, D] sharded result, jit-able
    closure, placed schedule). The closure re-runs on new sharded features of
    the same padded shape (one compile for the whole training run)."""
    from gigl_tpu.parallel.partition import shard_features_rowwise

    sched = build_ring_schedule(edges, num_nodes, mesh.shape[axis],
                                edge_weight=edge_weight)
    placed = put_ring_schedule(sched, mesh, axis)
    x = shard_features_rowwise(np.asarray(features), mesh, axis)

    # The schedule rides as ARGUMENTS (closing over arrays that span
    # non-addressable devices is rejected in real multi-process runs).
    @jax.jit
    def _run(xs, placed_):
        return ring_spmm(xs, placed_, mesh, axis=axis, reduce=reduce)

    def run(xs):
        return _run(xs, placed)

    out = run(x)
    return out[:num_nodes], run, sched
