"""Routed per-id lookup across a sharded table/graph — GLT's RPC as collectives.

TPU-native replacement for GraphLearn-for-PyTorch's torch-RPC remote feature
lookup and remote neighbor sampling (ref: GLT C++ engine used via
python/gigl/distributed/distributed_neighborloader.py:26 and
dist_link_prediction_dataset.py:31 — during sampled training, feature rows
and adjacency of nodes owned by OTHER machines are fetched with async RPC).

Here the table (feature rows, or per-node CSR adjacency) is range-partitioned
over a mesh axis, and a per-id lookup of arbitrary global ids becomes ONE
all_to_all round trip inside ``shard_map``:

  1. bucket the requested ids by owner shard (owner = id // rows_per_shard),
  2. ``all_to_all`` the request buckets (each shard receives the ids it owns),
  3. answer locally (dense row gather, or a local ``sample_neighbors`` call),
  4. ``all_to_all`` the answers back and un-permute into request order.

Shapes are static: each shard sends at most ``capacity`` requests to each
peer. ``capacity`` defaults to a multiple of the balanced load G/P; requests
beyond it are dropped and reported via a validity mask (the analog of an RPC
timeout — callers size capacity so overflow never happens in practice; tests
assert zero overflow under uniform access, and the partitioned trainers psum
dropped-request counts per step). Routing state is a counting sort — an
O(G*P) one-hot cumsum, pure vector work with no argsort and no inverse
permutation (see _route_requests); the only communication is the two
all_to_all collectives, which XLA schedules over ICI/DCN.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gigl_tpu.parallel.mesh import DATA_AXIS


def request_capacity(num_requests: int, num_shards: int,
                     factor: float = 2.0) -> int:
    """Per-(src, dst) shard bucket capacity: factor x the balanced load,
    rounded up to a multiple of 8 (lane-friendly)."""
    base = int(math.ceil(num_requests / max(num_shards, 1) * factor))
    return max(8, ((base + 7) // 8) * 8)


def _route_requests(global_ids: jnp.ndarray, rows_per_shard: int,
                    num_shards: int, capacity: int):
    """Bucket ``global_ids`` [G] by owner shard into a [P, C] request table.

    COUNTING-SORT routing (no argsort): each request's bucket column is
    the number of EARLIER requests with the same owner, computed as an
    exclusive cumsum over a [G, P] one-hot — O(G*P) pure vector work,
    measured ~5x cheaper than the previous stable-argsort scheme on both
    TPU and CPU (sorts lower to bitonic networks with poor constants;
    docs/performance.md "routed lookups"). Because every request keeps its
    original index, answers are read back DIRECTLY at [owner, pos] — no
    inverse permutation exists at all.

    Returns (req [P, C] int32, owner [G], pos [G], ok [G]): each request's
    bucket coordinates in ORIGINAL order. Requests beyond ``capacity`` per
    owner drop (ok=False), first-come-first-served in request order —
    identical semantics to the sorted scheme (stable sort preserved
    request order within an owner).
    """
    owner = jnp.clip(global_ids // rows_per_shard, 0,
                     num_shards - 1).astype(jnp.int32)
    onehot = (owner[:, None]
              == jnp.arange(num_shards, dtype=jnp.int32)[None, :])
    counts = jnp.cumsum(onehot.astype(jnp.int32), axis=0)     # inclusive
    pos = jnp.take_along_axis(counts, owner[:, None], axis=1)[:, 0] - 1
    ok = pos < capacity
    # Overflowing requests (pos >= capacity) scatter out of bounds and are
    # dropped; (owner, pos) pairs are distinct by construction, so the
    # unique_indices promise holds even with multiple overflows per owner.
    req = jnp.zeros((num_shards, capacity), jnp.int32)
    req = req.at[owner, pos].set(
        global_ids.astype(jnp.int32), mode="drop", unique_indices=True)
    return req, owner, pos, ok


def _unroute(answers: jnp.ndarray, owner, pos, ok):
    """Read each request's answer back at its bucket coordinates
    (original order — counting-sort routing needs no un-permutation);
    zero-filled where the request overflowed."""
    g = owner.shape[0]
    out = answers[owner, jnp.minimum(pos, answers.shape[1] - 1)]
    zero_shape = (1,) * (out.ndim - 1)
    return jnp.where(ok.reshape((g,) + zero_shape), out, 0), ok


def routed_gather(
    local_table: jnp.ndarray,
    global_ids: jnp.ndarray,
    *,
    axis: str = DATA_AXIS,
    capacity: Optional[int] = None,
    capacity_factor: float = 2.0,
    force_general: bool = False,
    sort_ids: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather rows of a range-sharded table by GLOBAL row id.

    ``sort_ids`` (num_shards == 1 closed form only): gather the big table
    in ASCENDING id order and invert with a second gather of the small
    result — monotonic HBM row addresses recover page locality when the
    table has tens of millions of rows (docs/performance.md "Large-N
    gather locality"). At P > 1 the counting-sort routing already fixes
    the bucket order, so the flag is ignored there.

    Must run inside ``shard_map`` over ``axis``. ``local_table`` is this
    shard's [rows_per_shard, ...] block (global row r lives on shard
    r // rows_per_shard at local row r % rows_per_shard). ``global_ids`` is
    this shard's [G] int32 request vector (each shard requests its own set).

    Returns (values [G, ...], ok [G] bool). ``ok`` is False only for
    requests dropped by bucket-capacity overflow (values row zero-filled).

    ``num_shards == 1`` takes the exact degenerate closed form of the same
    algorithm (owner == 0, pos == arange, capacity == G: no bucketing, no
    overflow — one plain row gather). Measured on TPU v5e: every
    element-granular index op (bucket scatter, position pick, un-route
    gather) costs ~7 ns/element regardless of formulation, so the general
    path is ~4x a plain gather per row; the closed form removes all of
    that on a single shard, exactly like world_size==1 special cases in
    NCCL-backed runtimes. ``force_general`` disables it (benchmarking the
    general path's routing overhead).
    """
    num_shards = jax.lax.axis_size(axis)
    rows_per_shard = local_table.shape[0]
    g = global_ids.shape[0]
    if num_shards == 1 and not force_general:
        rows = jnp.clip(global_ids.astype(jnp.int32), 0, rows_per_shard - 1)
        if sort_ids:
            order = jnp.argsort(rows)
            inv = jnp.argsort(order)
            return local_table[rows[order]][inv], jnp.ones((g,), bool)
        return local_table[rows], jnp.ones((g,), bool)
    if capacity is None:
        capacity = request_capacity(g, num_shards, capacity_factor)
    capacity = min(capacity, g) if g > 0 else capacity
    req, owner, pos, ok = _route_requests(
        global_ids.astype(jnp.int32), rows_per_shard, num_shards, capacity)
    # recv[q] = the ids shard q asked ME for.
    recv = jax.lax.all_to_all(req, axis, 0, 0, tiled=True)
    local_rows = jnp.clip(recv - jax.lax.axis_index(axis) * rows_per_shard,
                          0, rows_per_shard - 1)
    vals = local_table[local_rows]  # [P, C, ...]
    # back[p] = my requests' rows as answered by shard p.
    back = jax.lax.all_to_all(vals, axis, 0, 0, tiled=True)
    return _unroute(back, owner, pos, ok)


def routed_sample_neighbors(
    local_indptr: jnp.ndarray,
    local_indices: jnp.ndarray,
    global_ids: jnp.ndarray,
    fanout: int,
    *,
    row_offset: Optional[jnp.ndarray] = None,
    axis: str = DATA_AXIS,
    seed: int = 0,
    hop: int = 1,
    capacity: Optional[int] = None,
    capacity_factor: float = 2.0,
    method: str = "uniform",
    local_weights: Optional[jnp.ndarray] = None,
    weight_window: int = 128,
    local_edge_feats: Optional[jnp.ndarray] = None,
):
    """Sample ``fanout`` neighbors per frontier node over a row-sharded CSR.

    The adjacency is partitioned by anchor-node range: shard p holds the CSR
    of global nodes [p * rows_per_shard, (p+1) * rows_per_shard) as a LOCAL
    ``local_indptr`` [rows_per_shard + 1] / ``local_indices`` [E_p] pair
    (indices store GLOBAL neighbor ids). Frontier ids are routed to their
    owner shard, the owner runs the same counter-RNG draw as the single-chip
    sampler (bit-identical: keyed by global id), and the sampled GLOBAL
    neighbor ids are routed back.

    ``row_offset``: this shard's first global row (defaults to
    axis_index * rows_per_shard). Must run inside shard_map over ``axis``.

    Returns (neighbor_ids [G, fanout] int32 global ids, mask [G, fanout],
    ok [G] bool). ``ok`` is False only for requests dropped by
    bucket-capacity overflow (their mask rows are all-False) — callers
    surface/psum it as an overflow counter (the RPC-timeout analog).

    ``method`` "weighted" / "top_k" runs the owner-side bounded-window
    weighted draw (neighbor_sampler.weighted_offsets) over
    ``local_weights`` — this shard's CSR-slot-aligned edge weights.
    Draws stay bit-identical to the replicated sampler (same counter-RNG
    keying by global id, same local row slice content).

    ``local_edge_feats`` [E_p, De] (CSR slot order): when given, the owner
    ALSO returns each sampled edge's feature row and the result is a
    4-tuple (nbr, mask, ok, edge_feats [G, fanout, De]) — the label-edge-
    feature hydration of the reference's supervision-edge contract riding
    the same routed round trip (one extra all_to_all payload).
    """
    from gigl_tpu.sampling.neighbor_sampler import (
        uniform_offsets,
        weighted_offsets,
    )

    if method != "uniform" and local_weights is None:
        raise ValueError(f"method={method!r} requires local_weights")

    def _draw(deg, node_ids, start):
        if method == "uniform":
            return uniform_offsets(deg, node_ids, seed, hop, fanout)
        return weighted_offsets(local_weights, start, deg, node_ids, seed,
                                hop, fanout, method, window=weight_window)

    num_shards = jax.lax.axis_size(axis)
    rows_per_shard = local_indptr.shape[0] - 1
    g = global_ids.shape[0]
    if row_offset is None:
        row_offset = jax.lax.axis_index(axis) * rows_per_shard
    if num_shards == 1:
        # Degenerate closed form (see routed_gather): the owner-side draw
        # below runs unchanged on recv == the raw request vector, so
        # results stay bit-identical to the general path.
        recv = global_ids.astype(jnp.int32)[None, :]
        local_rows = jnp.clip(recv - row_offset, 0, rows_per_shard - 1)
        start = local_indptr[local_rows]
        deg = local_indptr[local_rows + 1] - start
        offsets, mask = _draw(deg, recv, start)
        slots = jnp.clip(start[..., None] + offsets, 0,
                         local_indices.shape[0] - 1)
        nbr = jnp.where(mask, local_indices[slots], 0)[0]
        if local_edge_feats is None:
            return nbr.astype(jnp.int32), mask[0], jnp.ones((g,), bool)
        ef = jnp.where(mask[0][..., None], local_edge_feats[slots[0]], 0.0)
        return nbr.astype(jnp.int32), mask[0], jnp.ones((g,), bool), ef
    if capacity is None:
        capacity = request_capacity(g, num_shards, capacity_factor)
    capacity = min(capacity, g) if g > 0 else capacity
    req, owner, pos, ok = _route_requests(
        global_ids.astype(jnp.int32), rows_per_shard, num_shards, capacity)
    recv = jax.lax.all_to_all(req, axis, 0, 0, tiled=True)  # [P, C] global ids
    local_rows = jnp.clip(recv - row_offset, 0, rows_per_shard - 1)
    # Owner-side draw. The counter RNG is keyed by the GLOBAL id (recv), so
    # the draw matches the replicated-graph sampler (sample_neighbors with
    # method="uniform") bit for bit; the CSR slice bounds come from the
    # local indptr.
    start = local_indptr[local_rows]
    deg = local_indptr[local_rows + 1] - start
    offsets, mask = _draw(deg, recv, start)
    slots = jnp.clip(start[..., None] + offsets, 0,
                     local_indices.shape[0] - 1)
    nbr = jnp.where(mask, local_indices[slots], 0)  # [P, C, fanout] global
    packed = jnp.where(mask, nbr, -1)  # single payload: -1 = invalid slot
    back = jax.lax.all_to_all(packed, axis, 0, 0, tiled=True)
    out, ok_req = _unroute(back, owner, pos, ok)
    out_mask = (out >= 0) & ok_req[:, None]
    nbr_out = jnp.where(out_mask, out, 0).astype(jnp.int32)
    if local_edge_feats is None:
        return nbr_out, out_mask, ok_req
    ef = jnp.where(mask[..., None], local_edge_feats[slots], 0.0)
    back_ef = jax.lax.all_to_all(ef, axis, 0, 0, tiled=True)
    ef_out, _ = _unroute(back_ef, owner, pos, ok)
    ef_out = jnp.where(out_mask[..., None], ef_out, 0.0)
    return nbr_out, out_mask, ok_req, ef_out
