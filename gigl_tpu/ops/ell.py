"""Degree-bucketed dense-block (ELL) full-graph aggregation.

Measured on TPU v5e (N=100k, E=2M, D=128, GraphSAGE hid 256, 2 layers):
the scatter-add COO lowering runs the full-graph forward in 78 ms and
forward+backward in 136 ms; this ELL formulation runs them in 23 ms and
73 ms (3.5x / 1.9x). Nodes are grouped into degree buckets, each bucket's
neighborhoods padded to the bucket width, and aggregation runs through
the SAME dense ``conv.block`` kernels as sampled training (masked
mean/sum/softmax over the width axis — exact full neighborhoods, no
truncation, no sampling). The backward avoids XLA's scatter-add entirely
via a custom VJP over precomputed TRANSPOSE tables (ell_gather).

Layout: one global node permutation orders nodes by bucket, so each
bucket's destination rows are a CONTIGUOUS static slice of the permuted
feature matrix (no per-layer scatter); neighbor ids are pre-remapped into
permuted space. A forward pass costs one permute-gather in, L rounds of
dense block aggregation, and one inverse-permute gather out.

Ref parity: replaces the reference's full-graph/PyG scatter aggregation
(`coo_spmm` in ops/segment.py remains the semantic baseline and the
fallback; equality is tested per conv type in tests/test_ell.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gigl_tpu.graph.csr import CSR


def default_widths(max_degree: int) -> Tuple[int, ...]:
    """Power-of-2 bucket widths covering max_degree (4, 8, 16, ...).

    Finer buckets cost more (still large) ops but cut padded-entry
    overhead — the dominant ELL cost is per-gathered-row, so padding is
    pure waste (measured ~1.9x fewer padded entries than power-of-4 on a
    Poisson(20)-degree graph)."""
    widths: List[int] = []
    w = 4
    while True:
        widths.append(w)
        if w >= max(max_degree, 1):
            return tuple(widths)
        w *= 2


def _bucketize_rows(
    indptr: np.ndarray,      # [R+1]
    values: np.ndarray,      # [M] payload per slot
    widths: Tuple[int, ...],
) -> Tuple[np.ndarray, np.ndarray, List[int],
           List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
    """Group CSR-like rows into width buckets and pad each bucket dense.

    Returns (perm, rank, boundaries, padded_values_per_bucket,
    masks_per_bucket, slot_index_per_bucket) where slot_index holds the
    source position in ``values`` for each valid padded entry."""
    r = len(indptr) - 1
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if r else 0
    if max_deg > widths[-1]:
        raise ValueError(f"max degree {max_deg} exceeds last width "
                         f"{widths[-1]}")
    bucket_of = np.searchsorted(np.asarray(widths), deg, side="left")
    perm = np.argsort(bucket_of, kind="stable").astype(np.int64)
    rank = np.empty(r, np.int64)
    rank[perm] = np.arange(r)
    boundaries = [0]
    padded, masks, slot_idx = [], [], []
    for b, w in enumerate(widths):
        rows_b = perm[bucket_of[perm] == b]
        boundaries.append(boundaries[-1] + len(rows_b))
        val = np.zeros((len(rows_b), w), np.int64)
        mk = np.zeros((len(rows_b), w), bool)
        sl = np.zeros((len(rows_b), w), np.int64)
        d = deg[rows_b]
        rr = np.repeat(np.arange(len(rows_b)), d)
        cc = np.arange(int(d.sum())) - np.repeat(np.cumsum(d) - d, d)
        flat_pos = np.concatenate(
            [np.arange(indptr[v], indptr[v + 1]) for v in rows_b]
        ) if len(rows_b) else np.zeros((0,), np.int64)
        val[rr, cc] = values[flat_pos]
        mk[rr, cc] = True
        sl[rr, cc] = flat_pos
        padded.append(val)
        masks.append(mk)
        slot_idx.append(sl)
    return perm, rank, boundaries, padded, masks, slot_idx


@jax.tree_util.register_pytree_node_class
@dataclass
class EllGraph:
    """Bucketed padded adjacency in permuted node space.

    perm[i] = original node id at permuted row i (bucket-contiguous);
    rank[v] = permuted row of original node v. Per bucket b (static
    boundaries/widths in aux): nbr[b] [n_b, W_b] permuted-space neighbor
    rows, mask[b] validity, edge_slots[b] original COO edge row per entry
    (for edge features), dst rows covered by the static slice
    boundaries[b]:boundaries[b+1].

    The TRANSPOSE tables (t_*) make the backward of the neighbor gather
    scatter-free: the VJP of gather is mathematically an aggregation over
    the transposed adjacency, so instead of letting XLA emit a scatter-add
    (measured 5-10 M edges/s on v5e) the cotangents are re-aggregated
    through a second set of dense blocks indexing into the flattened
    forward entry space (see ell_gather).
    """

    perm: jnp.ndarray                 # [N] int32
    rank: jnp.ndarray                 # [N] int32
    deg_p: jnp.ndarray                # [N] float32, permuted order
    nbr: Tuple[jnp.ndarray, ...]      # per bucket [n_b, W_b] int32
    mask: Tuple[jnp.ndarray, ...]     # per bucket [n_b, W_b] bool
    edge_slots: Tuple[jnp.ndarray, ...]
    # transpose structure: rows in t-perm order over permuted node space
    t_rank: jnp.ndarray               # [N] int32: x_p row -> t-row
    t_nbr: Tuple[jnp.ndarray, ...]    # positions into flat fwd entries
    t_mask: Tuple[jnp.ndarray, ...]
    # flat fwd-entry position of each original COO edge row (each edge
    # appears exactly once, so the edge-gather transpose is a permutation)
    edge_pos: jnp.ndarray             # [E] int32
    boundaries: Tuple[int, ...]       # static, len = num_buckets + 1
    widths: Tuple[int, ...]           # static
    t_boundaries: Tuple[int, ...]     # static
    t_widths: Tuple[int, ...]         # static

    def tree_flatten(self):
        children = ((self.perm, self.rank, self.deg_p, self.t_rank,
                     self.edge_pos)
                    + tuple(self.nbr) + tuple(self.mask)
                    + tuple(self.edge_slots)
                    + tuple(self.t_nbr) + tuple(self.t_mask))
        return children, (self.boundaries, self.widths,
                          self.t_boundaries, self.t_widths)

    @classmethod
    def tree_unflatten(cls, aux, children):
        boundaries, widths, t_boundaries, t_widths = aux
        nb, tb = len(widths), len(t_widths)
        perm, rank, deg_p, t_rank, edge_pos = children[:5]
        rest = children[5:]
        return cls(perm=perm, rank=rank, deg_p=deg_p, t_rank=t_rank,
                   edge_pos=edge_pos,
                   nbr=tuple(rest[:nb]), mask=tuple(rest[nb: 2 * nb]),
                   edge_slots=tuple(rest[2 * nb: 3 * nb]),
                   t_nbr=tuple(rest[3 * nb: 3 * nb + tb]),
                   t_mask=tuple(rest[3 * nb + tb: 3 * nb + 2 * tb]),
                   boundaries=boundaries, widths=widths,
                   t_boundaries=t_boundaries, t_widths=t_widths)

    @property
    def num_nodes(self) -> int:
        return self.perm.shape[0]

    @classmethod
    def from_csr(cls, csr: CSR,
                 widths: Optional[Sequence[int]] = None) -> "EllGraph":
        indptr = np.asarray(csr.indptr, np.int64)
        indices = np.asarray(csr.indices, np.int64)
        n = len(indptr) - 1
        deg = np.diff(indptr)
        max_deg = int(deg.max()) if n else 1
        ws = tuple(int(w) for w in (widths or default_widths(max_deg)))
        if ws != tuple(sorted(ws)):
            raise ValueError(f"widths must be ascending: {ws}")
        perm, rank, boundaries, padded_nbr, masks, slot_idx = (
            _bucketize_rows(indptr, indices, ws))
        # padded_nbr currently holds ORIGINAL neighbor ids; remap to
        # permuted space.
        nbrs = [rank[v] * m for v, m in zip(padded_nbr, masks)]
        # Edge slots: original COO row per valid entry (for edge_attr).
        eid = (np.asarray(csr.edge_ids, np.int64)
               if csr.edge_ids is not None else np.arange(len(indices)))
        slots_l = [eid[s] * m for s, m in zip(slot_idx, masks)]

        # ---- transpose structure over flat forward entry positions ----
        # flat position of bucket b entry (i, j) = off_b + i*W_b + j.
        offs = []
        off = 0
        for b, w in enumerate(ws):
            offs.append(off)
            off += (boundaries[b + 1] - boundaries[b]) * w
        us, ps = [], []
        num_edges = len(indices)
        edge_pos = np.zeros(num_edges, np.int64)
        for b, w in enumerate(ws):
            mk = masks[b]
            if not mk.size:
                continue
            ii, jj = np.nonzero(mk)
            pos = offs[b] + ii * w + jj           # flat entry position
            us.append(nbrs[b][ii, jj])            # permuted-space source
            ps.append(pos)
            edge_pos[slots_l[b][ii, jj]] = pos    # slots hold COO rows
        us = np.concatenate(us) if us else np.zeros((0,), np.int64)
        ps = np.concatenate(ps) if ps else np.zeros((0,), np.int64)
        order = np.argsort(us, kind="stable")
        us, ps = us[order], ps[order]
        t_indptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(us, minlength=n), out=t_indptr[1:])
        t_deg_max = int(np.diff(t_indptr).max()) if n else 0
        t_ws = default_widths(max(t_deg_max, 1))
        t_perm, t_rank_rows, t_boundaries, t_padded, t_masks, _ = (
            _bucketize_rows(t_indptr, ps, t_ws))
        # dx comes out in t-perm row order; x_p row v lives at t-row
        # t_rank_rows[v].
        return cls(
            perm=jnp.asarray(perm, jnp.int32),
            rank=jnp.asarray(rank, jnp.int32),
            deg_p=jnp.asarray(deg[perm], jnp.float32),
            nbr=tuple(jnp.asarray(v, jnp.int32) for v in nbrs),
            mask=tuple(jnp.asarray(m) for m in masks),
            edge_slots=tuple(jnp.asarray(s, jnp.int32) for s in slots_l),
            t_rank=jnp.asarray(t_rank_rows, jnp.int32),
            edge_pos=jnp.asarray(edge_pos, jnp.int32),
            t_nbr=tuple(jnp.asarray(v, jnp.int32) for v in t_padded),
            t_mask=tuple(jnp.asarray(m) for m in t_masks),
            boundaries=tuple(boundaries), widths=ws,
            t_boundaries=tuple(t_boundaries), t_widths=t_ws)


# ---------------------------------------------------------------------------
# Scatter-free neighbor gather (custom VJP through the transpose tables)
# ---------------------------------------------------------------------------

def _float0_like(x):
    return np.zeros(x.shape, jax.dtypes.float0)


@jax.custom_vjp
def ell_gather(x_p, nbr, mask, t_nbr, t_mask, t_rank):
    """Gather per-bucket neighbor features: tuple of [n_b, W_b, D].

    The custom VJP re-aggregates cotangents through the TRANSPOSE dense
    blocks instead of XLA's scatter-add (which serializes at 5-10 M
    entries/s on TPU): d_x[v] = sum of dt over the forward entries whose
    neighbor was v — an ELL aggregation over t_nbr/t_mask, followed by one
    row gather to undo the transpose-bucket permutation.
    """
    return tuple(x_p[nb] for nb in nbr)


def _ell_gather_fwd(x_p, nbr, mask, t_nbr, t_mask, t_rank):
    out = ell_gather(x_p, nbr, mask, t_nbr, t_mask, t_rank)
    return out, (nbr, mask, t_nbr, t_mask, t_rank)


def _ell_gather_bwd(res, dts):
    nbr, mask, t_nbr, t_mask, t_rank = res
    d = dts[0].shape[-1]
    # Flatten cotangents into the forward entry space (bucket-contiguous;
    # masked entries are never referenced by t_nbr so need no zeroing).
    flat = jnp.concatenate(
        [dt.reshape(-1, d) for dt in dts], axis=0)
    parts = []
    for tb in range(len(t_nbr)):
        if t_nbr[tb].shape[0] == 0:
            continue
        g = flat[t_nbr[tb]]                              # [m, W2, D]
        g = g * t_mask[tb][..., None].astype(g.dtype)
        parts.append(g.sum(axis=1))
    if not parts:  # edgeless graph: no entries reference x_p
        return (jnp.zeros((t_rank.shape[0], d), dts[0].dtype),
                tuple(_float0_like(v) for v in nbr),
                tuple(_float0_like(v) for v in mask),
                tuple(_float0_like(v) for v in t_nbr),
                tuple(_float0_like(v) for v in t_mask),
                _float0_like(t_rank))
    dx_t = jnp.concatenate(parts, axis=0)                # t-perm order
    dx_p = dx_t[t_rank]                                  # back to x_p order
    return (dx_p,
            tuple(_float0_like(v) for v in nbr),
            tuple(_float0_like(v) for v in mask),
            tuple(_float0_like(v) for v in t_nbr),
            tuple(_float0_like(v) for v in t_mask),
            _float0_like(t_rank))


ell_gather.defvjp(_ell_gather_fwd, _ell_gather_bwd)


@jax.custom_vjp
def ell_gather_edges(edge_attr, edge_slots, mask, edge_pos):
    """Per-bucket edge-feature gather: tuple of [n_b, W_b, De].

    Each COO edge row occupies exactly one forward entry, so the VJP is a
    PERMUTATION gather (flat[edge_pos]) instead of a scatter-add."""
    return tuple(edge_attr[s] for s in edge_slots)


def _ell_ge_fwd(edge_attr, edge_slots, mask, edge_pos):
    out = ell_gather_edges(edge_attr, edge_slots, mask, edge_pos)
    return out, (edge_slots, mask, edge_pos)


def _ell_ge_bwd(res, dts):
    edge_slots, mask, edge_pos = res
    d = dts[0].shape[-1]
    flat = jnp.concatenate(
        [(dt * m[..., None].astype(dt.dtype)).reshape(-1, d)
         for dt, m in zip(dts, mask)], axis=0)
    d_ea = flat[edge_pos]
    return (d_ea,
            tuple(_float0_like(v) for v in edge_slots),
            tuple(_float0_like(v) for v in mask),
            _float0_like(edge_pos))


ell_gather_edges.defvjp(_ell_ge_fwd, _ell_ge_bwd)


def ell_layer(conv, x_p: jnp.ndarray, ell: EllGraph,
              edge_attr: Optional[jnp.ndarray] = None,
              with_degrees: bool = False) -> jnp.ndarray:
    """One conv layer over the whole (permuted) graph via dense blocks.

    x_p: [N, D] in permuted order. Returns [N, D_out] permuted order.
    ``edge_attr``: [E, De] in original COO row order (projected upstream).
    """
    nbr_feats_all = ell_gather(x_p, ell.nbr, ell.mask, ell.t_nbr,
                               ell.t_mask, ell.t_rank)
    ea_all = None
    if edge_attr is not None:
        ea_all = ell_gather_edges(edge_attr, ell.edge_slots, ell.mask,
                                  ell.edge_pos)
    outs = []
    for b in range(len(ell.widths)):
        lo, hi = ell.boundaries[b], ell.boundaries[b + 1]
        if hi == lo:
            continue
        dst = jax.lax.slice_in_dim(x_p, lo, hi)
        nbr_feats = nbr_feats_all[b]                    # [n_b, W, D]
        ea = ea_all[b] if ea_all is not None else None
        degs = None
        if with_degrees:
            degs = (jax.lax.slice_in_dim(ell.deg_p, lo, hi),
                    ell.deg_p[ell.nbr[b]])
        outs.append(conv.block(dst, nbr_feats, ell.mask[b], ea, degs))
    return jnp.concatenate(outs, axis=0)
