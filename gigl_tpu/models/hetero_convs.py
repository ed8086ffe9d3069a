"""Heterogeneous message-passing convolutions on typed fanout blocks.

Ref parity: the reference's heterogeneous encoders and forked conv layers —
HGT (`python/gigl/src/common/models/pyg/heterogeneous.py:18`,
`pyg/nn/conv/hgt_conv.py`) and SimpleHGN (`pyg/heterogeneous.py:122`,
`pyg/nn/conv/simple_hgn_conv.py`).

TPU-native design: instead of PyG's ragged per-relation edge_index message
passing, each conv consumes a *dense typed neighbor list* — the target
level's representations [M, D] plus one [M, K_r, D] block per child
relation — and runs one masked multi-relation attention softmax over the
concatenated K_total neighbor slots. All relation/type-specific projections
are batched matmuls (MXU); masking handles padded slots.

Interface (both convs):
    __call__(x_dst [M, D], dst_node_type,
             children=[(x_nbr [M, K_r, D], mask [M, K_r], edge_type), ...],
             train=False) -> [M, out_dim]
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _safe(name: str) -> str:
    """Sanitize a type name into a flax param-collection key."""
    return name.replace("/", "_").replace(".", "_").replace(":", "_")


class HGTConv(nn.Module):
    """Heterogeneous Graph Transformer conv (dense typed-block form).

    Per-node-type K/Q/V/output projections; per-edge-type attention and
    message bilinear maps plus a learnable relation prior; softmax across
    all relations' neighbor slots; gated residual (skip) per node type —
    the semantics of the reference's forked HGTConv
    (`pyg/nn/conv/hgt_conv.py`, 252 LoC).
    """

    out_dim: int
    node_types: Tuple[str, ...]
    edge_types: Tuple[str, ...]
    heads: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        if self.out_dim % self.heads:
            raise ValueError(f"out_dim {self.out_dim} % heads {self.heads}")
        d, h = self.out_dim, self.heads
        dk = d // h
        self.k_lin = {nt: nn.Dense(d, dtype=self.dtype, name=f"k_{_safe(nt)}")
                      for nt in self.node_types}
        self.q_lin = {nt: nn.Dense(d, dtype=self.dtype, name=f"q_{_safe(nt)}")
                      for nt in self.node_types}
        self.v_lin = {nt: nn.Dense(d, dtype=self.dtype, name=f"v_{_safe(nt)}")
                      for nt in self.node_types}
        self.a_lin = {nt: nn.Dense(d, dtype=self.dtype, name=f"a_{_safe(nt)}")
                      for nt in self.node_types}
        self.skip = {nt: self.param(f"skip_{_safe(nt)}", nn.initializers.ones,
                                    (1,), jnp.float32)
                     for nt in self.node_types}
        glorot = nn.initializers.glorot_uniform()
        self.w_att = {et: self.param(f"watt_{_safe(et)}", glorot, (h, dk, dk),
                                     jnp.float32)
                      for et in self.edge_types}
        self.w_msg = {et: self.param(f"wmsg_{_safe(et)}", glorot, (h, dk, dk),
                                     jnp.float32)
                      for et in self.edge_types}
        self.prior = {et: self.param(f"prior_{_safe(et)}",
                                     nn.initializers.ones, (h,), jnp.float32)
                      for et in self.edge_types}

    def __call__(self, x_dst, dst_node_type: str, children, train=False):
        if not children:
            return x_dst[..., : self.out_dim]
        M = x_dst.shape[0]
        h, d = self.heads, self.out_dim
        dk = d // h
        q = self.q_lin[dst_node_type](x_dst).reshape(M, h, dk)
        logits, msgs, masks = [], [], []
        for x_nbr, mask, et, src_nt in children:
            K = x_nbr.shape[1]
            k = self.k_lin[src_nt](x_nbr).reshape(M, K, h, dk)
            v = self.v_lin[src_nt](x_nbr).reshape(M, K, h, dk)
            # Relation-specific bilinear: k' = k @ W_att[r], m = v @ W_msg[r].
            kr = jnp.einsum("mkhd,hde->mkhe", k,
                            self.w_att[et].astype(self.dtype))
            mr = jnp.einsum("mkhd,hde->mkhe", v,
                            self.w_msg[et].astype(self.dtype))
            logit = jnp.einsum("mkhd,mhd->mkh", kr, q)
            logit = logit * (self.prior[et].astype(self.dtype) /
                             jnp.sqrt(jnp.float32(dk)).astype(self.dtype))
            logits.append(logit)
            msgs.append(mr)
            masks.append(mask)
        logit = jnp.concatenate(logits, axis=1)        # [M, K_tot, h]
        msg = jnp.concatenate(msgs, axis=1)            # [M, K_tot, h, dk]
        mask = jnp.concatenate(masks, axis=1)          # [M, K_tot]
        neg = jnp.finfo(jnp.float32).min
        logit = jnp.where(mask[..., None], logit, neg)
        att = jax.nn.softmax(logit, axis=1)
        att = jnp.where(mask[..., None], att, 0.0)     # all-masked rows -> 0
        agg = jnp.einsum("mkh,mkhd->mhd", att, msg).reshape(M, d)
        out = self.a_lin[dst_node_type](jax.nn.gelu(agg))
        # Gated residual (HGT "skip" alpha), identity only if dims align.
        alpha = jax.nn.sigmoid(self.skip[dst_node_type]).astype(self.dtype)
        if x_dst.shape[-1] == d:
            out = alpha * out + (1.0 - alpha) * x_dst
        return out

    def coo(self, h: Dict[str, jnp.ndarray],
            edges: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
            num_nodes: Dict[str, int]) -> Dict[str, jnp.ndarray]:
        """Sparse FULL-GRAPH form: one layer over every node of every
        type, softmax per dst node across ALL relations' real in-edges
        (segment ops) — numerically identical to the dense typed-block
        form with fanout >= degree, but O(E) memory instead of
        O(N * max_degree): the hub-safe exact path (typed analog of
        GNNEncoder.encode_ell; r4 VERDICT weak 4)."""
        from gigl_tpu.ops.segment import segment_softmax, segment_sum
        from gigl_tpu.types.graph import EdgeType

        hh, d = self.heads, self.out_dim
        dk = d // hh
        q = {nt: self.q_lin[nt](x).reshape(-1, hh, dk)
             for nt, x in h.items()}
        k = {nt: self.k_lin[nt](x).reshape(-1, hh, dk)
             for nt, x in h.items()}
        v = {nt: self.v_lin[nt](x).reshape(-1, hh, dk)
             for nt, x in h.items()}
        by_dst: Dict[str, List[str]] = {}
        for et in edges:
            by_dst.setdefault(str(EdgeType.from_str(et).dst_node_type),
                              []).append(et)
        out = {}
        for nt, x in h.items():
            incoming = by_dst.get(nt, [])
            if not incoming:
                out[nt] = x[..., :d]  # childless contract (dense form)
                continue
            logit_l, msg_l, dst_l = [], [], []
            for et in incoming:
                src_ids, dst_ids = edges[et]
                s_nt = str(EdgeType.from_str(et).src_node_type)
                ke = k[s_nt][src_ids]                       # [E, h, dk]
                ve = v[s_nt][src_ids]
                kr = jnp.einsum("ehd,hdf->ehf", ke,
                                self.w_att[et].astype(self.dtype))
                mr = jnp.einsum("ehd,hdf->ehf", ve,
                                self.w_msg[et].astype(self.dtype))
                logit = jnp.sum(kr * q[nt][dst_ids], -1)    # [E, h]
                logit = logit * (self.prior[et].astype(self.dtype) /
                                 jnp.sqrt(jnp.float32(dk)).astype(
                                     self.dtype))
                logit_l.append(logit)
                msg_l.append(mr)
                dst_l.append(dst_ids)
            logits = jnp.concatenate(logit_l)
            msgs = jnp.concatenate(msg_l)
            dsts = jnp.concatenate(dst_l)
            att = segment_softmax(logits, dsts, num_nodes[nt])
            agg = segment_sum(att[..., None] * msgs, dsts,
                              num_nodes[nt]).reshape(-1, d)
            o = self.a_lin[nt](jax.nn.gelu(agg))
            alpha = jax.nn.sigmoid(self.skip[nt]).astype(self.dtype)
            if x.shape[-1] == d:
                o = alpha * o + (1.0 - alpha) * x
            out[nt] = o
        return out


class SimpleHGNConv(nn.Module):
    """SimpleHGN conv: GAT-style attention with learnable edge-type
    embeddings in the logits + residual (ref `pyg/nn/conv/simple_hgn_conv.py`,
    `pyg/heterogeneous.py:122` SimpleHGN).
    """

    out_dim: int
    node_types: Tuple[str, ...]
    edge_types: Tuple[str, ...]
    heads: int = 4
    edge_type_emb_dim: int = 16
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    def setup(self):
        if self.out_dim % self.heads:
            raise ValueError(f"out_dim {self.out_dim} % heads {self.heads}")
        h = self.heads
        dk = self.out_dim // h
        glorot = nn.initializers.glorot_uniform()
        self.w = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                          name="w")
        self.w_res = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                              name="w_res")
        self.edge_emb = self.param(
            "edge_emb", nn.initializers.normal(0.02),
            (len(self.edge_types), self.edge_type_emb_dim), jnp.float32)
        self.w_rel = self.param("w_rel", glorot,
                                (self.edge_type_emb_dim, h * dk), jnp.float32)
        self.att_src = self.param("att_src", glorot, (1, 1, h, dk), jnp.float32)
        self.att_dst = self.param("att_dst", glorot, (1, 1, h, dk), jnp.float32)
        self.att_rel = self.param("att_rel", glorot, (1, 1, h, dk), jnp.float32)

    def __call__(self, x_dst, dst_node_type: str, children, train=False):
        if not children:
            return self.w_res(x_dst)
        M = x_dst.shape[0]
        h = self.heads
        dk = self.out_dim // h
        et_index = {et: i for i, et in enumerate(self.edge_types)}
        wd = self.w(x_dst).reshape(M, 1, h, dk)
        a_dst = jnp.sum(wd * self.att_dst.astype(self.dtype), -1)  # [M,1,h]
        logits, vals, masks = [], [], []
        for x_nbr, mask, et, _src_nt in children:
            K = x_nbr.shape[1]
            wn = self.w(x_nbr).reshape(M, K, h, dk)
            rel = (self.edge_emb[et_index[et]] @ self.w_rel).reshape(1, 1, h, dk)
            a = (jnp.sum(wn * self.att_src.astype(self.dtype), -1)
                 + a_dst
                 + jnp.sum(rel.astype(self.dtype)
                           * self.att_rel.astype(self.dtype), -1))
            logits.append(jax.nn.leaky_relu(a, self.negative_slope))
            vals.append(wn)
            masks.append(mask)
        logit = jnp.concatenate(logits, axis=1)       # [M, K_tot, h]
        val = jnp.concatenate(vals, axis=1)           # [M, K_tot, h, dk]
        mask = jnp.concatenate(masks, axis=1)
        neg = jnp.finfo(jnp.float32).min
        logit = jnp.where(mask[..., None], logit, neg)
        att = jax.nn.softmax(logit, axis=1)
        att = jnp.where(mask[..., None], att, 0.0)
        agg = jnp.einsum("mkh,mkhd->mhd", att, val).reshape(M, self.out_dim)
        return agg + self.w_res(x_dst)

    def coo(self, h: Dict[str, jnp.ndarray],
            edges: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
            num_nodes: Dict[str, int]) -> Dict[str, jnp.ndarray]:
        """Sparse full-graph form (see HGTConv.coo): per-edge GAT-style
        logits with edge-type embeddings, softmax per dst node across all
        relations — exact full neighborhoods at O(E) memory."""
        from gigl_tpu.ops.segment import segment_softmax, segment_sum
        from gigl_tpu.types.graph import EdgeType

        hh = self.heads
        dk = self.out_dim // hh
        et_index = {et: i for i, et in enumerate(self.edge_types)}
        w = {nt: self.w(x).reshape(-1, hh, dk) for nt, x in h.items()}
        a_dst = {nt: jnp.sum(w[nt] * self.att_dst.astype(self.dtype)
                             .reshape(1, hh, dk), -1)
                 for nt in h}                                 # [N, h]
        by_dst: Dict[str, List[str]] = {}
        for et in edges:
            by_dst.setdefault(str(EdgeType.from_str(et).dst_node_type),
                              []).append(et)
        out = {}
        for nt, x in h.items():
            incoming = by_dst.get(nt, [])
            if not incoming:
                out[nt] = self.w_res(x)  # childless contract
                continue
            logit_l, val_l, dst_l = [], [], []
            for et in incoming:
                src_ids, dst_ids = edges[et]
                s_nt = str(EdgeType.from_str(et).src_node_type)
                wn = w[s_nt][src_ids]                        # [E, h, dk]
                rel = (self.edge_emb[et_index[et]] @ self.w_rel).reshape(
                    1, hh, dk)
                a = (jnp.sum(wn * self.att_src.astype(self.dtype)
                             .reshape(1, hh, dk), -1)
                     + a_dst[nt][dst_ids]
                     + jnp.sum(rel.astype(self.dtype)
                               * self.att_rel.astype(self.dtype)
                               .reshape(1, hh, dk), -1))
                logit_l.append(jax.nn.leaky_relu(a, self.negative_slope))
                val_l.append(wn)
                dst_l.append(dst_ids)
            logits = jnp.concatenate(logit_l)
            vals = jnp.concatenate(val_l)
            dsts = jnp.concatenate(dst_l)
            att = segment_softmax(logits, dsts, num_nodes[nt])
            agg = segment_sum(att[..., None] * vals, dsts,
                              num_nodes[nt]).reshape(-1, self.out_dim)
            out[nt] = agg + self.w_res(x)
        return out


class RGCNConv(nn.Module):
    """Relational GCN conv (dense typed-block form).

    h_v = W_self x_v + sum_r mean_{u in N_r(v)} W_r x_u  — the per-relation
    SpMM of Schlichtkrull et al.'s RGCN, with optional basis decomposition
    (W_r = sum_b a_rb B_b) to keep parameters O(bases) when the relation set
    is large. BASELINE.md milestone "Heterogeneous RGCN link prediction on
    OGB-MAG (typed edges, per-relation SpMM)"; the reference itself covers
    typed-edge modeling through HGT/SimpleHGN
    (pyg/heterogeneous.py:18,122) — RGCN is the classical baseline those
    generalize, included here for the OGB-MAG parity config.
    """

    out_dim: int
    node_types: Tuple[str, ...]
    edge_types: Tuple[str, ...]
    num_bases: int = 0  # 0 = full per-relation weights
    dtype: Any = jnp.float32

    def setup(self):
        glorot = nn.initializers.glorot_uniform()
        self.w_self = nn.Dense(self.out_dim, dtype=self.dtype, name="w_self")
        if self.num_bases > 0:
            # Basis weights are lazily shaped at first call (input dim not
            # known at setup in flax linen) via nn.DenseGeneral on stacked
            # bases: use per-relation coefficient vectors over shared bases.
            self.basis_coeff = self.param(
                "basis_coeff", glorot,
                (len(self.edge_types), self.num_bases), jnp.float32)
            self.bases = [
                nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                         name=f"basis_{b}")
                for b in range(self.num_bases)
            ]
        else:
            self.w_rel = {
                et: nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                             name=f"w_{_safe(et)}")
                for et in self.edge_types
            }

    def _rel_transform(self, et: str, x: jnp.ndarray) -> jnp.ndarray:
        if self.num_bases > 0:
            ri = self.edge_types.index(et)
            coeff = self.basis_coeff[ri].astype(self.dtype)
            stacked = jnp.stack([b(x) for b in self.bases], axis=0)
            return jnp.tensordot(coeff, stacked, axes=((0,), (0,)))
        return self.w_rel[et](x)

    def __call__(self, x_dst, dst_node_type: str, children, train=False):
        out = self.w_self(x_dst)
        for x_nbr, mask, et, _src_nt in children:
            m = mask.astype(self.dtype)[..., None]          # [M, K, 1]
            denom = jnp.maximum(m.sum(axis=1), 1.0)         # [M, 1]
            mean_x = (x_nbr * m).sum(axis=1) / denom        # [M, D_in]
            out = out + self._rel_transform(et, mean_x)
        return out

    def coo(self, h: Dict[str, jnp.ndarray],
            edges: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
            num_nodes: Dict[str, int]) -> Dict[str, jnp.ndarray]:
        """Sparse full-graph form (see HGTConv.coo): per-relation segment
        mean over real in-edges — exact full neighborhoods at O(E)."""
        from gigl_tpu.ops.segment import coo_spmm
        from gigl_tpu.types.graph import EdgeType

        out = {nt: self.w_self(x) for nt, x in h.items()}
        for et, (src_ids, dst_ids) in edges.items():
            t = EdgeType.from_str(et)
            s_nt, d_nt = str(t.src_node_type), str(t.dst_node_type)
            mean_x = coo_spmm(src_ids, dst_ids, h[s_nt],
                              num_nodes[d_nt], reduce="mean")
            out[d_nt] = out[d_nt] + self._rel_transform(et, mean_x)
        return out
