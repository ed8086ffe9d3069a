"""Message-passing convolution layers (flax.linen).

TPU-native re-design of the reference's PyG conv zoo
(ref: python/gigl/src/common/models/pyg/homogeneous.py:31-534 and the custom
convs in pyg/nn/conv/). Each conv exposes TWO computation paths sharing one
parameter set:

  - ``block(x_dst, nbr, mask, edge_attr=None)`` — dense fanout-block path:
    x_dst [N, Din], nbr [N, K, Din], mask [N, K] → [N, Dout]. The sampled
    training path; everything dense/static → MXU.
  - ``coo(x, src, dst, num_nodes, edge_attr=None)`` — COO/segment path for
    full-graph (full-batch training, layerwise inference).

Semantics parity notes are per-class. All matmuls run in the module dtype
(bfloat16 by default on TPU via the encoder's dtype arg) with fp32 params.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gigl_tpu.ops.fanout import masked_max, masked_mean, masked_softmax, masked_sum
from gigl_tpu.ops.segment import (
    coo_spmm,
    segment_softmax,
    segment_sum,
)


class SAGEConv(nn.Module):
    """GraphSAGE conv: W_self x + W_nbr mean(neighbors).

    Ref parity: `pyg/homogeneous.py:171` GraphSAGE uses PyG SAGEConv
    (mean aggregator, root weight, optional bias).
    """

    out_dim: int
    aggr: str = "mean"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.lin_self = nn.Dense(self.out_dim, use_bias=self.use_bias,
                                 dtype=self.dtype, name="lin_self")
        self.lin_nbr = nn.Dense(self.out_dim, use_bias=False,
                                dtype=self.dtype, name="lin_nbr")

    def _combine(self, x_dst, agg):
        return self.lin_self(x_dst) + self.lin_nbr(agg)

    # Aggregation kind consumed by block_cached (see ops/hopcache.py).
    @property
    def cached_agg_kind(self):
        if self.aggr not in ("mean", "sum"):
            raise ValueError(f"SAGE aggr {self.aggr!r} is not cacheable")
        return self.aggr

    def block_cached(self, x_dst, agg, degrees_dst=None):
        """Cached-hop path: ``agg`` [N, Din] is the precomputed
        sampled-neighbor aggregate (ops/hopcache.py)."""
        return self._combine(x_dst, agg.astype(x_dst.dtype))

    def block(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        if self.aggr == "mean":
            agg = masked_mean(nbr, mask)
        elif self.aggr == "max":
            agg = masked_max(nbr, mask)
        else:
            agg = masked_sum(nbr, mask)
        return self._combine(x_dst, agg)

    def coo(self, x, src, dst, num_nodes, edge_attr=None):
        agg = coo_spmm(src, dst, x, num_nodes, reduce=self.aggr)
        return self._combine(x, agg)

    def __call__(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        return self.block(x_dst, nbr, mask, edge_attr, degrees)


class GCNConv(nn.Module):
    """GCN conv with symmetric degree normalization.

    Ref parity: `pyg/homogeneous.py:488` TwoLayerGCN uses PyG GCNConv
    (D^-1/2 (A+I) D^-1/2 X W). On the block path, per-slot normalization uses
    1/sqrt((deg_dst+1)(deg_src+1)) with degrees approximated by valid-slot
    counts (exact on full neighborhoods; fanout-capped otherwise, the
    standard sampled-GCN approximation).
    """

    out_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.lin = nn.Dense(self.out_dim, use_bias=self.use_bias,
                            dtype=self.dtype, name="lin")

    def block(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        """``degrees``: optional (dst_deg [N], nbr_deg [N, K]) true global
        degrees (hydrated by the sampler from CSR indptr) for exact symmetric
        normalization; falls back to the local valid-slot count otherwise
        (the standard sampled-GCN approximation)."""
        if degrees is not None:
            dst_deg, nbr_deg = degrees
            dst_deg = dst_deg.astype(x_dst.dtype) + 1.0
            nbr_deg = nbr_deg.astype(x_dst.dtype) + 1.0
            w = jax.lax.rsqrt(dst_deg)[:, None] * jax.lax.rsqrt(nbr_deg)  # [N,K]
            agg = masked_sum(nbr * w[..., None], mask)
            return self.lin(agg + x_dst / dst_deg[:, None])
        deg = jnp.sum(mask, axis=1, keepdims=True).astype(x_dst.dtype)  # [N,1]
        norm = 1.0 / (deg + 1.0)
        agg = masked_sum(nbr, mask) * norm
        return self.lin(agg + x_dst * norm)

    @property
    def cached_agg_kind(self):
        return "gcn"

    def block_cached(self, x_dst, agg, degrees_dst=None):
        """Cached-hop path: ``agg`` = sum_j x_j * rsqrt(deg_j + 1)
        (hopcache agg="gcn"); requires true dst degrees for the symmetric
        normalization (matches the degrees-provided branch of block())."""
        if degrees_dst is None:
            raise ValueError("GCN cached path requires dst degrees")
        d = degrees_dst.astype(x_dst.dtype) + 1.0
        agg = agg.astype(x_dst.dtype) * jax.lax.rsqrt(d)[:, None]
        return self.lin(agg + x_dst / d[:, None])

    def coo(self, x, src, dst, num_nodes, edge_attr=None):
        ones = jnp.ones((src.shape[0],), x.dtype)
        deg = segment_sum(ones, dst, num_nodes) + 1.0  # +1 for self-loop
        deg_src = segment_sum(ones, src, num_nodes) + 1.0
        w = jax.lax.rsqrt(deg[dst]) * jax.lax.rsqrt(deg_src[src])
        agg = coo_spmm(src, dst, x, num_nodes, edge_weight=w, reduce="sum")
        agg = agg + x / deg[:, None]  # self-loop term: 1/sqrt(d)^2 = 1/d
        return self.lin(agg)

    def __call__(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        return self.block(x_dst, nbr, mask, edge_attr, degrees)


class GINConv(nn.Module):
    """GIN conv: MLP((1 + eps) x + sum(neighbors)).

    Ref parity: `pyg/homogeneous.py:205` GIN (PyG GINConv, learnable eps).
    """

    out_dim: int
    hidden_dim: Optional[int] = None
    train_eps: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        h = self.hidden_dim or self.out_dim
        self.mlp = nn.Sequential([
            nn.Dense(h, dtype=self.dtype), nn.relu,
            nn.Dense(self.out_dim, dtype=self.dtype),
        ])
        if self.train_eps:
            self.eps = self.param("eps", nn.initializers.zeros, ())
        else:
            self.eps = 0.0

    @property
    def cached_agg_kind(self):
        return "sum"

    def block_cached(self, x_dst, agg, degrees_dst=None):
        return self.mlp((1.0 + self.eps) * x_dst + agg.astype(x_dst.dtype))

    def block(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        agg = masked_sum(nbr, mask)
        return self.mlp((1.0 + self.eps) * x_dst + agg)

    def coo(self, x, src, dst, num_nodes, edge_attr=None):
        agg = coo_spmm(src, dst, x, num_nodes, reduce="sum")
        return self.mlp((1.0 + self.eps) * x + agg)

    def __call__(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        return self.block(x_dst, nbr, mask, edge_attr, degrees)


class GINEConv(nn.Module):
    """GIN-E conv: neighbors carry edge features —
    MLP((1+eps) x + sum relu(x_j + W_e e_ij)).

    Ref parity: the reference forks PyG GINEConv to linearly project edge
    features to the node dim when they differ (`pyg/nn/conv/gin_conv.py`).
    """

    out_dim: int
    hidden_dim: Optional[int] = None
    train_eps: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        h = self.hidden_dim or self.out_dim
        self.mlp = nn.Sequential([
            nn.Dense(h, dtype=self.dtype), nn.relu,
            nn.Dense(self.out_dim, dtype=self.dtype),
        ])
        if self.train_eps:
            self.eps = self.param("eps", nn.initializers.zeros, ())
        else:
            self.eps = 0.0
    # NOTE: when edge_attr dim != node dim, the encoder projects edge
    # features to the node dim before calling (the reference forks PyG's
    # GINEConv for exactly this, pyg/nn/conv/gin_conv.py).

    def block(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        if edge_attr is not None:
            nbr = jax.nn.relu(nbr + edge_attr)
        else:
            nbr = jax.nn.relu(nbr)
        agg = masked_sum(nbr, mask)
        return self.mlp((1.0 + self.eps) * x_dst + agg)

    def coo(self, x, src, dst, num_nodes, edge_attr=None):
        msgs = x[src]
        if edge_attr is not None:
            msgs = msgs + edge_attr
        msgs = jax.nn.relu(msgs)
        agg = segment_sum(msgs, dst, num_nodes)
        return self.mlp((1.0 + self.eps) * x + agg)

    def __call__(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        return self.block(x_dst, nbr, mask, edge_attr, degrees)


class GATConv(nn.Module):
    """Multi-head graph attention (GAT v1): score = LeakyReLU(a_l·Wx_i + a_r·Wx_j).

    Ref parity: `pyg/homogeneous.py:300` GAT (PyG GATConv, concat heads).
    ``v2=True`` gives GATv2 scoring a·LeakyReLU(W[x_i || x_j])
    (`pyg/homogeneous.py:346` GATv2). ``edge_dim`` adds edge features into
    the attention logits and messages (EdgeAttrGAT semantics,
    `pyg/nn/conv/edge_attr_gat_conv.py`).
    """

    out_dim: int
    heads: int = 1
    concat_heads: bool = True
    negative_slope: float = 0.2
    v2: bool = False
    use_edge_attr: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.concat_heads and self.out_dim % self.heads:
            raise ValueError(
                f"out_dim {self.out_dim} not divisible by heads {self.heads}")
        self.head_dim = (
            self.out_dim // self.heads if self.concat_heads else self.out_dim
        )
        d = self.heads * self.head_dim
        self.lin_src = nn.Dense(d, use_bias=False, dtype=self.dtype, name="lin_src")
        self.lin_dst = nn.Dense(d, use_bias=False, dtype=self.dtype, name="lin_dst")
        if self.use_edge_attr:
            self.lin_edge = nn.Dense(d, use_bias=False, dtype=self.dtype,
                                     name="lin_edge")
        if self.v2:
            self.att = self.param(
                "att", nn.initializers.glorot_uniform(),
                (self.heads, self.head_dim))
        else:
            self.att_src = self.param(
                "att_src", nn.initializers.glorot_uniform(),
                (self.heads, self.head_dim))
            self.att_dst = self.param(
                "att_dst", nn.initializers.glorot_uniform(),
                (self.heads, self.head_dim))
        self.bias = self.param(
            "bias", nn.initializers.zeros,
            (self.out_dim if self.concat_heads else self.head_dim,))

    def _scores_v1(self, hs, hd):
        # hs/hd: [..., H, Dh] -> logits [..., H]
        return jnp.sum(hs * self.att_src, -1) + jnp.sum(hd * self.att_dst, -1)

    def _finish(self, out):
        # out: [N, H, Dh]
        if self.concat_heads:
            out = out.reshape(out.shape[:-2] + (self.heads * self.head_dim,))
        else:
            out = out.mean(-2)
        return out + self.bias

    def block(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        N, K = nbr.shape[0], nbr.shape[1]
        H, Dh = self.heads, self.head_dim
        hs = self.lin_src(nbr).reshape(N, K, H, Dh)
        hd = self.lin_dst(x_dst).reshape(N, H, Dh)
        if self.use_edge_attr and edge_attr is not None:
            he = self.lin_edge(edge_attr).reshape(N, K, H, Dh)
            hs = hs + he
        if self.v2:
            z = jax.nn.leaky_relu(hs + hd[:, None], self.negative_slope)
            logits = jnp.einsum("nkhd,hd->nkh", z, self.att)
        else:
            logits = jax.nn.leaky_relu(
                self._scores_v1(hs, hd[:, None]), self.negative_slope)
        alpha = masked_softmax(
            logits.transpose(0, 2, 1), mask[:, None, :], axis=-1
        ).transpose(0, 2, 1)  # [N, K, H]
        out = jnp.einsum("nkh,nkhd->nhd", alpha, hs)
        return self._finish(out)

    def coo(self, x, src, dst, num_nodes, edge_attr=None):
        H, Dh = self.heads, self.head_dim
        hs_all = self.lin_src(x).reshape(-1, H, Dh)
        hd_all = self.lin_dst(x).reshape(-1, H, Dh)
        hs = hs_all[src]
        hd = hd_all[dst]
        if self.use_edge_attr and edge_attr is not None:
            hs = hs + self.lin_edge(edge_attr).reshape(-1, H, Dh)
        if self.v2:
            z = jax.nn.leaky_relu(hs + hd, self.negative_slope)
            logits = jnp.einsum("ehd,hd->eh", z, self.att)
        else:
            logits = jax.nn.leaky_relu(self._scores_v1(hs, hd), self.negative_slope)
        alpha = segment_softmax(logits, dst, num_nodes)  # [E, H]
        msgs = (alpha[..., None] * hs).reshape(-1, H * Dh)
        out = segment_sum(msgs, dst, num_nodes).reshape(num_nodes, H, Dh)
        return self._finish(out)

    def __call__(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        return self.block(x_dst, nbr, mask, edge_attr, degrees)


class TransformerConv(nn.Module):
    """Graph transformer conv: scaled dot-product attention over neighbors,
    with gated residual from the root.

    Ref parity: `pyg/homogeneous.py:440` Transformer (PyG TransformerConv:
    Q from dst, K/V from src, optional edge features added to K and V,
    root-weight skip).
    """

    out_dim: int
    heads: int = 1
    use_edge_attr: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.out_dim % self.heads:
            raise ValueError("out_dim must divide heads")
        self.head_dim = self.out_dim // self.heads
        d = self.out_dim
        self.lin_q = nn.Dense(d, dtype=self.dtype, name="lin_q")
        self.lin_k = nn.Dense(d, dtype=self.dtype, name="lin_k")
        self.lin_v = nn.Dense(d, dtype=self.dtype, name="lin_v")
        self.lin_skip = nn.Dense(d, dtype=self.dtype, name="lin_skip")
        if self.use_edge_attr:
            self.lin_edge = nn.Dense(d, use_bias=False, dtype=self.dtype,
                                     name="lin_edge")

    def block(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        N, K = nbr.shape[0], nbr.shape[1]
        H, Dh = self.heads, self.head_dim
        q = self.lin_q(x_dst).reshape(N, H, Dh)
        k = self.lin_k(nbr).reshape(N, K, H, Dh)
        v = self.lin_v(nbr).reshape(N, K, H, Dh)
        if self.use_edge_attr and edge_attr is not None:
            e = self.lin_edge(edge_attr).reshape(N, K, H, Dh)
            k = k + e
            v = v + e
        logits = jnp.einsum("nhd,nkhd->nkh", q, k) / jnp.sqrt(
            jnp.asarray(Dh, self.dtype))
        alpha = masked_softmax(
            logits.transpose(0, 2, 1), mask[:, None, :], axis=-1
        ).transpose(0, 2, 1)
        out = jnp.einsum("nkh,nkhd->nhd", alpha, v).reshape(N, H * Dh)
        return out + self.lin_skip(x_dst)

    def coo(self, x, src, dst, num_nodes, edge_attr=None):
        H, Dh = self.heads, self.head_dim
        q = self.lin_q(x).reshape(-1, H, Dh)[dst]
        k = self.lin_k(x).reshape(-1, H, Dh)[src]
        v = self.lin_v(x).reshape(-1, H, Dh)[src]
        if self.use_edge_attr and edge_attr is not None:
            e = self.lin_edge(edge_attr).reshape(-1, H, Dh)
            k = k + e
            v = v + e
        logits = jnp.sum(q * k, -1) / jnp.sqrt(jnp.asarray(Dh, self.dtype))
        alpha = segment_softmax(logits, dst, num_nodes)
        msgs = (alpha[..., None] * v).reshape(-1, H * Dh)
        out = segment_sum(msgs, dst, num_nodes)
        return out + self.lin_skip(x)

    def __call__(self, x_dst, nbr, mask, edge_attr=None, degrees=None):
        return self.block(x_dst, nbr, mask, edge_attr, degrees)
