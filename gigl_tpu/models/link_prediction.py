"""Link-prediction model wrapper and decoders.

Ref parity: `pyg/link_prediction.py:13-67` LinkPredictionGNN(encoder,
decoder) with forward (encode) and decode; `layers/decoder.py:10-19`
LinkPredictionDecoder with DecoderType (inner product default).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class DecoderType(str, enum.Enum):
    INNER_PRODUCT = "inner_product"
    COSINE = "cosine"
    MLP = "mlp"
    HADAMARD_MLP = "hadamard_mlp"


class LinkPredictionDecoder(nn.Module):
    """Scores (query, candidate) embedding pairs.

    ``__call__(q, c)`` supports broadcasting: q [..., D], c [..., D] →
    scores [...]; ``all_pairs(q, c)`` gives the [Nq, Nc] score matrix used by
    retrieval-style losses.
    """

    decoder_type: DecoderType = DecoderType.INNER_PRODUCT
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        t = DecoderType(self.decoder_type)
        if t == DecoderType.INNER_PRODUCT:
            return jnp.sum(q * c, axis=-1)
        if t == DecoderType.COSINE:
            qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-12))
            cn = c * jax.lax.rsqrt(jnp.maximum(jnp.sum(c * c, -1, keepdims=True), 1e-12))
            return jnp.sum(qn * cn, axis=-1)
        if t == DecoderType.HADAMARD_MLP:
            h = q * c
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp0")(h)
            h = jax.nn.relu(h)
            return nn.Dense(1, dtype=self.dtype, name="mlp1")(h).squeeze(-1)
        if t == DecoderType.MLP:
            h = jnp.concatenate(jnp.broadcast_arrays(q, c), axis=-1)
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp0")(h)
            h = jax.nn.relu(h)
            return nn.Dense(1, dtype=self.dtype, name="mlp1")(h).squeeze(-1)
        raise ValueError(f"Unknown decoder type {t}")

    def all_pairs(self, q: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        """q: [Nq, D], c: [Nc, D] → [Nq, Nc]."""
        t = DecoderType(self.decoder_type)
        if t == DecoderType.INNER_PRODUCT:
            return q @ c.T
        if t == DecoderType.COSINE:
            qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-12))
            cn = c * jax.lax.rsqrt(jnp.maximum(jnp.sum(c * c, -1, keepdims=True), 1e-12))
            return qn @ cn.T
        # MLP decoders: broadcast pairwise.
        return self(q[:, None, :], c[None, :, :])


class HeteroLinkPredictionGNN(nn.Module):
    """Typed encoder + decoder bundle (hetero analog of LinkPredictionGNN;
    ref pyg/link_prediction.py:13-67 wraps any encoder the same way).
    ``edge_scorer`` (optional) adds a label-edge-feature term to
    supervision-edge scores — the reference carries label_edge_features
    per condensed edge type for heterogeneous batches too
    (nalp_data_loader.py:44-46)."""

    encoder: nn.Module  # HeteroGNNEncoder
    decoder: LinkPredictionDecoder
    edge_scorer: Optional[EdgeFeatureScorer] = None

    def __call__(self, blocks, feats, train: bool = False):
        return self.encoder(blocks, feats, train=train)

    def decode(self, q, c, edge_feats=None):
        s = self.decoder(q, c)
        if edge_feats is not None and self.edge_scorer is not None:
            s = s + self.edge_scorer(edge_feats)
        return s

    def decode_all_pairs(self, q, c):
        return self.decoder.all_pairs(q, c)

    def edge_score(self, edge_feats):
        if self.edge_scorer is None:
            raise ValueError("model built without an edge_scorer")
        return self.edge_scorer(edge_feats)


class EdgeFeatureScorer(nn.Module):
    """Scores a supervision (label) edge from its OWN features — the
    consumer of the reference's per-positive/hard-negative label edge
    features (ref nalp_data_loader.py:44-46,184-192: batches carry
    ``label_edge_features`` per supervision edge; a task spec may fold
    them into scoring). Added to the pair score by
    ``LinkPredictionGNN.decode(..., edge_feats=)``."""

    hidden_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, edge_feats: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="e0")(edge_feats)
        h = jax.nn.relu(h)
        return nn.Dense(1, dtype=self.dtype, name="e1")(h)[..., 0]


class LinkPredictionGNN(nn.Module):
    """Encoder + decoder bundle.

    Ref parity: pyg/link_prediction.py:13-67 — forward() encodes, decode()
    scores pairs. The encoder is any module exposing the dense-block
    ``__call__`` and ``encode_coo``. ``edge_scorer`` (optional) adds a
    label-edge-feature term to supervision-edge scores (see
    EdgeFeatureScorer).
    """

    encoder: nn.Module
    decoder: LinkPredictionDecoder
    edge_scorer: Optional[EdgeFeatureScorer] = None

    def __call__(self, hop_feats, masks, edge_feats=None, train: bool = False,
                 hop_degrees=None, cached_agg=None):
        return self.encoder(hop_feats, masks, edge_feats, train=train,
                            hop_degrees=hop_degrees, cached_agg=cached_agg)

    def encode_coo(self, x, src, dst, num_nodes, edge_attr=None,
                   train: bool = False):
        return self.encoder.encode_coo(x, src, dst, num_nodes, edge_attr,
                                       train=train)

    def decode(self, q, c, edge_feats=None):
        s = self.decoder(q, c)
        if edge_feats is not None and self.edge_scorer is not None:
            s = s + self.edge_scorer(edge_feats)
        return s

    def decode_all_pairs(self, q, c):
        return self.decoder.all_pairs(q, c)

    def edge_score(self, edge_feats):
        if self.edge_scorer is None:
            raise ValueError("model built without an edge_scorer")
        return self.edge_scorer(edge_feats)

    def warmup(self, hop_feats, masks, edge_feats=None, hop_degrees=None,
               label_edge_feats=None, cached_agg=None):
        """Single init-time pass touching EVERY parameterized submodule
        (encoder, decoder — MLP decoder types have Dense params the plain
        ``__call__`` never reaches — and the edge scorer), so
        ``model.init(..., method="warmup")`` yields a complete param
        tree."""
        emb = self.encoder(hop_feats, masks, edge_feats, train=False,
                           hop_degrees=hop_degrees, cached_agg=cached_agg)
        s = self.decoder(emb, emb)
        if self.edge_scorer is not None:
            if label_edge_feats is None:
                label_edge_feats = jnp.zeros((1, 1), self.decoder.dtype)
            s = s[:1] + self.edge_scorer(label_edge_feats)[:1]
        return s
