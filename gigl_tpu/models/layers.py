"""Auxiliary model layers: categorical feature embeddings, DCN feature
interaction, jumping knowledge, normalization helpers.

Ref parity:
  - FeatureEmbeddingLayer: `pyg/nn/models/feature_embedding.py` (171 LoC) —
    selected integer feature columns pass through embedding tables, the rest
    pass through; outputs are concatenated.
  - DCNv2 feature interaction: `layers/feature_interaction.py:7-104`
    (cross layers x_{l+1} = x_0 * (W x_l + b) + x_l).
  - JumpingKnowledge: `pyg/nn/models/jumping_knowledge.py` (131 LoC) —
    cat / max / lstm combination of per-layer representations (lstm mode
    implemented as a bidirectional scan attention, matching PyG semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FeatureEmbeddingLayer(nn.Module):
    """Embed selected categorical (integer-valued) feature columns.

    ``vocab_specs`` maps feature-column index -> (vocab_size, embed_dim).
    Remaining columns pass through unchanged; output is
    [passthrough || embeddings] concatenated along the last axis.
    """

    vocab_specs: Tuple[Tuple[int, Tuple[int, int]], ...]  # ((col, (V, D)), ...)

    def setup(self):
        self.tables = [
            nn.Embed(num_embeddings=v, features=d, name=f"embed_col{col}")
            for col, (v, d) in self.vocab_specs
        ]

    @property
    def embedded_cols(self) -> List[int]:
        return [col for col, _ in self.vocab_specs]

    def out_dim(self, in_dim: int) -> int:
        emb = sum(d for _, (_, d) in self.vocab_specs)
        return in_dim - len(self.vocab_specs) + emb

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cols = set(self.embedded_cols)
        keep = [i for i in range(x.shape[-1]) if i not in cols]
        parts = [x[..., keep]] if keep else []
        for table, (col, _) in zip(self.tables, self.vocab_specs):
            ids = jnp.clip(x[..., col].astype(jnp.int32), 0,
                           table.num_embeddings - 1)
            parts.append(table(ids))
        return jnp.concatenate(parts, axis=-1)


class DCNCross(nn.Module):
    """DCN-v2 cross network: x_{l+1} = x0 * (W x_l + b) + x_l.

    Ref parity: layers/feature_interaction.py:7-104 (DCNv2 crossing).
    """

    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x0 = x
        for i in range(self.num_layers):
            w = nn.Dense(x.shape[-1], dtype=self.dtype, name=f"cross_{i}")
            x = x0 * w(x) + x
        return x


class JumpingKnowledge(nn.Module):
    """Combine per-layer node representations: cat | max | lstm."""

    mode: str = "cat"
    out_dim: Optional[int] = None  # if set, project with a final Dense
    lstm_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        if self.mode == "cat":
            out = jnp.concatenate(xs, axis=-1)
        elif self.mode == "max":
            out = jnp.max(jnp.stack(xs, axis=0), axis=0)
        elif self.mode == "lstm":
            # PyG JK-lstm: BiLSTM over the layer axis -> per-layer attention
            # scores -> weighted sum. Stack: [N, L, D].
            h = jnp.stack(xs, axis=-2)
            d = self.lstm_dim or h.shape[-1]
            fwd = nn.RNN(nn.OptimizedLSTMCell(d), name="lstm_fwd")(h)
            bwd = nn.RNN(nn.OptimizedLSTMCell(d), reverse=True,
                         keep_order=True, name="lstm_bwd")(h)
            alpha = nn.Dense(1, name="att")(
                jnp.concatenate([fwd, bwd], axis=-1)).squeeze(-1)
            alpha = jax.nn.softmax(alpha, axis=-1)
            out = jnp.einsum("...l,...ld->...d", alpha, h)
        else:
            raise ValueError(f"Unknown JK mode {self.mode!r}")
        if self.out_dim is not None:
            out = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(out)
        return out


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Ref parity: models/layers/normalization l2_normalize_embeddings."""
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=axis,
                                                 keepdims=True), eps))
