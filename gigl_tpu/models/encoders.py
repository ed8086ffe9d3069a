"""Homogeneous GNN encoders over dense fanout blocks and COO graphs.

Ref parity: `pyg/homogeneous.py:31-534` — BasicHomogeneousGNN and its
subclasses (GraphSAGE:171, GIN:205, GINE:252, GAT:300, GATv2:346,
EdgeAttrGAT:389, Transformer:440, TwoLayerGCN:488). One encoder class with a
``conv`` selector replaces the subclass zoo; layer-stacking semantics
(activation placement, batchnorm, dropout, jumping knowledge, final linear,
L2 normalization) mirror BasicHomogeneousGNN.forward (homogeneous.py:110-155).

Two forward paths share parameters:
  - ``__call__(hop_feats, masks, edge_feats=None)``: sampled dense-block
    path. ``hop_feats[d]`` is [B, K1..Kd, D]; layer i updates depths
    0..L-1-i from depth d+1 neighbors (the standard minibatch computation
    tree; redundancy is the TPU-friendly trade for static shapes).
  - ``encode_coo(x, src, dst, num_nodes, edge_attr=None)``: full-graph path
    (full-batch training / layerwise inference).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gigl_tpu.models.convs import (
    GATConv,
    GCNConv,
    GINConv,
    GINEConv,
    SAGEConv,
    TransformerConv,
)
from gigl_tpu.models.layers import (
    DCNCross,
    FeatureEmbeddingLayer,
    JumpingKnowledge,
    l2_normalize,
)

CONV_TYPES = (
    "graphsage", "gcn", "gin", "gine", "gat", "gatv2", "edge_attr_gat",
    "transformer",
)


def _make_conv(conv: str, out_dim: int, dtype, kwargs: Dict[str, Any], name: str):
    kw = dict(kwargs)
    if conv == "graphsage":
        return SAGEConv(out_dim=out_dim, dtype=dtype, name=name, **kw)
    if conv == "gcn":
        return GCNConv(out_dim=out_dim, dtype=dtype, name=name, **kw)
    if conv == "gin":
        return GINConv(out_dim=out_dim, dtype=dtype, name=name, **kw)
    if conv == "gine":
        return GINEConv(out_dim=out_dim, dtype=dtype, name=name, **kw)
    if conv == "gat":
        return GATConv(out_dim=out_dim, dtype=dtype, name=name, **kw)
    if conv == "gatv2":
        return GATConv(out_dim=out_dim, v2=True, dtype=dtype, name=name, **kw)
    if conv == "edge_attr_gat":
        return GATConv(out_dim=out_dim, use_edge_attr=True, dtype=dtype,
                       name=name, **kw)
    if conv == "transformer":
        return TransformerConv(out_dim=out_dim, dtype=dtype, name=name, **kw)
    raise ValueError(f"Unknown conv type {conv!r}; known: {CONV_TYPES}")


_CONVS_WITH_EDGE_ATTR = {"gine", "edge_attr_gat", "transformer"}

# Convs whose first-layer neighbor aggregation is weight-independent and can
# therefore consume a precomputed hop cache (ops/hopcache.py). Attention
# convs aggregate with weight-dependent coefficients — not cacheable.
CACHEABLE_CONVS = {"graphsage", "gcn", "gin"}


def cached_agg_kind(conv: str, conv_kwargs=None) -> str:
    """The hopcache aggregation kind layer 1 of ``conv`` consumes."""
    if conv == "graphsage":
        aggr = (conv_kwargs or {}).get("aggr", "mean")
        if aggr not in ("mean", "sum"):
            raise ValueError(f"SAGE aggr {aggr!r} is not cacheable")
        return aggr
    if conv == "gcn":
        return "gcn"
    if conv == "gin":
        return "sum"
    raise ValueError(
        f"conv {conv!r} is not hop-cacheable (weight-dependent aggregation); "
        f"cacheable: {sorted(CACHEABLE_CONVS)}")


class GNNEncoder(nn.Module):
    """Stacked message-passing encoder (see module docstring)."""

    hid_dim: int
    out_dim: int
    num_layers: int = 2
    conv: str = "graphsage"
    conv_kwargs: Dict[str, Any] = None
    activation: Callable = jax.nn.relu
    activation_before_norm: bool = False
    activation_after_last_conv: bool = False
    dropout: float = 0.0
    batchnorm: bool = False
    linear_layer: bool = False
    l2_normalize_output: bool = False
    jk_mode: Optional[str] = None
    edge_dim: Optional[int] = None
    feature_embedding: Optional[FeatureEmbeddingLayer] = None
    feature_interaction_layers: int = 0  # DCN cross layers, 0 = off
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ck = self.conv_kwargs or {}
        last_dim = (
            self.hid_dim if (self.linear_layer or self.jk_mode) else self.out_dim
        )
        dims = [self.hid_dim] * (self.num_layers - 1) + [last_dim]
        self.convs = [
            _make_conv(self.conv, d, self.dtype, ck, name=f"conv_{i}")
            for i, d in enumerate(dims)
        ]
        if self.batchnorm:
            n_bn = self.num_layers if self.jk_mode else self.num_layers - 1
            self.bns = [nn.BatchNorm(use_running_average=None, axis_name=None,
                                     dtype=self.dtype, name=f"bn_{i}")
                        for i in range(n_bn)]
        if self.jk_mode:
            self.jk = JumpingKnowledge(
                mode=self.jk_mode,
                out_dim=self.hid_dim if self.linear_layer else self.out_dim,
                dtype=self.dtype, name="jk")
        if self.linear_layer:
            self.final_linear = nn.Dense(self.out_dim, dtype=self.dtype,
                                         name="final_linear")
        if self.edge_dim is not None and self.conv in _CONVS_WITH_EDGE_ATTR:
            # Project raw edge features once; convs consume the projected dim.
            self.edge_in_proj = nn.Dense(self.hid_dim, use_bias=False,
                                         dtype=self.dtype, name="edge_in_proj")
        if self.feature_interaction_layers:
            self.dcn = DCNCross(num_layers=self.feature_interaction_layers,
                                dtype=self.dtype, name="dcn")
        self.drop = nn.Dropout(rate=self.dropout)

    # -- shared per-layer epilogue (homogeneous.py:131-147 ordering) ----------
    def _epilogue(self, x, layer_idx, is_last, train):
        if is_last and not self.jk_mode and not self.activation_after_last_conv:
            return x
        if self.activation_before_norm:
            x = self.activation(x)
        if self.batchnorm and layer_idx < len(self.bns):
            x = self.bns[layer_idx](x, use_running_average=not train)
        if not self.activation_before_norm:
            x = self.activation(x)
        x = self.drop(x, deterministic=not train)
        return x

    def _pre(self, x):
        if self.feature_embedding is not None:
            x = self.feature_embedding(x)
        if self.feature_interaction_layers:
            x = self.dcn(x)
        return x

    def _post(self, x):
        if self.l2_normalize_output:
            x = l2_normalize(x)
        if self.linear_layer:
            x = self.final_linear(x)
        return x

    # -- dense-block path ------------------------------------------------------
    def __call__(
        self,
        hop_feats: Sequence[jnp.ndarray],
        masks: Sequence[jnp.ndarray],
        edge_feats: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        train: bool = False,
        hop_degrees: Optional[Sequence[jnp.ndarray]] = None,
        cached_agg: Optional[Sequence[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """hop_feats[d]: [B, K1..Kd, Din]; masks[d]: [B, K1..Kd] bool.
        hop_degrees[d] (optional): true global degree per node, same shape
        as masks[d] — used by degree-normalized convs (GCN).

        cached_agg (optional): precomputed deepest-hop aggregates
        (ops/hopcache.py) gathered per tree node — cached_agg[d] is
        [B, K1..Kd, Din]. When given, the tree is ONE hop shallower
        (len(hop_feats) == num_layers) and layer 1 consumes the cache via
        conv.block_cached instead of aggregating sampled neighbor rows;
        requires a cacheable conv (CACHEABLE_CONVS) and no edge features
        on layer 1.

        Without cached_agg requires len(hop_feats) == num_layers + 1.
        Returns root embeddings [B, out_dim].
        """
        L = self.num_layers
        if cached_agg is not None:
            if self.conv not in CACHEABLE_CONVS:
                raise ValueError(
                    f"conv {self.conv!r} cannot use a hop cache")
            if len(hop_feats) != L:
                raise ValueError(
                    f"cached path needs {L} hop levels for {L} layers, "
                    f"got {len(hop_feats)}")
        elif len(hop_feats) != L + 1:
            raise ValueError(
                f"need {L + 1} hop levels for {L} layers, got {len(hop_feats)}")
        h = [self._pre(f.astype(self.dtype)) for f in hop_feats]
        if edge_feats is not None and hasattr(self, "edge_in_proj"):
            edge_feats = [
                None if e is None else self.edge_in_proj(e.astype(self.dtype))
                for e in edge_feats
            ]
        if cached_agg is not None and (
            self.feature_embedding is not None or self.feature_interaction_layers
        ):
            # The cache aggregates RAW features; a nonlinear per-node input
            # transform would make agg(transform(x)) != transform(agg(x)).
            raise ValueError(
                "hop cache is incompatible with feature_embedding / DCN")
        jk_xs: List[jnp.ndarray] = []
        for i, conv in enumerate(self.convs):
            is_last = i == L - 1
            if i == 0 and cached_agg is not None:
                new_h = []
                for d in range(L):
                    dst = h[d]
                    B_shape = dst.shape[:-1]
                    dim = dst.shape[-1]
                    agg_flat = cached_agg[d].reshape(-1, dim)
                    deg_flat = None
                    if hop_degrees is not None:
                        deg_flat = hop_degrees[d].reshape(-1)
                    out = conv.block_cached(
                        dst.reshape(-1, dim), agg_flat, deg_flat)
                    out = self._epilogue(out, i, is_last, train)
                    new_h.append(out.reshape(B_shape + (out.shape[-1],)))
                h = new_h
                if self.jk_mode:
                    jk_xs.append(h[0])
                continue
            new_h = []
            for d in range(L - i):
                dst = h[d]
                nbr = h[d + 1]
                B_shape = dst.shape[:-1]
                k = nbr.shape[len(B_shape)]
                dim = dst.shape[-1]
                dst_flat = dst.reshape(-1, dim)
                nbr_flat = nbr.reshape(-1, k, nbr.shape[-1])
                mask_flat = masks[d + 1].reshape(-1, k)
                ea = None
                if edge_feats is not None and edge_feats[d + 1] is not None:
                    ea = edge_feats[d + 1].reshape(-1, k, edge_feats[d + 1].shape[-1])
                degs = None
                if hop_degrees is not None:
                    degs = (hop_degrees[d].reshape(-1),
                            hop_degrees[d + 1].reshape(-1, k))
                out = conv.block(dst_flat, nbr_flat, mask_flat, ea, degs)
                out = self._epilogue(out, i, is_last, train)
                new_h.append(out.reshape(B_shape + (out.shape[-1],)))
            h = new_h
            if self.jk_mode:
                jk_xs.append(h[0])
        x = self.jk(jk_xs) if self.jk_mode else h[0]
        return self._post(x)

    # -- ELL/full-graph path ---------------------------------------------------
    def encode_ell(
        self,
        x: jnp.ndarray,
        ell,  # ops.ell.EllGraph
        edge_attr: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Full-graph encode via degree-bucketed dense blocks (ops/ell.py)
        — same semantics as encode_coo (exact full neighborhoods);
        measured 3.5x faster forward / 1.9x forward+backward than the
        scatter-add lowering on v5e. Returns [N, out_dim] in ORIGINAL
        node order."""
        from gigl_tpu.ops.ell import ell_layer

        x = self._pre(x.astype(self.dtype))
        x_p = x[ell.perm]
        if edge_attr is not None and hasattr(self, "edge_in_proj"):
            edge_attr = self.edge_in_proj(edge_attr.astype(self.dtype))
        jk_xs: List[jnp.ndarray] = []
        for i, conv in enumerate(self.convs):
            is_last = i == self.num_layers - 1
            x_p = ell_layer(conv, x_p, ell, edge_attr,
                            with_degrees=(self.conv == "gcn"))
            x_p = self._epilogue(x_p, i, is_last, train)
            if self.jk_mode:
                jk_xs.append(x_p)
        if self.jk_mode:
            x_p = self.jk(jk_xs)
        return self._post(x_p)[ell.rank]

    # -- COO/full-graph path ---------------------------------------------------
    def encode_coo(
        self,
        x: jnp.ndarray,
        src: jnp.ndarray,
        dst: jnp.ndarray,
        num_nodes: int,
        edge_attr: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        x = self._pre(x.astype(self.dtype))
        if edge_attr is not None and hasattr(self, "edge_in_proj"):
            edge_attr = self.edge_in_proj(edge_attr.astype(self.dtype))
        jk_xs: List[jnp.ndarray] = []
        for i, conv in enumerate(self.convs):
            is_last = i == self.num_layers - 1
            x = conv.coo(x, src, dst, num_nodes, edge_attr)
            x = self._epilogue(x, i, is_last, train)
            if self.jk_mode:
                jk_xs.append(x)
        if self.jk_mode:
            x = self.jk(jk_xs)
        return self._post(x)


def encoder_from_config(args: Dict[str, Any], **overrides) -> GNNEncoder:
    """Build a GNNEncoder from a flat string-map config (the reference's
    trainerArgs pattern: hyperparameters arrive as a str->str map,
    ref modeling_task_specs/utils/parameter_loading.py ArgumentReader)."""
    def geti(k, d):
        return int(args.get(k, d))

    def getf(k, d):
        return float(args.get(k, d))

    def getb(k, d):
        v = args.get(k, d)
        return v if isinstance(v, bool) else str(v).lower() in ("1", "true", "yes")

    conv_kwargs: Dict[str, Any] = {}
    if "num_heads" in args:
        conv_kwargs["heads"] = int(args["num_heads"])
    cfg = dict(
        hid_dim=geti("hid_dim", 128),
        out_dim=geti("out_dim", 128),
        num_layers=geti("num_layers", 2),
        conv=str(args.get("conv", "graphsage")),
        conv_kwargs=conv_kwargs,
        dropout=getf("dropout", 0.0),
        batchnorm=getb("batchnorm", False),
        linear_layer=getb("linear_layer", False),
        l2_normalize_output=getb("should_l2_normalize_embedding_layer_output", False),
        jk_mode=args.get("jk_mode") or None,
        dtype=jnp.bfloat16 if getb("use_bf16", False) else jnp.float32,
    )
    cfg.update(overrides)
    return GNNEncoder(**cfg)
