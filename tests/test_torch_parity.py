"""Per-layer activation parity against independent torch re-derivations.

BASELINE.md requires "per-layer activations allclose" against the
reference's model semantics. The reference's convs are PyG layers
(ref: python/gigl/src/common/models/pyg/homogeneous.py:31-534); PyG is not
installed here, so each layer's published math is RE-DERIVED in plain torch
inside the test (same approach as tests/test_losses.py) and evaluated with
the flax layer's own weights on the same small full graph (COO path — no
sampling, so the comparison is exact up to float tolerance).

Formulas (standard definitions the PyG layers implement):
  SAGE (mean):   h_i = W_s x_i + b + W_n mean_{j->i} x_j
  GCN:           h_i = W (sum_{j->i} x_j / sqrt((d_i+1)(d_j+1)) + x_i/(d_i+1)) + b
  GIN:           h_i = MLP((1+eps) x_i + sum_{j->i} x_j)
  GAT v1:        a_ij = softmax_j LeakyReLU(a_s.(W_s x_j) + a_d.(W_d x_i))
                 h_i = concat_h sum_j a_ij (W_s x_j) + b
  GATv2:         logits = a . LeakyReLU(W_s x_j + W_d x_i)
  Transformer:   a_ij = softmax_j (<W_q x_i, W_k x_j> / sqrt(Dh))
                 h_i = concat_h sum_j a_ij (W_v x_j) + W_skip x_i
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gigl_tpu.models.convs import (
    GATConv,
    GCNConv,
    GINConv,
    SAGEConv,
    TransformerConv,
)
from gigl_tpu.models.encoders import GNNEncoder

N, E, DIN, DOUT = 30, 150, 6, 8


def _graph(seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    x = rng.normal(size=(N, DIN)).astype(np.float32)
    return src, dst, x


def _coo_apply(conv, x, src, dst):
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
                       N, method="coo")
    out = conv.apply(params, jnp.asarray(x), jnp.asarray(src, jnp.int32),
                     jnp.asarray(dst, jnp.int32), N, method="coo")
    return np.asarray(out), jax.tree_util.tree_map(np.asarray,
                                                   params["params"])


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _scatter_sum(msgs, dst, n):
    out = torch.zeros((n,) + msgs.shape[1:], dtype=msgs.dtype)
    idx = torch.tensor(dst).reshape((-1,) + (1,) * (msgs.dim() - 1))
    return out.scatter_add(0, idx.expand_as(msgs), msgs)


class TestConvParity:
    def test_sage_mean(self):
        src, dst, x = _graph()
        out, p = _coo_apply(SAGEConv(out_dim=DOUT), x, src, dst)
        xt = _t(x)
        deg = _scatter_sum(torch.ones(E, 1), dst, N).clamp(min=1)
        mean = _scatter_sum(xt[src], dst, N) / deg
        expect = (xt @ _t(p["lin_self"]["kernel"]) + _t(p["lin_self"]["bias"])
                  + mean @ _t(p["lin_nbr"]["kernel"]))
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-5, atol=1e-5)

    def test_gcn(self):
        src, dst, x = _graph()
        out, p = _coo_apply(GCNConv(out_dim=DOUT), x, src, dst)
        xt = _t(x)
        ones = torch.ones(E)
        d_in = _scatter_sum(ones.unsqueeze(1), dst, N).squeeze(1) + 1.0
        d_out = _scatter_sum(ones.unsqueeze(1), src, N).squeeze(1) + 1.0
        w = (d_in[dst] * d_out[src]).rsqrt()
        agg = _scatter_sum(xt[src] * w[:, None], dst, N)
        agg = agg + xt / d_in[:, None]
        expect = agg @ _t(p["lin"]["kernel"]) + _t(p["lin"]["bias"])
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-5, atol=1e-5)

    def test_gin(self):
        src, dst, x = _graph()
        out, p = _coo_apply(GINConv(out_dim=DOUT), x, src, dst)
        xt = _t(x)
        eps = float(p["eps"])
        agg = _scatter_sum(xt[src], dst, N)
        h = (1.0 + eps) * xt + agg
        mk = p["mlp"]["layers_0"], p["mlp"]["layers_2"]
        h = torch.relu(h @ _t(mk[0]["kernel"]) + _t(mk[0]["bias"]))
        expect = h @ _t(mk[1]["kernel"]) + _t(mk[1]["bias"])
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-5, atol=1e-5)

    def _segment_softmax_torch(self, logits, dst, n):
        # logits [E, H] -> per-dst softmax
        neg = torch.finfo(torch.float32).min
        m = torch.full((n, logits.shape[1]), neg)
        m = m.scatter_reduce(0, torch.tensor(dst)[:, None].expand_as(logits),
                             logits, reduce="amax", include_self=True)
        m = torch.where(torch.isfinite(m), m, torch.zeros_like(m))
        ex = torch.exp(logits - m[dst])
        denom = _scatter_sum(ex, dst, n).clamp(min=1e-16)
        return ex / denom[dst]

    @pytest.mark.parametrize("v2", [False, True])
    def test_gat(self, v2):
        src, dst, x = _graph()
        heads = 2
        out, p = _coo_apply(GATConv(out_dim=DOUT, heads=heads, v2=v2),
                            x, src, dst)
        xt = _t(x)
        H, Dh = heads, DOUT // heads
        hs = (xt @ _t(p["lin_src"]["kernel"])).reshape(N, H, Dh)[src]
        hd = (xt @ _t(p["lin_dst"]["kernel"])).reshape(N, H, Dh)[dst]
        if v2:
            z = torch.nn.functional.leaky_relu(hs + hd, 0.2)
            logits = torch.einsum("ehd,hd->eh", z, _t(p["att"]))
        else:
            logits = torch.nn.functional.leaky_relu(
                torch.einsum("ehd,hd->eh", hs, _t(p["att_src"]))
                + torch.einsum("ehd,hd->eh", hd, _t(p["att_dst"])), 0.2)
        alpha = self._segment_softmax_torch(logits, dst, N)
        msgs = (alpha[..., None] * hs).reshape(E, H * Dh)
        expect = _scatter_sum(msgs, dst, N) + _t(p["bias"])
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)

    def test_transformer(self):
        src, dst, x = _graph()
        heads = 2
        out, p = _coo_apply(TransformerConv(out_dim=DOUT, heads=heads),
                            x, src, dst)
        xt = _t(x)
        H, Dh = heads, DOUT // heads

        def lin(name):
            return (xt @ _t(p[name]["kernel"]) + _t(p[name]["bias"]))

        q = lin("lin_q").reshape(N, H, Dh)[dst]
        k = lin("lin_k").reshape(N, H, Dh)[src]
        v = lin("lin_v").reshape(N, H, Dh)[src]
        logits = (q * k).sum(-1) / np.sqrt(Dh)
        alpha = self._segment_softmax_torch(logits, dst, N)
        msgs = (alpha[..., None] * v).reshape(E, H * Dh)
        expect = _scatter_sum(msgs, dst, N) + lin("lin_skip")
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)


class TestEncoderStackParity:
    def test_two_layer_sage_stack(self):
        """Full 2-layer encoder (relu between layers, none after the last)
        vs the same math in torch — the BasicHomogeneousGNN.forward stacking
        semantics (homogeneous.py:110-155)."""
        src, dst, x = _graph()
        enc = GNNEncoder(hid_dim=16, out_dim=DOUT, num_layers=2,
                         conv="graphsage")
        params = enc.init(jax.random.PRNGKey(1), jnp.asarray(x),
                          jnp.asarray(src, jnp.int32),
                          jnp.asarray(dst, jnp.int32), N, method="encode_coo")
        out = np.asarray(enc.apply(
            params, jnp.asarray(x), jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32), N, method="encode_coo"))
        p = jax.tree_util.tree_map(np.asarray, params["params"])

        def sage(xt, layer):
            deg = _scatter_sum(torch.ones(E, 1), dst, N).clamp(min=1)
            mean = _scatter_sum(xt[src], dst, N) / deg
            return (xt @ _t(layer["lin_self"]["kernel"])
                    + _t(layer["lin_self"]["bias"])
                    + mean @ _t(layer["lin_nbr"]["kernel"]))

        h = torch.relu(sage(_t(x), p["conv_0"]))
        expect = sage(h, p["conv_1"])
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Edge-featured and heterogeneous convs (VERDICT r2 item 7): the reference
# forks these layers (pyg/nn/conv/hgt_conv.py, simple_hgn_conv.py,
# gin_conv.py, edge_attr_gat_conv.py); each is re-derived independently in
# plain torch from its published math and checked against the flax layer's
# own weights.
# ---------------------------------------------------------------------------

from gigl_tpu.models.convs import GINEConv  # noqa: E402
from gigl_tpu.models.hetero_convs import (  # noqa: E402
    HGTConv,
    RGCNConv,
    SimpleHGNConv,
)

DE = 5  # edge feature dim (projected to node dim by the encoder in situ)


class TestEdgeFeaturedConvParity:
    def test_gine_with_edge_attr(self):
        """GINE: MLP((1+eps) x + sum_j relu(x_j + e_ij))."""
        src, dst, x = _graph()
        rng = np.random.default_rng(3)
        ea = rng.normal(size=(E, DIN)).astype(np.float32)
        conv = GINEConv(out_dim=DOUT)
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(src, jnp.int32),
                           jnp.asarray(dst, jnp.int32), N,
                           jnp.asarray(ea), method="coo")
        out = np.asarray(conv.apply(
            params, jnp.asarray(x), jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32), N, jnp.asarray(ea), method="coo"))
        p = jax.tree_util.tree_map(np.asarray, params["params"])
        xt = _t(x)
        msgs = torch.relu(xt[src] + _t(ea))
        agg = _scatter_sum(msgs, dst, N)
        eps = float(p["eps"])
        h = (1.0 + eps) * xt + agg
        h = torch.relu(h @ _t(p["mlp"]["layers_0"]["kernel"])
                       + _t(p["mlp"]["layers_0"]["bias"]))
        expect = (h @ _t(p["mlp"]["layers_2"]["kernel"])
                  + _t(p["mlp"]["layers_2"]["bias"]))
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)

    def test_edge_attr_gat(self):
        """EdgeAttrGAT: v1 attention with W_e e_ij added to the source-side
        transform in BOTH the logits and the messages
        (pyg/nn/conv/edge_attr_gat_conv.py)."""
        src, dst, x = _graph()
        rng = np.random.default_rng(4)
        ea = rng.normal(size=(E, DE)).astype(np.float32)
        H = 2
        conv = GATConv(out_dim=DOUT, heads=H, use_edge_attr=True)
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(src, jnp.int32),
                           jnp.asarray(dst, jnp.int32), N,
                           jnp.asarray(ea), method="coo")
        out = np.asarray(conv.apply(
            params, jnp.asarray(x), jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32), N, jnp.asarray(ea), method="coo"))
        p = jax.tree_util.tree_map(np.asarray, params["params"])
        Dh = DOUT // H
        xt = _t(x)
        hs = (xt[src] @ _t(p["lin_src"]["kernel"])).reshape(E, H, Dh)
        hs = hs + (_t(ea) @ _t(p["lin_edge"]["kernel"])).reshape(E, H, Dh)
        hd = (xt[dst] @ _t(p["lin_dst"]["kernel"])).reshape(E, H, Dh)
        logits = torch.nn.functional.leaky_relu(
            (hs * _t(p["att_src"])).sum(-1) + (hd * _t(p["att_dst"])).sum(-1),
            0.2)                                                # [E, H]
        # per-dst softmax
        mx = torch.full((N, H), -1e30)
        for e in range(E):
            mx[dst[e]] = torch.maximum(mx[dst[e]], logits[e])
        expv = torch.exp(logits - mx[dst])
        den = _scatter_sum(expv, dst, N).clamp(min=1e-30)
        alpha = expv / den[dst]
        msgs = (alpha[..., None] * hs).reshape(E, H * Dh)
        expect = _scatter_sum(msgs, dst, N) + _t(p["bias"])
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)


def _typed_children(seed=0, M=12, D=6):
    """Two children blocks (different edge types / src node types)."""
    rng = np.random.default_rng(seed)
    x_dst = rng.normal(size=(M, D)).astype(np.float32)
    ch = []
    for i, (et, snt, K) in enumerate(
            [("user:buys:item", "user", 4), ("item:rev:item", "item", 3)]):
        xn = rng.normal(size=(M, K, D)).astype(np.float32)
        mask = rng.random((M, K)) < 0.8
        mask[:, 0] = True  # no fully-masked rows
        ch.append((xn, mask, et, snt))
    return x_dst, ch


class TestHeteroConvParity:
    NT = ("user", "item")
    ET = ("user:buys:item", "item:rev:item")

    def _apply(self, conv, x_dst, ch, dst_nt="item"):
        jch = [(jnp.asarray(a), jnp.asarray(m), et, snt)
               for a, m, et, snt in ch]
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x_dst),
                           dst_nt, jch)
        out = conv.apply(params, jnp.asarray(x_dst), dst_nt, jch)
        return (np.asarray(out),
                jax.tree_util.tree_map(np.asarray, params["params"]))

    def test_hgt(self):
        """HGT: typed K/Q/V, relation bilinear att/msg maps, relation
        prior, softmax over all relations' slots, gelu+output proj, gated
        skip (pyg/nn/conv/hgt_conv.py)."""
        D, H = 8, 2
        x_dst, ch = _typed_children(D=D)
        conv = HGTConv(out_dim=D, node_types=self.NT, edge_types=self.ET,
                       heads=H)
        out, p = self._apply(conv, x_dst, ch)
        dk = D // H
        M = x_dst.shape[0]
        q = (_t(x_dst) @ _t(p["q_item"]["kernel"])
             + _t(p["q_item"]["bias"])).reshape(M, H, dk)
        logits, msgs, masks = [], [], []
        for xn, mask, et, snt in ch:
            K = xn.shape[1]
            k = (_t(xn) @ _t(p[f"k_{snt}"]["kernel"])
                 + _t(p[f"k_{snt}"]["bias"])).reshape(M, K, H, dk)
            v = (_t(xn) @ _t(p[f"v_{snt}"]["kernel"])
                 + _t(p[f"v_{snt}"]["bias"])).reshape(M, K, H, dk)
            watt = _t(p[f"watt_{et.replace(':', '_')}"])
            wmsg = _t(p[f"wmsg_{et.replace(':', '_')}"])
            prior = _t(p[f"prior_{et.replace(':', '_')}"])
            kr = torch.einsum("mkhd,hde->mkhe", k, watt)
            mr = torch.einsum("mkhd,hde->mkhe", v, wmsg)
            lg = torch.einsum("mkhd,mhd->mkh", kr, q) * prior / np.sqrt(dk)
            logits.append(lg)
            msgs.append(mr)
            masks.append(torch.tensor(mask))
        lg = torch.cat(logits, 1)
        mr = torch.cat(msgs, 1)
        mk = torch.cat(masks, 1)
        lg = lg.masked_fill(~mk[..., None], torch.finfo(torch.float32).min)
        att = torch.softmax(lg, dim=1) * mk[..., None]
        agg = torch.einsum("mkh,mkhd->mhd", att, mr).reshape(M, D)
        act = torch.nn.functional.gelu(agg)
        o = act @ _t(p["a_item"]["kernel"]) + _t(p["a_item"]["bias"])
        alpha = torch.sigmoid(_t(p["skip_item"]))
        expect = alpha * o + (1 - alpha) * _t(x_dst)
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)

    def test_simple_hgn(self):
        """SimpleHGN: GAT logits + edge-type embedding term + residual
        (pyg/nn/conv/simple_hgn_conv.py)."""
        D, H = 8, 2
        x_dst, ch = _typed_children(D=D)
        conv = SimpleHGNConv(out_dim=D, node_types=self.NT,
                             edge_types=self.ET, heads=H,
                             edge_type_emb_dim=4)
        out, p = self._apply(conv, x_dst, ch)
        dk = D // H
        M = x_dst.shape[0]
        w = _t(p["w"]["kernel"])
        wd = (_t(x_dst) @ w).reshape(M, 1, H, dk)
        a_dst = (wd * _t(p["att_dst"])).sum(-1)
        logits, vals, masks = [], [], []
        for i, (xn, mask, et, snt) in enumerate(ch):
            K = xn.shape[1]
            wn = (_t(xn) @ w).reshape(M, K, H, dk)
            rel = (_t(p["edge_emb"])[i] @ _t(p["w_rel"])).reshape(1, 1, H, dk)
            a = ((wn * _t(p["att_src"])).sum(-1) + a_dst
                 + (rel * _t(p["att_rel"])).sum(-1))
            logits.append(torch.nn.functional.leaky_relu(a, 0.2))
            vals.append(wn)
            masks.append(torch.tensor(mask))
        lg = torch.cat(logits, 1)
        vl = torch.cat(vals, 1)
        mk = torch.cat(masks, 1)
        lg = lg.masked_fill(~mk[..., None], torch.finfo(torch.float32).min)
        att = torch.softmax(lg, 1) * mk[..., None]
        agg = torch.einsum("mkh,mkhd->mhd", att, vl).reshape(M, D)
        expect = agg + _t(x_dst) @ _t(p["w_res"]["kernel"])
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)

    def test_rgcn_basis(self):
        """RGCN with basis decomposition: h = W_self x + sum_r
        (sum_b a_rb B_b)(mean_r x) (Schlichtkrull et al.)."""
        D, B = 8, 3
        x_dst, ch = _typed_children(D=D)
        conv = RGCNConv(out_dim=D, node_types=self.NT, edge_types=self.ET,
                        num_bases=B)
        out, p = self._apply(conv, x_dst, ch)
        expect = (_t(x_dst) @ _t(p["w_self"]["kernel"])
                  + _t(p["w_self"]["bias"]))
        for ri, (xn, mask, et, snt) in enumerate(ch):
            m = torch.tensor(mask).float()[..., None]
            mean_x = (_t(xn) * m).sum(1) / m.sum(1).clamp(min=1.0)
            wr = sum(float(p["basis_coeff"][ri][b])
                     * _t(p[f"basis_{b}"]["kernel"]) for b in range(B))
            expect = expect + mean_x @ wr
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)

    def test_rgcn_full_rank(self):
        D = 8
        x_dst, ch = _typed_children(D=D)
        conv = RGCNConv(out_dim=D, node_types=self.NT, edge_types=self.ET,
                        num_bases=0)
        out, p = self._apply(conv, x_dst, ch)
        expect = (_t(x_dst) @ _t(p["w_self"]["kernel"])
                  + _t(p["w_self"]["bias"]))
        for xn, mask, et, snt in ch:
            m = torch.tensor(mask).float()[..., None]
            mean_x = (_t(xn) * m).sum(1) / m.sum(1).clamp(min=1.0)
            expect = expect + mean_x @ _t(
                p[f"w_{et.replace(':', '_')}"]["kernel"])
        np.testing.assert_allclose(out, expect.numpy(), rtol=1e-4, atol=1e-4)
