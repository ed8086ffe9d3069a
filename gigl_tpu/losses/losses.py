"""Loss zoo for link prediction and self-supervised graph learning.

Ref parity: `python/gigl/src/common/models/layers/loss.py` (699 LoC) —
MarginLoss:21, SoftmaxLoss:99, RetrievalLoss:177, GRACELoss:362,
FeatureReconstructionLoss:419, WhiteningDecorrelationLoss:444, GBTLoss:491,
BGRLLoss:537, TBGRLLoss:559, AligmentLoss:591, UniformityLoss:609, KLLoss:630,
LLPRankingLoss:659.

TPU adaptation: every loss is a pure jittable function over **static-shape**
score/embedding arrays with explicit validity masks (padded batch slots),
instead of the reference's per-sample Python loops over ragged lists. All
"sum" reductions return (loss_sum, sample_count) so callers can divide after
cross-replica psum — matching the reference's (batch_loss, batch_size)
contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _finfo_min(dtype) -> float:
    return float(jnp.finfo(dtype).min)


# ---------------------------------------------------------------------------
# Ranking losses over (pos, hard-neg, random-neg) scores
# ---------------------------------------------------------------------------

def margin_loss(
    pos_scores: Array,          # [Q, P]
    neg_scores: Array,          # [Q, N]  (hard negs ++ random negs)
    *,
    margin: float = 0.5,
    pos_mask: Optional[Array] = None,   # [Q, P] bool
    neg_mask: Optional[Array] = None,   # [Q, N] bool
) -> Tuple[Array, Array]:
    """Margin ranking over all (pos, neg) pairs, sum reduction.

    Ref parity: MarginLoss._calculate_margin_loss (loss.py:40-69) —
    margin_ranking_loss(pos_repeated, neg_repeated, 1, reduction='sum'),
    sample_size = #pairs.
    """
    if pos_mask is None:
        pos_mask = jnp.ones(pos_scores.shape, bool)
    if neg_mask is None:
        neg_mask = jnp.ones(neg_scores.shape, bool)
    # pairwise [Q, P, N]
    diff = jnp.maximum(
        0.0, margin - pos_scores[:, :, None] + neg_scores[:, None, :]
    )
    pair_mask = pos_mask[:, :, None] & neg_mask[:, None, :]
    loss = jnp.sum(jnp.where(pair_mask, diff, 0.0))
    count = jnp.sum(pair_mask)
    return loss, count


def softmax_loss(
    pos_scores: Array,          # [Q, P]
    neg_scores: Array,          # [Q, N]
    *,
    temperature: float = 1.0,
    pos_mask: Optional[Array] = None,
    neg_mask: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Per-positive softmax CE against the shared negative set, sum reduction.

    Ref parity: SoftmaxLoss._calculate_softmax_loss (loss.py:113-147):
    rows = [pos_p, negs...], target 0, CE sum; sample_size = #positives.
    """
    if pos_mask is None:
        pos_mask = jnp.ones(pos_scores.shape, bool)
    if neg_mask is None:
        neg_mask = jnp.ones(neg_scores.shape, bool)
    neg = jnp.where(neg_mask, neg_scores, _finfo_min(neg_scores.dtype))
    # logits [Q, P, 1 + N] / temperature
    logits = jnp.concatenate(
        [pos_scores[:, :, None],
         jnp.broadcast_to(neg[:, None, :],
                          pos_scores.shape + (neg.shape[-1],))],
        axis=-1,
    ) / temperature
    logz = jax.nn.logsumexp(logits, axis=-1)
    ce = logz - logits[..., 0]
    loss = jnp.sum(jnp.where(pos_mask, ce, 0.0))
    count = jnp.sum(pos_mask)
    return loss, count


def retrieval_loss(
    scores: Array,                              # [Q, C]
    *,
    temperature: Optional[float] = None,
    candidate_sampling_probability: Optional[Array] = None,  # [C]
    query_ids: Optional[Array] = None,          # [Q]
    candidate_ids: Optional[Array] = None,      # [C]
    remove_accidental_hits: bool = False,
    query_mask: Optional[Array] = None,         # [Q] valid rows
    candidate_mask: Optional[Array] = None,     # [C] valid columns
) -> Tuple[Array, Array]:
    """In-batch sampled-softmax retrieval loss, sum reduction.

    Ref parity: RetrievalLoss.calculate_batch_retrieval_loss (loss.py:209-279):
    labels = eye(Q, C); optional temperature divide; optional logQ correction
    `scores -= log(clamp(p, 1e-10))`; duplicate-query mask (rows whose
    query_id equals another row's query id own each other's diagonal
    candidates) and accidental-hit mask (candidate_id equals the row's
    positive candidate id) — masked logits set to dtype-min;
    CE with soft target = labels (sum reduction).
    """
    Q, C = scores.shape
    dtype = scores.dtype
    labels = jnp.eye(Q, C, dtype=dtype)
    if temperature is not None:
        scores = scores / temperature
    if candidate_sampling_probability is not None:
        scores = scores - jnp.log(
            jnp.clip(candidate_sampling_probability, 1e-10, None)
        ).astype(dtype)[None, :]

    duplicates = jnp.zeros_like(labels)
    if query_ids is not None:
        # [Q, Q] same-query mask mapped onto the first Q candidate columns.
        same_q = (query_ids[:, None] == query_ids[None, :]).astype(dtype)
        duplicates = jnp.maximum(
            duplicates, jnp.pad(same_q, ((0, 0), (0, C - Q)))
        )
    if remove_accidental_hits:
        if candidate_ids is None:
            raise ValueError(
                "remove_accidental_hits requires candidate_ids")
        own_pos = candidate_ids[:Q]  # row i's true candidate id
        hit = (own_pos[:, None] == candidate_ids[None, :]).astype(dtype)
        duplicates = jnp.maximum(duplicates, hit)
    if query_ids is not None or remove_accidental_hits:
        scores = scores + (duplicates - labels) * _finfo_min(dtype)

    if candidate_mask is not None:
        scores = jnp.where(candidate_mask[None, :], scores, _finfo_min(dtype))
    logz = jax.nn.logsumexp(scores, axis=-1)  # [Q]
    ce = logz - jnp.sum(labels * jnp.where(labels > 0, scores, 0.0), axis=-1)
    if query_mask is not None:
        ce = jnp.where(query_mask, ce, 0.0)
        count = jnp.sum(query_mask)
    else:
        count = jnp.asarray(Q, jnp.int32)
    return jnp.sum(ce), count


# ---------------------------------------------------------------------------
# Self-supervised losses (two-view / regularization family)
# ---------------------------------------------------------------------------

def _cosine(a: Array, b: Array, eps: float = 1e-8) -> Array:
    an = a * jax.lax.rsqrt(jnp.maximum(jnp.sum(a * a, -1, keepdims=True), eps))
    bn = b * jax.lax.rsqrt(jnp.maximum(jnp.sum(b * b, -1, keepdims=True), eps))
    return jnp.sum(an * bn, axis=-1)


def grace_loss(z1: Array, z2: Array, *, temperature: float = 0.5) -> Array:
    """GRACE contrastive loss between two augmented views (mean reduction).

    Ref parity: GRACELoss (loss.py:362) — symmetric InfoNCE where, for node
    i, the positive is its counterpart in the other view and negatives are
    all other nodes in both views (intra + inter view).
    """
    def half(a, b):
        n = a.shape[0]
        sim_inter = _pairwise_cosine(a, b) / temperature  # [N, N]
        sim_intra = _pairwise_cosine(a, a) / temperature
        # exclude self-similarity in the intra-view term
        eye = jnp.eye(n, dtype=bool)
        pos = jnp.diag(sim_inter)
        denom = (
            jnp.sum(jnp.exp(jnp.where(eye, -jnp.inf, sim_intra)), axis=-1)
            + jnp.sum(jnp.exp(sim_inter), axis=-1)
        )
        return -jnp.mean(pos - jnp.log(jnp.maximum(denom, 1e-12)))

    return 0.5 * (half(z1, z2) + half(z2, z1))


def _pairwise_cosine(a: Array, b: Array, eps: float = 1e-8) -> Array:
    an = a * jax.lax.rsqrt(jnp.maximum(jnp.sum(a * a, -1, keepdims=True), eps))
    bn = b * jax.lax.rsqrt(jnp.maximum(jnp.sum(b * b, -1, keepdims=True), eps))
    return an @ bn.T


def bgrl_loss(online_pred: Array, target_proj: Array) -> Array:
    """BGRL: negative cosine between online predictions and (stop-gradient)
    target projections, symmetrized by the caller. Ref: BGRLLoss (loss.py:537).
    """
    return -jnp.mean(_cosine(online_pred, jax.lax.stop_gradient(target_proj)))


def tbgrl_loss(
    online_pred: Array, target_proj: Array, corrupted_target_proj: Array
) -> Array:
    """Triplet-BGRL: positive-pair cosine up, corrupted-pair cosine down.

    Ref parity: TBGRLLoss (loss.py:559) — margin-free triplet on cosine
    similarities with a stop-gradient target network.
    """
    pos = _cosine(online_pred, jax.lax.stop_gradient(target_proj))
    neg = _cosine(online_pred, jax.lax.stop_gradient(corrupted_target_proj))
    return jnp.mean(neg - pos)


def gbt_loss(z1: Array, z2: Array, *, eps: float = 1e-8) -> Array:
    """Graph Barlow Twins: cross-correlation of batch-normalized embeddings
    pushed toward identity. Ref parity: GBTLoss (loss.py:491).
    """
    n, d = z1.shape
    z1n = (z1 - z1.mean(0)) / jnp.maximum(z1.std(0), eps)
    z2n = (z2 - z2.mean(0)) / jnp.maximum(z2.std(0), eps)
    c = (z1n.T @ z2n) / n  # [D, D]
    on_diag = jnp.sum((jnp.diag(c) - 1.0) ** 2)
    off_diag = jnp.sum(c**2) - jnp.sum(jnp.diag(c) ** 2)
    lam = 1.0 / d
    return on_diag + lam * off_diag


def whitening_decorrelation_loss(z1: Array, z2: Array) -> Array:
    """CCA-SSG-style: invariance MSE + per-view decorrelation toward
    whitened features. Ref parity: WhiteningDecorrelationLoss (loss.py:444).
    """
    n, d = z1.shape
    z1n = (z1 - z1.mean(0)) / jnp.maximum(z1.std(0), 1e-8)
    z2n = (z2 - z2.mean(0)) / jnp.maximum(z2.std(0), 1e-8)
    inv = jnp.sum((z1n - z2n) ** 2) / n
    c1 = (z1n.T @ z1n) / n
    c2 = (z2n.T @ z2n) / n
    eye = jnp.eye(d)
    dec = (jnp.sum((c1 - eye) ** 2) + jnp.sum((c2 - eye) ** 2)) / d
    return inv + dec


def feature_reconstruction_loss(
    reconstructed: Array, target: Array, *, gamma: float = 2.0
) -> Array:
    """Scaled cosine error (GraphMAE-style) feature reconstruction.

    Ref parity: FeatureReconstructionLoss (loss.py:419) — (1 - cos)^gamma,
    mean over nodes.
    """
    return jnp.mean((1.0 - _cosine(reconstructed, target)) ** gamma)


def alignment_loss(q: Array, c: Array, *, alpha: float = 2.0) -> Array:
    """DirectAU alignment: mean squared distance of normalized positive
    pairs. Ref parity: AligmentLoss (loss.py:591)."""
    qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-12))
    cn = c * jax.lax.rsqrt(jnp.maximum(jnp.sum(c * c, -1, keepdims=True), 1e-12))
    return jnp.mean(jnp.sum((qn - cn) ** 2, -1) ** (alpha / 2.0))


def uniformity_loss(z: Array, *, t: float = 2.0) -> Array:
    """DirectAU uniformity: log mean Gaussian-potential of pairwise
    distances. Ref parity: UniformityLoss (loss.py:609)."""
    zn = z * jax.lax.rsqrt(jnp.maximum(jnp.sum(z * z, -1, keepdims=True), 1e-12))
    d2 = jnp.sum((zn[:, None, :] - zn[None, :, :]) ** 2, -1)
    n = z.shape[0]
    mask = ~jnp.eye(n, dtype=bool)
    return jnp.log(
        jnp.sum(jnp.where(mask, jnp.exp(-t * d2), 0.0))
        / jnp.maximum(n * (n - 1), 1)
    )


def kl_loss(p_scores: Array, q_scores: Array, *, temperature: float = 1.0) -> Array:
    """KL divergence between two score distributions (distillation).

    Ref parity: KLLoss (loss.py:630)."""
    logp = jax.nn.log_softmax(p_scores / temperature, axis=-1)
    logq = jax.nn.log_softmax(q_scores / temperature, axis=-1)
    return jnp.mean(jnp.sum(jnp.exp(logp) * (logp - logq), axis=-1))


def llp_ranking_loss(
    pos_scores: Array, neg_scores: Array, *, temperature: float = 1.0
) -> Array:
    """Listwise link-prediction ranking loss (ListNet-style top-1).

    Ref parity: LLPRankingLoss (loss.py:659) — softmax CE of pos against
    the concatenated candidate list, mean over queries."""
    logits = jnp.concatenate([pos_scores[:, None], neg_scores], axis=-1)
    return jnp.mean(
        jax.nn.logsumexp(logits / temperature, -1) - logits[:, 0] / temperature
    )


# ---------------------------------------------------------------------------
# Supervised node classification
# ---------------------------------------------------------------------------

def cross_entropy_loss(
    logits: Array, labels: Array, *, mask: Optional[Array] = None
) -> Tuple[Array, Array]:
    """Standard CE (sum, count) with optional valid-row mask."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    ce = logz - ll
    if mask is not None:
        ce = jnp.where(mask, ce, 0.0)
        return jnp.sum(ce), jnp.sum(mask)
    return jnp.sum(ce), jnp.asarray(logits.shape[0], jnp.int32)
