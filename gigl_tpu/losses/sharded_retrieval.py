"""Retrieval loss with the candidate pool SHARDED across the mesh.

SURVEY §7.4 "In-batch negative losses at scale": the replicated retrieval
loss materializes [Q, C] logits with the full candidate pool per chip; at
pod scale (C = global positives + hard negs + a large shared-negative
pool) both the all_gathered candidate embeddings and the logits blow past
HBM. Here the candidates stay SHARDED (each shard holds its own rows'
positives/hard negatives + its 1/P slice of the random negatives) and the
softmax runs as a RING:

  each of P steps scores the local query rows against ONE shard's
  candidate block ([Q_local, C/P] logits), folds it into a running
  (max, exp-sum) accumulator — the streaming/psum-style logsumexp — and
  rotates the block to the next shard via lax.ppermute.

Per-shard memory is O(Q_local * C/P); total ICI traffic equals one
candidate all_gather. The result is the REFERENCE's full-batch contract —
every shard's positives serve as negatives for every query (loss.py:209-279
semantics: temperature, logQ correction, duplicate-query and
accidental-hit masking) — where the existing partitioned per-shard loss
scores only local positives. Row losses partition across shards, so
gradients compose with the standard pmean/psum reduction exactly like the
per-shard path (autodiff through ppermute routes candidate cotangents
back to their owner shards).

Parity: tests/test_sharded_retrieval.py asserts equality with the
replicated retrieval_loss over the assembled global score matrix.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gigl_tpu.losses.losses import _finfo_min


def ring_retrieval_loss(
    q_local: jnp.ndarray,             # [Ql, D] this shard's query rows
    cand_local: jnp.ndarray,          # [Cl, D] this shard's candidate block
    *,
    axis: str,
    temperature: Optional[float] = None,
    decode_all_pairs=None,            # fn(q, c) -> [Ql, Cl]; default dot
    label_local_cols: Optional[jnp.ndarray] = None,  # [Ql] col of own pos
    query_ids: Optional[jnp.ndarray] = None,         # [Ql]
    own_pos_ids: Optional[jnp.ndarray] = None,       # [Ql]
    candidate_ids: Optional[jnp.ndarray] = None,     # [Cl]
    pos_col_query_ids: Optional[jnp.ndarray] = None,  # [Cl], -1 = not a pos
    candidate_mask: Optional[jnp.ndarray] = None,     # [Cl]
    candidate_log_q: Optional[jnp.ndarray] = None,    # [Cl] logQ correction
    query_mask: Optional[jnp.ndarray] = None,         # [Ql]
    remove_accidental_hits: bool = True,
    own_block_bias: Optional[jnp.ndarray] = None,     # [Ql, Cl] raw-score add
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ce_sum_local, count_local) for THIS shard's query rows against the
    GLOBAL (all-shards) candidate pool. Must run inside shard_map over
    ``axis``. ``label_local_cols[r]`` is row r's own-positive column in
    the LOCAL block (rows and their positives are co-located by
    construction). Combine across shards as psum(sum)/psum(count).
    """
    P = jax.lax.axis_size(axis)
    ql = q_local.shape[0]
    dtype = q_local.dtype
    neg_inf = _finfo_min(jnp.float32)
    if decode_all_pairs is None:
        decode_all_pairs = lambda a, b: a @ b.T
    if label_local_cols is None:
        label_local_cols = jnp.arange(ql, dtype=jnp.int32)
    if candidate_mask is None:
        candidate_mask = jnp.ones(cand_local.shape[0], bool)
    perm = [(i, (i + 1) % P) for i in range(P)]

    def score_block(blk_emb, blk_ids, blk_pos_qids, blk_cmask, blk_logq,
                    is_own: bool):
        s = decode_all_pairs(q_local, blk_emb).astype(jnp.float32)
        if is_own and own_block_bias is not None:
            s = s + own_block_bias  # raw-score add, pre-temperature
        if temperature is not None:
            s = s / temperature
        if blk_logq is not None:
            s = s - blk_logq[None, :]
        labels = jnp.zeros_like(s)
        if is_own:
            col_iota = jnp.arange(s.shape[1], dtype=jnp.int32)
            labels = (col_iota[None, :]
                      == label_local_cols[:, None]).astype(jnp.float32)
        dup = jnp.zeros_like(s)
        if query_ids is not None and blk_pos_qids is not None:
            dup = jnp.maximum(dup, (query_ids[:, None]
                                    == blk_pos_qids[None, :]
                                    ).astype(jnp.float32))
        if (remove_accidental_hits and blk_ids is not None
                and own_pos_ids is not None):
            dup = jnp.maximum(dup, (own_pos_ids[:, None]
                                    == blk_ids[None, :]
                                    ).astype(jnp.float32))
        # dup ⊇ labels whenever masking is active (as in the replicated
        # loss); the clamp keeps the inactive case a no-op instead of
        # +inf-ing the diagonal.
        s = s + jnp.maximum(dup - labels, 0.0) * neg_inf
        s = jnp.where(blk_cmask[None, :], s, neg_inf)
        pos_term = jnp.sum(labels * jnp.where(labels > 0, s, 0.0), axis=1)
        return s, pos_term

    # Streaming logsumexp over the ring of candidate blocks.
    m_run = jnp.full((ql,), neg_inf, jnp.float32)
    s_run = jnp.zeros((ql,), jnp.float32)
    pos_score = jnp.zeros((ql,), jnp.float32)
    blk = (cand_local.astype(dtype),
           (candidate_ids if candidate_ids is not None
            else jnp.zeros(cand_local.shape[0], jnp.int32)),
           (pos_col_query_ids if pos_col_query_ids is not None
            else jnp.full(cand_local.shape[0], -1, jnp.int32)),
           candidate_mask,
           candidate_log_q)
    for t in range(P):
        emb, ids, pqids, cmask, logq = blk
        s, pterm = score_block(
            emb, ids if (remove_accidental_hits or query_ids is not None)
            else None, pqids, cmask, logq, is_own=(t == 0))
        pos_score = pos_score + pterm
        m_new = jnp.maximum(m_run, jnp.max(s, axis=1))
        # guard: rows with everything masked keep -inf cleanly
        scale = jnp.where(jnp.isfinite(m_run), jnp.exp(m_run - m_new), 0.0)
        s_run = s_run * scale + jnp.sum(
            jnp.exp(jnp.where(jnp.isfinite(s), s - m_new[:, None],
                              neg_inf)), axis=1)
        m_run = m_new
        if t < P - 1:
            blk = tuple(
                None if x is None else jax.lax.ppermute(x, axis, perm)
                for x in blk)
    ce = jnp.log(jnp.maximum(s_run, 1e-30)) + m_run - pos_score
    if query_mask is not None:
        ce = jnp.where(query_mask, ce, 0.0)
        count = jnp.sum(query_mask)
    else:
        count = jnp.asarray(ql, jnp.int32)
    return jnp.sum(ce), count



def ring_candidate_pool(batch, pos, hard, rand_emb_l, rand_ids_local):
    """Assemble the per-shard candidate block for the partitioned ring
    loss (shared by the homogeneous and hetero trainers): columns are
    [own positives | own hard negatives | own R/P shared-negative slice].
    Returns (cand_local, cand_ids, cand_mask, pos_col_query_ids)."""
    b, p_, d = pos.shape
    parts = [pos.reshape(b * p_, d)]
    cand_ids = [batch.pos.reshape(-1)]
    cmask = [batch.pos_mask.reshape(-1)]
    pos_qids = [jnp.repeat(batch.anchors, p_, axis=0)]
    if hard is not None and hard.shape[1] > 0:
        h = hard.shape[1]
        parts.append(hard.reshape(b * h, d))
        cand_ids.append(batch.hard_neg.reshape(-1))
        cmask.append(batch.hard_neg_mask.reshape(-1))
        pos_qids.append(jnp.full((b * h,), -1, jnp.int32))
    parts.append(rand_emb_l)
    cand_ids.append(rand_ids_local)
    cmask.append(jnp.ones(rand_emb_l.shape[0], bool))
    pos_qids.append(jnp.full((rand_emb_l.shape[0],), -1, jnp.int32))
    return (jnp.concatenate(parts, axis=0), jnp.concatenate(cand_ids),
            jnp.concatenate(cmask), jnp.concatenate(pos_qids))


def ring_own_block_edge_bias(edge_score_fn, batch, num_cols: int):
    """Label-edge-feature score terms as an own-block bias matrix
    (ref nalp_data_loader.py:44-46 contract; mirrors the replicated
    nalp_loss_from_embeddings placement): row r's own positive at column
    r gets edge_score(pos_edge_feats[r]); anchor b's hard-negative
    columns get edge_score(hard_neg_edge_feats[b, j]) for ALL of b's
    query rows. Returns [Ql, num_cols] or None when the batch carries no
    label edge features."""
    if batch.pos_edge_feats is None and batch.hard_neg_edge_feats is None:
        return None
    b, p_ = batch.pos.shape
    ql = b * p_
    bias = jnp.zeros((ql, num_cols), jnp.float32)
    if batch.pos_edge_feats is not None:
        e_pos = edge_score_fn(
            batch.pos_edge_feats.reshape(ql, -1)).astype(jnp.float32)
        bias = bias.at[jnp.arange(ql), jnp.arange(ql)].add(e_pos)
    h = batch.hard_neg.shape[1]
    if h > 0 and batch.hard_neg_edge_feats is not None:
        e_hard = edge_score_fn(
            batch.hard_neg_edge_feats.reshape(b * h, -1)
        ).astype(jnp.float32)
        row_b = jnp.arange(ql) // p_
        col_b = jnp.arange(b * h) // h
        add = jnp.where(row_b[:, None] == col_b[None, :],
                        e_hard[None, :], 0.0)
        bias = bias.at[:, ql: ql + b * h].add(add)
    return bias
