"""Ring (sharded-candidate) retrieval loss == replicated retrieval loss.

SURVEY §7.4 "in-batch negative losses at scale": candidates stay sharded,
softmax runs as a streaming-logsumexp ring over ppermute'd blocks; the
result must equal the replicated full-batch retrieval_loss over the
assembled global score matrix — temperature, logQ correction, duplicate-
query and accidental-hit masking included.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gigl_tpu.losses.losses import retrieval_loss
from gigl_tpu.losses.sharded_retrieval import ring_retrieval_loss
from gigl_tpu.parallel.mesh import make_mesh

AXIS = "data"
NP_ = 8   # shards
QL = 6    # query rows per shard
RL = 4    # random negatives per shard
D = 8


def _setup(seed=0, with_dups=True):
    rng = np.random.default_rng(seed)
    Q = NP_ * QL
    q = rng.normal(size=(Q, D)).astype(np.float32)
    pos = rng.normal(size=(Q, D)).astype(np.float32)
    rand = rng.normal(size=(NP_ * RL, D)).astype(np.float32)
    qids = rng.integers(0, Q // 2 if with_dups else 10 ** 9, Q).astype(
        np.int32)
    pos_ids = rng.integers(0, 40, Q).astype(np.int32)
    rand_ids = rng.integers(0, 40, NP_ * RL).astype(np.int32)
    pos_mask = rng.random(Q) < 0.9
    return q, pos, rand, qids, pos_ids, rand_ids, pos_mask


def _replicated(q, pos, rand, qids, pos_ids, rand_ids, pos_mask, prob=None,
                temperature=0.1):
    cand = np.concatenate([pos, rand], 0)
    cand_ids = np.concatenate([pos_ids, rand_ids])
    scores = jnp.asarray(q) @ jnp.asarray(cand).T
    cand_mask = np.concatenate([pos_mask, np.ones(len(rand), bool)])
    s, c = retrieval_loss(
        scores, temperature=temperature,
        candidate_sampling_probability=(jnp.asarray(prob)
                                        if prob is not None else None),
        query_ids=jnp.asarray(qids), candidate_ids=jnp.asarray(cand_ids),
        remove_accidental_hits=True,
        query_mask=jnp.asarray(pos_mask),
        candidate_mask=jnp.asarray(cand_mask))
    return float(s), int(c)


def _sharded(q, pos, rand, qids, pos_ids, rand_ids, pos_mask, prob=None,
             temperature=0.1):
    mesh = make_mesh(NP_, axes=(AXIS,))
    sh = NamedSharding(mesh, P(AXIS))

    # per-shard blocks: rows s*QL..(s+1)*QL, cand = [own pos | own rand]
    cand = np.stack([np.concatenate([pos[s * QL:(s + 1) * QL],
                                     rand[s * RL:(s + 1) * RL]])
                     for s in range(NP_)])
    cand_ids = np.stack([np.concatenate([pos_ids[s * QL:(s + 1) * QL],
                                         rand_ids[s * RL:(s + 1) * RL]])
                         for s in range(NP_)])
    pos_qids = np.stack([np.concatenate(
        [qids[s * QL:(s + 1) * QL], np.full(RL, -1, np.int32)])
        for s in range(NP_)])
    cmask = np.stack([np.concatenate(
        [pos_mask[s * QL:(s + 1) * QL], np.ones(RL, bool)])
        for s in range(NP_)])
    logq = None
    if prob is not None:
        pr = np.stack([np.concatenate(
            [prob[s * QL:(s + 1) * QL],
             prob[NP_ * QL + s * RL: NP_ * QL + (s + 1) * RL]])
            for s in range(NP_)])
        logq = np.log(np.clip(pr, 1e-10, None)).astype(np.float32)

    def body(q_l, c_l, ci_l, pq_l, cm_l, lq_l, qi_l, opi_l, qm_l):
        s, c = ring_retrieval_loss(
            q_l, c_l[0], axis=AXIS, temperature=temperature,
            label_local_cols=jnp.arange(QL, dtype=jnp.int32),
            query_ids=qi_l, own_pos_ids=opi_l,
            candidate_ids=ci_l[0], pos_col_query_ids=pq_l[0],
            candidate_mask=cm_l[0],
            candidate_log_q=None if lq_l is None else lq_l[0],
            query_mask=qm_l, remove_accidental_hits=True)
        return s[None], c[None]

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS, None), P(AXIS, None), P(AXIS, None),
                  P(AXIS, None),
                  None if logq is None else P(AXIS, None),
                  P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)), check_vma=False))
    args = [jax.device_put(q, sh), jax.device_put(cand, sh),
            jax.device_put(cand_ids, sh), jax.device_put(pos_qids, sh),
            jax.device_put(cmask, sh),
            None if logq is None else jax.device_put(logq, sh),
            jax.device_put(qids, sh), jax.device_put(pos_ids, sh),
            jax.device_put(pos_mask, sh)]
    s, c = fn(*args)
    return float(np.asarray(s).sum()), int(np.asarray(c).sum())


class TestRingRetrievalLoss:
    def test_matches_replicated_full_batch(self):
        data = _setup()
        s_rep, c_rep = _replicated(*data)
        s_ring, c_ring = _sharded(*data)
        assert c_ring == c_rep
        np.testing.assert_allclose(s_ring, s_rep, rtol=2e-5, atol=2e-5)

    def test_matches_with_logq_correction(self):
        data = _setup(seed=3)
        prob = np.random.default_rng(5).random(
            NP_ * QL + NP_ * RL).astype(np.float32) * 0.1 + 1e-3
        s_rep, c_rep = _replicated(*data, prob=prob)
        s_ring, c_ring = _sharded(*data, prob=prob)
        assert c_ring == c_rep
        np.testing.assert_allclose(s_ring, s_rep, rtol=2e-5, atol=2e-5)

    def test_no_dup_queries_path(self):
        data = _setup(seed=7, with_dups=False)
        s_rep, c_rep = _replicated(*data)
        s_ring, c_ring = _sharded(*data)
        np.testing.assert_allclose(s_ring, s_rep, rtol=2e-5, atol=2e-5)

    def test_gradients_flow_and_are_finite(self):
        """Autodiff through the ring (ppermute transposes) yields finite
        grads wrt both queries and candidate blocks."""
        mesh = make_mesh(NP_, axes=(AXIS,))
        sh = NamedSharding(mesh, P(AXIS))
        rng = np.random.default_rng(1)
        q = rng.normal(size=(NP_ * QL, D)).astype(np.float32)
        cand = rng.normal(size=(NP_, QL + RL, D)).astype(np.float32)

        def loss(q_l, c_l):
            s, c = ring_retrieval_loss(q_l, c_l[0], axis=AXIS,
                                       temperature=0.1,
                                       own_pos_ids=jnp.zeros(QL, jnp.int32),
                                       remove_accidental_hits=False)
            return jax.lax.psum(s, AXIS) / jnp.maximum(
                jax.lax.psum(c, AXIS).astype(jnp.float32), 1.0)

        g = jax.jit(jax.shard_map(
            jax.grad(loss, argnums=(0, 1)), mesh=mesh,
            in_specs=(P(AXIS), P(AXIS, None)),
            out_specs=(P(AXIS), P(AXIS, None)), check_vma=False))
        gq, gc = g(jax.device_put(q, sh), jax.device_put(cand, sh))
        assert np.isfinite(np.asarray(gq)).all()
        assert np.isfinite(np.asarray(gc)).all()
        assert float(np.abs(np.asarray(gq)).sum()) > 0
        assert float(np.abs(np.asarray(gc)).sum()) > 0

    def test_defaults_without_ids(self):
        """All id args omitted with accidental-hit masking left at its
        default: must not crash (regression: own_pos_ids None was
        broadcast against the default candidate-id zeros)."""
        mesh = make_mesh(NP_, axes=(AXIS,))
        sh = NamedSharding(mesh, P(AXIS))
        rng = np.random.default_rng(2)
        q = rng.normal(size=(NP_ * QL, D)).astype(np.float32)
        cand = rng.normal(size=(NP_, QL + RL, D)).astype(np.float32)

        def body(q_l, c_l):
            s, c = ring_retrieval_loss(q_l, c_l[0], axis=AXIS,
                                       temperature=0.1)
            return s[None], c[None]

        fn = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(AXIS), P(AXIS, None)),
            out_specs=(P(AXIS), P(AXIS)), check_vma=False))
        s, c = fn(jax.device_put(q, sh), jax.device_put(cand, sh))
        assert np.isfinite(np.asarray(s)).all()
