"""Loss tests, incl. numeric parity against the reference's torch math
(reference loss semantics re-derived in torch inside the tests, per
loss.py:21-279; our jnp impls must match)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gigl_tpu.losses.count_min_sketch import (
    cms_add,
    cms_estimate,
    cms_init,
    cms_sampling_probability,
)
from gigl_tpu.losses.losses import (
    alignment_loss,
    bgrl_loss,
    cross_entropy_loss,
    feature_reconstruction_loss,
    gbt_loss,
    grace_loss,
    kl_loss,
    llp_ranking_loss,
    margin_loss,
    retrieval_loss,
    softmax_loss,
    tbgrl_loss,
    uniformity_loss,
    whitening_decorrelation_loss,
)
from gigl_tpu.losses.metrics import accuracy, hits_at_k, mean_reciprocal_rank


class TestMarginLoss:
    def test_parity_with_reference_math(self):
        """Ref MarginLoss (loss.py:40-69): margin_ranking_loss over repeated
        pos/neg pairs, sum reduction, count = #pairs."""
        rng = np.random.default_rng(0)
        pos = rng.normal(size=(1, 3)).astype(np.float32)
        hard = rng.normal(size=(1, 2)).astype(np.float32)
        rand = rng.normal(size=(1, 4)).astype(np.float32)
        all_neg = torch.tensor(np.concatenate([hard, rand], 1))
        neg_rep = all_neg.repeat(1, 3)
        pos_rep = torch.tensor(pos).repeat_interleave(all_neg.shape[1], dim=1)
        expect = F.margin_ranking_loss(
            pos_rep, neg_rep, torch.ones_like(pos_rep), margin=0.5,
            reduction="sum")
        loss, count = margin_loss(
            jnp.array(pos), jnp.array(np.concatenate([hard, rand], 1)),
            margin=0.5)
        np.testing.assert_allclose(float(loss), float(expect), rtol=1e-5)
        assert int(count) == 18

    def test_masked_padding_excluded(self):
        pos = jnp.array([[1.0, 99.0]])
        neg = jnp.array([[0.5, 99.0]])
        loss_masked, cnt = margin_loss(
            pos, neg, margin=0.5,
            pos_mask=jnp.array([[True, False]]),
            neg_mask=jnp.array([[True, False]]))
        loss_ref, _ = margin_loss(pos[:, :1], neg[:, :1], margin=0.5)
        np.testing.assert_allclose(float(loss_masked), float(loss_ref))
        assert int(cnt) == 1


class TestSoftmaxLoss:
    def test_parity_with_reference_math(self):
        """Ref SoftmaxLoss (loss.py:113-147): CE([pos_p, negs], 0, sum)."""
        rng = np.random.default_rng(1)
        pos = rng.normal(size=(1, 3)).astype(np.float32)
        neg = rng.normal(size=(1, 6)).astype(np.float32)
        temp = 0.07
        neg_rep = torch.tensor(neg).squeeze(0).repeat(3, 1)
        all_scores = torch.cat([torch.tensor(pos).reshape(-1, 1), neg_rep], 1)
        expect = F.cross_entropy(all_scores / temp,
                                 torch.zeros(3).long(), reduction="sum")
        loss, count = softmax_loss(jnp.array(pos), jnp.array(neg),
                                   temperature=temp)
        np.testing.assert_allclose(float(loss), float(expect), rtol=1e-4)
        assert int(count) == 3


class TestRetrievalLoss:
    def _torch_reference(self, scores, temperature=None, probs=None,
                         query_ids=None, candidate_ids=None,
                         remove_accidental_hits=False):
        """Reference RetrievalLoss.calculate_batch_retrieval_loss
        (loss.py:209-279) re-derived in torch."""
        scores = torch.tensor(scores)
        Q, C = scores.shape
        labels = torch.eye(Q, C)
        duplicates = torch.zeros_like(labels)
        if temperature is not None:
            scores = scores / temperature
        if probs is not None:
            scores = scores - torch.log(torch.clamp(torch.tensor(probs),
                                                    min=1e-10))
        if query_ids is not None:
            qid = torch.tensor(query_ids)
            same = (qid[:, None] == qid[None, :]).float()
            m = torch.zeros(Q, C)
            m[:, :Q] = same
            duplicates = torch.maximum(duplicates, m)
        if remove_accidental_hits:
            cid = torch.tensor(candidate_ids)
            hit = (cid[:Q, None] == cid[None, :]).float()
            duplicates = torch.maximum(duplicates, hit)
        if query_ids is not None or remove_accidental_hits:
            scores = scores + (duplicates - labels) * torch.finfo(scores.dtype).min
        return float(F.cross_entropy(scores, labels, reduction="sum"))

    def test_plain_parity(self):
        rng = np.random.default_rng(2)
        scores = rng.normal(size=(4, 10)).astype(np.float32)
        expect = self._torch_reference(scores, temperature=0.1)
        loss, count = retrieval_loss(jnp.array(scores), temperature=0.1)
        np.testing.assert_allclose(float(loss), expect, rtol=1e-4)
        assert int(count) == 4

    def test_logq_correction_parity(self):
        rng = np.random.default_rng(3)
        scores = rng.normal(size=(3, 8)).astype(np.float32)
        probs = rng.random(8).astype(np.float32)
        expect = self._torch_reference(scores, probs=probs)
        loss, _ = retrieval_loss(jnp.array(scores),
                                 candidate_sampling_probability=jnp.array(probs))
        np.testing.assert_allclose(float(loss), expect, rtol=1e-4)

    def test_accidental_hits_and_duplicate_queries_parity(self):
        rng = np.random.default_rng(4)
        scores = rng.normal(size=(4, 9)).astype(np.float32)
        qids = np.array([7, 7, 8, 9])
        cids = np.array([1, 2, 3, 4, 1, 2, 9, 9, 5])
        expect = self._torch_reference(
            scores, query_ids=qids, candidate_ids=cids,
            remove_accidental_hits=True)
        loss, _ = retrieval_loss(
            jnp.array(scores), query_ids=jnp.array(qids),
            candidate_ids=jnp.array(cids), remove_accidental_hits=True)
        np.testing.assert_allclose(float(loss), expect, rtol=1e-4)

    def test_requires_candidate_ids(self):
        with pytest.raises(ValueError, match="candidate_ids"):
            retrieval_loss(jnp.zeros((2, 4)), remove_accidental_hits=True)

    def test_masked_rows_and_columns(self):
        rng = np.random.default_rng(5)
        scores = rng.normal(size=(4, 8)).astype(np.float32)
        # Masking the last row/cols == computing on the submatrix.
        loss_m, cnt = retrieval_loss(
            jnp.array(scores),
            query_mask=jnp.array([True, True, True, False]),
            candidate_mask=jnp.array([True] * 6 + [False] * 2))
        loss_s, _ = retrieval_loss(jnp.array(scores[:3, :6]))
        np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=1e-5)
        assert int(cnt) == 3


class TestSSLLosses:
    def setup_method(self):
        rng = np.random.default_rng(6)
        self.z1 = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
        self.z2 = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))

    def test_grace_identical_views_lower(self):
        same = float(grace_loss(self.z1, self.z1))
        diff = float(grace_loss(self.z1, self.z2))
        assert same < diff

    def test_bgrl_perfect_alignment(self):
        assert float(bgrl_loss(self.z1, self.z1)) == pytest.approx(-1.0, abs=1e-5)

    def test_bgrl_stop_gradient(self):
        g = jax.grad(lambda t: bgrl_loss(self.z1, t))(self.z2)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_tbgrl_prefers_true_target(self):
        val = float(tbgrl_loss(self.z1, self.z1, self.z2))
        assert val < 0  # pos sim (1.0) > corrupted sim

    def test_gbt_identical_perfect(self):
        # Identical whitened views: cross-correlation diag ~1 -> small loss.
        small = float(gbt_loss(self.z1, self.z1))
        large = float(gbt_loss(self.z1, self.z2))
        assert small < large

    def test_whitening_decorrelation_nonneg(self):
        assert float(whitening_decorrelation_loss(self.z1, self.z2)) >= 0

    def test_feature_reconstruction_zero_on_equal(self):
        assert float(feature_reconstruction_loss(self.z1, self.z1)) == pytest.approx(0.0, abs=1e-5)

    def test_alignment_uniformity(self):
        assert float(alignment_loss(self.z1, self.z1)) == pytest.approx(0.0, abs=1e-6)
        # Uniformity of a spread-out set < collapsed set.
        collapsed = jnp.ones((16, 8))
        assert float(uniformity_loss(self.z1)) < float(uniformity_loss(collapsed))

    def test_kl_zero_on_same(self):
        assert float(kl_loss(self.z1, self.z1)) == pytest.approx(0.0, abs=1e-6)

    def test_llp_ranking(self):
        pos = jnp.array([10.0, 10.0])
        neg = jnp.zeros((2, 5))
        assert float(llp_ranking_loss(pos, neg)) < 0.01


class TestCountMinSketch:
    @pytest.mark.slow
    def test_counts_overestimate_never_under(self):
        sketch = cms_init(depth=4, width=64)
        rng = np.random.default_rng(7)
        ids = rng.integers(0, 1000, 500)
        sketch = cms_add(sketch, jnp.array(ids))
        true_counts = {i: int((ids == i).sum()) for i in np.unique(ids)}
        est = np.asarray(cms_estimate(sketch, jnp.array(list(true_counts))))
        for e, (i, t) in zip(est, true_counts.items()):
            assert e >= t
        assert int(sketch.total) == 500

    def test_exact_when_sparse(self):
        sketch = cms_init(depth=5, width=4096)
        sketch = cms_add(sketch, jnp.array([1, 1, 1, 2]))
        est = np.asarray(cms_estimate(sketch, jnp.array([1, 2, 3])))
        np.testing.assert_array_equal(est, [3, 1, 0])

    def test_sampling_probability(self):
        sketch = cms_add(cms_init(), jnp.array([5, 5, 6, 7]))
        p = np.asarray(cms_sampling_probability(sketch, jnp.array([5])))
        np.testing.assert_allclose(p, [0.5])

    def test_jittable(self):
        f = jax.jit(lambda s, i: cms_estimate(cms_add(s, i), i))
        out = f(cms_init(), jnp.array([3, 3]))
        assert int(out[0]) == 2


class TestMetrics:
    def test_mrr_and_hits_hand_computed(self):
        pos = jnp.array([3.0, 0.5])
        neg = jnp.array([[1.0, 2.0, 0.1], [1.0, 2.0, 0.1]])
        # q0: rank 1 -> rr 1; q1: below 1.0 and 2.0 -> rank 3 -> rr 1/3.
        rr_sum, cnt = mean_reciprocal_rank(pos, neg)
        np.testing.assert_allclose(float(rr_sum), 1 + 1 / 3, rtol=1e-6)
        hits, cnt2 = hits_at_k(pos, neg, ks=[1, 3])
        assert int(hits[1]) == 1 and int(hits[3]) == 2
        assert int(cnt) == 2 and int(cnt2) == 2

    def test_shared_negatives_broadcast(self):
        pos = jnp.array([3.0, 0.5])
        neg = jnp.array([1.0, 2.0, 0.1])
        rr_sum, _ = mean_reciprocal_rank(pos, neg)
        np.testing.assert_allclose(float(rr_sum), 1 + 1 / 3, rtol=1e-6)

    def test_tie_counts_against_positive(self):
        rr_sum, _ = mean_reciprocal_rank(jnp.array([1.0]), jnp.array([[1.0]]))
        np.testing.assert_allclose(float(rr_sum), 0.5)

    def test_masks(self):
        pos = jnp.array([3.0, 99.0])
        neg = jnp.array([[1.0, 98.0], [1.0, 98.0]])
        rr_sum, cnt = mean_reciprocal_rank(
            pos, neg, pos_mask=jnp.array([True, False]),
            neg_mask=jnp.array([[True, False], [True, False]]))
        np.testing.assert_allclose(float(rr_sum), 1.0)
        assert int(cnt) == 1

    def test_accuracy(self):
        logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
        labels = jnp.array([0, 1, 1])
        correct, cnt = accuracy(logits, labels)
        assert int(correct) == 2 and int(cnt) == 3


class TestCrossEntropy:
    def test_parity_with_torch(self):
        rng = np.random.default_rng(8)
        logits = rng.normal(size=(6, 4)).astype(np.float32)
        labels = rng.integers(0, 4, 6)
        expect = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                                 reduction="sum")
        loss, cnt = cross_entropy_loss(jnp.array(logits), jnp.array(labels))
        np.testing.assert_allclose(float(loss), float(expect), rtol=1e-5)
        assert int(cnt) == 6
