"""Heterogeneous node-anchor link-prediction trainer.

Typed analog of gigl_tpu.training.trainer.NALPTrainer: the anchor and
candidate sides may be different node types (e.g. bipartite user→item
link prediction), each encoded through its own SubgraphSamplingStrategy
path. Mirrors the reference's hetero NALP semantics: anchors sampled with
per-root-type message-passing paths
(`subgraph_sampling_strategy.proto:38-84`), per-anchor positives/hard
negatives from supervision edges + batch-shared random negatives of the
candidate node type, Retrieval/Margin/Softmax losses, MRR/Hits@K eval
(`modeling_task_spec:334,490-560`).

The graph (HeteroDeviceGraph) is a pytree ARGUMENT of every jitted step.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigl_tpu.losses.losses import margin_loss, retrieval_loss, softmax_loss
from gigl_tpu.losses.metrics import hits_at_k, mean_reciprocal_rank
from gigl_tpu.sampling.hetero_sampler import OpSpec
from gigl_tpu.training.dataset import AnchorBatchIterator, NALPBatch
from gigl_tpu.training.early_stop import EarlyStopper
from gigl_tpu.training.hetero_dataset import HeteroDeviceGraph
from gigl_tpu.training.trainer import TrainState, make_optimizer
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


@dataclass
class HeteroNALPTrainerConfig:
    anchor_node_type: str
    candidate_node_type: str
    num_positives: int = 1
    num_hard_negs: int = 0
    num_random_negs: int = 512
    loss_type: str = "retrieval"
    margin: float = 0.5
    temperature: float = 0.07
    remove_accidental_hits: bool = True
    eval_ks: Tuple[int, ...] = (1, 5, 10, 50, 100)
    seed: int = 0
    # Tabularized typed sampling: frozen per-(csr, fanout) sample tables,
    # one packed row gather per op instead of per-slot CSR element gathers
    # (8x sampling throughput, docs/performance.md; the v1 frozen-sample
    # regime). refresh_tables(epoch) is the Subgraph Sampler re-run analog.
    tabularized: bool = False
    # PartitionedHeteroNALPTrainer only: ring/streaming-logsumexp retrieval
    # loss over the GLOBAL candidate pool with candidates kept sharded
    # (losses/sharded_retrieval.py; see NALPTrainerConfig
    # .global_candidate_pool).
    global_candidate_pool: bool = False


class HeteroNALPTrainer:
    def __init__(
        self,
        model,  # HeteroLinkPredictionGNN
        graph: HeteroDeviceGraph,
        paths: Dict[str, Tuple[OpSpec, ...]],
        config: HeteroNALPTrainerConfig,
        optimizer_args: Optional[Dict[str, Any]] = None,
    ):
        for nt in (config.anchor_node_type, config.candidate_node_type):
            if str(nt) not in paths:
                raise ValueError(f"no sampling path for node type {nt!r}")
        self.model = model
        self.graph = graph
        self.paths = {k: tuple(v) for k, v in paths.items()}
        self.cfg = config
        self.tx = make_optimizer(optimizer_args or {})
        self._train_step = jax.jit(self._train_step_impl)
        self._train_steps = jax.jit(self._train_steps_impl,
                                    donate_argnums=(1,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._eval_steps = jax.jit(self._eval_steps_impl)
        self._encode_step = jax.jit(self._encode_impl,
                                    static_argnums=(3, 4, 5))
        self._init_params = jax.jit(self._init_params_impl)
        if self.cfg.tabularized:
            self.refresh_tables(0)

    # -- tabularized sampling ----------------------------------------------------
    def refresh_tables(self, epoch: int = 0) -> None:
        """(Re)freeze the per-node samples with a new seed — the typed
        analog of NALPTrainer.refresh_cache."""
        self.graph = self.graph.with_sample_tables(
            self.paths, seed=self.cfg.seed + 1_299_709 * epoch)

    # -- encoding --------------------------------------------------------------
    def _encode_impl(self, graph: HeteroDeviceGraph, params,
                     node_ids: jnp.ndarray, node_type: str,
                     seed_offset: int, train: bool, rng=None):
        shape = node_ids.shape
        if self.cfg.tabularized and graph.sample_tables is not None:
            blocks = graph.sample_tabularized(node_ids, node_type,
                                              self.paths[node_type])
        else:
            blocks = graph.sample(node_ids, node_type, self.paths[node_type],
                                  seed=self.cfg.seed + seed_offset)
        feats, _ = graph.hydrate(blocks)
        rngs = {"dropout": rng} if (train and rng is not None) else None
        emb = self.model.apply(params, blocks, feats, train=train, rngs=rngs)
        return emb.reshape(shape + (emb.shape[-1],))

    def encode_batch(self, params, node_ids, node_type: Optional[str] = None):
        nt = str(node_type or self.cfg.anchor_node_type)
        return self._encode_step(self.graph, params,
                                 jnp.asarray(node_ids, jnp.int32), nt, 0,
                                 False)

    def _scores(self, graph, params, batch: NALPBatch, train, rng=None):
        """Per-group encoder passes: independent sample-gather-encode
        chains overlap on TPU (see trainer.py _scores measurement)."""
        a_nt, c_nt = self.cfg.anchor_node_type, self.cfg.candidate_node_type
        q = self._encode_impl(graph, params, batch.anchors, a_nt, 0, train,
                              rng)
        pos = self._encode_impl(graph, params, batch.pos, c_nt, 1, train, rng)
        rand = self._encode_impl(graph, params, batch.random_neg, c_nt, 2,
                                 train, rng)
        hard = None
        if batch.hard_neg.shape[-1] > 0:
            hard = self._encode_impl(graph, params, batch.hard_neg, c_nt, 3,
                                     train, rng)
        return q, pos, hard, rand

    # -- batch assembly --------------------------------------------------------
    def _sample_batch(self, graph: HeteroDeviceGraph, anchors, *,
                      num_hard_negs: int, seed: int, step) -> NALPBatch:
        pos, pos_mask, pos_ef = graph.sample_positives_with_feats(
            anchors, self.cfg.num_positives, seed=seed, step=step)
        hard, hard_mask, hard_ef = graph.sample_hard_negatives_with_feats(
            anchors, num_hard_negs, seed=seed, step=step)
        rand = graph.sample_random_negatives(
            self.cfg.num_random_negs, self.cfg.candidate_node_type,
            seed=seed, step=step)
        return NALPBatch(anchors=anchors.astype(jnp.int32), pos=pos,
                         pos_mask=pos_mask, hard_neg=hard,
                         hard_neg_mask=hard_mask, random_neg=rand,
                         pos_edge_feats=pos_ef,
                         hard_neg_edge_feats=hard_ef)

    # -- loss ------------------------------------------------------------------
    def _loss(self, graph, params, batch: NALPBatch, rng):
        from gigl_tpu.training.trainer import nalp_loss_from_embeddings

        q, pos, hard, rand = self._scores(graph, params, batch, True, rng)
        # Shared loss assembly (Appendix A.2): identical retrieval /
        # margin / softmax semantics as before, plus padded-candidate
        # masking and the label-edge-feature score terms when the model
        # carries an edge_scorer and the batch carries edge features.
        loss, _cms = nalp_loss_from_embeddings(
            self.model, params, self.cfg, batch, q, pos, hard, rand, None)
        return loss

    # -- steps -----------------------------------------------------------------
    def _train_step_impl(self, graph: HeteroDeviceGraph, state: TrainState,
                         anchors, rng):
        batch = self._sample_batch(
            graph, anchors, num_hard_negs=self.cfg.num_hard_negs,
            seed=self.cfg.seed, step=state.step)
        loss, grads = jax.value_and_grad(
            lambda p: self._loss(graph, p, batch, rng))(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, cms=state.cms), loss

    def _train_steps_impl(self, graph: HeteroDeviceGraph, state: TrainState,
                          anchors_kb: jnp.ndarray, rngs: jax.Array):
        """K steps as one device program (see NALPTrainer._train_steps_impl
        — amortizes per-step dispatch; state donated across the chunk)."""
        def body(st, xs):
            a, r = xs
            st2, loss = self._train_step_impl(graph, st, a, r)
            return st2, loss

        return jax.lax.scan(body, state, (anchors_kb, rngs))

    def train_steps(self, state: TrainState, anchors_kb,
                    rng: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        anchors_kb = jnp.asarray(anchors_kb, jnp.int32)
        rngs = jax.random.split(rng, anchors_kb.shape[0])
        return self._train_steps(self.graph, state, anchors_kb, rngs)

    def _eval_step_impl(self, graph, params, anchors, step):
        batch = self._sample_batch(graph, anchors, num_hard_negs=0,
                                   seed=self.cfg.seed + 7_777_777, step=step)
        q, pos, _, rand = self._scores(graph, params, batch, False)
        B, P, D = pos.shape
        if (getattr(self.model, "edge_scorer", None) is not None
                and batch.pos_edge_feats is not None):
            pos_scores = self.model.apply(
                params, q[:, None, :], pos, batch.pos_edge_feats,
                method="decode")
        else:
            pos_scores = self.model.apply(params, q[:, None, :], pos,
                                          method="decode")
        rand_scores = self.model.apply(params, q, rand,
                                       method="decode_all_pairs")
        pos_flat = pos_scores.reshape(-1)
        mask_flat = batch.pos_mask.reshape(-1)
        neg_rep = jnp.repeat(rand_scores, P, axis=0)
        acc = (batch.pos.reshape(-1)[:, None] == batch.random_neg[None, :])
        rr_sum, rr_cnt = mean_reciprocal_rank(
            pos_flat, neg_rep, pos_mask=mask_flat, neg_mask=~acc)
        hits, _ = hits_at_k(pos_flat, neg_rep, self.cfg.eval_ks,
                            pos_mask=mask_flat, neg_mask=~acc)
        return rr_sum, hits, rr_cnt

    # -- public API ------------------------------------------------------------
    def init_state(self, rng: jax.Array, batch_size: int,
                   params: Optional[Any] = None) -> TrainState:
        if params is None:
            anchors = jnp.zeros((batch_size,), jnp.int32)
            params = self._init_params(self.graph, rng, anchors)
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def _init_params_impl(self, graph, rng, anchors):
        # flax materializes only the params of modules actually traced at
        # init — so trace EVERY distinct root path (anchor + candidate node
        # types) and the decoder in one init call.
        node_types = []
        for nt in (self.cfg.anchor_node_type, self.cfg.candidate_node_type):
            if str(nt) not in node_types:
                node_types.append(str(nt))
        samples = []
        for nt in node_types:
            blocks = graph.sample(anchors, nt, self.paths[nt],
                                  seed=self.cfg.seed)
            feats, _ = graph.hydrate(blocks)
            samples.append((blocks, feats))

        def init_all(mdl):
            embs = [mdl(b, f) for b, f in samples]
            mdl.decode(embs[0], embs[-1])
            mdl.decode_all_pairs(embs[0], embs[-1])
            if getattr(mdl, "edge_scorer", None) is not None:
                de = (graph.sup_edge_features.shape[-1]
                      if graph.sup_edge_features is not None else 1)
                mdl.edge_score(jnp.zeros((1, de), jnp.float32))
            return embs[0]

        return self.model.init(rng, method=init_all)

    def train_step(self, state, anchors, rng):
        return self._train_step(self.graph, state,
                                jnp.asarray(anchors, jnp.int32), rng)

    def _eval_steps_impl(self, graph, params, anchors_kb, steps):
        """All eval batches in one scan program (one dispatch per eval)."""
        def body(_, xs):
            a, s = xs
            rr, hits, cnt = self._eval_step_impl(graph, params, a, s)
            return None, (rr, jnp.stack(
                [hits[int(k)] for k in self.cfg.eval_ks]), cnt)

        _, (rrs, hits, cnts) = jax.lax.scan(body, None, (anchors_kb, steps))
        return rrs.sum(), hits.sum(axis=0), cnts.sum()

    def evaluate(self, params, anchor_batches, step: int = 0) -> Dict[str, float]:
        batches = jnp.asarray(np.stack(list(anchor_batches)), jnp.int32)
        steps = jnp.arange(step, step + batches.shape[0], dtype=jnp.int32)
        rr, hits, cnt = self._eval_steps(self.graph, params, batches, steps)
        hits = np.asarray(hits)
        cnt_total = max(float(cnt), 1.0)
        out = {"mrr": float(rr) / cnt_total}
        for i, k in enumerate(self.cfg.eval_ks):
            out[f"hits@{k}"] = float(hits[i]) / cnt_total
        return out

    def fit(self, state: TrainState, train_anchors: np.ndarray,
            val_anchors: np.ndarray, *, batch_size: int, num_epochs: int = 1,
            val_every_n_batches: int = 100, num_val_batches: int = 8,
            early_stop_patience: int = 5,
            log_every: int = 50) -> Tuple[TrainState, Dict[str, float]]:
        it = AnchorBatchIterator(train_anchors, batch_size,
                                seed=self.cfg.seed)
        val_bs = max(1, min(batch_size, len(val_anchors)))
        val_it = AnchorBatchIterator(val_anchors, val_bs,
                                     seed=self.cfg.seed + 1)
        stopper = EarlyStopper(patience=early_stop_patience)
        rng = jax.random.PRNGKey(self.cfg.seed)
        global_step, stop = 0, False
        t0 = time.time()
        for epoch in range(num_epochs):
            if self.cfg.tabularized and epoch > 0:
                self.refresh_tables(epoch)
            for anchors in it.epoch(epoch):
                rng, srng = jax.random.split(rng)
                state, loss = self.train_step(state, anchors, srng)
                global_step += 1
                if global_step % log_every == 0:
                    logger.info("epoch %d step %d loss %.4f (%.1f steps/s)",
                                epoch, global_step, float(loss),
                                log_every / max(time.time() - t0, 1e-9))
                    t0 = time.time()
                if global_step % val_every_n_batches == 0:
                    batches = []
                    for i, b in enumerate(val_it.epoch(global_step)):
                        if i >= num_val_batches:
                            break
                        batches.append(b)
                    metrics = self.evaluate(state.params, batches,
                                            step=global_step)
                    logger.info("eval @%d: %s", global_step, metrics)
                    if stopper.update(metrics["mrr"], state.params):
                        stop = True
                        break
            if stop:
                break
        if stopper.best_state is not None:
            state = state._replace(params=stopper.best_state)
        batches = []
        for i, b in enumerate(val_it.epoch(10 ** 6)):
            if i >= num_val_batches:
                break
            batches.append(b)
        return state, self.evaluate(state.params, batches)
