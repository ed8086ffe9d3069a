"""Supervised link-based task: edge-level classification / link scoring.

The reference DEFINES this task — ``LinkBasedTaskMetadata``
(gbml_config.proto:32-34) and ``SupervisedLinkBasedTaskSample``
(training_samples_schema.proto:56: root_edge + merged neighborhood +
root_edge_labels, "can be used for both Link-classification-based link
prediction tasks & Edge level prediction tasks") — but ships no trainer for
it; only NALP and node classification have modeling task specs. This module
completes the schema: both endpoints of each labeled edge are encoded with
the sampled-block GNN encoder, combined (hadamard / concat), and classified
by an MLP head; cross-entropy loss, accuracy + per-edge logits eval.

Everything per batch is one jit-compiled device program, like the other
trainers (sampling + hydration + two encoder passes + head + loss +
backward + optimizer).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from gigl_tpu.losses.losses import cross_entropy_loss
from gigl_tpu.training.dataset import AnchorBatchIterator, DeviceGraph
from gigl_tpu.training.early_stop import EarlyStopper
from gigl_tpu.training.trainer import TrainState, make_optimizer
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class EdgeClassifierHead(nn.Module):
    """Combine two endpoint embeddings and classify.

    combine="hadamard" (elementwise product, the standard link-feature
    map) or "concat".
    """

    num_classes: int
    hidden_dim: int = 64
    combine: str = "hadamard"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src_emb: jnp.ndarray, dst_emb: jnp.ndarray):
        if self.combine == "hadamard":
            z = src_emb * dst_emb
        elif self.combine == "concat":
            z = jnp.concatenate([src_emb, dst_emb], axis=-1)
        else:
            raise ValueError(f"unknown combine {self.combine!r}")
        z = nn.Dense(self.hidden_dim, dtype=self.dtype)(z)
        z = jax.nn.relu(z)
        return nn.Dense(self.num_classes, dtype=self.dtype)(z)


class LinkClassificationModel(nn.Module):
    """GNN encoder shared by both endpoints + edge classifier head."""

    encoder: nn.Module
    head: EdgeClassifierHead

    def __call__(self, src_feats, src_masks, dst_feats, dst_masks,
                 train: bool = False, hop_degrees=None):
        zs = self.encoder(src_feats, src_masks, None, train=train,
                          hop_degrees=hop_degrees)
        zd = self.encoder(dst_feats, dst_masks, None, train=train,
                          hop_degrees=hop_degrees)
        return self.head(zs, zd)


@dataclass
class LinkClassificationTrainerConfig:
    fanouts: Tuple[int, ...] = (10, 5)
    seed: int = 0
    sampling_method: str = "uniform"


class LinkClassificationTrainer:
    """Edge classification over a DeviceGraph + labeled edge list.

    ``labeled_edges``: [2, E] int (src row 0, dst row 1);
    ``edge_labels``: [E] int class ids. Batches are edge-index batches.
    """

    def __init__(self, model: LinkClassificationModel, graph: DeviceGraph,
                 labeled_edges: np.ndarray, edge_labels: np.ndarray,
                 config: LinkClassificationTrainerConfig,
                 optimizer_args: Optional[Dict[str, Any]] = None):
        self.model = model
        self.graph = graph
        self.edges = jnp.asarray(labeled_edges, jnp.int32)
        self.labels = jnp.asarray(edge_labels, jnp.int32)
        self.cfg = config
        self.tx = make_optimizer(optimizer_args or {})
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._logits_step = jax.jit(self._logits_impl, static_argnums=(4,))
        self._init_params = jax.jit(self._init_params_impl)

    def _encode_inputs(self, graph: DeviceGraph, node_ids: jnp.ndarray):
        blocks = graph.sample_hop_blocks(
            node_ids, self.cfg.fanouts, seed=self.cfg.seed,
            method=self.cfg.sampling_method)
        feats, masks, _ = graph.hydrate(blocks)
        return feats, masks

    def _logits_impl(self, graph: DeviceGraph, params,
                     src: jnp.ndarray, dst: jnp.ndarray, train: bool,
                     rng=None):
        sf, sm = self._encode_inputs(graph, src)
        df, dm = self._encode_inputs(graph, dst)
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.model.apply(params, sf, sm, df, dm, train=train,
                                rngs=rngs)

    def _init_params_impl(self, graph: DeviceGraph, rng, src, dst):
        sf, sm = self._encode_inputs(graph, src)
        df, dm = self._encode_inputs(graph, dst)
        return self.model.init(rng, sf, sm, df, dm)

    def init_state(self, rng: jax.Array, batch_size: int,
                   params: Optional[Any] = None) -> TrainState:
        if params is None:
            z = jnp.zeros((batch_size,), jnp.int32)
            params = self._init_params(self.graph, rng, z, z)
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def _train_step_impl(self, graph: DeviceGraph, state: TrainState,
                         edge_idx: jnp.ndarray, rng):
        src = self.edges[0, edge_idx]
        dst = self.edges[1, edge_idx]
        labels = self.labels[edge_idx]

        def loss_fn(p):
            logits = self._logits_impl(graph, p, src, dst, True, rng)
            s, c = cross_entropy_loss(logits, labels)
            return s / jnp.maximum(c.astype(jnp.float32), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        return TrainState(params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state, step=state.step + 1), loss

    def train_step(self, state, edge_idx, rng):
        return self._train_step(self.graph, state,
                                jnp.asarray(edge_idx, jnp.int32), rng)

    def _eval_step_impl(self, graph: DeviceGraph, params, edge_idx):
        src = self.edges[0, edge_idx]
        dst = self.edges[1, edge_idx]
        logits = self._logits_impl(graph, params, src, dst, False)
        pred = jnp.argmax(logits, -1)
        labels = self.labels[edge_idx]
        return jnp.sum(pred == labels), edge_idx.shape[0]

    def predict_batch(self, params, src, dst) -> jnp.ndarray:
        """Per-edge class logits (the inference surface)."""
        return self._logits_step(self.graph, params,
                                 jnp.asarray(src, jnp.int32),
                                 jnp.asarray(dst, jnp.int32), False)

    def evaluate(self, params, edge_indices, batch_size: int = 512) -> float:
        it = AnchorBatchIterator(np.asarray(edge_indices), batch_size,
                                 drop_remainder=False)
        correct = total = 0.0
        for b in it.epoch(0):
            c, n = self._eval_step(self.graph, params,
                                   jnp.asarray(b, jnp.int32))
            correct += float(c)
            total += float(n)
        return correct / max(total, 1.0)

    def fit(self, state: TrainState, train_idx, val_idx, *,
            batch_size: int, num_epochs: int = 10,
            early_stop_patience: int = 5,
            log_every: int = 50) -> Tuple[TrainState, Dict[str, float]]:
        it = AnchorBatchIterator(np.asarray(train_idx), batch_size,
                                 seed=self.cfg.seed)
        stopper = EarlyStopper(patience=early_stop_patience)
        rng = jax.random.PRNGKey(self.cfg.seed)
        step = 0
        for epoch in range(num_epochs):
            for b in it.epoch(epoch):
                rng, srng = jax.random.split(rng)
                state, loss = self.train_step(state, b, srng)
                step += 1
                if log_every and step % log_every == 0:
                    logger.info("epoch %d step %d loss %.4f",
                                epoch, step, float(loss))
            acc = self.evaluate(state.params, val_idx, batch_size)
            logger.info("epoch %d val edge-accuracy %.4f", epoch, acc)
            if stopper.update(acc, state.params):
                break
        if stopper.best_state is not None:
            state = state._replace(params=stopper.best_state)
        return state, {"accuracy": stopper.best_value or 0.0}
