"""Full-batch (whole-graph) training over the COO/SpMM path.

Ref parity: the reference's quick-start Cora flow trains full-graph GCN
style models (docs/.../getting_started/quick_start.md; TwoLayerGCN,
pyg/homogeneous.py:488); BASELINE.md milestone 1 is "Cora GraphSAGE
full-batch node classification".

TPU-native: one jitted step runs encoder.encode_coo (segment-sum SpMM
aggregation over the full edge list, gigl_tpu.ops.segment) + masked CE +
backward + optimizer. The graph tensors (features, edges, labels, split
masks) are pytree ARGUMENTS of the step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.graph.splitters import HashedNodeAnchorLinkSplitter
from gigl_tpu.losses.losses import cross_entropy_loss
from gigl_tpu.training.trainer import TrainState, make_optimizer
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class FullBatchData(NamedTuple):
    """Whole-graph device tensors (a pytree jit argument).

    When ``ell`` is set (the default from full_batch_data_from_graph), the
    trainer aggregates through degree-bucketed dense blocks (ops/ell.py —
    measured 2x end-to-end over the scatter-add COO lowering on v5e, with
    a scatter-free custom-VJP backward); src/dst stay for the COO fallback
    and parity tests.
    """

    x: jnp.ndarray          # [N, D] node features
    src: jnp.ndarray        # [E] int32
    dst: jnp.ndarray        # [E] int32
    labels: jnp.ndarray     # [N] int32
    train_mask: jnp.ndarray  # [N] bool
    val_mask: jnp.ndarray
    test_mask: jnp.ndarray
    edge_attr: Optional[jnp.ndarray] = None
    ell: Optional[Any] = None  # ops.ell.EllGraph

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]


def full_batch_data_from_graph(
    graph: HeteroGraph,
    *,
    train_ratio: float = 0.8,
    val_ratio: float = 0.1,
    seed: int = 0,
    build_ell: bool = True,
) -> FullBatchData:
    """Build device tensors + deterministic hash split masks from a
    homogeneous HeteroGraph with labels."""
    nt = graph.metadata.node_types[0]
    coo = graph.edges[graph.metadata.edge_types[0]]
    n = graph.num_nodes[nt]
    labels = graph.node_labels[nt]
    ids = np.arange(n)
    splitter = HashedNodeAnchorLinkSplitter(
        sampling_direction="in", num_val=val_ratio,
        num_test=max(1.0 - train_ratio - val_ratio, 0.0))
    tr, va, te = splitter(np.stack([ids, ids]))
    masks = {}
    for name, sel in (("train", tr), ("val", va), ("test", te)):
        m = np.zeros(n, bool)
        m[sel] = True
        masks[name] = m
    feats = (graph.node_features[nt] if nt in graph.node_features
             else np.zeros((n, 1), np.float32))
    ell = None
    if build_ell:
        from gigl_tpu.ops.ell import EllGraph

        ell = EllGraph.from_csr(graph.csr(graph.metadata.edge_types[0],
                                          anchor="dst"))
    return FullBatchData(
        x=jnp.asarray(np.asarray(feats), jnp.float32),
        src=jnp.asarray(coo[0], jnp.int32),
        dst=jnp.asarray(coo[1], jnp.int32),
        labels=jnp.asarray(labels, jnp.int32),
        train_mask=jnp.asarray(masks["train"]),
        val_mask=jnp.asarray(masks["val"]),
        test_mask=jnp.asarray(masks["test"]),
        ell=ell,
    )


@dataclass
class FullBatchTrainerConfig:
    num_epochs: int = 100
    eval_every: int = 10
    early_stop_patience: int = 10
    seed: int = 0


class FullBatchTrainer:
    """Whole-graph supervised node classification (COO/SpMM path)."""

    def __init__(self, encoder, data: FullBatchData,
                 config: Optional[FullBatchTrainerConfig] = None,
                 optimizer_args: Optional[Dict[str, Any]] = None):
        self.encoder = encoder
        self.data = data
        self.cfg = config or FullBatchTrainerConfig()
        self.tx = make_optimizer(optimizer_args or {})
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._init = jax.jit(self._init_impl)

    def _forward(self, data: FullBatchData, params, train, rng=None):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if data.ell is not None:
            # ell.edge_slots hold ORIGINAL COO row ids, so the same
            # COO-order edge_attr feeds both paths.
            return self.encoder.apply(
                params, data.x, data.ell, data.edge_attr, train=train,
                method="encode_ell", rngs=rngs)
        return self.encoder.apply(
            params, data.x, data.src, data.dst, data.num_nodes,
            data.edge_attr, train=train, method="encode_coo", rngs=rngs)

    def _init_impl(self, data: FullBatchData, rng):
        if data.ell is not None:
            return self.encoder.init(rng, data.x, data.ell, data.edge_attr,
                                     method="encode_ell")
        return self.encoder.init(rng, data.x, data.src, data.dst,
                                 data.num_nodes, data.edge_attr,
                                 method="encode_coo")

    def init_state(self, rng: jax.Array,
                   params: Optional[Any] = None) -> TrainState:
        if params is None:
            params = self._init(self.data, rng)
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def _train_step_impl(self, data: FullBatchData, state: TrainState, rng):
        def loss_fn(p):
            logits = self._forward(data, p, True, rng)
            s, c = cross_entropy_loss(logits, data.labels,
                                      mask=data.train_mask)
            return s / jnp.maximum(c.astype(jnp.float32), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        return TrainState(params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state, step=state.step + 1), loss

    def _eval_step_impl(self, data: FullBatchData, params, mask):
        logits = self._forward(data, params, False)
        pred = jnp.argmax(logits, -1)
        correct = jnp.sum((pred == data.labels) & mask)
        return correct, jnp.sum(mask)

    def accuracy(self, params, split: str = "val") -> float:
        mask = {"train": self.data.train_mask, "val": self.data.val_mask,
                "test": self.data.test_mask}[split]
        c, n = self._eval_step(self.data, params, mask)
        return float(c) / max(float(n), 1.0)

    def fit(self, state: Optional[TrainState] = None
            ) -> Tuple[TrainState, Dict[str, float]]:
        from gigl_tpu.training.early_stop import EarlyStopper

        rng = jax.random.PRNGKey(self.cfg.seed)
        if state is None:
            rng, init_rng = jax.random.split(rng)
            state = self.init_state(init_rng)
        stopper = EarlyStopper(patience=self.cfg.early_stop_patience)
        for epoch in range(self.cfg.num_epochs):
            rng, srng = jax.random.split(rng)
            state, loss = self._train_step(self.data, state, srng)
            if (epoch + 1) % self.cfg.eval_every == 0:
                acc = self.accuracy(state.params, "val")
                logger.info("epoch %d loss %.4f val acc %.4f",
                            epoch + 1, float(loss), acc)
                if stopper.update(acc, state.params):
                    break
        if stopper.best_state is not None:
            state = state._replace(params=stopper.best_state)
        return state, {
            "accuracy": self.accuracy(state.params, "val"),
            "test_accuracy": self.accuracy(state.params, "test"),
        }
