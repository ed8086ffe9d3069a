"""Self-supervised GNN training: augmented-view objectives over sampled
neighborhoods.

Ref parity: the reference trains NALP specs with SSL task heads from
`layers/task.py` (GRACE:212, FeatureReconstruction:282,
WhiteningDecorrelation:351, GBT:421, BGRL:483, TBGRL:563, DirectAU:656) —
selected by trainer args and weighted by the multi-task container (:699).
Here the same heads (gigl_tpu.models.ssl_tasks) drive a dedicated trainer:
each step samples a node batch's neighborhood, builds two augmented views
(feature masking + neighbor dropout, gigl_tpu.models.augmentations), and
minimizes the chosen SSL objective. BGRL/TBGRL maintain an EMA target
encoder in the train state (functional-JAX form of the reference's target
network updates).

The graph is a pytree ARGUMENT of the jitted step (see trainer.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigl_tpu.models.augmentations import augment_view
from gigl_tpu.models.ssl_tasks import (
    BGRLTask,
    DirectAUTask,
    FeatureReconstructionTask,
    GBTTask,
    GraceTask,
    TBGRLTask,
    WhiteningDecorrelationTask,
    ema_update,
)
from gigl_tpu.training.dataset import AnchorBatchIterator, DeviceGraph
from gigl_tpu.training.trainer import make_optimizer
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)

SSL_TASKS = ("grace", "gbt", "whitening", "feature_recon", "bgrl", "tbgrl",
             "directau")


class SSLTrainState(NamedTuple):
    params: Any            # {"encoder": ..., "head": ...}
    opt_state: Any
    step: jnp.ndarray
    target_params: Optional[Any] = None  # EMA encoder copy (bgrl/tbgrl)


@dataclass
class SSLTrainerConfig:
    task: str = "grace"
    fanouts: Tuple[int, ...] = (10, 5)
    feature_drop_rate: float = 0.2
    edge_drop_rate: float = 0.2
    ema_decay: float = 0.99
    num_positives: int = 1  # directau draws supervision positives
    seed: int = 0


class SSLTrainer:
    """Trains a GNNEncoder with a self-supervised objective."""

    def __init__(self, encoder, graph: DeviceGraph, config: SSLTrainerConfig,
                 optimizer_args: Optional[Dict[str, Any]] = None):
        if config.task not in SSL_TASKS:
            raise ValueError(
                f"Unknown SSL task {config.task!r}; known: {SSL_TASKS}")
        self.encoder = encoder
        self.graph = graph
        self.cfg = config
        self.tx = make_optimizer(optimizer_args or {})
        self.head = self._make_head()
        self._train_step = jax.jit(self._train_step_impl)
        self._encode_step = jax.jit(self._encode_impl)

    def _make_head(self):
        c = self.cfg
        return {
            "grace": lambda: GraceTask(),
            "gbt": lambda: GBTTask(),
            "whitening": lambda: WhiteningDecorrelationTask(),
            "feature_recon": lambda: FeatureReconstructionTask(),
            "bgrl": lambda: BGRLTask(),
            "tbgrl": lambda: TBGRLTask(),
            "directau": lambda: DirectAUTask(),
        }[c.task]()

    # -- encoding --------------------------------------------------------------
    def _encode_impl(self, graph: DeviceGraph, enc_params, nodes):
        blocks = graph.sample_hop_blocks(nodes, self.cfg.fanouts,
                                         seed=self.cfg.seed)
        feats, masks, degs = graph.hydrate(blocks)
        return self.encoder.apply(enc_params, feats, masks, None,
                                  hop_degrees=degs)

    def encode_batch(self, params, nodes) -> jnp.ndarray:
        return self._encode_step(self.graph, params["encoder"],
                                 jnp.asarray(nodes, jnp.int32))

    def _encode_view(self, graph, enc_params, nodes, rng, corrupt=False):
        blocks = graph.sample_hop_blocks(nodes, self.cfg.fanouts,
                                         seed=self.cfg.seed)
        feats, masks, degs = graph.hydrate(blocks)
        feats, masks = augment_view(
            rng, feats, masks,
            feature_drop_rate=self.cfg.feature_drop_rate,
            edge_drop_rate=self.cfg.edge_drop_rate)
        if corrupt:
            # TBGRL negative view: shuffle root features across the batch.
            perm = jax.random.permutation(rng, feats[0].shape[0])
            feats = [feats[0][perm]] + list(feats[1:])
        return self.encoder.apply(enc_params, feats, masks, None,
                                  hop_degrees=degs), (feats, masks, degs)

    # -- loss ------------------------------------------------------------------
    def _loss(self, graph, params, target_params, nodes, step, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        task = self.cfg.task
        enc = params["encoder"]
        z1, view1 = self._encode_view(graph, enc, nodes, r1)
        if task == "feature_recon":
            x = graph.node_features[nodes]
            return self.head.apply(params["head"], z1, x)
        if task == "directau":
            # Positives: one supervision neighbor per anchor.
            batch = graph.sample_nalp_batch(
                nodes, num_positives=1, num_random_negs=1,
                seed=self.cfg.seed, step=step)
            zp = self._encode_impl(graph, enc, batch.pos[:, 0])
            return self.head.apply(params["head"], z1, zp)
        z2, view2 = self._encode_view(graph, enc, nodes, r2)
        if task in ("grace", "gbt", "whitening"):
            return self.head.apply(params["head"], z1, z2)
        # bgrl / tbgrl: target embeddings from the EMA encoder copy.
        t1, _ = self._encode_view(graph, target_params, nodes, r1)
        t2, _ = self._encode_view(graph, target_params, nodes, r2)
        if task == "bgrl":
            return self.head.apply(params["head"], z1, z2, t1, t2)
        neg, _ = self._encode_view(graph, target_params, nodes, r3,
                                   corrupt=True)
        return self.head.apply(params["head"], z1, z2, t1, t2, neg)

    # -- steps -----------------------------------------------------------------
    def _train_step_impl(self, graph: DeviceGraph, state: SSLTrainState,
                         nodes, rng):
        loss, grads = jax.value_and_grad(
            lambda p: self._loss(graph, p, state.target_params, nodes,
                                 state.step, rng))(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        target = state.target_params
        if target is not None:
            target = ema_update(target, params["encoder"],
                                self.cfg.ema_decay)
        return SSLTrainState(params=params, opt_state=opt_state,
                             step=state.step + 1, target_params=target), loss

    # -- public API ------------------------------------------------------------
    def init_state(self, rng: jax.Array, batch_size: int) -> SSLTrainState:
        e_rng, h_rng, v_rng = jax.random.split(rng, 3)
        nodes = jnp.zeros((batch_size,), jnp.int32)

        def init_all(graph):
            blocks = graph.sample_hop_blocks(nodes, self.cfg.fanouts,
                                             seed=self.cfg.seed)
            feats, masks, degs = graph.hydrate(blocks)
            enc_params = self.encoder.init(e_rng, feats, masks, None,
                                           hop_degrees=degs)
            z = self.encoder.apply(enc_params, feats, masks, None,
                                   hop_degrees=degs)
            task = self.cfg.task
            if task == "feature_recon":
                head_params = self.head.init(
                    h_rng, z, graph.node_features[nodes])
            elif task == "directau":
                head_params = self.head.init(h_rng, z, z)
            elif task in ("grace", "gbt", "whitening"):
                head_params = self.head.init(h_rng, z, z)
            elif task == "bgrl":
                head_params = self.head.init(h_rng, z, z, z, z)
            else:  # tbgrl
                head_params = self.head.init(h_rng, z, z, z, z, z)
            return enc_params, head_params

        enc_params, head_params = jax.jit(init_all)(self.graph)
        params = {"encoder": enc_params, "head": head_params}
        target = (jax.tree_util.tree_map(jnp.copy, enc_params)
                  if self.cfg.task in ("bgrl", "tbgrl") else None)
        return SSLTrainState(params=params, opt_state=self.tx.init(params),
                             step=jnp.zeros((), jnp.int32),
                             target_params=target)

    def train_step(self, state, nodes, rng):
        return self._train_step(self.graph, state,
                                jnp.asarray(nodes, jnp.int32), rng)

    def fit(self, state: SSLTrainState, nodes: np.ndarray, *,
            batch_size: int, num_epochs: int = 1,
            log_every: int = 50) -> Tuple[SSLTrainState, float]:
        it = AnchorBatchIterator(np.asarray(nodes), batch_size,
                                 seed=self.cfg.seed)
        rng = jax.random.PRNGKey(self.cfg.seed)
        last = 0.0
        step = 0
        for epoch in range(num_epochs):
            for batch in it.epoch(epoch):
                rng, srng = jax.random.split(rng)
                state, loss = self.train_step(state, batch, srng)
                last = float(loss)
                step += 1
                if step % log_every == 0:
                    logger.info("ssl[%s] epoch %d step %d loss %.4f",
                                self.cfg.task, epoch, step, last)
        return state, last
