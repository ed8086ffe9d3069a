"""Decompose the partitioned-P=1 vs replicated step-time gap (throwaway).

Times, at the bench shape, K-step scan programs for:
  r_full  - replicated full train step      p_full  - partitioned full step
  r_loss  - replicated loss only (no grad)  p_loss  - partitioned loss only
  r_enc   - replicated 3-group encode only  p_enc   - partitioned encode only
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gigl_tpu.graph.csr import HeteroGraph
from gigl_tpu.models.encoders import GNNEncoder
from gigl_tpu.models.link_prediction import (
    LinkPredictionDecoder,
    LinkPredictionGNN,
)
from gigl_tpu.parallel.mesh import make_mesh
from gigl_tpu.training.dataset import DeviceGraph
from gigl_tpu.training.dist_sampled import (
    PartitionedGraph,
    PartitionedNALPTrainer,
)
from gigl_tpu.training.trainer import NALPTrainer, NALPTrainerConfig

N, E, D = 100_000, 2_000_000, 128
B, R = 512, 512
FANOUTS = (15, 10)
K = 300

rng = np.random.default_rng(0)
src = rng.integers(0, N, E)
dst = rng.integers(0, N, E)
g = HeteroGraph.homogeneous(
    src=src, dst=dst, num_nodes=N,
    node_features=rng.normal(size=(N, D)).astype(np.float32))
dg = DeviceGraph.from_hetero(g, supervision_edges=np.stack([src, dst]))

enc = GNNEncoder(hid_dim=256, out_dim=D, num_layers=2, conv="graphsage",
                 dtype=jnp.bfloat16)
model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
cfg = NALPTrainerConfig(fanouts=FANOUTS, num_random_negs=R,
                        loss_type="retrieval", num_positives=1,
                        cached_hop=True, fused_cache=True)
trainer = NALPTrainer(model, dg, cfg)
state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)

import dataclasses
mesh = make_mesh(1, axes=("data",))
pcfg = dataclasses.replace(cfg, fused_cache=False)
pg = PartitionedGraph.build(dg, mesh)
pt = PartitionedNALPTrainer(model, pg, mesh, pcfg, capacity_factor=4.0)
pstate = pt.init_state(jax.random.PRNGKey(0), batch_size=B)

anchors = (np.arange(B * K).reshape(K, B) % N).astype(np.int32)
rngs_np = np.asarray(jax.random.split(jax.random.PRNGKey(1), K))


def timed(label, fn):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / K * 1e6:.1f} us/step")
    return best / K


# -- full steps (rebind the donated state between calls: re-passing a
# donated TrainState raised an opaque TPU backend error AND wedged the
# tunnel on 2026-08-21) -----------------------------------------------------
_h = {"r": state, "p": pstate}


def _run_r():
    s2, losses = trainer.train_steps(_h["r"], anchors,
                                     jax.random.PRNGKey(2))
    _h["r"] = s2
    return losses


def _run_p():
    s2, losses = pt.train_steps(_h["p"], anchors, jax.random.PRNGKey(2))
    _h["p"] = s2
    return losses


t_r_full = timed("r_full", _run_r)
t_p_full = timed("p_full", _run_p)
state, pstate = _h["r"], _h["p"]

# -- loss only (no grad/update) --------------------------------------------
params_r = state.params
@jax.jit
def r_loss_scan(graph, p, a_kb, rr):
    def body(c, xs):
        a, r = xs
        batch = graph.sample_nalp_batch(
            a, num_positives=1, num_hard_negs=0, num_random_negs=R,
            seed=cfg.seed, step=c)
        loss, _ = trainer._loss(graph, p, batch, None, r)
        return c + 1, loss
    _, losses = jax.lax.scan(body, jnp.zeros((), jnp.int32), (a_kb, rr))
    return losses

t_r_loss = timed("r_loss", lambda: r_loss_scan(
    trainer.graph, params_r, anchors, rngs_np))

params_p = pstate.params
gspec = pt._train_steps  # reuse specs via manual program
from jax import shard_map as _sm  # noqa

def p_loss_local(gargs, p, a_kb, rr):
    gg = pt._unblock(gargs)
    def body(c, xs):
        a, r = xs
        loss, _aux = pt._loss_local(gg, p, None, a, c, r)
        return c + 1, loss
    _, losses = jax.lax.scan(body, jnp.zeros((), jnp.int32), (a_kb, rr))
    return losses

n_tab = len(pt.pg.sample_tables or ())
gspec_t = (P("data"), P("data", None), P("data", None),
           P("data", None), P("data", None),
           P("data", None), P("data", None),
           P("data", None), P("data", None), P("data", None),
           tuple(P("data") for _ in range(n_tab)))
p_loss_prog = jax.jit(jax.shard_map(
    p_loss_local, mesh=mesh,
    in_specs=(gspec_t, P(), P(None, "data"), P()),
    out_specs=P(), check_vma=False))

t_p_loss = timed("p_loss", lambda: p_loss_prog(
    pt._graph_args(), params_p, anchors, rngs_np))

# -- encode only (3 groups, no batch draws, no loss) ------------------------
@jax.jit
def r_enc_scan(graph, p, a_kb):
    def body(c, a):
        q = trainer._encode_impl(graph, p, a, 0, False)
        pos = trainer._encode_impl(graph, p, a[:, None], 1, False)
        rand = trainer._encode_impl(graph, p, a, 2, False)
        s = (q.sum() + pos.sum() + rand.sum()).astype(jnp.float32)
        return c, s
    _, out = jax.lax.scan(body, jnp.zeros((), jnp.int32), a_kb)
    return out

t_r_enc = timed("r_enc", lambda: r_enc_scan(trainer.graph, params_r,
                                            anchors))

def p_enc_local(gargs, p, a_kb):
    gg = pt._unblock(gargs)
    def body(c, a):
        groups = [(a, 0), (a[:, None], 1), (a, 2)]
        embs, _ovf = pt._encode_groups(gg, p, groups, train=False)
        s = sum(e.sum() for e in embs).astype(jnp.float32)
        return c, s
    _, out = jax.lax.scan(body, jnp.zeros((), jnp.int32), a_kb)
    return out

p_enc_prog = jax.jit(jax.shard_map(
    p_enc_local, mesh=mesh,
    in_specs=(gspec_t, P(), P(None, "data")),
    out_specs=P(), check_vma=False))
t_p_enc = timed("p_enc", lambda: p_enc_prog(pt._graph_args(), params_p,
                                            anchors))

print(f"\ngap full: {1e6*(t_p_full-t_r_full):.1f} us | "
      f"loss: {1e6*(t_p_loss-t_r_loss):.1f} us | "
      f"enc: {1e6*(t_p_enc-t_r_enc):.1f} us")
print(f"grad+update overhead: repl {1e6*(t_r_full-t_r_loss):.1f} us, "
      f"part {1e6*(t_p_full-t_p_loss):.1f} us")
print(f"batch-draw+loss-math: repl {1e6*(t_r_loss-t_r_enc):.1f} us, "
      f"part {1e6*(t_p_loss-t_p_enc):.1f} us")
