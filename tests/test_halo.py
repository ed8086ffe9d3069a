"""Ring halo-exchange SpMM (gigl_tpu.parallel.halo) on the 8-device CPU mesh.

Numeric parity with the single-device COO path (ops/segment.coo_spmm) —
the reference's cross-machine feature-lookup semantics (GLT RPC feature
fetch) expressed as a ppermute ring (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigl_tpu.ops.segment import coo_spmm
from gigl_tpu.parallel.halo import (
    RingSchedule,
    build_ring_schedule,
    put_ring_schedule,
    ring_sharded_aggregate,
    ring_spmm,
)
from gigl_tpu.parallel.mesh import make_mesh
from gigl_tpu.parallel.partition import shard_features_rowwise


def _rand_graph(n=203, e=2311, d=16, seed=0):
    rng = np.random.default_rng(seed)
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    x = rng.normal(size=(n, d)).astype(np.float32)
    return edges, x


def test_schedule_covers_every_edge_exactly_once():
    edges, _ = _rand_graph()
    p = 8
    sched = build_ring_schedule(edges, 203, p)
    assert sched.src_local.shape[:2] == (p, p)
    # Reconstruct the global edge multiset from the buckets.
    per = sched.per
    rebuilt = []
    for s in range(p):
        for k in range(p):
            valid = sched.weight[s, k] > 0
            src_owner = (s + k) % p
            src = sched.src_local[s, k, valid] + src_owner * per
            dst = sched.dst_local[s, k, valid] + s * per
            rebuilt.append(np.stack([src, dst]))
    rebuilt = np.concatenate(rebuilt, axis=1)
    want = edges[:, np.lexsort((edges[1], edges[0]))]
    got = rebuilt[:, np.lexsort((rebuilt[1], rebuilt[0]))]
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_ring_spmm_matches_coo(reduce):
    edges, x = _rand_graph()
    n = x.shape[0]
    mesh = make_mesh(8)
    out, _, _ = ring_sharded_aggregate(edges, x, n, mesh, reduce=reduce)
    want = coo_spmm(jnp.asarray(edges[0]), jnp.asarray(edges[1]),
                    jnp.asarray(x), n, reduce=reduce)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ring_spmm_weighted_and_reusable_closure():
    edges, x = _rand_graph(n=97, e=801, d=8, seed=3)
    w = np.random.default_rng(4).random(edges.shape[1]).astype(np.float32)
    n = x.shape[0]
    mesh = make_mesh(8)
    out, run, sched = ring_sharded_aggregate(
        edges, x, n, mesh, reduce="sum", edge_weight=w)
    want = coo_spmm(jnp.asarray(edges[0]), jnp.asarray(edges[1]),
                    jnp.asarray(x), n, edge_weight=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # The returned closure re-runs on fresh sharded features (same shapes):
    # one compile serves the whole training run.
    x2 = (x * 2.0 + 1.0).astype(np.float32)
    xs2 = shard_features_rowwise(jnp.asarray(x2), mesh)
    out2 = run(xs2)[:n]
    want2 = coo_spmm(jnp.asarray(edges[0]), jnp.asarray(edges[1]),
                     jnp.asarray(x2), n, edge_weight=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(want2),
                               rtol=1e-5, atol=1e-5)


def test_ring_spmm_differentiable():
    # Gradients flow through ppermute + scatter-add: a 1-layer sharded
    # aggregation inside a scalar loss, compared against the COO path.
    edges, x = _rand_graph(n=64, e=500, d=4, seed=7)
    n = x.shape[0]
    mesh = make_mesh(8)
    sched = build_ring_schedule(edges, n, mesh.shape["data"])
    placed = put_ring_schedule(sched, mesh)
    pad = sched.padded_num_nodes

    def loss_ring(xp):
        out = ring_spmm(xp, placed, mesh, reduce="sum")
        return jnp.sum(out[:n] ** 2)

    def loss_coo(xd):
        out = coo_spmm(jnp.asarray(edges[0]), jnp.asarray(edges[1]), xd, n)
        return jnp.sum(out ** 2)

    xp = shard_features_rowwise(jnp.asarray(x), mesh)
    g_ring = jax.jit(jax.grad(loss_ring))(xp)
    g_coo = jax.grad(loss_coo)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_ring)[:n], np.asarray(g_coo),
                               rtol=1e-4, atol=1e-5)


def test_isolated_nodes_and_empty_buckets():
    # Nodes with no in-edges get zeros (sum) / zeros (mean, deg clamped to 1);
    # shards whose buckets are all padding still participate in the ring.
    n, d = 40, 4
    edges = np.array([[1, 2, 3], [0, 0, 0]])  # all edges into node 0
    x = np.random.default_rng(0).normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(8)
    out, _, _ = ring_sharded_aggregate(edges, x, n, mesh, reduce="mean")
    want = coo_spmm(jnp.asarray(edges[0]), jnp.asarray(edges[1]),
                    jnp.asarray(x), n, reduce="mean")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    assert np.allclose(np.asarray(out)[1:], 0.0)
