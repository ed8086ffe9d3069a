"""Probe the large-N locality cliff on the real chip (r4 VERDICT weak 2).

Builds the N=12M bench rung ONCE, then measures:
  1. full partitioned tabularized step, sort_gather_ids OFF (r4 baseline)
  2. full step, sort_gather_ids ON (the documented remedy, implemented)
  3. hydration-gather microbench (24,576 rows of the packed fused table,
     scan-difference timing): unsorted vs sorted
  4. sample-table expansion gather microbench: unsorted vs sorted

Prints one line per measurement; run manually (not part of bench.py).
"""

import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/repo")


def main(N=12_000_000, E=60_000_000, K=200):
    import dataclasses
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gigl_tpu.graph.csr import build_csr
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.models.link_prediction import (
        LinkPredictionDecoder,
        LinkPredictionGNN,
    )
    from gigl_tpu.parallel.mesh import make_mesh
    from gigl_tpu.training.dist_sampled import (
        PartitionedGraph,
        PartitionedNALPTrainer,
    )
    from gigl_tpu.training.trainer import NALPTrainerConfig

    D, B, R, FANOUTS = 128, 512, 512, (15, 10)
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E, dtype=np.int64)
    dst = rng.integers(0, N, E, dtype=np.int64)
    feats = rng.standard_normal((N, D), dtype=np.float32)
    csr = build_csr(src, dst, num_anchor_nodes=N, num_neighbor_nodes=N,
                    anchor="dst")
    msg = types.SimpleNamespace(indptr=csr.indptr, indices=csr.indices,
                                edge_weights=None)
    hostdg = types.SimpleNamespace(
        num_nodes=N, node_features=feats,
        degrees=np.diff(csr.indptr).astype(np.float32),
        message_csr=msg, supervision_csr=msg, hard_neg_csr=None,
        sup_edge_features=None, hard_neg_edge_features=None,
        node_labels=None)
    mesh = make_mesh(1, axes=("data",))
    t0 = time.perf_counter()
    pg = PartitionedGraph.build(hostdg, mesh, quantize_features=True)
    hostdg.node_features = None
    del feats, src, dst
    cfg = NALPTrainerConfig(fanouts=FANOUTS, num_random_negs=R,
                            loss_type="retrieval", num_positives=1,
                            cached_hop=True)
    enc = GNNEncoder(hid_dim=256, out_dim=D, num_layers=2,
                     conv="graphsage", dtype=jnp.bfloat16)
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    k1, k2 = FANOUTS
    per_step_edges = (2 * k1 + k1 * k2) * (B + B + R)

    def step_rate(trainer):
        state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)
        anchors = (np.arange(B * K).reshape(K, B) * 2654435761 % N).astype(
            np.int32)
        state, losses = trainer.train_steps(state, anchors,
                                            jax.random.PRNGKey(1))
        _ = float(np.asarray(losses)[-1])
        best = float("inf")
        for t in range(2):
            t1 = time.perf_counter()
            state, losses = trainer.train_steps(state, anchors,
                                                jax.random.PRNGKey(2 + t))
            _ = float(np.asarray(losses)[-1])
            best = min(best, (time.perf_counter() - t1) / K)
        del state
        return per_step_edges / best, best

    tr0 = PartitionedNALPTrainer(model, pg, mesh, cfg, capacity_factor=4.0,
                                 sort_gather_ids=False)
    pg_tab = tr0.pg
    tr0.pg_base = None
    del pg, hostdg
    print(f"# build+tabularize: {time.perf_counter() - t0:.1f}s",
          flush=True)

    eps0, dt0 = step_rate(tr0)
    print(f"step UNSORTED: {eps0/1e6:.1f}M edges/s ({dt0*1e3:.3f} ms/step)",
          flush=True)

    tr1 = PartitionedNALPTrainer(model, pg_tab, mesh, cfg,
                                 capacity_factor=4.0, sort_gather_ids=True)
    tr1.pg_base = None
    eps1, dt1 = step_rate(tr1)
    print(f"step SORTED:   {eps1/1e6:.1f}M edges/s ({dt1*1e3:.3f} ms/step) "
          f"-> {eps1/eps0:.2f}x", flush=True)

    # -- microbenches (scan-difference; fixed dispatch cancels) ----------
    def bench_gather(table, G, sort):
        ids_np = np.random.default_rng(3).integers(
            0, table.shape[0], G).astype(np.int32)
        ids = jax.device_put(ids_np, NamedSharding(mesh, P("data")))

        def make(n_iters):
            def many(t, i):
                def body(acc, j):
                    idx = jnp.clip(i + j, 0, t.shape[0] - 1)
                    if sort:
                        order = jnp.argsort(idx)
                        inv = jnp.argsort(order)
                        rows = t[idx[order]][inv]
                    else:
                        rows = t[idx]
                    return acc + rows[0, 0].astype(jnp.int32), None

                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                      jnp.arange(n_iters, dtype=jnp.int32))
                return acc

            return jax.jit(jax.shard_map(
                many, mesh=mesh, in_specs=(P("data"), P("data")),
                out_specs=P(), check_vma=False))

        f_small, f_big = make(100), make(200)
        _ = int(f_small(table, ids))
        _ = int(f_big(table, ids))
        best = float("inf")
        for _t in range(2):
            t1 = time.perf_counter()
            _ = int(f_small(table, ids))
            ts = time.perf_counter() - t1
            t1 = time.perf_counter()
            _ = int(f_big(table, ids))
            tb = time.perf_counter() - t1
            best = min(best, max(tb - ts, 1e-9) / 100)
        return best / G * 1e9

    G = 24576
    for sort in (False, True):
        ns = bench_gather(tr0.pg.feat_deg, G, sort)
        print(f"fused-table gather G={G} sorted={sort}: {ns:.2f} ns/row "
              f"(row {tr0.pg.feat_deg.shape[1]} B int8)", flush=True)
    tab = tr0.pg.sample_tables[tr0._tab_index[15]]
    for sort in (False, True):
        ns = bench_gather(tab, 1536, sort)
        print(f"sample-table gather G=1536 sorted={sort}: {ns:.2f} ns/row "
              f"(row {tab.shape[1]}x4 B)", flush=True)


if __name__ == "__main__":
    main()
