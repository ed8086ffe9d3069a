"""Benchmark: NALP training-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: forward-aggregated edges per second per chip across the full
training step (sampling + anchor/positive/negative encoder passes + loss +
backward + optimizer) — the "SpMM aggregate" north star of BASELINE.md. The
reference publishes no numeric baseline (BASELINE.md: "no numeric benchmark
tables"), so vs_baseline is measured against BASELINE_EDGES_PER_S — the
XLA-path throughput of this framework's first working round-1 build on the
same chip (fixed constant so later kernel work shows as >1.0).

Measurement methodology: steps run as lax.scan chunks of K=2000 (one device
program per chunk — the remote device has a measured ~28 ms fixed
dispatch+sync round-trip per call, so small chunks overstate step time;
production training runs thousands of steps per host sync), and the sync
point fetches the final loss VALUE (block_until_ready alone does not flush
the remote device queue).

Config (matches the reference's MAG240M flagship recipe shape,
examples/MAG240M/task_config.yaml:26-62: 2 hops, fanout 15, main batch 512,
random-neg batch 512): GraphSAGE 2-layer, hid 256, D=128, fanouts (15,10),
retrieval loss. The deepest-hop aggregate is tabularized (gigl_tpu/ops/
hopcache.py — the reference v1 semantics of frozen precomputed samples;
measured 7.7x over live per-occurrence resampling, which is gather-bound).
Cache refresh (the analog of re-running the Subgraph Sampler) costs ~50 ms
at this scale and is excluded from the steady-state loop, matching v1
semantics where subgraphs are sampled once per job.

Round-2 step optimizations (each measured on the same chip):
  - bf16 compute dtype (fp32 params, MXU-native matmuls): ~5%.
  - fused feature+cache table (one row gather hydrates both layer-1
    inputs) + packed sample tables (-1 sentinels instead of a separate
    bool-mask gather): ~2-9% — gather cost is near width-insensitive, so
    halving gather COUNT is what pays, not narrowing rows.
  - K=2000 scan chunks (28 ms fixed dispatch round-trip amortized to
    14 us/step; production jobs run thousands of steps per host sync).
"""

import json
import sys
import time

import numpy as np

# Round-1 first-light measurement on TPU v5 lite (XLA live-sampling path,
# batch 512, fanouts (15,10), D=128): 45.96M edges/s with honest value-sync.
# Later work (hop caching, scan chunking, kernel fusion) measures against it.
BASELINE_EDGES_PER_S = 4.5956e7


def bench_partitioned(model, dg, base_cfg, B, R, FANOUTS, K=2000):
    """Partitioned (scale-path) tabularized step on a 1-chip mesh.

    The all_to_all collectives degenerate on one chip, so this measures the
    per-step overhead the routed design adds ON TOP of the replicated fast
    path (id bucketing sort + un-permute + degenerate collectives); the
    cross-chip byte cost rides ICI on real pods. Printed as a secondary
    JSON line.

    K MUST match the flagship's scan-chunk length: the ~28 ms fixed
    dispatch+sync round trip is 14 us/step at K=2000 but 93 us/step at
    the K=300 this bench used through round 3 — which alone accounted
    for roughly half of the reported "partitioned tax" (the r3
    frac_of_replicated 0.64 band mixes methodology bias with real
    routing overhead)."""
    import dataclasses
    import jax

    from gigl_tpu.parallel.mesh import make_mesh
    from gigl_tpu.training.dist_sampled import (
        PartitionedGraph,
        PartitionedNALPTrainer,
    )

    mesh = make_mesh(1, axes=("data",))
    cfg = dataclasses.replace(base_cfg, cached_hop=True, fused_cache=False)
    pg = PartitionedGraph.build(dg, mesh)
    trainer = PartitionedNALPTrainer(model, pg, mesh, cfg,
                                     capacity_factor=4.0)
    state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)
    N = dg.num_nodes
    anchors = (np.arange(B * K).reshape(K, B) % N).astype(np.int32)
    state, losses = trainer.train_steps(state, anchors,
                                        jax.random.PRNGKey(1))
    _ = float(np.asarray(losses)[-1])  # warmup + full sync
    best_dt = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        state, losses = trainer.train_steps(state, anchors,
                                            jax.random.PRNGKey(2 + trial))
        _ = float(np.asarray(losses)[-1])
        best_dt = min(best_dt, (time.perf_counter() - t0) / K)
    k1, k2 = FANOUTS
    per_root = 2 * k1 + k1 * k2
    roots = B + B * cfg.num_positives + R
    return per_root * roots / best_dt


def bench_routed_gather_us(dg, G=8192, D=129):
    """Routed-lookup microbench: us per routed_gather call and ns/row on
    a 1-chip mesh (isolates the routing overhead: counting-sort bucket
    scatter + two degenerate all_to_alls + un-permute).

    Methodology: the remote device has a ~28 ms fixed dispatch+sync round
    trip per program; through round 3 this bench spread it over only 50
    calls (~560 us/call of pure bias — the dominant part of the reported
    number!). Now two scan programs of 250 and 500 calls are timed and
    the DIFFERENCE taken, so the fixed round trip cancels exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gigl_tpu.parallel.feature_lookup import routed_gather
    from gigl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, axes=("data",))
    n = dg.num_nodes
    table = jax.device_put(
        np.random.default_rng(0).normal(size=(n, D)).astype(np.float32),
        NamedSharding(mesh, P("data")))
    ids = jax.device_put(
        np.random.default_rng(1).integers(0, n, G).astype(np.int32),
        NamedSharding(mesh, P("data")))

    def make(n_iters):
        def many(t, i):
            # force_general: measure the GENERAL routing path (bucketing
            # + collectives), not the num_shards==1 closed form the
            # trainers take on one chip. Scan keeps the program small.
            def body(acc, j):
                v, _ok = routed_gather(t, i + j % 3, axis="data",
                                       capacity_factor=2.0,
                                       force_general=True)
                return acc + v[0, 0], None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(n_iters, dtype=jnp.int32))
            return acc

        return jax.jit(jax.shard_map(
            many, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P(), check_vma=False))

    f_small, f_big = make(250), make(500)
    _ = float(f_small(table, ids))  # compile + sync
    _ = float(f_big(table, ids))
    t_small = t_big = float("inf")
    for _trial in range(2):
        t0 = time.perf_counter()
        _ = float(f_small(table, ids))
        t_small = min(t_small, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = float(f_big(table, ids))
        t_big = min(t_big, time.perf_counter() - t0)
    dt = max(t_big - t_small, 1e-9) / 250
    return dt * 1e6, dt / G * 1e9


def bench_largeN(K=1000, N=12_000_000, E=60_000_000):
    """Large-N single-chip rung: N=12M nodes / E=60M edges / D=128 with
    the int8-packed fused table — the largest shape that reliably fits
    one v5e's HBM alongside the trainer state (20M brushes the HBM limit
    and OOMs with the state resident). MAG240M is 244M rows — 20x this.

    ALWAYS run in its own subprocess (main() does), for two measured
    reasons (docs/performance.md "Large-N: the r4 cliff was process
    contamination"): (1) an OOM here poisons every later multi-GB
    allocation in the process; (2) big programs/buffers compiled EARLIER
    in the same process inflate this step 3-6x (r4's 87.6M edges/s "10x
    locality cliff" was exactly this — in a fresh process the 12M step
    is ~0.5 ms, within ~25-30% of the 100k step; the residual is
    hydration cache misses, ~3.5 -> ~10 ns/row fwd+bwd). K=1000
    amortizes the ~28 ms dispatch round trip to 28 us/step.

    Returns (edges_per_s, edges_per_s_sorted, gather_ns_per_row) — the
    partitioned P=1 tabularized trainer step (default, unsorted
    hydration) and with sorted-id hydration (the r4-documented locality
    remedy — MEASURED NEGATIVE, 0.80x, kept as the before/after
    evidence; docs/performance.md), plus a plain 8192-row gather on the
    packed table."""
    import dataclasses
    import time as _t
    import types

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

    D = 128
    B, R = 512, 512
    FANOUTS = (15, 10)
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
    t0 = _t.perf_counter()
    pg = PartitionedGraph.build(hostdg, mesh, quantize_features=True)
    hostdg.node_features = None  # actually frees the ~10 GB fp32 array
    del feats, src, dst
    cfg = NALPTrainerConfig(fanouts=FANOUTS, num_random_negs=R,
                            loss_type="retrieval", num_positives=1,
                            cached_hop=True)
    enc = GNNEncoder(hid_dim=256, out_dim=D, num_layers=2,
                     conv="graphsage", dtype=jnp.bfloat16)
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    trainer = PartitionedNALPTrainer(model, pg, mesh, cfg,
                                     capacity_factor=4.0)
    # Free the pre-tabularization base table (~N x 136 B int8): the
    # trainer keeps it only for refresh_cache, which this bench never
    # calls — at this N that is ~1.6 GB of HBM back.
    trainer.pg_base = None
    pg_tab = trainer.pg
    del pg, hostdg
    print(f"# largeN build+tabularize: {_t.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    anchors = (np.arange(B * K).reshape(K, B) * 2654435761 % N).astype(
        np.int32)
    k1, k2 = FANOUTS
    per_step_edges = (2 * k1 + k1 * k2) * (B + B + R)

    def rate(tr):
        state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)
        state, losses = tr.train_steps(state, anchors,
                                       jax.random.PRNGKey(1))
        _ = float(np.asarray(losses)[-1])
        best_dt = float("inf")
        for trial in range(2):
            t1 = _t.perf_counter()
            state, losses = tr.train_steps(state, anchors,
                                           jax.random.PRNGKey(2 + trial))
            _ = float(np.asarray(losses)[-1])
            best_dt = min(best_dt, (_t.perf_counter() - t1) / K)
        del state
        return per_step_edges / best_dt

    edges_per_s = rate(trainer)
    # Before/after evidence for the r4-documented "sorted hydration"
    # locality remedy (measured NEGATIVE; same build, recompile only).
    tr_sorted = PartitionedNALPTrainer(model, pg_tab, mesh, cfg,
                                       capacity_factor=4.0,
                                       sort_gather_ids=True)
    tr_sorted.pg_base = None
    edges_per_s_sorted = rate(tr_sorted)
    del tr_sorted

    # Plain-gather locality at 20M rows: scan programs of 250/500
    # 8192-row gathers of the packed int8 table, timed by DIFFERENCE so
    # the fixed dispatch round trip cancels (see bench_routed_gather_us).
    table = trainer.pg.feat_deg
    ids = jax.device_put(
        (np.random.default_rng(3).integers(0, N, 8192)).astype(np.int32),
        NamedSharding(mesh, P("data")))

    def make(n_iters):
        def many(t, i):
            def body(acc, j):
                rows = t[jnp.clip(i + j, 0, t.shape[0] - 1)]
                return acc + rows[0, 0].astype(jnp.int32), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(n_iters, dtype=jnp.int32))
            return acc

        return jax.jit(jax.shard_map(many, mesh=mesh,
                                     in_specs=(P("data"), P("data")),
                                     out_specs=P(), check_vma=False))

    f_small, f_big = make(250), make(500)
    _ = int(f_small(table, ids))
    _ = int(f_big(table, ids))
    t0 = _t.perf_counter()
    _ = int(f_small(table, ids))
    t_small = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    _ = int(f_big(table, ids))
    t_big = _t.perf_counter() - t0
    ns_row = max(t_big - t_small, 1e-9) / 250 / 8192 * 1e9
    return edges_per_s, edges_per_s_sorted, ns_row


def _flagship_model_cfg(D=128, R=512, FANOUTS=(15, 10)):
    import jax.numpy as jnp

    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.models.link_prediction import (
        LinkPredictionDecoder,
        LinkPredictionGNN,
    )
    from gigl_tpu.training.trainer import NALPTrainerConfig

    enc = GNNEncoder(hid_dim=256, out_dim=D, num_layers=2,
                     conv="graphsage", dtype=jnp.bfloat16)
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    cfg = NALPTrainerConfig(fanouts=FANOUTS, num_random_negs=R,
                            loss_type="retrieval", num_positives=1,
                            cached_hop=True)
    return model, cfg


def _streamed_partitioned_rate(trainer, N, B, K, warm=8):
    """Steady-state pipelined rate + a per-phase breakdown of ONE step.

    The breakdown splits the un-pipelined step into: plan (device program
    + the request-id D2H), host_gather (owner-side fused-row gather in
    host RAM), apply (answer H2D + device program + loss sync). On this
    tunneled single-chip setup each device sync pays the ~28 ms fixed
    dispatch round trip, so the breakdown phases OVERSTATE a directly
    PCIe-attached host; the pipelined rate amortizes most of it (plan
    t+1 and the host gather run while apply t executes)."""
    import time as _t

    import jax

    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    batches = rng.integers(0, N, (warm, B)).astype(np.int32)
    state, _ = trainer.run_steps(state, batches, jax.random.PRNGKey(1))
    k_batches = rng.integers(0, N, (K, B)).astype(np.int32)
    best_dt = float("inf")
    for trial in range(2):
        t0 = _t.perf_counter()
        state, losses = trainer.run_steps(state, k_batches,
                                          jax.random.PRNGKey(2 + trial),
                                          start_step=warm + trial * K)
        best_dt = min(best_dt, (_t.perf_counter() - t0) / K)
    # Un-pipelined single-step phase breakdown (private APIs, mirrors
    # train_step's structure).
    a = k_batches[0]
    breakdown = {"plan_ms": [], "host_gather_ms": [], "apply_ms": []}
    rng_put = trainer._put(np.asarray(jax.random.PRNGKey(9)))
    for _i in range(3):
        t0 = _t.perf_counter()
        plan_out = trainer._plan_step(a, 10_000 + _i)
        jax.block_until_ready(plan_out)
        recv_np = {int(sh.index[0].start or 0): np.asarray(sh.data)
                   for sh in plan_out[0].addressable_shards}
        t1 = _t.perf_counter()
        p = trainer.num_shards
        blocks = {start // p: trainer._answer_cast(
                      trainer.host.answer_shard(start // p, ids))
                  for start, ids in recv_np.items()}
        t2 = _t.perf_counter()
        sharding = trainer._NS(trainer.mesh,
                               trainer._P(trainer.axis, None, None))
        ans = jax.make_array_from_callback(
            (p * p, trainer.capacity, trainer.host.width), sharding,
            lambda idx: blocks[int(idx[0].start or 0) // p])
        state, loss, _ovf = trainer._apply(
            state, ans, *plan_out[1:], rng_put)
        _ = float(loss)
        t3 = _t.perf_counter()
        breakdown["plan_ms"].append((t1 - t0) * 1e3)
        breakdown["host_gather_ms"].append((t2 - t1) * 1e3)
        breakdown["apply_ms"].append((t3 - t2) * 1e3)
    bd = {k: round(min(v), 2) for k, v in breakdown.items()}
    bd["unpipelined_ms"] = round(sum(min(v) for v in
                                     breakdown.values()), 2)
    bd["pipelined_ms"] = round(best_dt * 1e3, 2)
    return best_dt, bd


def bench_streamed_partitioned(N=100_000, E=2_000_000, K=40):
    """Beyond-HBM path at the flagship bench shape (r4 VERDICT item 1):
    the streamed-PARTITIONED step (per-shard HOST fused table, device HBM
    holds only adjacency ints) vs the HBM-resident partitioned row. One
    chip: the all_to_alls degenerate; the HOST round trip (request-id
    D2H, fused-row gather in host RAM, answer H2D) is the measured cost
    on top of the HBM step. fp32 answers (exact parity contract) headline;
    bf16 answers (halved payload) reported alongside."""
    import jax

    from gigl_tpu.parallel.mesh import make_mesh
    from gigl_tpu.training.streaming import HostGraphStore
    from gigl_tpu.training.streaming_partitioned import (
        StreamingPartitionedNALPTrainer,
    )

    D, B, R, FANOUTS = 128, 512, 512, (15, 10)
    model, cfg = _flagship_model_cfg(D, R, FANOUTS)
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    edges = np.stack([src, dst])
    store = HostGraphStore.build(
        message_edges=edges, supervision_edges=edges,
        features=rng.normal(size=(N, D)).astype(np.float32),
        num_nodes=N, fanouts=FANOUTS, seed=0)
    mesh = make_mesh(1, axes=("data",))
    out = {}
    k1, k2 = FANOUTS
    per_step_edges = (2 * k1 + k1 * k2) * (B + B + R)
    for dtype in ("float32", "bfloat16"):
        tr = StreamingPartitionedNALPTrainer(
            model, store, mesh, cfg, batch_size=B,
            capacity_factor=1.0,  # P=1: capacity == union, exact fit
            overflow_policy="raise", answer_dtype=dtype)
        dt, bd = _streamed_partitioned_rate(tr, N, B, K)
        out[dtype] = (per_step_edges / dt, bd)
        del tr
    return out


def bench_streamed_largen(K=30, N=30_000_000, E=150_000_000):
    """Beyond-HBM LARGE-N rung (r4 VERDICT item 1): the fused
    [feat|deg|agg] table (~31 GB fp32 at N=30M, D=128) lives in HOST RAM
    — past this chip's 16 GB HBM ceiling, the regime the streamed-
    partitioned trainer exists for (MAG240M: 244M rows, ~8x this rung).
    Device HBM holds only the frozen sample table + supervision CSR
    (~2.5 GB of ints).

    Build shortcut (documented, timing-only): topology, CSR, frozen
    sample tables and degrees are REAL (native C++ sampler); the fused
    table's feature/aggregate VALUES are a tiled random block instead of
    the 230 GB host hop-aggregate precompute (2-vCPU box; value-
    independent timing — real nonzero bytes on distinct pages, so host
    gather + PCIe cost is faithful). bf16 answers (the production choice
    at this scale — halves the answer payload).

    ALWAYS run in its own subprocess: the ~37 GB host working set should
    not outlive the measurement."""
    import time as _t

    import jax

    from gigl_tpu.graph.csr import build_csr
    from gigl_tpu.parallel.mesh import make_mesh
    from gigl_tpu.training.streaming import HostGraphStore, _HostTable
    from gigl_tpu.training.streaming_partitioned import (
        ShardedHostStore,
        StreamingPartitionedNALPTrainer,
    )

    D, B, R, FANOUTS = 128, 512, 512, (15, 10)
    model, cfg = _flagship_model_cfg(D, R, FANOUTS)
    t0 = _t.perf_counter()
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E, dtype=np.int64)
    dst = rng.integers(0, N, E, dtype=np.int64)
    csr = build_csr(src, dst, num_anchor_nodes=N, num_neighbor_nodes=N,
                    anchor="dst")
    del src, dst
    degrees = np.diff(csr.indptr).astype(np.float32)
    store = HostGraphStore(
        message_indptr=csr.indptr.astype(np.int64),
        message_indices=csr.indices.astype(np.int32),
        supervision_indptr=csr.indptr.astype(np.int64),
        supervision_indices=csr.indices.astype(np.int32),
        features=_HostTable(np.zeros((1, D), np.float32)),  # dim only
        agg=_HostTable(np.zeros((1, D), np.float32)),
        degrees=degrees, sample_tables={}, num_nodes=N)
    # Frozen sample tables: REAL draws from the real CSR (native C++).
    for k in sorted(set(int(x) for x in FANOUTS[:-1])):
        ids_t = np.empty((N, k), np.int32)
        mask_t = np.empty((N, k), bool)
        chunk = 1 << 20
        for s in range(0, N, chunk):
            ids = np.arange(s, min(s + chunk, N), dtype=np.int32)
            ids_t[s: s + len(ids)], mask_t[s: s + len(ids)] = (
                store._sample(ids, k, 0, 1))
        store.sample_tables[k] = (ids_t, mask_t)
    # Fused host table: [feat D | deg | agg D] fp32 — values tiled from
    # one random block (see docstring), degrees REAL.
    w = 2 * D + 1
    fused = np.empty((N, w), np.float32)
    block = np.random.default_rng(1).standard_normal(
        (1 << 16, w)).astype(np.float32)
    for s in range(0, N, 1 << 16):
        e = min(s + (1 << 16), N)
        fused[s:e] = block[: e - s]
    fused[:, D] = degrees
    host = ShardedHostStore(fused, rows_per_shard=N, local_shards=[0])
    print(f"# streamed-largeN build: {_t.perf_counter() - t0:.1f}s "
          f"(fused {fused.nbytes / 1e9:.1f} GB host-resident)",
          file=sys.stderr)
    mesh = make_mesh(1, axes=("data",))
    tr = StreamingPartitionedNALPTrainer(
        model, store, mesh, cfg, batch_size=B, capacity_factor=1.0,
        overflow_policy="raise", host_store=host,
        answer_dtype="bfloat16")
    dt, bd = _streamed_partitioned_rate(tr, N, B, K, warm=4)
    k1, k2 = FANOUTS
    return (2 * k1 + k1 * k2) * (B + B + R) / dt, bd


def _rung_subprocess(args, tries):
    """Run one bench rung per fresh subprocess (a RESOURCE_EXHAUSTED
    poisons every later multi-GB allocation in a process, and the child
    must own the chip alone) and return the child's final JSON line."""
    import subprocess

    for extra in tries:
        cmd = [sys.executable, __file__] + args + [str(x) for x in extra]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"# rung {args} {extra} timed out", file=sys.stderr)
            continue
        sys.stderr.write(r.stderr)
        lines = [ln for ln in r.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if r.returncode == 0 and lines:
            return lines[-1]
        print(f"# rung {args} {extra} failed rc={r.returncode}",
              file=sys.stderr)
    return None


def main():
    # Subprocess rungs FIRST, before this process touches the chip: each
    # rung owns a pristine device and its host RAM dies with the child
    # (r4 ADVICE items 1-2; r4 VERDICT weak 1: the in-process ladder
    # contaminated the flagship row by ~9%).
    if "--largen" in sys.argv:
        i = sys.argv.index("--largen")
        n, e = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        eps, eps_sorted, ns_row = bench_largeN(N=n, E=e)
        print(json.dumps({
            "metric": "partitioned_tabularized_edges_per_s_largeN",
            "value": round(eps, 1),
            "unit": "edges/s",
            "n_nodes": n,
            "edges_per_s_sorted_hydration": round(eps_sorted, 1),
            "gather_ns_per_row_packed_table": round(ns_row, 3),
            "vs_baseline": round(eps / BASELINE_EDGES_PER_S, 4),
        }))
        return
    if "--streamed-largen" in sys.argv:
        i = sys.argv.index("--streamed-largen")
        n, e = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        eps, bd = bench_streamed_largen(N=n, E=e)
        print(json.dumps({
            "metric": "streamed_partitioned_edges_per_s_largeN",
            "value": round(eps, 1),
            "unit": "edges/s",
            "n_nodes": n,
            "host_resident_gb": round(n * (2 * 128 + 1) * 4 / 1e9, 1),
            "breakdown_ms": bd,
            "vs_baseline": round(eps / BASELINE_EDGES_PER_S, 4),
        }))
        return

    # Print each rung line as soon as its subprocess returns (a later
    # failure or driver timeout then still leaves the rungs on record);
    # the flagship line stays LAST (the driver records the final line).
    largen_line = _rung_subprocess(
        ["--largen"], [(12_000_000, 60_000_000), (6_000_000, 30_000_000)])
    if largen_line is not None:
        print(largen_line, flush=True)
    sp_largen_line = _rung_subprocess(
        ["--streamed-largen"],
        [(30_000_000, 150_000_000), (20_000_000, 100_000_000)])
    if sp_largen_line is not None:
        print(sp_largen_line, flush=True)

    import jax
    import jax.numpy as jnp

    from gigl_tpu.graph.csr import HeteroGraph
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.models.link_prediction import (
        LinkPredictionDecoder,
        LinkPredictionGNN,
    )
    from gigl_tpu.training.dataset import DeviceGraph
    from gigl_tpu.training.trainer import NALPTrainer, NALPTrainerConfig

    N, E, D = 100_000, 2_000_000, 128
    B, R = 512, 512
    FANOUTS = (15, 10)
    HID = 256
    K = 2000  # steps per scan chunk (amortizes the fixed dispatch round-trip)

    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    g = HeteroGraph.homogeneous(
        src=src, dst=dst, num_nodes=N,
        node_features=rng.normal(size=(N, D)).astype(np.float32))
    dg = DeviceGraph.from_hetero(g, supervision_edges=np.stack([src, dst]))

    enc = GNNEncoder(hid_dim=HID, out_dim=D, num_layers=2, conv="graphsage",
                     dtype=jnp.bfloat16)
    model = LinkPredictionGNN(encoder=enc, decoder=LinkPredictionDecoder())
    cfg = NALPTrainerConfig(fanouts=FANOUTS, num_random_negs=R,
                            loss_type="retrieval", num_positives=1,
                            cached_hop=True, fused_cache=True)
    trainer = NALPTrainer(model, dg, cfg,
                          optimizer_args={"learning_rate": "1e-3"})
    state = trainer.init_state(jax.random.PRNGKey(0), batch_size=B)

    anchors = (np.arange(B * K).reshape(K, B) % N).astype(np.int32)

    # Warmup (compile) + full sync via value fetch.
    state, losses = trainer.train_steps(state, anchors, jax.random.PRNGKey(1))
    _ = float(np.asarray(losses)[-1])

    best_dt = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        state, losses = trainer.train_steps(
            state, anchors, jax.random.PRNGKey(2 + trial))
        _ = float(np.asarray(losses)[-1])
        best_dt = min(best_dt, (time.perf_counter() - t0) / K)

    # Forward-aggregated edges per step: each encode of M roots with
    # fanouts (k1, k2) aggregates M*k1 (layer1@d0) + M*k1*k2 (layer1@d1)
    # + M*k1 (layer2@d0) edges. Encodes: anchors B, positives B, negs R.
    k1, k2 = FANOUTS
    per_root = 2 * k1 + k1 * k2
    roots = B + B * cfg.num_positives + R
    edges_per_step = per_root * roots
    edges_per_s = edges_per_step / best_dt

    # Secondary metrics first; the flagship line is printed LAST (the
    # driver records the final JSON line).
    us_call, ns_row = bench_routed_gather_us(dg)
    print(json.dumps({
        "metric": "routed_gather_general_path_us_per_call_1chip",
        "value": round(us_call, 2),
        "unit": "us",
        "ns_per_row": round(ns_row, 3),
        "vs_baseline": 0.0,
    }))
    part_edges_per_s = bench_partitioned(model, dg, cfg, B, R, FANOUTS)
    print(json.dumps({
        "metric": "partitioned_nalp_train_edges_per_s_per_chip",
        "value": round(part_edges_per_s, 1),
        "unit": "edges/s",
        "frac_of_replicated": round(part_edges_per_s / edges_per_s, 4),
        "vs_baseline": round(part_edges_per_s / BASELINE_EDGES_PER_S, 4),
    }))
    # Beyond-HBM path at the flagship shape (host fused table + routed
    # device lookups) vs the HBM-partitioned row just measured.
    sp = bench_streamed_partitioned()
    sp_f32, bd_f32 = sp["float32"]
    sp_bf16, bd_bf16 = sp["bfloat16"]
    print(json.dumps({
        "metric": "streamed_partitioned_nalp_edges_per_s",
        "value": round(sp_f32, 1),
        "unit": "edges/s",
        "frac_of_hbm_partitioned": round(sp_f32 / part_edges_per_s, 4),
        "bf16_answers_edges_per_s": round(sp_bf16, 1),
        "breakdown_ms": bd_f32,
        "breakdown_ms_bf16": bd_bf16,
        "vs_baseline": round(sp_f32 / BASELINE_EDGES_PER_S, 4),
    }))
    print(json.dumps({
        "metric": "nalp_train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
