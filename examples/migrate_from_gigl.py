"""End-to-end migration from snap-research/GiGL artifacts.

Demonstrates the full interop path a migrating team follows — no
re-preprocessing, no conversion jobs:

  1. Load a reference GbmlConfig YAML (template or frozen, camelCase
     json_format keys) as a native TaskConfig.
  2. Read reference-format NodeAnchorBasedLinkPredictionSample TFRecords
     (the Subgraph Sampler's output), validate them with the
     TaskOutputValidator-parity checker, and assemble the deduped graph +
     NALP supervision arrays.
  3. Train the NALP model named by the config's trainerArgs on TPU.
  4. Export embeddings AND re-emit RootedNodeNeighborhood TFRecords in the
     reference wire format for downstream reference-stack consumers.

This script fabricates the "existing GiGL artifacts" first (stage 0) since
no real deployment is reachable from CI — the bytes are identical to what
the reference's ScalaPB writers produce (oracle-tested in
tests/test_gbml_interop.py).

Usage:  python examples/migrate_from_gigl.py [workdir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # The axon plugin registers itself as the default platform even when
    # JAX_PLATFORMS=cpu is exported; pin explicitly (as tests/conftest.py).
    import jax

    jax.config.update("jax_platform_name", "cpu")

import numpy as np
import yaml

import jax
import jax.numpy as jnp


def stage0_fabricate_gigl_artifacts(workdir: str):
    """Stand-in for an existing GiGL deployment's outputs."""
    from gigl_tpu.data import gbml

    rng = np.random.default_rng(0)
    n, d, clusters = 400, 16, 50
    # Clustered graph: positives inside a cluster (so MRR is learnable).
    cluster = rng.integers(0, clusters, n)
    feats = (np.eye(clusters)[cluster] @ rng.normal(size=(clusters, d))
             + 0.1 * rng.normal(size=(n, d))).astype(np.float32)
    samples = []
    for root in range(n):
        same = np.flatnonzero(cluster == cluster[root])
        same = same[same != root]
        pos = int(rng.choice(same))
        nbrs = rng.choice(same, size=min(6, len(same)), replace=False)
        node_ids = sorted(set(nbrs.tolist()) | {root, pos})
        samples.append(gbml.NodeAnchorBasedLinkPredictionSamplePb(
            root_node=gbml.GbmlNode(root, 0, feats[root]),
            pos_edges=[gbml.GbmlEdge(root, pos, 0)],
            hard_neg_edges=[gbml.GbmlEdge(
                root, int(rng.integers(0, n)), 0)],
            neighborhood=gbml.GbmlGraph(
                nodes=[gbml.GbmlNode(int(u), 0, feats[u])
                       for u in node_ids],
                edges=[gbml.GbmlEdge(int(u), root, 0) for u in nbrs]),
        ))
    # Hard-neg endpoints must exist in the neighborhood for the validator.
    for s in samples:
        ids = {nd.node_id for nd in s.neighborhood.nodes}
        for e in s.hard_neg_edges:
            if e.dst_node_id not in ids:
                s.neighborhood.nodes.append(gbml.GbmlNode(
                    e.dst_node_id, 0, feats[e.dst_node_id]))
    path = os.path.join(workdir, "nalp_samples.tfrecord")
    gbml.write_samples(path, samples)

    config = {
        "graphMetadata": {"nodeTypes": ["default"], "edgeTypes": [
            {"srcNodeType": "default", "relation": "to",
             "dstNodeType": "default"}]},
        "taskMetadata": {"nodeAnchorBasedLinkPredictionTaskMetadata": {
            "supervisionEdgeTypes": [{"srcNodeType": "default",
                                      "relation": "to",
                                      "dstNodeType": "default"}]}},
        "datasetConfig": {"subgraphSamplerConfig": {
            "numHops": 2, "numNeighborsToSample": 6,
            "numPositiveSamples": 1}},
        "trainerConfig": {
            "trainerClsPath": "gigl.src.common.modeling_task_specs."
                "NodeAnchorBasedLinkPredictionModelingTaskSpec",
            "trainerArgs": {"hid_dim": "32", "out_dim": "16",
                            "num_layers": "2",
                            "random_negative_sample_batch_size": "64",
                            "temperature": "0.1",
                            "num_epochs": "8",
                            "val_every_num_batches": "4",
                            "learning_rate": "0.01"}},
    }
    cfg_path = os.path.join(workdir, "gbml_task_config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return cfg_path, path


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    cfg_path, samples_path = stage0_fabricate_gigl_artifacts(workdir)
    print(f"[0] fabricated GiGL artifacts under {workdir}")

    # 1. Reference config -> TaskConfig (class paths remapped).
    from gigl_tpu.config.gbml_import import task_config_from_gbml_yaml
    cfg = task_config_from_gbml_yaml(cfg_path)
    print(f"[1] imported config: task={cfg.task_metadata.task_type.value} "
          f"fanouts={cfg.dataset.sampling.fanouts} "
          f"trainer={cfg.trainer.trainer_cls_path.rsplit('.', 1)[-1]}")

    # 2. Reference sample TFRecords -> validated graph + supervision.
    from gigl_tpu.data import gbml
    samples = list(gbml.read_samples(
        samples_path, gbml.NodeAnchorBasedLinkPredictionSamplePb))
    n_ok = gbml.validate_samples(samples, cfg.graph_metadata)
    graph, _ = gbml.hetero_graph_from_samples(samples, cfg.graph_metadata)
    sup = gbml.nalp_supervision_from_samples(samples, cfg.graph_metadata)
    et = cfg.graph_metadata.edge_types[0]
    print(f"[2] {n_ok} samples validated; graph: "
          f"{graph.num_nodes} nodes, {graph.num_total_edges} edges, "
          f"{sup[et]['pos_edges'].shape[1]} positives, "
          f"{sup[et]['hard_neg_edges'].shape[1]} hard negatives")

    # 3. Train with the config-named task spec (BaseTrainer contract).
    from gigl_tpu.utils.registry import import_obj
    graph.node_features  # features were hydrated from the sample protos
    spec_cls = import_obj(cfg.trainer.trainer_cls_path)
    spec = spec_cls()
    spec.init_model(cfg, graph=graph)
    metrics = spec.train()
    print(f"[3] trained: val MRR {metrics['mrr']:.3f} "
          f"hits@10 {metrics.get('hits@10', float('nan')):.3f}")
    assert metrics["mrr"] > 0.2, metrics

    # 4a. Embedding export (the Inferencer -> warehouse path).
    from gigl_tpu.data.export import EmbeddingExporter
    exp = EmbeddingExporter(os.path.join(workdir, "embeddings"))
    ids = np.arange(graph.num_nodes["default"])
    emb = spec.infer_batch(ids)
    exp.add_embeddings(ids, np.asarray(emb))
    shards = exp.flush()
    print(f"[4a] exported {len(ids)} embeddings -> {shards}")

    # 4b. Re-emit reference-format RootedNodeNeighborhood TFRecords from
    #     on-device sampling (for downstream reference consumers).
    from gigl_tpu.sampling.neighbor_sampler import DeviceCSR, sample_blocks
    csr = DeviceCSR.from_csr(graph.csr(et, "dst"))
    blocks = sample_blocks(csr, jnp.arange(32, dtype=jnp.int32), (6, 4))
    protos = gbml.sampled_blocks_to_rooted_neighborhoods(
        blocks, np.asarray(graph.node_features["default"]),
        condensed_node_type=0, condensed_edge_type=0)
    gbml.validate_samples(protos, cfg.graph_metadata)
    out = os.path.join(workdir, "rooted_neighborhoods.tfrecord")
    gbml.write_samples(out, protos)
    print(f"[4b] wrote {len(protos)} reference-format RNN samples -> {out}")
    print("migration path OK")


if __name__ == "__main__":
    main()
