"""GraphDB ingestion protocol, GraphSAGE template spec, example configs,
KFP metrics file (small parity surfaces)."""

import json

import numpy as np
import yaml

from gigl_tpu.config.task_config import TaskConfig
from gigl_tpu.data.ingestion import InMemoryIngestion, ingest_graph
from gigl_tpu.data.mocking import (
    HETEROGENEOUS_TOY_GRAPH,
    TOY_GRAPH_NODE_ANCHOR_LP,
    MockedPreprocessorConfig,
    get_mocked_graph,
    mocked_task_config,
)
from gigl_tpu.data.uri import UriFactory


class TestIngestionProtocol:
    def test_ingest_hetero_graph(self):
        g = get_mocked_graph(HETEROGENEOUS_TOY_GRAPH)
        ing = InMemoryIngestion()
        ingest_graph(ing, g)
        assert ing.prepared and ing.finalized
        assert set(ing.nodes) == {"author", "paper"}
        assert len(ing.nodes["paper"]["ids"]) == g.num_nodes["paper"]
        assert "labels" in ing.nodes["paper"]
        total_edges = sum(e.shape[1] for e in ing.edges.values())
        assert total_edges == g.num_total_edges


class TestGraphSageTemplateSpec:
    def test_defaults_applied_and_trains(self, tmp_path):
        from gigl_tpu.data.preprocessor import load_graph_from_metadata
        from gigl_tpu.training.task_specs import GraphSageTemplateTaskSpec

        g = get_mocked_graph(TOY_GRAPH_NODE_ANCHOR_LP)
        cfg = mocked_task_config(TOY_GRAPH_NODE_ANCHOR_LP, num_epochs=1)
        spec = GraphSageTemplateTaskSpec(hid_dim="32", out_dim="16")
        spec.init_model(cfg, graph=g)
        # Template default: margin loss + graphsage conv.
        assert spec.trainer.cfg.loss_type == "margin"
        metrics = spec.train()
        assert "mrr" in metrics


class TestExampleConfigs:
    def test_all_example_configs_load_and_validate(self):
        import glob

        from gigl_tpu.config.validation import validate_task_config

        paths = glob.glob("examples/configs/*.yaml")
        assert len(paths) >= 3
        for p in paths:
            cfg = TaskConfig.load(p)
            validate_task_config(cfg, start_at="trainer")

    def test_dblp_config_paths_resolve(self):
        from gigl_tpu.sampling.hetero_sampler import resolve_path

        cfg = TaskConfig.load(
            "examples/configs/dblp_hetero_nalp_task_config.yaml")
        mpp = cfg.dataset.sampling.message_passing_paths
        assert set(mpp) == {"paper", "author"}
        spec = resolve_path("paper", mpp["paper"])
        assert {s.name for s in spec} == {
            "authors", "cited", "coauthored", "cited_authors"}


class TestKfpMetricsFile:
    def test_trainer_stage_writes_kfp_metrics(self, tmp_path):
        from gigl_tpu.orchestration.runner import (
            Component,
            PipelineConfig,
            Runner,
        )

        g = get_mocked_graph(TOY_GRAPH_NODE_ANCHOR_LP)
        cfg = mocked_task_config(TOY_GRAPH_NODE_ANCHOR_LP, num_epochs=1)
        template = str(tmp_path / "t.yaml")
        cfg.save(template)
        runner = Runner(PipelineConfig(
            job_name="kfpm", template_task_config_uri=template,
            working_dir=str(tmp_path),
            data_preprocessor_config=MockedPreprocessorConfig(g)))
        frozen = runner.run(stop_after=Component.TRAINER)
        model_dir = UriFactory.create(
            frozen.shared.trained_model_metadata_uri).uri.rsplit("/", 1)[0]
        payload = json.loads(UriFactory.create(
            f"{model_dir}/kfp_metrics.json").read_text())
        names = {m["name"] for m in payload["metrics"]}
        assert "mrr" in names
        assert all("@" not in n for n in names)  # KFP-safe names
