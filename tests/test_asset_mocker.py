"""DatasetAssetMocker: versioned stage-artifact mocking (ref
dataset_asset_mocker.py + mocking/lib/versioning.py semantics)."""

import pytest

from gigl_tpu.data.asset_mocker import (
    DatasetAssetMocker,
    compute_mocked_dataset_version,
)
from gigl_tpu.data.mocking import TOY_GRAPH_NODE_ANCHOR_LP
from gigl_tpu.data.uri import UriFactory
from gigl_tpu.losses.metrics import EvalMetricsCollection


@pytest.fixture(scope="module")
def mocker(tmp_path_factory):
    root = tmp_path_factory.mktemp("mocked_assets")
    return DatasetAssetMocker(str(root))


class TestDatasetAssetMocker:
    def test_mock_assets_registers_versioned_artifacts(self, mocker):
        meta = mocker.mock_assets(TOY_GRAPH_NODE_ANCHOR_LP)
        assert meta.version == compute_mocked_dataset_version(
            TOY_GRAPH_NODE_ANCHOR_LP)
        assert UriFactory.create(meta.frozen_task_config_uri).exists()
        # Registry lookup round-trips.
        got = mocker.get_mocked_dataset_artifact_metadata(
            TOY_GRAPH_NODE_ANCHOR_LP)
        assert got.to_dict() == meta.to_dict()

    def test_remock_is_idempotent_per_version(self, mocker):
        a = mocker.mock_assets(TOY_GRAPH_NODE_ANCHOR_LP)
        b = mocker.mock_assets(TOY_GRAPH_NODE_ANCHOR_LP)
        assert a.working_dir == b.working_dir

    def test_consumer_can_start_pipeline_at_trainer(self, mocker):
        """The reference workflow: integration tests restart components
        against mocked stage outputs (SURVEY.md §4)."""
        from gigl_tpu.data.mocking import (
            MockedPreprocessorConfig,
            get_mocked_graph,
        )
        from gigl_tpu.orchestration.runner import (
            Component,
            PipelineConfig,
            Runner,
        )

        meta = mocker.mock_assets(TOY_GRAPH_NODE_ANCHOR_LP)
        runner = Runner(PipelineConfig(
            job_name=TOY_GRAPH_NODE_ANCHOR_LP,
            template_task_config_uri=meta.frozen_task_config_uri,
            working_dir=meta.working_dir,
            data_preprocessor_config=MockedPreprocessorConfig(
                get_mocked_graph(TOY_GRAPH_NODE_ANCHOR_LP)),
        ))
        frozen = runner.run(start_at=Component.TRAINER,
                            stop_after=Component.TRAINER)
        assert UriFactory.create(
            frozen.shared.trained_model_metadata_uri).exists()

    def test_unknown_handle_raises(self, mocker):
        with pytest.raises(KeyError):
            mocker.get_mocked_dataset_artifact_metadata("nope")


def test_eval_metrics_collection_kfp_json():
    c = EvalMetricsCollection({"mrr": 0.5})
    c.add("hits_at_10", 0.75)
    assert c["mrr"] == 0.5 and "hits_at_10" in c
    js = c.to_kfp_metrics_json()
    assert '"numberValue": 0.75' in js and '"name": "mrr"' in js
    assert EvalMetricsCollection.from_dict(c.to_dict()).to_dict() == c.to_dict()
