"""Tests for config core: graph metadata, task config YAML round-trip,
populator freeze semantics, validation (ref test model: SURVEY.md §4 —
pb-wrapper + config-populator unit tests)."""

import pytest

from gigl_tpu.config.populator import ConfigPopulator
from gigl_tpu.config.task_config import (
    DatasetConfig,
    SamplingOp,
    SubgraphSamplingStrategy,
    TaskConfig,
)
from gigl_tpu.config.validation import ConfigValidationError, validate_task_config
from gigl_tpu.types.graph import EdgeType, GraphMetadata
from gigl_tpu.types.task import TaskMetadata, TaskMetadataType


def _hetero_metadata():
    return GraphMetadata(
        node_types=("user", "item"),
        edge_types=(
            EdgeType("user", "buys", "item"),
            EdgeType("item", "rev_buys", "user"),
        ),
    )


def _nalp_config(gm=None):
    gm = gm or _hetero_metadata()
    return TaskConfig(
        graph_metadata=gm,
        task_metadata=TaskMetadata(
            task_type=TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK,
            supervision_edge_types=(EdgeType("user", "buys", "item"),),
        ),
    )


class TestGraphMetadata:
    def test_condensed_maps_autopopulated_deterministic(self):
        gm = _hetero_metadata()
        assert gm.condensed_node_type_map == {0: "item", 1: "user"}
        assert gm.node_type_to_condensed["item"] == 0
        assert len(gm.condensed_edge_type_map) == 2
        # Deterministic: same input -> same maps.
        gm2 = _hetero_metadata()
        assert gm2.condensed_edge_type_map == gm.condensed_edge_type_map

    def test_unknown_node_type_in_edge_raises(self):
        with pytest.raises(ValueError, match="unknown node type"):
            GraphMetadata(
                node_types=("user",),
                edge_types=(EdgeType("user", "buys", "item"),),
            )

    def test_duplicate_types_raise(self):
        with pytest.raises(ValueError, match="Duplicate"):
            GraphMetadata(node_types=("a", "a"), edge_types=())

    def test_dict_round_trip(self):
        gm = _hetero_metadata()
        gm2 = GraphMetadata.from_dict(gm.to_dict())
        assert gm2 == gm

    def test_edge_type_str_round_trip(self):
        et = EdgeType("user", "buys", "item")
        assert EdgeType.from_str(str(et)) == et

    def test_homogeneous(self):
        gm = GraphMetadata.homogeneous()
        assert gm.is_homogeneous


class TestTaskConfigYaml:
    def test_yaml_round_trip(self):
        cfg = _nalp_config()
        cfg2 = TaskConfig.from_yaml(cfg.to_yaml())
        assert cfg2.to_dict() == cfg.to_dict()

    def test_save_load(self, tmp_path):
        cfg = _nalp_config()
        p = str(tmp_path / "cfg.yaml")
        cfg.save(p)
        assert TaskConfig.load(p).to_dict() == cfg.to_dict()


class TestConfigPopulator:
    def test_freeze_populates_paths(self, tmp_path):
        cfg = _nalp_config()
        pop = ConfigPopulator(job_name="job1", working_dir=str(tmp_path))
        frozen = pop.populate(cfg)
        assert frozen.shared.is_frozen
        assert frozen.shared.trained_model_metadata_uri.endswith(
            "trainer/trained_model_metadata.yaml"
        )
        assert "job1" in frozen.shared.preprocessed_metadata_uri
        # Template untouched.
        assert not cfg.shared.is_frozen

    def test_refreeze_raises(self, tmp_path):
        pop = ConfigPopulator("j", str(tmp_path))
        frozen = pop.populate(_nalp_config())
        with pytest.raises(ValueError, match="already frozen"):
            pop.populate(frozen)

    def test_run_writes_frozen_yaml(self, tmp_path):
        cfg = _nalp_config()
        template = str(tmp_path / "template.yaml")
        cfg.save(template)
        pop = ConfigPopulator("jobx", str(tmp_path / "work"))
        frozen_uri = pop.run(template)
        frozen = TaskConfig.load(str(frozen_uri))
        assert frozen.shared.is_frozen


class TestValidation:
    def test_valid_config_passes(self):
        ran = validate_task_config(_nalp_config())
        assert "supervision_edge_types_nonempty" in ran

    def test_missing_supervision_edge_types(self):
        cfg = TaskConfig(
            graph_metadata=_hetero_metadata(),
            task_metadata=TaskMetadata(
                task_type=TaskMetadataType.NODE_ANCHOR_BASED_LINK_PREDICTION_TASK
            ),
        )
        with pytest.raises(ConfigValidationError, match="supervision_edge_types"):
            validate_task_config(cfg)

    def test_sampling_dag_frontier_mismatch(self):
        gm = _hetero_metadata()
        cfg = _nalp_config(gm)
        # Root op samples in-edges of 'item' but root type is 'user' -> bad.
        cfg.dataset = DatasetConfig(
            sampling=SubgraphSamplingStrategy(
                message_passing_paths={
                    "user": [
                        SamplingOp(
                            op_name="hop1",
                            edge_type=EdgeType("user", "buys", "item"),
                            num_nodes_to_sample=10,
                            sampling_direction="INCOMING",
                        )
                    ]
                }
            )
        )
        with pytest.raises(ConfigValidationError, match="root sampling op"):
            validate_task_config(cfg)

    def test_sampling_dag_valid_chain(self):
        gm = _hetero_metadata()
        cfg = _nalp_config(gm)
        # user -(rev_buys INCOMING? )-: anchor of INCOMING op is dst side.
        # hop1: sample in-edges of user via item-rev_buys-user (dst=user).
        # hop2: sample in-edges of item via user-buys-item (dst=item), parent
        # frontier of hop1 is src side = item. OK.
        cfg.dataset = DatasetConfig(
            sampling=SubgraphSamplingStrategy(
                message_passing_paths={
                    "user": [
                        SamplingOp(
                            op_name="hop1",
                            edge_type=EdgeType("item", "rev_buys", "user"),
                            num_nodes_to_sample=10,
                        ),
                        SamplingOp(
                            op_name="hop2",
                            edge_type=EdgeType("user", "buys", "item"),
                            num_nodes_to_sample=5,
                            input_op_names=("hop1",),
                        ),
                    ]
                }
            )
        )
        ran = validate_task_config(cfg)
        assert "sampling_frontier_consistent" in ran

    def test_sampling_op_zero_fanout_raises(self):
        with pytest.raises(ValueError, match="num_nodes_to_sample"):
            SamplingOp(
                op_name="bad",
                edge_type=EdgeType("user", "buys", "item"),
                num_nodes_to_sample=0,
            )

    def test_bad_split_ratios(self):
        cfg = _nalp_config()
        cfg.dataset.split.train_ratio = 0.95
        cfg.dataset.split.val_ratio = 0.2
        with pytest.raises(ConfigValidationError, match="split_ratios"):
            validate_task_config(cfg)
