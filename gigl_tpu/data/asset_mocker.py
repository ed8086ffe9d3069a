"""Versioned mocked pipeline artifacts: DatasetAssetMocker parity.

Ref parity: `python/gigl/src/mocking/dataset_asset_mocker.py:28,447`
DatasetAssetMocker.mock_assets generates, for each named toy dataset, the
*outputs of every data-plane pipeline stage* (preprocessed assets, sampler
manifest, dataset splits, frozen config) and registers them under a version
stamp in `mocking/lib/mocked_dataset_artifact_metadata.json` (versioning:
`mocking/lib/versioning.py`); tests fetch artifacts by handle via
`get_mocked_dataset_artifact_metadata()` (SURVEY.md §2.6, §4).

TPU-native mapping: the stages are the local Runner's CONFIG_POPULATOR →
DATA_PREPROCESSOR → SUBGRAPH_SAMPLER → SPLIT_GENERATOR (training-input
boundary); consumers restart the pipeline at TRAINER against the recorded
frozen config — exactly the reference's "mocked inputs for component
integration tests" workflow.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from gigl_tpu.data import mocking
from gigl_tpu.data.uri import Uri, UriFactory

ARTIFACT_METADATA_FILENAME = "mocked_dataset_artifact_metadata.json"


def compute_mocked_dataset_version(name: str) -> str:
    """Deterministic version stamp: content hash of the mocked graph + its
    template config (ref versioning.py's semantic: artifacts are re-mocked
    when the generating code changes the data)."""
    g = mocking.get_mocked_graph(name)
    h = hashlib.sha256()
    h.update(name.encode())
    for et in sorted(g.edges, key=str):
        h.update(str(et).encode())
        h.update(g.edges[et].tobytes())
    for nt in sorted(g.node_features.features, key=str):
        h.update(str(nt).encode())
        h.update(np.ascontiguousarray(g.node_features[nt]).tobytes())
    # Labels and edge features are part of the dataset content too — a
    # label-only change must produce a new version (idempotent mock_assets
    # would otherwise serve stale artifacts).
    for nt in sorted(g.node_labels, key=str):
        h.update(str(nt).encode())
        h.update(np.ascontiguousarray(g.node_labels[nt]).tobytes())
    for ek in sorted(g.edge_features.features, key=str):
        h.update(str(ek).encode())
        h.update(np.ascontiguousarray(g.edge_features[ek]).tobytes())
    h.update(mocking.mocked_task_config(name).to_yaml().encode())
    return h.hexdigest()[:16]


@dataclass
class MockedDatasetArtifactMetadata:
    """One registry row (ref MockedDatasetArtifactMetadata)."""

    name: str
    version: str
    frozen_task_config_uri: str
    working_dir: str

    def to_dict(self) -> Dict[str, str]:
        return dict(self.__dict__)


class DatasetAssetMocker:
    """Generates + registers stage artifacts for the named mocked datasets.

    `mock_assets(name)` runs the data plane end-to-end into
    `<root>/<name>/<version>/` (skipping if that version already exists) and
    updates the JSON registry; `get_mocked_dataset_artifact_metadata()` is
    the test-side lookup.
    """

    def __init__(self, root_dir: str):
        self.root = UriFactory.create(root_dir)

    # -- registry --------------------------------------------------------------
    def _registry_uri(self) -> Uri:
        return self.root.join(ARTIFACT_METADATA_FILENAME)

    def _read_registry(self) -> Dict[str, Dict[str, str]]:
        uri = self._registry_uri()
        if not uri.exists():
            return {}
        return json.loads(uri.read_text())

    def _write_registry(self, reg: Dict[str, Dict[str, str]]) -> None:
        self._registry_uri().write_text(json.dumps(reg, indent=2, sort_keys=True))

    def get_mocked_dataset_artifact_metadata(
            self, name: str) -> MockedDatasetArtifactMetadata:
        reg = self._read_registry()
        if name not in reg:
            raise KeyError(
                f"No mocked assets registered for {name!r}; run "
                f"mock_assets({name!r}) first. Known: {sorted(reg)}")
        return MockedDatasetArtifactMetadata(**reg[name])

    # -- mocking ---------------------------------------------------------------
    def mock_assets(self, name: str,
                    force: bool = False) -> MockedDatasetArtifactMetadata:
        """Generate every data-plane stage output for `name` (idempotent per
        version; `force` re-mocks)."""
        from gigl_tpu.orchestration.runner import (
            Component,
            PipelineConfig,
            Runner,
        )

        version = compute_mocked_dataset_version(name)
        workdir = self.root.join(name, version)
        reg = self._read_registry()
        row = reg.get(name)
        if (row and row["version"] == version and not force
                and UriFactory.create(row["frozen_task_config_uri"]).exists()):
            return MockedDatasetArtifactMetadata(**row)

        g = mocking.get_mocked_graph(name)
        cfg = mocking.mocked_task_config(name)
        template = workdir.join("template_task_config.yaml")
        template.write_text(cfg.to_yaml())
        runner = Runner(PipelineConfig(
            job_name=name,
            template_task_config_uri=str(template),
            working_dir=str(workdir),
            data_preprocessor_config=mocking.MockedPreprocessorConfig(g),
        ))
        # Data plane only: everything the Trainer consumes.
        runner.run(stop_after=Component.SPLIT_GENERATOR)
        meta = MockedDatasetArtifactMetadata(
            name=name,
            version=version,
            frozen_task_config_uri=str(runner._frozen_uri()),
            working_dir=str(workdir),
        )
        reg[name] = meta.to_dict()
        self._write_registry(reg)
        return meta

    def mock_all(self, names: Optional[list] = None) -> Dict[str, str]:
        """Ref DatasetAssetMockingSuite: mock every named dataset."""
        out = {}
        for name in names or sorted(mocking._BUILDERS):
            out[name] = self.mock_assets(name).version
        return out
