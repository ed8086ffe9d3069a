"""Config Populator: template config -> frozen config with all output URIs.

Ref parity: `python/gigl/src/config_populator/config_populator.py` —
`_populate_frozen_gbml_config_pb` (:507-559) takes the user's template
`GbmlConfig`, validates graph-metadata coherence (:429-505), fills condensed
type maps, populates every inter-stage output location into `SharedConfig`
(`__populate_flattened_graph_metadata_pb` :68-158 and the path constants in
`src/common/constants/gcs.py`), and writes the "frozen" YAML that every later
component consumes. Component restartability falls out of this: any stage can
be re-run against the same frozen config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

from gigl_tpu.config.task_config import TaskConfig
from gigl_tpu.data.uri import Uri, UriFactory


class ConfigPopulator:
    """Freezes a template TaskConfig by populating shared output paths."""

    def __init__(self, job_name: str, working_dir: Union[str, Uri]):
        self.job_name = job_name
        self.working_dir = UriFactory.create(working_dir)

    # Path layout mirrors the reference's GCS constants
    # (src/common/constants/gcs.py): one root per (job, stage).
    def _stage_uri(self, *parts: str) -> str:
        return str(self.working_dir.join(self.job_name, *parts))

    def populate(self, template: TaskConfig) -> TaskConfig:
        """Return a frozen copy of ``template`` with SharedConfig filled in.

        Raises if the template is already frozen (the reference's populator
        likewise refuses templates carrying sharedConfig,
        config_populator.py:601+ flow).
        """
        if template.shared.is_frozen:
            raise ValueError("Config is already frozen")
        # GraphMetadata validates itself (coherence checks, condensed maps) in
        # __post_init__ — re-construct to force population of condensed maps.
        frozen = dataclasses.replace(template)
        frozen.shared = dataclasses.replace(
            template.shared,
            preprocessed_metadata_uri=self._stage_uri(
                "data_preprocess", "preprocessed_metadata.yaml"
            ),
            flattened_graph_metadata_uri=self._stage_uri(
                "subgraph_sampler", "flattened_graph_metadata.yaml"
            ),
            dataset_metadata_uri=self._stage_uri(
                "split_generator", "dataset_metadata.yaml"
            ),
            trained_model_metadata_uri=self._stage_uri(
                "trainer", "trained_model_metadata.yaml"
            ),
            inference_metadata_uri=self._stage_uri(
                "inferencer", "inference_metadata.yaml"
            ),
            postprocessed_metadata_uri=self._stage_uri(
                "post_processor", "postprocessed_metadata.yaml"
            ),
            is_frozen=True,
        )
        return frozen

    def run(self, template_uri: Union[str, Uri]) -> Uri:
        """Read template YAML, freeze, write frozen YAML; returns its URI.

        Ref parity: ConfigPopulator.run (config_populator.py:601): read
        template (proto_utils.py:21), populate, write frozen (:561).
        """
        template = TaskConfig.load(str(template_uri))
        frozen = self.populate(template)
        frozen_uri = UriFactory.create(
            self._stage_uri("config_populator", "frozen_task_config.yaml")
        )
        frozen_uri.write_text(frozen.to_yaml())
        return frozen_uri
