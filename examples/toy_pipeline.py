"""End-to-end local pipeline on a mocked toy graph.

Runs all seven components (config populator → data preprocessor → subgraph
sampler → split generator → trainer → inferencer → post processor) locally,
the TPU-native analog of the reference's quick start
(docs/.../getting_started/quick_start.md).

Usage:  python examples/toy_pipeline.py [workdir]
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

import yaml

from gigl_tpu.data.mocking import (
    TOY_GRAPH_NODE_ANCHOR_LP,
    MockedPreprocessorConfig,
    get_mocked_graph,
    mocked_task_config,
)
from gigl_tpu.data.uri import UriFactory
from gigl_tpu.orchestration.runner import PipelineConfig, Runner


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    graph = get_mocked_graph(TOY_GRAPH_NODE_ANCHOR_LP)
    template_cfg = mocked_task_config(
        TOY_GRAPH_NODE_ANCHOR_LP, num_epochs=3, val_every_num_batches=3)
    template_uri = f"{workdir}/template_task_config.yaml"
    template_cfg.save(template_uri)

    runner = Runner(PipelineConfig(
        job_name="toy_e2e",
        template_task_config_uri=template_uri,
        working_dir=workdir,
        data_preprocessor_config=MockedPreprocessorConfig(graph),
    ))
    frozen = runner.run()

    trained = yaml.safe_load(UriFactory.create(
        frozen.shared.trained_model_metadata_uri).read_text())
    post = yaml.safe_load(UriFactory.create(
        frozen.shared.postprocessed_metadata_uri).read_text())
    print("eval metrics:", trained["eval_metrics"])
    print("exported rows:", post["num_rows"])
    print("artifacts under:", workdir)


if __name__ == "__main__":
    main()
