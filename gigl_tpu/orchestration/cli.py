"""Per-component CLI entry point.

Ref parity: every reference component is runnable as a module with
--job_name/--task_config_uri/--resource_config_uri args (e.g.
`python -m gigl.src.training.v1.lib.training_process`,
training_process.py:372); the KFP container ops invoke exactly these.
Here one CLI dispatches to the local Runner's stage functions, so the same
container image serves every pipeline component.

Usage:
    python -m gigl_tpu.orchestration.cli --component trainer \
        --job_name myjob --task_config_uri gs://.../template.yaml \
        [--working_dir /tmp/work] [--start_at X --stop_after Y]
"""

from __future__ import annotations

import argparse
import sys

from gigl_tpu.orchestration.runner import Component, PipelineConfig, Runner
from gigl_tpu.utils.logger import get_logger
from gigl_tpu.utils.metrics import initialize_metrics

logger = get_logger(__name__)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--component", required=True,
                   choices=[c.value for c in Component] + ["pipeline"],
                   help="component to run, or 'pipeline' for the full run")
    p.add_argument("--job_name", required=True)
    p.add_argument("--task_config_uri", required=True,
                   help="template (config_populator) or frozen config URI")
    p.add_argument("--resource_config_uri", default="")
    p.add_argument("--working_dir", default="/tmp/gigl_tpu_work")
    p.add_argument("--start_at", default=None)
    p.add_argument("--stop_after", default=None)
    p.add_argument("--metrics_cls_path", default=None)
    args = p.parse_args(argv)

    initialize_metrics(args.metrics_cls_path)
    runner = Runner(PipelineConfig(
        job_name=args.job_name,
        template_task_config_uri=args.task_config_uri,
        working_dir=args.working_dir,
    ))
    if args.component == "pipeline":
        runner.run(start_at=Component(args.start_at
                                      or Component.CONFIG_POPULATOR),
                   stop_after=(Component(args.stop_after)
                               if args.stop_after else None))
    else:
        comp = Component(args.component)
        runner.run(start_at=comp, stop_after=comp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
