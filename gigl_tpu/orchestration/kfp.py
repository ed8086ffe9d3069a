"""Cloud orchestration adapters: KFP pipeline compiler + Vertex-AI-style
job launcher.

Ref parity: `python/gigl/orchestration/kubeflow/kfp_orchestrator.py:40-164`
(compile/run/wait_for_completion), the KFP DAG builder
(`kfp_pipeline.py:126-236`, one container op per component wired by
start_at/stop_after), and `common/services/vertex_ai.py:140-236`
VertexAIService.launch_job (CustomJob with leader + worker pools).

This environment has no GCP access; the adapters are functional up to the
submission boundary: ``compile()`` produces a complete, serializable
pipeline spec (the artifact the reference uploads), and ``run()`` requires
the optional cloud SDKs, raising a clear error otherwise. The local Runner
(gigl_tpu.orchestration.runner) executes the same stage sequence
in-process.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import yaml

from gigl_tpu.orchestration.runner import ORDER, Component
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)

DEFAULT_IMAGE = "gigl-tpu:latest"


@dataclass
class ComponentSpec:
    """One pipeline stage -> container invocation (ref kfp_pipeline.py's
    per-component container ops)."""

    name: str
    image: str
    command: List[str]
    machine_type: str = "n1-standard-8"
    accelerator_type: Optional[str] = None  # e.g. "TPU_V5E"
    accelerator_count: int = 0
    depends_on: List[str] = field(default_factory=list)


class KfpOrchestrator:
    """Compiles the component sequence into a pipeline spec; submission
    needs the kfp SDK + a Vertex AI endpoint (ref kfp_orchestrator.py:106
    compiles then creates a VAI PipelineJob)."""

    def __init__(self, image: str = DEFAULT_IMAGE):
        self.image = image

    def compile(
        self,
        job_name: str,
        template_task_config_uri: str,
        resource_config_uri: str = "",
        start_at: Component = Component.CONFIG_POPULATOR,
        stop_after: Optional[Component] = None,
        machine_overrides: Optional[Dict[str, str]] = None,
    ) -> Dict:
        """Build the DAG spec: a linear chain gated by start_at/stop_after
        (ref kfp_pipeline.py:126-236)."""
        start_idx = ORDER.index(Component(start_at))
        stop_idx = (ORDER.index(Component(stop_after)) if stop_after
                    else len(ORDER) - 1)
        overrides = machine_overrides or {}
        comps: List[ComponentSpec] = []
        prev: Optional[str] = None
        for comp in ORDER[start_idx: stop_idx + 1]:
            name = comp.value
            spec = ComponentSpec(
                name=name,
                image=self.image,
                command=[
                    "python", "-m", "gigl_tpu.orchestration.cli",
                    "--component", name,
                    "--job_name", job_name,
                    "--task_config_uri", template_task_config_uri,
                    "--resource_config_uri", resource_config_uri,
                ],
                machine_type=overrides.get(name, "n1-standard-8"),
                depends_on=[prev] if prev else [],
            )
            if comp in (Component.TRAINER, Component.INFERENCER):
                spec.accelerator_type = "TPU_V5E"
                spec.accelerator_count = 1
            comps.append(spec)
            prev = name
        return {
            "pipeline_name": f"gigl-tpu-{job_name}",
            "components": [vars(c) for c in comps],
        }

    def compile_to_file(self, path: str, **kwargs) -> Dict:
        spec = self.compile(**kwargs)
        validate_pipeline_spec(spec)
        with open(path, "w") as f:
            yaml.safe_dump(spec, f)
        logger.info("pipeline spec written to %s", path)
        return spec

    def run(self, spec: Optional[Dict] = None, *, project: str = "",
            location: str = "us-central1", sync: bool = True,
            **compile_kwargs) -> List:
        """Validate the compiled spec, then SUBMIT it as a chain of
        Vertex AI CustomJobs — one per component, sequential, matching the
        linear DAG the spec encodes (the reference compiles to KFP IR and
        submits one VAI PipelineJob, kfp_orchestrator.py:106; here the
        per-component container commands are identical and the chain is
        driven client-side). Import-gated on google-cloud-aiplatform —
        compile()/compile_to_file() stay fully functional offline.

        Returns the list of launched jobs (one per component)."""
        if spec is None:
            spec = self.compile(**compile_kwargs)
        validate_pipeline_spec(spec)
        launcher = VertexAILauncher(project=project, location=location)
        jobs = []
        for comp in spec["components"]:
            pool = WorkerPoolSpec(machine_type=comp["machine_type"],
                                  image=comp["image"],
                                  command=list(comp["command"]))
            payload = launcher.build_job_payload(
                f"{spec['pipeline_name']}-{comp['name']}", pool)
            at = comp.get("accelerator_type")
            if at:
                ms = payload["job_spec"]["worker_pool_specs"][0][
                    "machine_spec"]
                ms["accelerator_type"] = at
                ms["accelerator_count"] = comp.get("accelerator_count", 1)
            # Sequential (each component consumes the previous one's
            # artifacts — Runner.start_at semantics); sync=False submits
            # the FIRST component only and returns.
            jobs.append(launcher.launch(payload, sync=sync))
            if not sync:
                break
        return jobs


def validate_pipeline_spec(spec: Dict) -> None:
    """Schema-check a compiled pipeline spec (run()/compile_to_file gate:
    the offline artifact must be trustworthy before submission).

    Checks: required top-level keys, per-component required fields and
    types, dependency references resolve, dependencies are acyclic and
    respect list order, known accelerator types.
    """
    if not isinstance(spec, dict):
        raise ValueError("pipeline spec must be a dict")
    for key in ("pipeline_name", "components"):
        if key not in spec:
            raise ValueError(f"pipeline spec missing {key!r}")
    if not isinstance(spec["pipeline_name"], str) or not spec["pipeline_name"]:
        raise ValueError("pipeline_name must be a non-empty string")
    comps = spec["components"]
    if not isinstance(comps, list) or not comps:
        raise ValueError("components must be a non-empty list")
    seen: set = set()
    known_components = {c.value for c in Component}
    for c in comps:
        for key, typ in (("name", str), ("image", str), ("command", list),
                         ("machine_type", str), ("depends_on", list)):
            if key not in c:
                raise ValueError(f"component missing {key!r}: {c}")
            if not isinstance(c[key], typ):
                raise ValueError(
                    f"component field {key!r} must be {typ.__name__}: {c}")
        if c["name"] not in known_components:
            raise ValueError(f"unknown component {c['name']!r}")
        if c["name"] in seen:
            raise ValueError(f"duplicate component {c['name']!r}")
        if not c["command"]:
            raise ValueError(f"component {c['name']!r} has empty command")
        for dep in c["depends_on"]:
            if dep not in seen:
                raise ValueError(
                    f"component {c['name']!r} depends on {dep!r} which is "
                    f"not defined earlier (cycle or missing)")
        at = c.get("accelerator_type")
        if at is not None and not str(at).startswith(("TPU_", "NVIDIA_")):
            raise ValueError(f"unknown accelerator_type {at!r}")
        if c.get("accelerator_count", 0) and at is None:
            raise ValueError(
                f"component {c['name']!r} sets accelerator_count without "
                f"accelerator_type")
        seen.add(c["name"])


@dataclass
class WorkerPoolSpec:
    """Ref common/services/vertex_ai.py:186-199 — leader pool (size 1) +
    worker pool."""

    machine_type: str = "ct5lp-hightpu-1t"
    replica_count: int = 1
    image: str = DEFAULT_IMAGE
    command: List[str] = field(default_factory=list)


class VertexAILauncher:
    """VAI CustomJob launcher shape (ref VertexAIService.launch_job).

    ``build_job_payload`` is pure (testable, serializable); ``launch``
    requires google-cloud-aiplatform.
    """

    def __init__(self, project: str = "", location: str = "us-central1"):
        self.project = project
        self.location = location

    def build_job_payload(self, job_name: str, leader: WorkerPoolSpec,
                          workers: Optional[WorkerPoolSpec] = None,
                          timeout_s: int = 60 * 60 * 24) -> Dict:
        pools = [{
            "machine_spec": {"machine_type": leader.machine_type},
            "replica_count": 1,
            "container_spec": {"image_uri": leader.image,
                               "command": leader.command},
        }]
        if workers and workers.replica_count > 0:
            pools.append({
                "machine_spec": {"machine_type": workers.machine_type},
                "replica_count": workers.replica_count,
                "container_spec": {"image_uri": workers.image,
                                   "command": workers.command},
            })
        return {
            "display_name": job_name,
            "job_spec": {"worker_pool_specs": pools,
                         "scheduling": {"timeout": f"{timeout_s}s"}},
        }

    def _make_job(self, payload: Dict):  # pragma: no cover - needs SDK
        """SDK-object factory — the injection point for tests (the same
        recorded-backend pattern as data/graphdb.NebulaGraphDBClient)."""
        from google.cloud import aiplatform

        aiplatform.init(project=self.project or None,
                        location=self.location)
        return aiplatform.CustomJob(
            display_name=payload["display_name"],
            worker_pool_specs=payload["job_spec"]["worker_pool_specs"])

    def launch(self, payload: Optional[Dict] = None, *, sync: bool = True,
               **build_kwargs):
        """Validate, then submit a real CustomJob (ref
        VertexAIService.launch_job, common/services/vertex_ai.py:140-236:
        CustomJob from worker pool specs, run with the scheduling
        timeout). Import-gated on google-cloud-aiplatform;
        build_job_payload() is fully functional offline."""
        if payload is None:
            payload = self.build_job_payload(**build_kwargs)
        validate_job_payload(payload)
        try:
            job = self._make_job(payload)
        except ImportError as e:
            raise RuntimeError(
                "Vertex AI submission requires google-cloud-aiplatform; "
                "build_job_payload() is fully functional offline.") from e
        timeout_s = int(
            payload["job_spec"]["scheduling"]["timeout"].rstrip("s"))
        if sync:
            job.run(sync=True, timeout=timeout_s)
        else:
            job.submit()
        return job


def validate_job_payload(payload: Dict) -> None:
    """Schema-check a CustomJob payload against the VAI shape the reference
    submits (vertex_ai.py:186-199): display_name, worker_pool_specs with a
    size-1 leader pool, machine/container specs, timeout format."""
    if not isinstance(payload, dict):
        raise ValueError("job payload must be a dict")
    if not payload.get("display_name"):
        raise ValueError("payload missing display_name")
    job = payload.get("job_spec")
    if not isinstance(job, dict) or "worker_pool_specs" not in job:
        raise ValueError("payload missing job_spec.worker_pool_specs")
    pools = job["worker_pool_specs"]
    if not isinstance(pools, list) or not pools:
        raise ValueError("worker_pool_specs must be a non-empty list")
    if pools[0].get("replica_count") != 1:
        raise ValueError("leader pool (index 0) must have replica_count 1")
    for i, p in enumerate(pools):
        ms = p.get("machine_spec", {})
        cs = p.get("container_spec", {})
        if not ms.get("machine_type"):
            raise ValueError(f"pool {i} missing machine_spec.machine_type")
        if not cs.get("image_uri"):
            raise ValueError(f"pool {i} missing container_spec.image_uri")
        if int(p.get("replica_count", 0)) < 1:
            raise ValueError(f"pool {i} replica_count must be >= 1")
    timeout = job.get("scheduling", {}).get("timeout", "")
    if not (isinstance(timeout, str) and timeout.endswith("s")
            and timeout[:-1].isdigit()):
        raise ValueError(f"scheduling.timeout must look like '86400s', "
                         f"got {timeout!r}")
