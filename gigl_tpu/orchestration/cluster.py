"""Auxiliary compute-cluster service: the Dataproc/SparkJobManager analog.

Ref parity: `common/services/dataproc.py` (249 LoC: create/exists/delete
cluster, submit_and_wait job, job-id listing) + `src/common/utils/
spark_job_manager.py` (211 LoC: ClusterInitData knobs — machine type,
worker count, local SSDs, idle-delete TTL, debug mode with OWNER label —
and the create/submit/delete lifecycle). The reference provisions Dataproc
for the Spark subgraph-sampler stage; the TPU stack has no Spark, but the
ROLE survives: auxiliary worker pools for host-side stages (the
rank-sharded preprocessor, materialization jobs).

Two backends:
  - ``LocalProcessClusterService`` — FUNCTIONAL: a local worker pool that
    actually executes rank-sharded jobs as subprocesses with per-job retry
    and idle-TTL auto-delete (the analog of a single-node test cluster).
  - ``build_dataproc_cluster_payload`` — pure payload builder with the
    reference's request shape (master/worker configs, local SSDs,
    lifecycle idle_delete_ttl, debug OWNER label), submission gated on the
    cloud SDK like the other orchestration adapters.
"""

from __future__ import annotations

import subprocess
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


@dataclass
class ClusterInitData:
    """SparkJobManager.ClusterInitData analog (spark_job_manager.py:30-42)."""

    cluster_name: str
    machine_type: str = "n1-highmem-16"
    num_workers: int = 2
    num_local_ssds: int = 1
    idle_delete_ttl_s: int = 1800
    is_debug_mode: bool = False
    debug_cluster_owner_alias: Optional[str] = None


def build_dataproc_cluster_payload(project: str, region: str,
                                   init: ClusterInitData) -> Dict:
    """Cluster request payload with the reference's shape
    (spark_job_manager.py:79-155: master + worker configs, SSDs, software
    config, lifecycle idle TTL, debug OWNER metadata)."""
    metadata = {}
    if init.debug_cluster_owner_alias is not None:
        metadata["OWNER"] = init.debug_cluster_owner_alias
    return {
        "project_id": project,
        "cluster_name": init.cluster_name,
        "config": {
            "master_config": {
                "num_instances": 1,
                "machine_type_uri": init.machine_type,
                "disk_config": {"num_local_ssds": init.num_local_ssds},
            },
            "worker_config": {
                "num_instances": init.num_workers,
                "machine_type_uri": init.machine_type,
                "disk_config": {"num_local_ssds": init.num_local_ssds},
            },
            "lifecycle_config": {
                "idle_delete_ttl": {"seconds": init.idle_delete_ttl_s},
            },
            "gce_cluster_config": {"metadata": metadata},
        },
        "labels": {"debug": str(init.is_debug_mode).lower()},
    }


@dataclass
class JobResult:
    job_id: str
    returncode: int
    stdout: str
    attempts: int


class LocalProcessClusterService:
    """Functional local cluster: submit shell jobs (optionally one per
    rank), with retry and idle-TTL deletion — the lifecycle contract of
    DataprocService.create_cluster / submit_and_wait / delete_cluster.

    ``is_debug_mode`` keeps the cluster alive after a failed job (the
    reference's debug-cluster semantics) instead of tearing it down.
    """

    def __init__(self):
        self._clusters: Dict[str, ClusterInitData] = {}
        self._last_active: Dict[str, float] = {}
        self._jobs: Dict[str, List[str]] = {}

    # -- lifecycle -----------------------------------------------------------
    def does_cluster_exist(self, cluster_name: str) -> bool:
        self._reap_idle()
        return cluster_name in self._clusters

    def create_cluster(self, init: ClusterInitData) -> None:
        self._reap_idle()
        if init.cluster_name in self._clusters:
            logger.info("cluster %s already exists", init.cluster_name)
            return
        self._clusters[init.cluster_name] = init
        self._last_active[init.cluster_name] = time.time()
        self._jobs[init.cluster_name] = []

    def delete_cluster(self, cluster_name: str) -> None:
        self._clusters.pop(cluster_name, None)
        self._last_active.pop(cluster_name, None)
        self._jobs.pop(cluster_name, None)

    def _reap_idle(self) -> None:
        """Idle-TTL auto-delete (lifecycle_config.idle_delete_ttl analog)."""
        now = time.time()
        for name in list(self._clusters):
            ttl = self._clusters[name].idle_delete_ttl_s
            if now - self._last_active[name] > ttl:
                logger.info("cluster %s idle past %ds TTL; deleting",
                            name, ttl)
                self.delete_cluster(name)

    # -- jobs ------------------------------------------------------------
    def submit_and_wait(self, cluster_name: str, command: Sequence[str],
                        *, job_id: Optional[str] = None, retries: int = 2,
                        timeout_s: float = 600.0) -> JobResult:
        """submit_and_wait_scala_spark_job analog: run to completion with
        retry; a failed job tears the cluster down unless debug mode."""
        if cluster_name not in self._clusters:
            raise ValueError(f"cluster {cluster_name!r} does not exist")
        init = self._clusters[cluster_name]
        job_id = job_id or f"job-{len(self._jobs[cluster_name])}"
        self._last_active[cluster_name] = time.time()
        attempts = 0
        out = ""
        rc = -1
        while attempts < max(retries, 1):
            attempts += 1
            proc = subprocess.run(list(command), capture_output=True,
                                  text=True, timeout=timeout_s)
            rc, out = proc.returncode, proc.stdout + proc.stderr
            if rc == 0:
                break
            logger.warning("job %s attempt %d failed rc=%d", job_id,
                           attempts, rc)
        self._jobs[cluster_name].append(job_id)
        self._last_active[cluster_name] = time.time()
        if rc != 0 and not init.is_debug_mode:
            logger.error("job %s failed; deleting cluster %s (debug mode "
                         "would keep it)", job_id, cluster_name)
            self.delete_cluster(cluster_name)
        return JobResult(job_id=job_id, returncode=rc, stdout=out,
                         attempts=attempts)

    def submit_sharded_and_wait(self, cluster_name: str,
                                command_for_rank, world_size: int,
                                **kwargs) -> List[JobResult]:
        """Fan a rank-parameterized job across the 'cluster' — the shape
        the rank-sharded preprocessor phases run under
        (``command_for_rank(rank, world_size) -> argv``)."""
        procs = []
        if cluster_name not in self._clusters:
            raise ValueError(f"cluster {cluster_name!r} does not exist")
        self._last_active[cluster_name] = time.time()
        for r in range(world_size):
            procs.append(subprocess.Popen(
                list(command_for_rank(r, world_size)),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        results = []
        for r, p in enumerate(procs):
            out, _ = p.communicate(timeout=kwargs.get("timeout_s", 600.0))
            results.append(JobResult(job_id=f"shard-{r}",
                                     returncode=p.returncode, stdout=out,
                                     attempts=1))
        self._last_active[cluster_name] = time.time()
        if any(r.returncode for r in results) and \
                not self._clusters[cluster_name].is_debug_mode:
            self.delete_cluster(cluster_name)
        return results

    def get_submitted_job_ids(self, cluster_name: str) -> List[str]:
        return list(self._jobs.get(cluster_name, []))
