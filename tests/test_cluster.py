"""Auxiliary cluster service (orchestration/cluster.py): Dataproc/
SparkJobManager lifecycle analog with a functional local backend."""

import sys
import time

import pytest

from gigl_tpu.orchestration.cluster import (
    ClusterInitData,
    LocalProcessClusterService,
    build_dataproc_cluster_payload,
)


class TestDataprocPayload:
    def test_reference_request_shape(self):
        p = build_dataproc_cluster_payload(
            "proj", "us-central1",
            ClusterInitData(cluster_name="c", machine_type="n1-highmem-16",
                            num_workers=4, num_local_ssds=2,
                            idle_delete_ttl_s=900, is_debug_mode=True,
                            debug_cluster_owner_alias="alice"))
        cfg = p["config"]
        assert cfg["master_config"]["num_instances"] == 1
        assert cfg["worker_config"]["num_instances"] == 4
        assert cfg["worker_config"]["disk_config"]["num_local_ssds"] == 2
        assert cfg["lifecycle_config"]["idle_delete_ttl"]["seconds"] == 900
        assert cfg["gce_cluster_config"]["metadata"]["OWNER"] == "alice"
        assert p["labels"]["debug"] == "true"


class TestLocalClusterService:
    def _svc(self, **kw):
        svc = LocalProcessClusterService()
        svc.create_cluster(ClusterInitData(cluster_name="c", **kw))
        return svc

    def test_lifecycle_and_job(self):
        svc = self._svc()
        assert svc.does_cluster_exist("c")
        res = svc.submit_and_wait(
            "c", [sys.executable, "-c", "print('hello-job')"])
        assert res.returncode == 0
        assert "hello-job" in res.stdout
        assert svc.get_submitted_job_ids("c") == [res.job_id]
        svc.delete_cluster("c")
        assert not svc.does_cluster_exist("c")

    def test_retry_then_success_counted(self, tmp_path):
        svc = self._svc()
        flag = tmp_path / "flag"
        # fails on first attempt, succeeds on second (flag file created)
        code = (f"import os,sys; p={str(flag)!r}\n"
                "e=os.path.exists(p)\n"
                "open(p,'w').write('x')\n"
                "sys.exit(0 if e else 1)")
        res = svc.submit_and_wait("c", [sys.executable, "-c", code],
                                  retries=3)
        assert res.returncode == 0
        assert res.attempts == 2

    def test_failed_job_tears_down_unless_debug(self):
        svc = self._svc()
        res = svc.submit_and_wait("c", [sys.executable, "-c", "raise SystemExit(3)"],
                                  retries=1)
        assert res.returncode == 3
        assert not svc.does_cluster_exist("c")

        svc2 = self._svc(is_debug_mode=True)
        svc2.submit_and_wait("c", [sys.executable, "-c", "raise SystemExit(3)"],
                             retries=1)
        assert svc2.does_cluster_exist("c")  # debug cluster kept

    def test_idle_ttl_reaps(self):
        svc = self._svc(idle_delete_ttl_s=0)
        time.sleep(0.05)
        assert not svc.does_cluster_exist("c")

    def test_sharded_fanout(self, tmp_path):
        svc = self._svc()

        def cmd(rank, world):
            return [sys.executable, "-c",
                    f"open({str(tmp_path)!r} + '/r{rank}', 'w')."
                    f"write(str({rank}))"]

        results = svc.submit_sharded_and_wait("c", cmd, world_size=3)
        assert [r.returncode for r in results] == [0, 0, 0]
        for r in range(3):
            assert (tmp_path / f"r{r}").read_text() == str(r)
