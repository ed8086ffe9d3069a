"""Partitioned / streamed / halo training across a REAL process boundary.

Two spawned processes x 4 virtual CPU devices each form an 8-device
2-process jax.distributed cluster; the full training scenario
(tests/mp_scenario.py) runs on it, so every all_to_all / ppermute / psum
in the partitioned trainer, the streamed mesh trainer, and the halo ring
SpMM actually crosses the inter-process fabric (the DCN analog). Results
must match the single-process 8-device run of the SAME scenario — the
reference validates its distributed stack the same way with spawned RPC
worker processes (ref tests/integration/distributed/
distributed_dataset_test.py:34-60).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platform_name", "cpu")
sys.path.insert(0, os.getcwd())
from gigl_tpu.parallel.mesh import initialize_distributed

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

from tests.mp_scenario import run_scenario

out = run_scenario()
print("RESULT" + str(pid) + " " + json.dumps(out), flush=True)
"""


def _run_two_process_cluster():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=os.path.dirname(
                             os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-5000:]}"
        for line in out.splitlines():
            if line.startswith(f"RESULT{i} "):
                results[i] = json.loads(line.split(" ", 1)[1])
    assert set(results) == {0, 1}, f"missing results: {sorted(results)}"
    return results


@pytest.mark.slow
def test_two_process_trainer_parity():
    """The partitioned trainer (tabularized + ring global-candidate-pool
    loss), one streamed-mesh step, and a halo ring-SpMM layer run across
    two REAL processes and match the single-process 8-device run."""
    from tests.mp_scenario import run_scenario

    ref = run_scenario()  # single process, 8 virtual devices (conftest)
    results = _run_two_process_cluster()

    # Both processes of the cluster must agree exactly (replicated outs).
    for key in ref:
        np.testing.assert_allclose(
            np.asarray(results[0][key]), np.asarray(results[1][key]),
            rtol=0, atol=0, err_msg=f"{key}: processes disagree")

    got = results[0]
    np.testing.assert_allclose(
        got["partitioned_losses"], ref["partitioned_losses"],
        rtol=2e-5, err_msg="partitioned trainer loss diverges across the "
        "process boundary")
    np.testing.assert_allclose(got["partitioned_mrr"],
                               ref["partitioned_mrr"], rtol=2e-5)
    np.testing.assert_allclose(got["streamed_loss"], ref["streamed_loss"],
                               rtol=2e-5)
    np.testing.assert_allclose(
        got["streamed_partitioned_loss"], ref["streamed_partitioned_loss"],
        rtol=2e-5, err_msg="streamed-partitioned trainer (per-process host "
        "feature shards + routed lookups) diverges across the process "
        "boundary")
    np.testing.assert_allclose(
        got["hetero_partitioned_losses"], ref["hetero_partitioned_losses"],
        rtol=2e-5, err_msg="typed partitioned trainer diverges across the "
        "process boundary")
    np.testing.assert_allclose(got["halo_sumsq"], ref["halo_sumsq"],
                               rtol=2e-5)
