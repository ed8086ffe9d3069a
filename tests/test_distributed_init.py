"""Multi-process cluster bring-up: parallel/mesh.initialize_distributed
actually rendezvouses (ref vertex_ai_context.py:79-126 leader-file
rendezvous -> jax.distributed). Two REAL processes on localhost form a
2-process CPU cluster and run a cross-process psum."""

import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platform_name", "cpu")
from gigl_tpu.parallel.mesh import initialize_distributed

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 procs x 2 devices

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
x = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P("data")),
    lambda idx: np.ones((1,), np.float32))
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(x)
# fetch only the addressable shard's value
val = float(np.asarray(total.addressable_data(0)))
assert val == 4.0, val
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_rendezvous_and_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
