"""Multi-host (DCN) bring-up test: two REAL processes, one global mesh.

Exercises parallel/mesh.init_distributed the way a pod slice would use it
(SURVEY.md §2.3): each process owns local CPU devices, joins the jax
distributed runtime via a localhost coordinator, builds a global mesh over
all processes' devices, assembles a globally-sharded array from
process-local shards, and runs a jitted computation whose result requires a
cross-process all-reduce.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

port, pid = sys.argv[1], int(sys.argv[2])
from matinvent_tpu.parallel.mesh import init_distributed

init_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 local x 2 processes

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(4), ("dp",))
sharding = NamedSharding(mesh, P("dp"))

# process-local shard: rows [4*pid, 4*pid+4) of the global [8, 16] batch
local = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)[4 * pid : 4 * pid + 4]
garr = jax.make_array_from_process_local_data(sharding, local, (8, 16))

@jax.jit
def global_reduce(x):
    return jnp.sum(x * 2.0)  # requires an all-reduce across both processes

got = float(global_reduce(garr))
want = float((np.arange(8 * 16, dtype=np.float32) * 2.0).sum())
assert abs(got - want) < 1e-3, (got, want)
print(f"proc {pid}: global reduce OK ({got})", flush=True)
"""


@pytest.mark.slow
def test_two_process_mesh_allreduce():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # children provision their own device counts
    # the axon sitecustomize registers a PJRT plugin at interpreter start,
    # which counts as backend initialization and breaks
    # jax.distributed.initialize; its whole block is gated on this env var
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(port), str(pid)],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "global reduce OK" in out
