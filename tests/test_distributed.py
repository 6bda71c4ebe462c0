"""Multi-HOST (multi-process) bring-up: 2 CPU processes over localhost.

The reference has no distributed layer at all (SURVEY §2.3); this validates
the framework's multi-host path end-to-end on one machine: each process
calls ``initialize_distributed``, sees the global device set, builds the
global mesh, and runs a cross-process ``psum`` through ``shard_map``.
Subprocesses get a scrubbed environment (no axon TPU tunnel, private
coordinator port) so the test is hermetic.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
import jax
from vickers_tpu.core.mesh import create_mesh, initialize_distributed

ok = initialize_distributed(coordinator="127.0.0.1:29712",
                            num_processes=2, process_id=pid)
assert ok
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()      # 2 local x 2 procs
assert jax.local_device_count() == 2

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = create_mesh()                                    # data axis over all 4
x = jnp.ones((4,), jnp.float32) * (pid + 1)

def tot(v):
    return jax.lax.psum(v, "data")

f = jax.jit(shard_map(tot, mesh=mesh, in_specs=P("data"), out_specs=P()))
g = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.full((4,), 1.0, np.float32))
out = f(g)
assert float(out.addressable_data(0)[0]) == 4.0, out    # summed over 4 shards
print(f"proc{pid}: OK")
"""


def test_two_process_cpu_distributed():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out
    assert any("proc0: OK" in o for _, o in outs)
    assert any("proc1: OK" in o for _, o in outs)
