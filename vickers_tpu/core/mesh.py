"""Device mesh / topology helpers.

The reference has no distributed layer at all (SURVEY §2.3: single device,
``"cuda" if torch.cuda.is_available() else "cpu"`` at train.py:592).  Here the
device story is JAX-native: a ``jax.sharding.Mesh`` whose ``data`` axis carries
batch parallelism over ICI; model axes are reserved for future spatial/tensor
sharding of very large inputs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return jax.local_device_count()


def create_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh.

    ``model_parallel=1`` (the default) gives pure data parallelism, the
    appropriate regime for a 24M-param U-Net; the model axis exists so that
    spatially-sharded high-res inference can reuse the same mesh.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up (SURVEY §2.3/§5 distributed plan).

    Wraps ``jax.distributed.initialize``; must run before any device is
    touched.  Three modes:

    - explicit args: a pod-slice launcher passes coordinator/count/id;
    - env-gated: ``JAX_NUM_PROCESSES`` (with ``JAX_COORDINATOR_ADDRESS`` and
      ``JAX_PROCESS_ID``, or a supported cluster env like GKE/SLURM that JAX
      auto-detects) triggers ``jax.distributed.initialize()``;
    - single process (neither given): graceful no-op, returns False.

    After a successful init, ``jax.devices()`` spans every host and
    ``create_mesh()`` lays the data axis over all of them — DP gradients
    psum over ICI within a slice and DCN across hosts with no further code
    changes (collective routing is XLA's job once the mesh is global).
    Verified by the 2-process CPU test in tests/test_distributed.py.
    """
    import os

    if num_processes not in (None, 0, 1):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    if env_n and int(env_n) > 1:
        jax.distributed.initialize()
        return True
    return False
