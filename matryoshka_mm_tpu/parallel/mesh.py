"""Device mesh construction.

The framework scales over a 2-axis logical mesh:

* ``data``  — batch (DP) + fully-sharded parameters (the ZeRO-3/FSDP
  equivalent of the reference's DeepSpeed config, scripts/zero3.json);
* ``model`` — tensor parallelism over attention heads / MLP columns
  (the reference has only a vestigial ``pretraining_tp``, SURVEY.md P4).

Collectives ride ICI automatically once parameters and batches carry
NamedShardings over this mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host (pod / multi-slice) runtime init over DCN.

    The reference's launcher role is played by deepspeed/torchrun + NCCL
    (SURVEY.md P9); here a pod just needs ``jax.distributed.initialize``
    before any backend use — XLA then places collectives across hosts.
    Called with no arguments it auto-detects the TPU pod environment and
    is a no-op on a single host.  Returns True when running multi-process.
    """
    import os

    import jax

    try:
        if jax.process_count() > 1:
            return True
    except Exception:
        pass
    env_hints = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                 "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
    if coordinator_address is None and not any(k in os.environ
                                               for k in env_hints):
        return False
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError as e:
        # backend already initialized (e.g. an interactive session that
        # touched devices first, or this image's startup hook) — continue
        # single-process rather than aborting the run
        import warnings

        warnings.warn(f"multi-host init skipped: {e}")
        return False
    return jax.process_count() > 1


def put_batch(mesh: Mesh, tree, spec=None):
    """Place a host-local batch pytree onto the mesh.

    Single-process: a plain ``device_put`` with the batch sharding.
    Multi-process: each host contributes its local rows via
    ``jax.make_array_from_process_local_data`` (the global batch is the
    concatenation over hosts along the data axis)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: None if x is None else jax.device_put(x, sharding), tree,
            is_leaf=lambda x: x is None)
    return jax.tree.map(
        lambda x: None if x is None
        else jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree, is_leaf=lambda x: x is None)


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a (data, model) mesh.  Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
