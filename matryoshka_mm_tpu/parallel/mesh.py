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
