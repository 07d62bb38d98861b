"""Device mesh helpers.

The reference's scale axes are big/LITTLE CPU clusters + NPU offload
(system/cpu.c, optimizer/split.c). The TPU-native equivalents are mesh axes:
"data" (batch replication / DP serving) over which requests are sharded, and
"model" (TP) over which large conv/FC weights are sharded, with XLA inserting
the collectives (SURVEY §2.3, §7).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a 2-D (data, model) mesh over the given devices.

    Default factorization puts more devices on "model" (weights of the conv
    nets we serve shard well over output channels; batch=1 latency serving
    can't use DP), i.e. shape (1, n) unless specified.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-sharded activation: dim 0 over "data", rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
