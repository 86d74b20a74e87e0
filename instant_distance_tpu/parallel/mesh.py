"""Device mesh helpers.

The reference's only parallel substrate is an intra-process rayon thread
pool (lib.rs:316-318); the TPU-native equivalent is a
``jax.sharding.Mesh`` over which indices are sharded and queries fan out,
with XLA collectives (all_gather + sorted top-k merge) riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

SHARD_AXIS = "shard"


def default_mesh(n_devices: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the shard axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (SHARD_AXIS,),
                         devices=list(devices))
