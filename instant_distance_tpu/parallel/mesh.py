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


_distributed_initialized = False


def distributed_mesh(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Mesh:
    """Multi-host mesh: initialize ``jax.distributed`` (idempotent) and
    return a 1-D mesh over ALL devices of all hosts.

    On Cloud TPU pods the three arguments are auto-detected from the
    environment; pass them explicitly elsewhere.  Each host then runs
    the same program (single-controller SPMD): sharded index classes
    place one shard per global device, and their ``all_gather`` merges
    ride ICI/DCN exactly as on one host.  Per-host data feeding for
    builds larger than one host's RAM should construct the [S, n_s, ...]
    arrays with ``jax.make_array_from_process_local_data`` — the shard
    axis layout used by Sharded* classes is already global-device-major,
    so no relayout is needed.
    """
    global _distributed_initialized
    # Do NOT touch any backend-initializing JAX API (jax.devices,
    # jax.process_count, ...) before initialize(): they start the local
    # backend, after which initialize() raises.  Initialization errors
    # propagate — silently degrading to a single-host mesh on a pod
    # would violate this function's contract.
    if not _distributed_initialized:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
        _distributed_initialized = True
    return default_mesh()
