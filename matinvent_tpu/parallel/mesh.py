"""Device-mesh and sharding helpers.

The reference has no device-level parallelism (SURVEY.md §2.3): one GPU, period.
Here data parallelism is first-class: a 1-D ``dp`` mesh over all local (or
global) devices, batches sharded on their leading axis, parameters replicated.
XLA inserts the psum gradient all-reduce over ICI automatically from the
sharding annotations — no NCCL-style collective calls in user code.

Multi-host: call :func:`init_distributed` first (jax.distributed.initialize),
then the same mesh code spans slices via DCN transparently.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up (no-op when single-process).

    Must run before ANY backend-initializing JAX call — including
    ``jax.process_count()`` itself, which is why the kwargs check comes
    first: with explicit coordinator kwargs we go straight to
    ``jax.distributed.initialize`` without touching the backend.
    """
    if kwargs:
        jax.distributed.initialize(**kwargs)
        return
    if jax.process_count() > 1:
        jax.distributed.initialize()


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis sharding for batched arrays."""
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every leaf of a batch pytree along its leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
