"""Device mesh construction and sharding helpers.

The reference trains on exactly one CUDA device (train.py:43-50) with no
distributed code anywhere. Here scaling is first-class: a 1-D ``('data',)``
mesh over the TPU slice, batches sharded on the leading axis over ICI,
parameters replicated, and gradient all-reduce inserted by XLA through
pjit. Multi-host launches piggyback on ``jax.distributed`` + per-process
data sharding (each host feeds its local shard of the global batch).

Sequence (time) stays unsharded by design: windows are 256 frames and the
decoder is a sequential scan (SURVEY.md §5 — batch is the scaling axis).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    dev_mesh = np.asarray(devices[:n_devices]).reshape(n_devices)
    return Mesh(dev_mesh, (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """device_put a pytree of host arrays with the leading axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def create_mesh_for_batch(batch_size, axis_name="data", devices=None):
    """Mesh over the most devices that evenly divide ``batch_size`` — small
    debug batches shouldn't crash on a large slice."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return create_mesh(n, axis_name, devices)
