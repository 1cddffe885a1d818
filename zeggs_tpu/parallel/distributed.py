"""Multi-host initialization helpers.

The reference is strictly single-process (SURVEY.md §5). For multi-host TPU
slices: call `initialize()` once per process before any jax op; the
('data',) mesh then spans all global devices and each host feeds its local
shard of the global batch (`local_batch_slice`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize with env-var fallbacks; no-op when
    single-process or already initialized.

    Deliberately does NOT query ``jax.process_count()`` first: any backend
    query initializes XLA, after which ``jax.distributed.initialize``
    raises ("must be called before any JAX computation"). The
    already-initialized case (launcher/env auto-init) is detected by the
    RuntimeError it raises instead.
    """
    if coordinator_address is None and num_processes is None:
        return  # single-process / launcher- or env-driven auto-init
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # initialized by the launcher; keep its configuration
        raise


def local_batch_slice(global_batch_size):
    """This host's [start, end) rows of the global batch."""
    per = global_batch_size // jax.process_count()
    i = jax.process_index()
    return i * per, (i + 1) * per


def host_shard(array_like, global_batch_size=None):
    """Slice a host-side global batch down to this process's rows."""
    n = global_batch_size or len(array_like)
    s, e = local_batch_slice(n)
    return array_like[s:e]


def clip_shard(items):
    """Strided shard of a work list across hosts (data-pipeline sharding)."""
    return list(items)[jax.process_index() :: jax.process_count()]


def make_replicated(tree, mesh):
    """Host pytree -> globally-replicated jax.Arrays over ``mesh``.

    Works across processes: every process must hold the SAME host values
    (e.g. params initialized from a shared PRNG seed); each contributes its
    local copy and the result is a fully-replicated global array usable in
    pjit over the whole mesh.
    """
    rep = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, rep)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def put_global_batch(tree, mesh, axis_name="data"):
    """Per-process LOCAL batch rows -> global batch-sharded arrays.

    Multi-process: each host passes only its own rows (its
    `local_batch_slice` of the global batch) and
    ``jax.make_array_from_process_local_data`` assembles the global array
    (process order == mesh device order, matching `local_batch_slice`).
    Single-process: plain sharded device_put of the full batch.
    """
    sh = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), tree
    )
