"""Parallel helpers: mesh construction, shardings, distributed utilities."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from zeggs_tpu.parallel import (
    batch_sharding,
    create_mesh,
    pad_batch_to_devices,
    replicated,
    shard_batch,
)
from zeggs_tpu.parallel.distributed import clip_shard, host_shard, local_batch_slice


def test_create_mesh_and_shardings():
    mesh = create_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    bs = batch_sharding(mesh)
    assert bs.spec == P("data")
    rep = replicated(mesh)
    assert rep.spec == P()


def test_shard_batch_places_arrays():
    mesh = create_mesh(4)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    dev = shard_batch(batch, mesh)
    assert dev["x"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])


def test_pad_batch_to_devices():
    batch = {"x": np.ones((5, 3))}
    padded = pad_batch_to_devices(batch, 4)
    assert padded["x"].shape == (8, 3)
    np.testing.assert_array_equal(padded["x"][5:], np.ones((3, 3)))


def test_single_process_distributed_helpers():
    assert jax.process_count() == 1
    s, e = local_batch_slice(32)
    assert (s, e) == (0, 32)
    assert list(host_shard(list(range(10)))) == list(range(10))
    assert clip_shard([1, 2, 3]) == [1, 2, 3]


def test_sharded_computation_correct():
    """A psum-style reduction over the mesh equals the single-device sum."""
    mesh = create_mesh(8)
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    xs = jax.device_put(x, batch_sharding(mesh))
    total = jax.jit(lambda a: a.sum(), out_shardings=replicated(mesh))(xs)
    assert float(total) == x.sum()
