"""Mesh / sharding helper tests (virtual 8-device CPU platform)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from eyediseasesegmentation_tpu.parallel import (batch_sharding, make_mesh,
                                                 replicate, shard_batch)
from eyediseasesegmentation_tpu.parallel.mesh import pad_to_batch_multiple


def test_make_mesh_default_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_make_mesh_2d_with_wildcard():
    mesh = make_mesh({"data": 4, "model": -1})
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh({"data": 8})
    batch = {"image": np.zeros((8, 4, 4, 3), np.float32),
             "mask": np.zeros((8, 4, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    s = sharded["image"].sharding
    assert s.spec == P("data", None, None, None)
    assert sharded["mask"].sharding.spec == P("data", None, None)


def test_replicate():
    mesh = make_mesh({"data": 8})
    tree = {"w": np.ones((3, 3), np.float32)}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.spec == P()


def test_pad_to_batch_multiple():
    batch = {"x": np.ones((5, 2), np.float32)}
    padded, n = pad_to_batch_multiple(batch, 4)
    assert n == 5
    assert padded["x"].shape == (8, 2)
    np.testing.assert_array_equal(padded["x"][5:], 0)


def test_global_mean_matches_local():
    """A jitted global mean over a sharded batch equals the unsharded mean
    (XLA inserts the cross-device reduction)."""
    mesh = make_mesh({"data": 8})
    x = np.random.RandomState(0).rand(16, 32).astype(np.float32)
    xs = shard_batch({"x": x}, mesh)["x"]
    got = float(jax.jit(jnp.mean)(xs))
    assert abs(got - float(x.mean())) < 1e-6
