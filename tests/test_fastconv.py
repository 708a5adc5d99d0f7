"""Space-to-depth packed conv: exactness vs the direct lax conv."""

import numpy as np
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.ops.fastconv import (conv3x3_s2d,
                                                     depth_to_space,
                                                     pack_kernel_3x3,
                                                     should_pack,
                                                     space_to_depth)


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_packed_conv_matches_direct(rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    got = conv3x3_s2d(x, k, compute_dtype=jnp.float32)
    want = _direct(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_packed_conv_border_zero_padding(rng):
    # the border behavior must equal SAME zero padding exactly
    x = jnp.asarray(np.ones((1, 6, 6, 2), np.float32))
    k = jnp.asarray(np.ones((3, 3, 2, 1), np.float32))
    got = np.asarray(conv3x3_s2d(x, k, compute_dtype=jnp.float32))
    want = np.asarray(_direct(x, k))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_packed_conv_gradients(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32) * 0.1)

    g1 = jax.grad(lambda k: jnp.sum(conv3x3_s2d(x, k, jnp.float32) ** 2))(k)
    g2 = jax.grad(lambda k: jnp.sum(_direct(x, k) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-4)


def test_should_pack_heuristic():
    assert should_pack(1024, 1024, 16, 16)
    assert should_pack(512, 512, 32, 16)
    assert not should_pack(256, 256, 16, 16)   # too small
    assert not should_pack(512, 512, 64, 64)   # channels too big
    assert not should_pack(513, 512, 16, 16)   # odd H
