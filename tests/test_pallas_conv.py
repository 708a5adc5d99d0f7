"""Pallas conv3x3+BN+ReLU proof kernel: interpret-mode correctness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.ops.pallas_conv import conv3x3_bn_relu


def _ref(x, w, s, b, relu):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * s + b
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("tile_rows", [8, 16])
def test_conv3x3_bn_relu_matches_xla(rng, tile_rows):
    x = jnp.asarray(rng.randn(2, 16, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.2)
    s = jnp.asarray(np.abs(rng.randn(6)).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32) * 0.1)
    got = conv3x3_bn_relu(x, w, s, b, relu=True, tile_rows=tile_rows,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w, s, b, True)),
                               rtol=1e-4, atol=1e-5)


def test_conv3x3_no_relu(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32) * 0.2)
    s = jnp.ones((4,), jnp.float32)
    b = jnp.zeros((4,), jnp.float32)
    got = conv3x3_bn_relu(x, w, s, b, relu=False, tile_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref(x, w, s, b, False)),
                               rtol=1e-4, atol=1e-5)
