"""Exactness tests for ops/pallas_scse_conv.py (interpret mode on CPU).

Pins the fused scSE-gate -> 3x3 SAME conv (virtual concat) -> folded-BN
affine -> ReLU kernel against the plain XLA composition (the decode-node
attention1/conv1 stage of reference unetplusplusstar.py:71-161) at 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyediseasesegmentation_tpu.ops.pallas_scse_conv import scse_conv3x3_bn_relu


def _plain(parts, gate_c, sse_kernel, sse_bias, k3, scale, bias, relu):
    x = jnp.concatenate(parts, axis=-1).astype(jnp.float32)
    sse = jnp.einsum("bhwc,c->bhw", x, sse_kernel.astype(jnp.float32))
    gate = (gate_c.astype(jnp.float32)[:, None, None, :]
            + jax.nn.sigmoid(sse + sse_bias)[..., None])
    xg = (x * gate).astype(parts[0].dtype).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        xg, k3.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _make(rng, parts_ch, cout, B=2, H=16, W=32, dtype=jnp.float32):
    ks = jax.random.split(rng, len(parts_ch) + 6)
    parts = [jax.random.normal(ks[i], (B, H, W, c), dtype)
             for i, c in enumerate(parts_ch)]
    C = sum(parts_ch)
    n = len(parts_ch)
    gate_c = jax.nn.sigmoid(jax.random.normal(ks[n], (B, C), jnp.float32))
    sse_k = jax.random.normal(ks[n + 1], (C,), jnp.float32) * 0.3
    sse_b = jax.random.normal(ks[n + 2], (), jnp.float32)
    k3 = jax.random.normal(ks[n + 3], (3, 3, C, cout), jnp.float32) * 0.1
    scale = jax.random.normal(ks[n + 4], (cout,), jnp.float32)
    bias = jax.random.normal(ks[n + 5], (cout,), jnp.float32)
    return parts, gate_c, sse_k, sse_b, k3, scale, bias


@pytest.mark.parametrize("parts_ch,cout", [
    ([24, 8], 8),          # g=16 -> one group of 9 taps
    ([16, 8, 8], 48),      # g=2, last group has 1 tap
    ([32], 64),            # g=2, single part
    ([8, 8], 100),         # g=1, 9 groups
])
def test_exact_vs_plain(parts_ch, cout):
    args = _make(jax.random.PRNGKey(hash((cout,)) % 1000), parts_ch, cout)
    got = scse_conv3x3_bn_relu(*args, relu=True, tile_rows=4, interpret=True)
    want = _plain(*args, relu=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0, atol=1e-5)


def test_no_relu_and_identity_affine():
    parts, gate_c, sse_k, sse_b, k3, _, _ = _make(
        jax.random.PRNGKey(7), [16, 16], 32)
    got = scse_conv3x3_bn_relu(parts, gate_c, sse_k, sse_b, k3,
                               None, None, relu=False, tile_rows=8,
                               interpret=True)
    want = _plain(parts, gate_c, sse_k, sse_b, k3,
                  jnp.ones((32,)), jnp.zeros((32,)), relu=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0, atol=1e-5)


def test_single_chunk_and_uneven_tile():
    # H == th (single chunk, both halos zeroed in one step) and
    # tile_rows not dividing H (falls back to a divisor)
    parts, gate_c, sse_k, sse_b, k3, scale, bias = _make(
        jax.random.PRNGKey(3), [8, 8], 16, B=1, H=6, W=16)
    for th in (6, 4):
        got = scse_conv3x3_bn_relu(parts, gate_c, sse_k, sse_b, k3,
                                   scale, bias, tile_rows=th, interpret=True)
        want = _plain(parts, gate_c, sse_k, sse_b, k3, scale, bias, True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), rtol=0, atol=1e-5)


def test_ungated_plain_conv():
    parts, _, _, _, k3, scale, bias = _make(jax.random.PRNGKey(5), [24, 8], 16)
    got = scse_conv3x3_bn_relu(parts, jnp.zeros((2, 32)), jnp.zeros((32,)),
                               jnp.float32(0.0), k3, scale, bias,
                               relu=True, gated=False, tile_rows=4,
                               interpret=True)
    x = jnp.concatenate(parts, axis=-1)
    want = jax.lax.conv_general_dilated(
        x, k3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = jnp.maximum(want * scale + bias, 0.0)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0, atol=1e-5)


def test_bf16_parts_close():
    parts, gate_c, sse_k, sse_b, k3, scale, bias = _make(
        jax.random.PRNGKey(11), [16, 8], 32, dtype=jnp.bfloat16)
    got = scse_conv3x3_bn_relu(parts, gate_c, sse_k, sse_b, k3,
                               scale, bias, tile_rows=8, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _plain(parts, gate_c, sse_k, sse_b,
                  k3.astype(jnp.bfloat16), scale, bias, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.15)
