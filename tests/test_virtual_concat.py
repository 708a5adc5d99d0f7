"""Virtual-concat (split) conv and scSE: exact equivalence with the
materialized-concat formulation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.models.modules.layers import Conv2d, SCSEAttention


def test_split_conv_equals_concat_conv(rng):
    a = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    conv = Conv2d(6, kernel_size=3, use_bias=True)
    v = conv.init(jax.random.PRNGKey(0), [a, b])
    got = conv.apply(v, [a, b])
    want = conv.apply(v, jnp.concatenate([a, b], axis=-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_split_scse_equals_concat_scse(rng):
    a = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    scse = SCSEAttention(reduction=4)
    v = scse.init(jax.random.PRNGKey(0), [a, b])
    parts = scse.apply(v, [a, b])
    got = np.concatenate([np.asarray(p) for p in parts], axis=-1)
    want = np.asarray(scse.apply(v, jnp.concatenate([a, b], axis=-1)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_decoder_block_with_list_skip(rng):
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    s1 = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    s2 = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    blk = DecoderBlock(16, 12, 8, attention_type="scse", drop_block_prob=0.0)
    v = blk.init(jax.random.PRNGKey(0), x, [s1, s2], train=False)
    got = blk.apply(v, x, [s1, s2], train=False)
    assert got.shape == (1, 16, 16, 8)
    # a single concatenated skip gives the identical result
    want = blk.apply(v, x, jnp.concatenate([s1, s2], -1), train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
