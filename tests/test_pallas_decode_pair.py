"""Exactness tests for ops/pallas_decode_pair.py (interpret mode on CPU).

Pins the two-conv fused decode-node kernel — scSE gate → conv3×3 → affine →
ReLU → conv3×3 → affine → ReLU plus the channel-sum epilogue (the decode
node's attention1/conv1/conv2 stack of reference unetplusplusstar.py:71-161
in eval mode) — against the plain XLA composition at 1e-5, and the
``pallas_tail="pair"`` flagship path against the default fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyediseasesegmentation_tpu.ops.pallas_decode_pair import scse_conv3x3_pair


def _plain(parts, gate_c, sse_k, sse_b, k1, s1, b1, k2, s2, b2,
           relu=True, gated=True):
    x = jnp.concatenate(parts, axis=-1).astype(jnp.float32)
    if gated:
        sse = jnp.einsum("bhwc,c->bhw", x, sse_k.astype(jnp.float32))
        gate = (gate_c.astype(jnp.float32)[:, None, None, :]
                + jax.nn.sigmoid(sse + sse_b)[..., None])
        x = (x * gate).astype(parts[0].dtype).astype(jnp.float32)

    def conv_aff(z, k, s, bvec):
        y = jax.lax.conv_general_dilated(
            z, k.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y * s[None, None, None, :] + bvec[None, None, None, :]
        return jnp.maximum(y, 0.0) if relu else y

    y1 = conv_aff(x, k1, s1, b1)
    # match the kernel's inter-stage rounding: y1 is carried in the compute
    # dtype between the two convs
    y1 = y1.astype(parts[0].dtype).astype(jnp.float32)
    y2 = conv_aff(y1, k2, s2, b2)
    return y2, jnp.sum(y2, axis=(1, 2))


def _make(rng, parts_ch, cout, B=2, H=16, W=32, dtype=jnp.float32):
    ks = jax.random.split(rng, len(parts_ch) + 8)
    parts = [jax.random.normal(ks[i], (B, H, W, c), dtype)
             for i, c in enumerate(parts_ch)]
    C = sum(parts_ch)
    n = len(parts_ch)
    gate_c = jax.nn.sigmoid(jax.random.normal(ks[n], (B, C), jnp.float32))
    sse_k = jax.random.normal(ks[n + 1], (C,), jnp.float32) * 0.3
    sse_b = jax.random.normal(ks[n + 2], (), jnp.float32)
    k1 = jax.random.normal(ks[n + 3], (3, 3, C, cout), jnp.float32) * 0.1
    s1 = jax.random.normal(ks[n + 4], (cout,), jnp.float32)
    b1 = jax.random.normal(ks[n + 5], (cout,), jnp.float32)
    k2 = jax.random.normal(ks[n + 6], (3, 3, cout, cout), jnp.float32) * 0.1
    s2 = jax.random.normal(ks[n + 7], (cout,), jnp.float32) * 0.5 + 1.0
    b2 = jax.random.normal(ks[n], (cout,), jnp.float32) * 0.1
    return parts, gate_c, sse_k, sse_b, k1, s1, b1, k2, s2, b2


@pytest.mark.parametrize("parts_ch,cout", [
    ([24, 8], 8),          # g=16 -> one group of 9 taps
    ([16, 8, 8], 48),      # g=2, last group has 1 tap
    ([32], 64),            # g=2, single part
    ([8, 8], 100),         # g=1, 9 groups
])
def test_exact_vs_plain(parts_ch, cout):
    args = _make(jax.random.PRNGKey(hash((cout,)) % 1000), parts_ch, cout)
    y2, csum = scse_conv3x3_pair(*args, relu=True, tile_rows=4,
                                 interpret=True)
    want_y2, want_csum = _plain(*args, relu=True)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(want_y2), rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(csum), np.asarray(want_csum),
                               rtol=1e-5, atol=1e-3)


def test_single_chunk_and_uneven_tile():
    # H == th (single chunk: both stage-A and stage-B halos zeroed in one
    # step) and tile_rows not dividing H (falls back to a divisor)
    args = _make(jax.random.PRNGKey(3), [8, 8], 16, B=1, H=6, W=16)
    want_y2, want_csum = _plain(*args)
    for th in (6, 4):
        y2, csum = scse_conv3x3_pair(*args, tile_rows=th, interpret=True)
        np.testing.assert_allclose(np.asarray(y2, np.float32),
                                   np.asarray(want_y2), rtol=0, atol=3e-5)
        np.testing.assert_allclose(np.asarray(csum), np.asarray(want_csum),
                                   rtol=1e-5, atol=1e-3)


def test_many_batch_csum_slots():
    # B > 8 exercises the csum scratch slot reuse (b % 8)
    args = _make(jax.random.PRNGKey(9), [8], 16, B=10, H=8, W=16)
    y2, csum = scse_conv3x3_pair(*args, tile_rows=4, interpret=True)
    want_y2, want_csum = _plain(*args)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(want_y2), rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(csum), np.asarray(want_csum),
                               rtol=1e-5, atol=1e-3)


def test_ungated():
    parts, _, _, _, k1, s1, b1, k2, s2, b2 = _make(
        jax.random.PRNGKey(5), [24, 8], 16)
    C = 32
    y2, csum = scse_conv3x3_pair(
        parts, jnp.zeros((2, C)), jnp.zeros((C,)), jnp.float32(0.0),
        k1, s1, b1, k2, s2, b2, gated=False, tile_rows=4, interpret=True)
    want_y2, want_csum = _plain(parts, None, None, None, k1, s1, b1,
                                k2, s2, b2, gated=False)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(want_y2), rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(csum), np.asarray(want_csum),
                               rtol=1e-5, atol=1e-3)


def test_bf16_parts_close():
    args = _make(jax.random.PRNGKey(11), [16, 8], 32, dtype=jnp.bfloat16)
    y2, csum = scse_conv3x3_pair(*args, tile_rows=8, interpret=True)
    assert y2.dtype == jnp.bfloat16 and csum.dtype == jnp.float32
    want_y2, _ = _plain(
        args[0], *args[1:4],
        args[4].astype(jnp.bfloat16), args[5], args[6],
        args[7].astype(jnp.bfloat16), args[8], args[9])
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(want_y2), rtol=0.08, atol=0.25)


def _up_args(rng, parts_ch, cout, B=2, H=16, W=32, dtype=jnp.float32):
    """Args for the up_part0 form: part 0 is generated at LOW resolution
    (H/2, W/2); the kernel receives its W-upsampled half-height form and the
    plain reference receives the full bilinear ×2 (jax.image.resize)."""
    args = list(_make(rng, parts_ch, cout, B=B, H=H, W=W, dtype=dtype))
    x0 = jax.random.normal(jax.random.fold_in(rng, 99),
                           (B, H // 2, W // 2, parts_ch[0]), dtype)
    c0 = parts_ch[0]
    part0_half = jax.image.resize(x0, (B, H // 2, W, c0), "bilinear")
    part0_full = jax.image.resize(x0, (B, H, W, c0), "bilinear")
    kernel_parts = [part0_half.astype(dtype)] + args[0][1:]
    plain_parts = [part0_full.astype(dtype)] + args[0][1:]
    return kernel_parts, plain_parts, args[1:]


@pytest.mark.parametrize("parts_ch,cout,H,tile", [
    ([24, 8], 8, 16, 4),
    ([16, 8, 8], 48, 16, 3),   # odd tile_rows -> even-th fallback
    ([8, 8], 16, 8, 8),        # single chunk: both edge clamps in one block
])
def test_up_part0_exact_vs_plain(parts_ch, cout, H, tile):
    kparts, pparts, rest = _up_args(
        jax.random.PRNGKey(hash((cout, H)) % 997), parts_ch, cout, H=H)
    y2, csum = scse_conv3x3_pair(kparts, *rest, relu=True, tile_rows=tile,
                                 up_part0=True, interpret=True)
    want_y2, want_csum = _plain(pparts, *rest, relu=True)
    # separable (W then H) vs one-pass 2D bilinear rounds once more in f32
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(want_y2), rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(csum), np.asarray(want_csum),
                               rtol=1e-5, atol=2e-3)


def test_up_part0_ungated():
    kparts, pparts, rest = _up_args(jax.random.PRNGKey(21), [16, 8], 16)
    C = 24
    _, _, _, k1, s1, b1, k2, s2, b2 = rest
    y2, csum = scse_conv3x3_pair(
        kparts, jnp.zeros((2, C)), jnp.zeros((C,)), jnp.float32(0.0),
        k1, s1, b1, k2, s2, b2, gated=False, tile_rows=4, up_part0=True,
        interpret=True)
    want_y2, want_csum = _plain(pparts, None, None, None, k1, s1, b1,
                                k2, s2, b2, gated=False)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(want_y2), rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(csum), np.asarray(want_csum),
                               rtol=1e-5, atol=2e-3)


@pytest.mark.parametrize("tail", ["pair", "pair_up"])
def test_flagship_pair_tail_matches_fast_path(tail):
    """pallas_tail='pair'/'pair_up' == the default H2/s2d fast path on the
    flagship (same params; all are eval-layout rewrites of the same math)."""
    from functools import partial

    from eyediseasesegmentation_tpu import models as zoo

    size = 64
    common = {
        "encoder_name": "BoTSER50_Axial_Imagenet_3",
        "decoder_attention_type": "scse",
        "base_dim": size // 32,
        "classes": 1,
        "fast_min_res": 32,  # tiny shapes: let the tail nodes qualify
    }
    m_ref = zoo.get_model("unetplusplusstar", dict(common), training=False)
    m_pair = zoo.get_model("unetplusplusstar",
                           dict(common, pallas_tail=tail), training=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, 3),
                          jnp.float32)
    variables = jax.jit(partial(m_ref.init, train=False))(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x)
    ref = m_ref.apply(variables, x, train=False)
    got = m_pair.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=2e-4)
