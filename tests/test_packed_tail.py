"""Exactness tests for the packed decoder-tail rewrites (ops/packed.py).

Every transform must reproduce the plain composition bit-for-bit in fp32 (up
to reassociation): these rewrites change the layout/schedule of the flagship's
hot path, not its math (reference unetplusplusstar.py:71-161 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyediseasesegmentation_tpu.ops import packed as P
from eyediseasesegmentation_tpu.ops.fastconv import (depth_to_space,
                                                     space_to_depth)


def conv3x3(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def up2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), "bilinear")


@pytest.mark.parametrize("h,w,cin,cout",
                         [(16, 16, 7, 5), (8, 12, 3, 4),
                          (16, 12, 5, 64)])  # cout>=64: row-split kernels
def test_conv3x3_s2d_out_exact(h, w, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
    ref = space_to_depth(conv3x3(x, k))
    got = P.conv3x3_s2d_out([x], k, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_s2d_out_virtual_concat():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(2, 8, 8, 5), jnp.float32)
    b = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 6), jnp.float32)
    ref = space_to_depth(conv3x3(jnp.concatenate([a, b], -1), k))
    got = P.conv3x3_s2d_out([a, b], k, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,w", [(8, 8), (6, 10), (4, 4)])
def test_phase_upconv_exact_incl_borders(h, w):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, h, w, 6), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 6, 4), jnp.float32)
    ref = space_to_depth(conv3x3(up2(x), k))
    got = P.phase_upconv_s2d(x, k, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_packed_helpers_roundtrip_and_gates():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 12), jnp.float32)
    xp = space_to_depth(x)
    # spatial mean matches the logical mean
    np.testing.assert_allclose(
        np.asarray(P.packed_spatial_mean(xp)),
        np.asarray(jnp.mean(x, axis=(1, 2), keepdims=True)),
        rtol=1e-5, atol=1e-6)
    # per-phase 1x1 spatial gate matches the logical 1x1 conv
    k = jnp.asarray(rng.randn(1, 1, 12, 1), jnp.float32)
    bias = jnp.asarray([0.3], jnp.float32)
    t_ref = conv3x3(x, jnp.zeros((3, 3, 12, 1)).at[1, 1].set(k[0, 0])) + bias
    t_got = P.packed_spatial_gate(xp, k, bias)
    np.testing.assert_allclose(np.asarray(depth_to_space(t_got)),
                               np.asarray(t_ref), rtol=1e-5, atol=1e-5)
    # per-phase multiply == logical elementwise multiply
    g = jnp.asarray(rng.randn(2, 4, 4, 4), jnp.float32)
    y = P.mul_per_phase(xp, g)
    ref = x * depth_to_space(g)
    np.testing.assert_allclose(np.asarray(depth_to_space(y)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # channel tiling: packed index (phase-major) picks the logical channel
    v = jnp.arange(12.0)
    tiled = P.tile_channels(v)
    assert tiled.shape == (48,)
    np.testing.assert_array_equal(np.asarray(tiled[13]), 1.0)


# ---------------------------------------------------------------------------
# Module-level: fast (packed) path vs normal path with the SAME parameters
# ---------------------------------------------------------------------------

def _init_apply(mod_a, mod_b, args, rngs=None):
    rngs = rngs or {"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}
    va = mod_a.init(rngs, *args, train=False)
    ya = mod_a.apply(va, *args, train=False)
    yb = mod_b.apply(va, *args, train=False)
    return ya, yb


def test_decoder_block_fast_exact_scse():
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 24), jnp.float32)
    skips = [jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32),
             jnp.asarray(rng.randn(2, 16, 16, 10), jnp.float32)]
    kw = dict(in_channels=24, skip_channels=16, out_channels=12,
              attention_type="scse", drop_block_prob=0.1, dtype=jnp.float32)
    slow = DecoderBlock(**kw)
    fast = DecoderBlock(fast_tail=True, **kw)
    ys, yf = _init_apply(slow, fast, (x, skips))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=2e-4, atol=2e-4)


def test_decoder_block_fast_exact_noskip():
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 24), jnp.float32)
    kw = dict(in_channels=24, skip_channels=0, out_channels=12,
              attention_type="scse", drop_block_prob=0.1, dtype=jnp.float32)
    slow = DecoderBlock(**kw)
    fast = DecoderBlock(fast_tail=True, **kw)
    ys, yf = _init_apply(slow, fast, (x, None))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=2e-4, atol=2e-4)


def test_flagship_fast_inference_exact():
    """Full UnetPlusPlusStar: packed-tail eval == normal eval (fp32, CPU)."""
    from eyediseasesegmentation_tpu.models.unetplusplusstar import UnetPlusPlusStar
    kw = dict(encoder_name="BoTSER50_Axial_Imagenet_3", base_dim=2,
              decoder_attention_type="scse", classes=1, dtype=jnp.float32)
    slow = UnetPlusPlusStar(fast_inference=False, **kw)
    fast = UnetPlusPlusStar(fast_inference=True, fast_min_res=8, **kw)
    x = jnp.asarray(np.random.RandomState(6).rand(1, 64, 64, 3), jnp.float32)
    ys, yf = _init_apply(slow, fast, (x,))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=5e-4, atol=5e-4)


def test_stem7_s2d_exact():
    """s2d stem == lax 7x7/2 conv with 3-pixel zero pad."""
    from eyediseasesegmentation_tpu.ops.packed import stem7_s2d
    import jax
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 12, 3), jnp.float32)
    k7 = jnp.asarray(rng.randn(7, 7, 3, 8), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k7, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = stem7_s2d(x, k7, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_resnet_encoder_stem_fast_exact():
    from eyediseasesegmentation_tpu.models.encoders import ResNetEncoder
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    kw = dict(stage_sizes=(1, 1), block="basic", num_stages=2,
              dtype=jnp.float32)
    slow = ResNetEncoder(fast_inference=False, **kw)
    fast = ResNetEncoder(fast_inference=True, **kw)
    ys, yf = _init_apply(slow, fast, (x,))
    for a, b in zip(jax.tree_util.tree_leaves(ys),
                    jax.tree_util.tree_leaves(yf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_phase_upconv_s2d_packed_exact():
    """Packed-input phase-up conv == s2d(phase_upconv_s2d(x)) == double-s2d
    of conv3x3(up2(x))."""
    rng = np.random.RandomState(9)
    for h, w, cin, cout in [(8, 8, 5, 3), (12, 8, 4, 2)]:
        x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
        ref = space_to_depth(space_to_depth(conv3x3(up2(x), k)))
        got = P.phase_upconv_s2d_packed(space_to_depth(x), k,
                                        dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_decoder_block_packed_input_exact():
    """packed_input=4 no-skip fast block == the normal block on d2s input."""
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(2, 8, 8, 24), jnp.float32)
    kw = dict(in_channels=24, skip_channels=0, out_channels=12,
              attention_type="scse", drop_block_prob=0.1, dtype=jnp.float32)
    slow = DecoderBlock(**kw)
    fast = DecoderBlock(fast_tail=True, packed_input=4, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    va = slow.init(rngs, x, None, train=False)
    ys = slow.apply(va, x, None, train=False)
    yf = fast.apply(va, space_to_depth(x), None, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# H2 (pack-along-H-only) layout — the cout>=64 tail's measured sweet spot
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("h,w,cin,cout", [(16, 16, 7, 5), (8, 12, 3, 4)])
def test_conv3x3_h2_out_exact(h, w, cin, cout):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
    ref = P.pack_h2(conv3x3(x, k))
    got = P.conv3x3_h2_out([x], k, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # virtual concat + roundtrip
    b = jnp.asarray(rng.randn(2, h, w, 3), jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, cin + 3, cout), jnp.float32)
    ref2 = conv3x3(jnp.concatenate([x, b], -1), k2)
    got2 = P.unpack_h2(P.conv3x3_h2_out([x, b], k2, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_h2_packed_in_exact():
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 12, 10, 6), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 6, 4), jnp.float32)
    ref = P.pack_h2(conv3x3(x, k))
    got = P.conv3x3_h2([P.pack_h2(x)], k, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_decoder_block_fast_exact_h2():
    """cout>=64 skip nodes take the H2 branch; same params, same output."""
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 8, 8, 24), jnp.float32)
    skips = [jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32),
             jnp.asarray(rng.randn(2, 16, 16, 10), jnp.float32)]
    kw = dict(in_channels=24, skip_channels=16, out_channels=64,
              attention_type="scse", drop_block_prob=0.1, dtype=jnp.float32)
    slow = DecoderBlock(**kw)
    fast = DecoderBlock(fast_tail=True, **kw)
    ys, yf = _init_apply(slow, fast, (x, skips))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=2e-4, atol=2e-4)


def test_stem7_s2d2_exact():
    """double-s2d stem == s2d(lax 7x7/2 conv with 3-pixel zero pad)."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 16, 12, 3), jnp.float32)
    k7 = jnp.asarray(rng.randn(7, 7, 3, 8), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k7, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = P.stem7_s2d2(x, k7, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(space_to_depth(ref)),
                               rtol=1e-5, atol=1e-5)


def test_scse_unpack_h2_fused_exact():
    """packed scSE with the fused H2 un-interleave == gate then unpack."""
    from eyediseasesegmentation_tpu.models.modules.layers import SCSEAttention
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 10, 8, 12), jnp.float32)
    xp = P.pack_h2(x)
    plain = SCSEAttention(packed=2, dtype=jnp.float32)
    fused = SCSEAttention(packed=2, unpack_h2=True, dtype=jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), xp)
    ref = P.unpack_h2(plain.apply(params, xp))
    got = fused.apply(params, xp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Fused Pallas decode-node kernel route (ops/pallas_scse_conv.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cout", [12, 64])
def test_decoder_block_pallas_exact(cout):
    """pallas_tail skip nodes == the normal block (interpret mode on CPU)."""
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 8, 8, 24), jnp.float32)
    skips = [jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32),
             jnp.asarray(rng.randn(2, 16, 16, 10), jnp.float32)]
    kw = dict(in_channels=24, skip_channels=16, out_channels=cout,
              attention_type="scse", drop_block_prob=0.1, dtype=jnp.float32)
    slow = DecoderBlock(**kw)
    fast = DecoderBlock(fast_tail=True, pallas_tail=True, **kw)
    ys, yf = _init_apply(slow, fast, (x, skips))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=2e-4, atol=2e-4)


def test_decoder_block_pallas_no_attention():
    """pallas_tail with attention_type=None (plain conv1/conv2 node)."""
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 8, 8, 12), jnp.float32)
    skips = [jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)]
    kw = dict(in_channels=12, skip_channels=8, out_channels=16,
              attention_type=None, drop_block_prob=0.1, dtype=jnp.float32)
    slow = DecoderBlock(**kw)
    fast = DecoderBlock(fast_tail=True, pallas_tail=True, **kw)
    ys, yf = _init_apply(slow, fast, (x, skips))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Grad-safe packed TRAIN path (fast_train)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pf", [2, 4, 16])
def test_dropblock_packed_exact(pf):
    """Packed DropBlock == logical DropBlock (same rng stream)."""
    from eyediseasesegmentation_tpu.models.modules.layers import DropBlock2d
    from eyediseasesegmentation_tpu.ops import packed as P2
    rng = np.random.RandomState(20)
    x = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)
    key = {"dropout": jax.random.PRNGKey(5)}
    ref = DropBlock2d(0.3, block_size=5).apply({}, x, True, rngs=key)
    if pf == 2:
        xp = P2.pack_h2(x)
    else:
        xp = x
        for _ in range(pf.bit_length() // 2):
            xp = P2.space_to_depth(xp)
    yp = DropBlock2d(0.3, block_size=5, packed=pf).apply({}, xp, True,
                                                         rngs=key)
    if pf == 2:
        got = P2.unpack_h2(yp)
    else:
        got = yp
        for _ in range(pf.bit_length() // 2):
            got = P2.depth_to_space(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_batchnorm_packed_train_exact():
    """Packed train-mode BN: output AND updated running stats == logical."""
    from eyediseasesegmentation_tpu.models.modules.layers import BatchNorm
    from eyediseasesegmentation_tpu.ops import packed as P2
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(2, 8, 8, 5) * 3 + 1, jnp.float32)
    bn = BatchNorm()
    v = bn.init(jax.random.PRNGKey(0), x, train=True)
    ref, upd = bn.apply(v, x, True, mutable=["batch_stats"])
    bn_p = BatchNorm(packed=4)
    got, upd_p = bn_p.apply(v, P2.space_to_depth(x), True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(P2.depth_to_space(got)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd_p["batch_stats"][k]),
            np.asarray(upd["batch_stats"][k]), rtol=1e-5, atol=1e-6)


def _train_loss(blk, v, x, skips, key):
    def loss(params):
        out, _ = blk.apply({**v, "params": params}, x, skips, train=True,
                           rngs={"dropout": key}, mutable=["batch_stats"])
        return jnp.sum(out * out)
    return loss


@pytest.mark.parametrize("cout", [12, 64])
def test_decoder_block_fast_train_outputs_and_grads(cout):
    """fast_train packed node == normal node under TRAIN: outputs, grads,
    and batch-stats updates (same dropout rng)."""
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    rng = np.random.RandomState(22)
    x = jnp.asarray(rng.randn(2, 8, 8, 24), jnp.float32)
    skips = [jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32),
             jnp.asarray(rng.randn(2, 16, 16, 10), jnp.float32)]
    kw = dict(in_channels=24, skip_channels=16, out_channels=cout,
              attention_type="scse", drop_block_prob=0.2, dtype=jnp.float32)
    slow = DecoderBlock(**kw)
    fast = DecoderBlock(fast_tail=True, fast_train=True, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = slow.init(rngs, x, skips, train=True)
    v = dict(v)
    key = jax.random.PRNGKey(9)
    params = v.pop("params")
    ls = _train_loss(slow, v, x, skips, key)
    lf = _train_loss(fast, v, x, skips, key)
    np.testing.assert_allclose(float(ls(params)), float(lf(params)),
                               rtol=1e-4)
    gs = jax.grad(ls)(params)
    gf = jax.grad(lf)(params)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gs),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gf),
                   key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=str(ka))


def test_decoder_block_fast_train_packed_input():
    """The keep_packed -> packed_input=4 chain under TRAIN (x_0_3 -> x_0_4)."""
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    rng = np.random.RandomState(23)
    x = jnp.asarray(rng.randn(2, 8, 8, 24), jnp.float32)
    kw = dict(in_channels=24, skip_channels=0, out_channels=12,
              attention_type="scse", drop_block_prob=0.2, dtype=jnp.float32)
    slow = DecoderBlock(**kw)
    fast = DecoderBlock(fast_tail=True, fast_train=True, packed_input=4, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = dict(slow.init(rngs, x, None, train=True))
    key = jax.random.PRNGKey(9)
    params = v.pop("params")
    ls = _train_loss(slow, v, x, None, key)
    lf = _train_loss(fast, v, space_to_depth(x), None, key)
    np.testing.assert_allclose(float(ls(params)), float(lf(params)),
                               rtol=1e-4)
    gs, gf = jax.grad(ls)(params), jax.grad(lf)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_flagship_fast_train_equals_normal():
    """Whole flagship under TRAIN: fast_train packed tail == normal path
    (loss + grad norm) at a small size with fast_min_res lowered."""
    from eyediseasesegmentation_tpu import models as zoo
    rng = np.random.RandomState(24)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)

    def build(fast_train):
        return zoo.get_model(
            "unetplusplusstar",
            {"encoder_name": "BoTSER50_Axial_Imagenet_3",
             "decoder_attention_type": "scse", "base_dim": 2, "classes": 1,
             "fast_inference": fast_train, "fast_train": fast_train,
             "fast_min_res": 16},
            training=True, dtype=jnp.float32)

    slow, fast = build(False), build(True)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = dict(slow.init(rngs, x, train=True))
    params = v.pop("params")
    key = jax.random.PRNGKey(9)

    def loss(model, p):
        out, _ = model.apply({**v, "params": p}, x, train=True,
                             rngs={"dropout": key},
                             mutable=["batch_stats"])
        final = out[0] if isinstance(out, tuple) else out
        return jnp.mean(final * final)

    ls, gs = jax.value_and_grad(lambda p: loss(slow, p))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(fast, p))(params)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-4)
    ns = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(gs))
    nf = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(gf))
    np.testing.assert_allclose(nf, ns, rtol=1e-3)
