"""Spatial (context-parallel) sharding: halo-exchange primitives and the
mesh-sharded tile scan, exact vs their unsharded counterparts on the
virtual 8-device CPU mesh (SURVEY §5.7's 'honest CP analogue')."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.parallel import make_mesh
from eyediseasesegmentation_tpu.parallel import spatial as SP


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8
    return make_mesh({"data": 8})


def test_spatial_conv3x3_exact(mesh):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 16, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 5, 7), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = SP.spatial_predict(
        lambda xl: SP.conv3x3_spatial(xl, k), x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_upsample2x_exact(mesh):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 32, 8, 3), jnp.float32)
    ref = jax.image.resize(x, (1, 64, 16, 3), "bilinear")
    got = SP.spatial_predict(SP.upsample2x_spatial, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_conv_stack_exact(mesh):
    """Composed CP forward: conv → pool → conv → upsample → conv, sharded
    along H the whole way (no full-resolution gather anywhere)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 64, 16, 4), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 8, 8), jnp.float32)
    k3 = jnp.asarray(rng.randn(3, 3, 8, 2), jnp.float32)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    ref = conv(x, k1)
    ref = pool(ref)
    ref = conv(ref, k2)
    ref = jax.image.resize(ref, (1, 64, 16, 8), "bilinear")
    ref = conv(ref, k3)

    def stack(xl):
        y = SP.conv3x3_spatial(xl, k1)
        y = SP.pool2x_spatial(y, "max")
        y = SP.conv3x3_spatial(y, k2)
        y = SP.upsample2x_spatial(y)
        return SP.conv3x3_spatial(y, k3)

    got = SP.spatial_predict(stack, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("blend", ["overwrite", "mean"])
def test_tiled_predict_sharded_matches_sequential(mesh, blend):
    """Grid-sharded tile scan == sequential scan, including the reference's
    later-tiles-overwrite rule (priority-max combine)."""
    from eyediseasesegmentation_tpu.ops.tiling import (tiled_predict,
                                                       tiled_predict_sharded)
    from eyediseasesegmentation_tpu.utils import make_grid

    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(70, 90, 3), jnp.float32)
    window, scale = 32, 16
    grid = jnp.asarray(make_grid((70, 90), window=window, min_overlap=8))
    assert grid.shape[0] % 8 != 0  # exercises the padding path

    w1 = jnp.asarray(rng.randn(3), jnp.float32)

    def predict_fn(tile):  # (scale, scale, 3) -> (scale, scale)
        return jax.nn.sigmoid(tile @ w1 - 0.3)

    seq = tiled_predict(predict_fn, image, grid, window, scale, blend=blend)
    shd = tiled_predict_sharded(predict_fn, image, grid, window, scale,
                                mesh, blend=blend)
    np.testing.assert_allclose(np.asarray(shd), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_sharded_ensemble_matches_host_mean(mesh):
    """Device-axis ensemble (members over chips + psum-mean, SURVEY §3.5)
    == the host-side per-model mean, including the zero-weight padding of
    member count up to the axis size."""
    from eyediseasesegmentation_tpu import models as zoo
    from eyediseasesegmentation_tpu.infer.tta import TTAPredictor
    from eyediseasesegmentation_tpu.infer.ensemble import make_sharded_ensemble

    model = zoo.get_model("classic_unet", {"filters": (8, 16)})
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    cfg = {"dataset_name": "IDRiD", "gray": False, "scale_size": 32}
    preds = []
    for seed in range(3):  # 3 members on an 8-device axis: padding exercised
        variables = model.init({"params": jax.random.PRNGKey(seed),
                                "dropout": jax.random.PRNGKey(99)},
                               x0, train=False)
        preds.append(TTAPredictor(model, variables, cfg, tta="d4",
                                  ori_hw=(32, 32)))
    imgs = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3) * 255,
                       jnp.float32)
    host = sum(p.predict(imgs) for p in preds) / len(preds)
    sharded = make_sharded_ensemble(preds, mesh)(imgs)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(host),
                               rtol=1e-5, atol=1e-5)


def test_spatial_flagship_matches_unsharded(mesh):
    """The FULL flagship runs context-parallel: H-sharded stem/maxpool front,
    replicated /4-and-below middle (incl. the axial layer4 — its height
    attention never crosses a shard), H-sharded x_3_3..x_0_4+head tail with
    psum'd scSE gates — and equals the unsharded normal path (round-2 review
    item 4 / SURVEY §5.7)."""
    from functools import partial

    from eyediseasesegmentation_tpu import models as zoo
    from eyediseasesegmentation_tpu.parallel.spatial_model import (
        spatial_flagship_predict)

    S, base_dim = 128, 4
    model = zoo.get_model(
        "unetplusplusstar",
        {"encoder_name": "BoTSER50_Axial_Imagenet_3",
         "decoder_attention_type": "scse", "base_dim": base_dim,
         "classes": 1, "fast_inference": False},  # normal path = reference
        training=False, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, S, S, 3), jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x)

    ref = model.apply(variables, x, train=False)
    got = spatial_flagship_predict(variables, x, mesh, base_dim=base_dim)
    assert got.shape == ref.shape == (2, S, S, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_spatial_flagship_grads_match_unsharded(mesh):
    """Context-parallel TRAINING capability: parameter gradients through the
    H-sharded flagship forward (halo-exchange ppermute transposes, psum'd
    gates) equal the unsharded path's gradients."""
    from functools import partial

    from eyediseasesegmentation_tpu import models as zoo
    from eyediseasesegmentation_tpu.parallel.spatial_model import (
        spatial_flagship_predict)

    S, base_dim = 64, 2
    model = zoo.get_model(
        "unetplusplusstar",
        {"encoder_name": "BoTSER50_Axial_Imagenet_3",
         "decoder_attention_type": "scse", "base_dim": base_dim,
         "classes": 1, "fast_inference": False},
        training=False, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, S, S, 3), jnp.float32)
    tgt = (jax.random.uniform(jax.random.PRNGKey(2), (1, S, S, 1))
           < 0.2).astype(jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x)
    v = dict(variables)
    params = v.pop("params")

    def loss_ref(p):
        out = model.apply({**v, "params": p}, x, train=False)
        return jnp.mean((jax.nn.sigmoid(out) - tgt) ** 2)

    def loss_cp(p):
        out = spatial_flagship_predict({**v, "params": p}, x, mesh,
                                       base_dim=base_dim)
        return jnp.mean((jax.nn.sigmoid(out) - tgt) ** 2)

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lc, gc = jax.value_and_grad(loss_cp)(params)
    np.testing.assert_allclose(float(lc), float(lr), rtol=1e-5)
    leaves_r = jax.tree_util.tree_leaves_with_path(gr)
    leaves_c = {str(k): g for k, g in
                jax.tree_util.tree_leaves_with_path(gc)}
    checked = 0
    for k, a in leaves_r:
        b = leaves_c[str(k)]
        scale = max(float(jnp.max(jnp.abs(a))), 1e-8)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4 * scale,
                                   err_msg=str(k))
        checked += 1
    assert checked == len(leaves_r)
