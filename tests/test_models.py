"""Model zoo tests: build-forward shape checks at tiny scale for every registry
entry (the reference's __main__ smoke checks, made into asserts — SURVEY.md §4),
plus flagship-specific structure tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu import models as zoo


def _init_and_forward(model, shape=(1, 64, 64, 3), train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=train)
    out = model.apply(variables, x, train=train,
                      rngs={"dropout": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"] if train else False)
    if train:
        out = out[0]
    return out, variables


SIMPLE_MODELS = [
    "Unet", "resnet18_unet32", "resnet34_unet32",
    "resnet50_attunet", "resnet34_fpncat128", "resnet34_deeplab128",
    "classic_unet", "sa_unet", "LeeJunHyun_impl_att",
]


@pytest.mark.parametrize("name", SIMPLE_MODELS)
def test_zoo_forward_shapes(name):
    model = zoo.get_model(name)
    out, _ = _init_and_forward(model)
    assert out.shape == (1, 64, 64, 1), f"{name}: {out.shape}"


def test_rrcnn_unet():
    model = zoo.get_model("rrcnn_unet", {"filters": (8, 16, 32)})
    out, _ = _init_and_forward(model, (1, 32, 32, 3))
    assert out.shape == (1, 32, 32, 1)


def test_unet3plus_deep_supervision():
    model = zoo.get_model("Unet3Plus_DS", {"filters": (8, 16, 32, 64, 128),
                                           "deep_supervision": True})
    out, _ = _init_and_forward(model, (1, 64, 64, 3))
    final, deeps = out
    assert final.shape == (1, 64, 64, 1)
    assert len(deeps) == 4
    for d in deeps:
        assert d.shape == (1, 64, 64, 1)


def test_unetplusplus_deepsup():
    model = zoo.get_model("unetplusplus_deepsup",
                          {"encoder_name": "resnet18", "deep_supervision": True,
                           "decoder_attention_type": "scse"})
    out, _ = _init_and_forward(model, (1, 64, 64, 3))
    final, deeps = out
    assert final.shape == (1, 64, 64, 1)
    assert len(deeps) == 3
    # ds taps are at 1/2 input resolution (x_3_3, x_2_3, x_1_3 live at /2)
    for d in deeps:
        assert d.shape == (1, 32, 32, 1)


def test_get_model_training_demotions():
    m = zoo.get_model("unetplusplus_deepsup",
                      {"encoder_name": "resnet18", "deep_supervision": True},
                      training=False)
    assert m.deep_supervision is False


def test_upsample2x_matches_jax_image_resize():
    """upsample2x must equal jax.image.resize 'bilinear' (torch F.interpolate
    align_corners=False) on the active backend, and the MXU banded matrix used
    on TPU must reproduce it exactly."""
    from eyediseasesegmentation_tpu.models.modules.layers import (upsample2x,
                                                                  _up2_matrix)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 9, 6, 5).astype(np.float32))
    want = jax.image.resize(x, (2, 18, 12, 5), "bilinear")
    got = upsample2x(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # the TPU matmul form, evaluated in fp32 numpy
    Uh, Uw = _up2_matrix(9), _up2_matrix(6)
    mm = np.einsum("Hh,nhwc->nHwc", Uh, np.asarray(x))
    mm = np.einsum("Ww,nhwc->nhWc", Uw, mm)
    np.testing.assert_allclose(mm, np.asarray(want), atol=1e-6)
    # the TPU depthwise-transposed-conv form, evaluated in fp32 on CPU:
    # edge-replicated pad + lhs_dilation=2 + separable [1,3,3,1]/4 kernel
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], jnp.float32)
    k = jnp.broadcast_to((k1[:, None] * k1[None, :]).reshape(4, 4, 1, 1),
                         (4, 4, 1, c))
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    np.testing.assert_allclose(np.asarray(y[:, 2:2 + 2 * h, 2:2 + 2 * w]),
                               np.asarray(want), atol=1e-5)


def test_registry_unknown_raises():
    with pytest.raises(KeyError):
        zoo.get_model("not_a_model")


def test_preprocessing_fn():
    fn, mean, std = zoo.get_preprocessing_fn("IDRiD", grayscale=False)
    x = np.full((4, 4, 3), 255.0, np.float32)
    out = fn(x)
    want = np.broadcast_to((1.0 - np.array(mean)) / np.array(std), out.shape)
    np.testing.assert_allclose(out, want, rtol=1e-5)
    fn_g, mean_g, std_g = zoo.get_preprocessing_fn("DRIVE", grayscale=True)
    assert np.isscalar(mean_g) or np.ndim(mean_g) == 0


class TestUnetPlusPlusStar:
    """Flagship: base_dim ties to input/32; use 64x64 input with base_dim=2."""

    @pytest.fixture(scope="class")
    def built(self):
        model = zoo.get_model("unetplusplusstar", {
            "encoder_name": "BoTSER50_Axial_Imagenet_3",
            "decoder_attention_type": "scse",
            "base_dim": 2,
            "classes": 1,
        })
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False)
        return model, variables, x

    def test_forward_shape(self, built):
        model, variables, x = built
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 64, 64, 1)

    def test_layer4_weight_sharing(self, built):
        """The reference reuses one axial block instance twice in layer4
        (nn.Sequential(first_block, block, block)) => exactly one shared set."""
        _, variables, _ = built
        enc = variables["params"]["encoder"]
        assert "layer4_first" in enc and "layer4_shared" in enc
        assert "layer4_shared2" not in enc  # only one instance of the shared block

    def test_deep_supervision_and_clf(self):
        model = zoo.get_model("unetplusplusstar", {
            "encoder_name": "BoTSER50_Axial_scratch",
            "base_dim": 2, "deep_supervision": True, "clf_head": True,
        })
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False)
        mask, ds, clf = model.apply(variables, x, train=False)
        assert mask.shape == (1, 64, 64, 1)
        assert len(ds) == 3 and all(d.shape == (1, 32, 32, 1) for d in ds)
        assert clf.shape == (1, 1)

    def test_train_step_updates_batch_stats(self, built):
        model, variables, x = built
        out, updates = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"])
        assert "batch_stats" in updates
        assert out.shape == (1, 64, 64, 1)

    def test_gradients_flow(self, built):
        model, variables, x = built

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": jax.random.PRNGKey(4)},
                mutable=["batch_stats"])[0]
            return jnp.mean(out ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # positional-encoding tables receive gradient
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0


def test_axial_attention_standalone():
    from eyediseasesegmentation_tpu.models.modules.axial import AxialAttention
    att = AxialAttention(dim=16, in_channels=32, heads=8)
    x = jnp.zeros((4, 16, 32), jnp.float32)
    variables = att.init(jax.random.PRNGKey(0), x, train=False)
    out = att.apply(variables, x, train=False)
    assert out.shape == (4, 16, 32)


def test_cross_axial_attention_standalone():
    from eyediseasesegmentation_tpu.models.modules.axial import CrossAxialAttention
    catt = CrossAxialAttention(dim=16, in_channels=64, in_skip_channels=32, heads=4)
    x = jnp.zeros((4, 16, 64), jnp.float32)
    s = jnp.zeros((4, 16, 32), jnp.float32)
    variables = catt.init(jax.random.PRNGKey(0), x, s, train=False)
    out = catt.apply(variables, x, s, train=False)
    assert out.shape == (4, 16, 32)


def test_flagship_remat_identical_loss():
    """Per-block remat (remat=True) produces the same train-mode loss and
    gradients as the plain flagship — only the backward schedule changes."""
    import numpy as np
    kw = {"encoder_name": "BoTSER50_Axial_Imagenet_3",
          "decoder_attention_type": "scse", "base_dim": 2, "classes": 1}
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    plain = zoo.get_model("unetplusplusstar", dict(kw))
    rem = zoo.get_model("unetplusplusstar", {**kw, "remat": True})
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = plain.init(rngs, x, train=False)

    def loss(model, p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x,
            train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        final = out[0] if isinstance(out, tuple) else out
        return jnp.mean(jnp.square(final))

    l0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(rem, p))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
