"""Multi-chip TTA: the fused view batch sharded over the mesh's data axis."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu import models as zoo
from eyediseasesegmentation_tpu.infer.tta import TTAPredictor
from eyediseasesegmentation_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def small_model():
    model = zoo.get_model("classic_unet", {"filters": (8, 16)})
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    return model, variables


@pytest.mark.parametrize("tta", ["multiscale", "five_crop", "ten_crop", "flip"])
def test_all_tta_families_produce_valid_probs(small_model, tta):
    model, variables = small_model
    cfg = {"dataset_name": "IDRiD", "gray": False, "scale_size": 32}
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 255
    p = np.asarray(TTAPredictor(model, variables, cfg, tta=tta,
                                ori_hw=(32, 32)).predict(x))
    assert p.shape == (1, 32, 32)
    assert 0.0 <= p.min() and p.max() <= 1.0
    assert p.std() > 0  # non-degenerate


def test_flip_tta_is_view_mean(small_model):
    """flip (4 views) equals sigmoid of the explicit mean of the 4 aligned
    LOGITS (ttach merges raw outputs; one sigmoid after, tta.py:92-113)."""
    from eyediseasesegmentation_tpu.ops import image as I
    model, variables = small_model
    cfg = {"dataset_name": "IDRiD", "gray": False, "scale_size": 32}
    x = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32) * 255
    fused = np.asarray(TTAPredictor(model, variables, cfg, tta="flip",
                                    ori_hw=(32, 32)).predict(x))
    none = TTAPredictor(model, variables, cfg, tta="none", ori_hw=(32, 32))

    def logit(xv):
        p = np.clip(np.asarray(none.predict(xv))[0], 1e-7, 1 - 1e-7)
        return np.log(p / (1 - p))

    v0 = logit(x)
    v1 = logit(x[:, :, ::-1])[:, ::-1]      # hflip
    v2 = logit(x[:, ::-1])[::-1]            # vflip
    v3 = logit(x[:, ::-1, ::-1])[::-1, ::-1]
    manual = 1.0 / (1.0 + np.exp(-np.mean([v0, v1, v2, v3], axis=0)))
    np.testing.assert_allclose(fused[0], manual, atol=2e-3)


def test_sharded_d4_matches_single_device(small_model):
    assert jax.device_count() == 8
    model, variables = small_model
    cfg = {"dataset_name": "IDRiD", "gray": False, "scale_size": 32}
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 255

    single = TTAPredictor(model, variables, cfg, tta="d4", ori_hw=(32, 32))
    p_single = np.asarray(single.predict(x))

    mesh = make_mesh({"data": 8})  # 8 views -> 8 devices
    sharded = TTAPredictor(model, variables, cfg, tta="d4", ori_hw=(32, 32),
                           mesh=mesh)
    p_sharded = np.asarray(sharded.predict(x))

    np.testing.assert_allclose(p_sharded, p_single, rtol=1e-5, atol=1e-5)


class _PointwiseModel:
    """Local (1×1) model: per-tile forward == whole-image forward, so the
    tiled multiscale path must match the monolithic path exactly."""

    def init(self, rngs, x, train=False):
        return {}

    def apply(self, variables, x, train=False):
        w = jnp.asarray([0.02, -0.03, 0.01], jnp.float32)
        return (x @ w[:, None]) - 0.5


def test_tiled_multiscale_matches_monolithic():
    """Scales over multiscale_max_res run tiled (lax.scan over s² tiles,
    scale_and_translate slicing); for a pointwise model this is exactly the
    monolithic resize->forward->resize leg."""
    model = _PointwiseModel()
    cfg = {"dataset_name": "IDRiD", "gray": False, "scale_size": 32}
    x = np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32) * 255
    mono = TTAPredictor(model, {}, cfg, tta="multiscale", ori_hw=(32, 32),
                        multiscale_max_res=1 << 20)
    tiled = TTAPredictor(model, {}, cfg, tta="multiscale", ori_hw=(32, 32),
                         multiscale_max_res=32)  # every s>1 leg goes tiled
    np.testing.assert_allclose(np.asarray(tiled.predict(x)),
                               np.asarray(mono.predict(x)), atol=1e-6)


def test_tiled_multiscale_real_model_valid():
    model = zoo.get_model("classic_unet", {"filters": (8, 16)})
    xin = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, xin, train=False)
    cfg = {"dataset_name": "IDRiD", "gray": False, "scale_size": 32}
    x = np.random.RandomState(3).rand(1, 32, 32, 3).astype(np.float32) * 255
    p = np.asarray(TTAPredictor(model, variables, cfg, tta="multiscale",
                                ori_hw=(32, 32),
                                multiscale_max_res=32).predict(x))
    assert p.shape == (1, 32, 32)
    assert 0.0 <= p.min() and p.max() <= 1.0 and p.std() > 0
