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
