"""One train-mode step per model family: gradients flow and are finite.

The zoo shape tests cover eval forward for every registry name; this file
pins the TRAIN path (DropBlock/BN-stats/dropout rngs + backward) for one
representative of each family — the role of the reference's per-file
``__main__`` build-forward-backward smoke checks (SURVEY §4.1)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu import models as zoo

TRAIN_FAMILIES = [
    ("classic_unet", {"filters": (8, 16)}),
    ("resnet18_unet32", {}),
    ("mobilenetv3_attunet", {}),
    ("hrnet18", {}),
    ("sa_unet", {"filters": (8, 16)}),
    ("resunetplusplus", {"filters": (8, 16, 32)}),
    ("unetplusplus_deepsup", {"encoder_name": "resnet18", "deep_supervision": False}),
    ("transunet_r50", {"hidden": 64, "depth": 1, "heads": 4}),
    ("SegFormerStar", {"variant": "mit_b0"}),
]


def _first(out):
    while isinstance(out, (tuple, list)):
        out = out[0]
    return out


@pytest.mark.parametrize("name,params", TRAIN_FAMILIES)
def test_train_step_gradients(name, params):
    model = zoo.get_model(name, dict(params), training=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=True)

    has_bn = "batch_stats" in variables

    def loss_fn(p):
        res = model.apply(
            {"params": p, **{k: v for k, v in variables.items() if k != "params"}},
            x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"] if has_bn else False,
        )
        out = res[0] if has_bn else res
        return jnp.mean(jnp.square(_first(out)))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.sum(jnp.abs(g))) for g in leaves]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.5, (
        f"{name}: too many zero gradients")
