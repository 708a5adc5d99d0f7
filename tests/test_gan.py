"""GAN fine-tuning trainer tests (reference train_gan.py behavior)."""

import numpy as np
import pytest
import jax.numpy as jnp

from eyediseasesegmentation_tpu.data.synthetic import make_idrid_tree
from eyediseasesegmentation_tpu.data import OneLesionSegmentation, get_datapath
from eyediseasesegmentation_tpu.train.gan import GanTrainer, image_to_patch


def test_image_to_patch_grid():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    p = image_to_patch(x, 4)
    assert p.shape == (2 * 4, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(p[0]), np.asarray(x[0, :4, :4]))


def test_gan_training_runs(tmp_path):
    from pathlib import Path
    make_idrid_tree(tmp_path / "data", lesion_type="SE", n_train=4, n_test=2,
                    size=(32, 32))
    imgs, masks = get_datapath(tmp_path / "data" / "train" / "image",
                               tmp_path / "data" / "train" / "mask", "SE")
    ds = OneLesionSegmentation(imgs, masks)
    cfg = {
        "image_size": 32, "patch_size": 8, "d_weight": 0.01,
        "generator": "classic_unet",
        "generator_params": {"filters": (8, 16), "classes": 1},
        "g_learning_rate": 1e-3, "d_learning_rate": 1e-3,
        "num_epochs": 2, "eval_every": 2, "seg_loss": "bce",
    }
    trainer = GanTrainer(cfg, logdir=tmp_path / "gan")
    result = trainer.fit(ds, ds, batch_size=2)
    assert np.isfinite(result["history"][0]["g_loss"])
    assert np.isfinite(result["history"][0]["d_loss"])
    assert 0.0 <= result["best_ap"] <= 1.0
    assert (tmp_path / "gan" / "best_gan.ckpt").exists()
    assert (tmp_path / "gan" / "gan_metrics.jsonl").exists()


def test_gan_step_sharded_equals_single_device():
    """mesh={'data':2} G/D step == mesh={'data':1} (same seed, same batch) —
    the sharded-training equality bar applied to the GAN trainer."""
    import jax

    cfg = {
        "image_size": 16, "patch_size": 8, "d_weight": 0.01,
        "generator": "classic_unet",
        "generator_params": {"filters": (4, 8), "classes": 1},
        "g_learning_rate": 1e-3, "d_learning_rate": 1e-3, "seg_loss": "bce",
    }
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (4, 16, 16, 3)) * 255
    masks = (jax.random.uniform(jax.random.fold_in(rng, 1), (4, 16, 16))
             < 0.2).astype(jnp.float32)

    outs = []
    for mesh_shape in ({"data": 1}, {"data": 2}):
        tr = GanTrainer({**cfg, "mesh_shape": mesh_shape})
        state = tr.init(jax.random.PRNGKey(3))
        g_params, g_bs, d_params, g_opt, d_opt = state
        g_params, g_bs, d_params, g_opt, d_opt, m = tr._step(
            g_params, g_bs, d_params, g_opt, d_opt, imgs, masks,
            jax.random.PRNGKey(4))
        outs.append((m, g_params))
    (m1, p1), (m2, p2) = outs
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
