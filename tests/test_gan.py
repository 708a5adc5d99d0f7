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
