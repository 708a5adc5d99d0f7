"""Extras: clf-head training loss, augmentation visualizer, dsconv."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.data.synthetic import synthetic_fundus
from eyediseasesegmentation_tpu.train.trainer import Trainer


def test_clf_head_training_adds_loss(tmp_path):
    """Models with a classification head get the per-patch clf BCE added
    (reference train_tmp.py / lesion_dataset_tmp.py semantics)."""
    cfg = {
        "dataset_name": "IDRiD", "lesion_type": "EX", "augmentation": "normal",
        "scale_size": 32, "batch_size": 2, "learning_rate": 1e-3,
        "is_fp16": False,
        "model_name": "Unet",
        "model_params": {"encoder_name": "resnet18", "clf_head": True},
        "criterion": {"bce": 1.0}, "pos_weights": [1.0], "optimizer": "adamw",
    }
    tr = Trainer(cfg, logdir=tmp_path, seed=0)
    state = tr.init_state(jax.random.PRNGKey(0), sample_shape=(2, 32, 32, 3))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3) * 255, jnp.float32)
    masks = jnp.asarray((rng.rand(2, 32, 32) < 0.3), jnp.float32)
    state, m = tr._train_step(state, imgs, masks, jax.random.PRNGKey(1),
                              jnp.asarray(1e-3, jnp.float32))
    assert "loss_clf" in m
    assert np.isfinite(float(m["loss_clf"]))


def test_val_aucpr_metric(tmp_path):
    """metric='aucpr' selects checkpoints on the on-device PR sweep (the
    reference's disabled AucPRMetricCallback role, util/aucpr_cb.py:15-65)."""
    import json
    from eyediseasesegmentation_tpu.data.synthetic import make_idrid_tree
    from eyediseasesegmentation_tpu.train import train_model

    make_idrid_tree(tmp_path / "d", lesion_type="EX", n_train=4, n_test=2,
                    size=(32, 32))
    cfg = {
        "train_img_path": str(tmp_path / "d" / "train" / "image"),
        "train_mask_path": str(tmp_path / "d" / "train" / "mask"),
        "dataset_name": "IDRiD", "lesion_type": "EX", "augmentation": "normal",
        "scale_size": 32, "num_epochs": 1, "batch_size": 2, "val_size": 0.3,
        "is_fp16": False, "model_name": "classic_unet",
        "model_params": {"filters": (8, 16)}, "criterion": {"bce": 1.0},
        "pos_weights": [1.0], "metric": "aucpr", "mode": "max",
    }
    logdir = train_model("aucpr_exp", cfg, seed=0,
                         models_root=str(tmp_path / "m"))
    rows = [json.loads(l) for l in (logdir / "metrics.jsonl").read_text().splitlines()]
    assert "val_aucpr" in rows[0]
    assert 0.0 <= rows[0]["val_aucpr"] <= 1.0 + 1e-6


def test_visualize_augmentations(tmp_path):
    from eyediseasesegmentation_tpu.analysis.visualize import visualize_augmentations
    from eyediseasesegmentation_tpu.data import get_transform

    rng = np.random.RandomState(0)
    img, mask = synthetic_fundus(rng, (32, 32))
    tf = get_transform("advanced")(image_size=32)
    out = visualize_augmentations(img.astype(np.float32),
                                  (mask > 127).astype(np.float32),
                                  tf, tmp_path / "test.jpg", n=4)
    assert out.exists()


def test_dsconv():
    from eyediseasesegmentation_tpu.models.modules import DepthwiseSeparableConv2d
    m = DepthwiseSeparableConv2d(8)
    x = jnp.zeros((1, 16, 16, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 16, 16, 8)
