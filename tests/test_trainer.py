"""Synthetic-data integration tests of the training engine (the role of the
reference's src/main/test.py Catalyst scratchpad — SURVEY.md §4.3)."""

import json

import numpy as np
import pytest
import jax

from eyediseasesegmentation_tpu.data.synthetic import make_idrid_tree
from eyediseasesegmentation_tpu.train import train_model
from eyediseasesegmentation_tpu.train.checkpoint import load_checkpoint


@pytest.fixture(scope="module")
def small_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_idrid_tree(root, lesion_type="EX", n_train=6, n_test=2, size=(64, 64))
    return {
        "train_img_path": str(root / "train" / "image"),
        "train_mask_path": str(root / "train" / "mask"),
        "dataset_name": "IDRiD",
        "lesion_type": "EX",
        "gray": False,
        "augmentation": "normal",
        "use_ben_transform": False,
        "scale_size": 64,
        "data_type": "all",
        "num_epochs": 3,
        "batch_size": 2,
        "val_size": 0.34,
        "learning_rate": 1e-3,
        "weight_decay": 1e-5,
        "is_fp16": False,
        "model_name": "classic_unet",
        "model_params": {"filters": (8, 16, 32), "classes": 1},
        "metric": "dice",
        "mode": "max",
        "criterion": {"bce": 0.8, "log_dice": 0.2},
        "deep_supervision": False,
        "pos_weights": [5.0],
        "optimizer": "adamw",
        "scheduler": "reduce",
        "early_stopping_patience": 20,
    }


@pytest.fixture(scope="module")
def run(small_config, tmp_path_factory):
    models_root = tmp_path_factory.mktemp("models")
    logdir = train_model("test_exp", small_config, seed=1999,
                         models_root=str(models_root))
    return logdir


def test_artifacts_layout(run):
    # models/<dataset>/<lesion>/<exp>/ with config.json + checkpoints (README:55-57)
    assert run.name == "test_exp"
    assert run.parent.name == "EX" and run.parent.parent.name == "IDRiD"
    assert (run / "config.json").exists()
    for ckpt in ("best.ckpt", "last.ckpt", "best_full.ckpt"):
        assert (run / "checkpoints" / ckpt).exists()


def test_config_roundtrip(run, small_config):
    saved = json.loads((run / "config.json").read_text())
    assert saved["model_name"] == small_config["model_name"]
    assert saved["criterion"] == {"bce": 0.8, "log_dice": 0.2}


def test_training_progress(run):
    rows = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
    assert len(rows) == 3
    losses = [r["train_loss"] for r in rows]
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert all(np.isfinite(r["val_dice"]) for r in rows)


def test_flagship_learns(tmp_path_factory):
    """Accuracy evidence for the flagship: UnetPlusPlusStar (axial encoder,
    cross-axial skip gates, in-logit BN) trained on synthetic blobs must
    OPTIMIZE, not just compile — val dice rises from ~0.15 to >0.6 in 10
    epochs (a 30-epoch run reaches 0.93). Guards the axial-BN train path
    (SURVEY.md §7 hard parts; reference train.py:160)."""
    root = tmp_path_factory.mktemp("flagship")
    make_idrid_tree(root / "data", lesion_type="EX", n_train=12, n_test=2,
                    size=(64, 64))
    cfg = {
        "train_img_path": str(root / "data" / "train" / "image"),
        "train_mask_path": str(root / "data" / "train" / "mask"),
        "dataset_name": "IDRiD", "lesion_type": "EX",
        "augmentation": "normal", "scale_size": 64, "num_epochs": 10,
        "batch_size": 4, "val_size": 0.25, "learning_rate": 1e-3,
        "weight_decay": 1e-5, "is_fp16": False,
        "model_name": "unetplusplusstar",
        "model_params": {"encoder_name": "BoTSER50_Axial_scratch",
                         "decoder_attention_type": "scse",
                         "base_dim": 2, "classes": 1},
        "criterion": {"bce": 0.8, "log_dice": 0.2}, "pos_weights": [5.0],
        "optimizer": "adamw", "scheduler": "reduce",
        "metric": "dice", "mode": "max",
    }
    logdir = train_model("flagship_learn", cfg, seed=1999,
                         models_root=str(root / "models"))
    rows = [json.loads(l) for l in
            (logdir / "metrics.jsonl").read_text().splitlines()]
    dice = [r["val_dice"] for r in rows]
    assert max(dice) > 0.6, f"flagship did not learn: {dice}"
    assert dice[-1] > dice[0] * 2, f"no improvement: {dice}"


def test_val_dice_semantics_and_visuals(run):
    """Epoch val dice is the PER-BATCH MEAN (the reference's Catalyst
    DiceCallback semantics, train.py:300-309) with the global-counts variant
    logged alongside; each epoch writes best/worst val-batch overlays (the
    ShowPolarBatchesCallback role, train.py:323-327)."""
    rows = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
    for r in rows:
        assert np.isfinite(r["val_dice"]) and np.isfinite(r["val_dice_global"])
        assert 0.0 <= r["val_dice"] <= 1.0
        assert np.isfinite(r["val_iou_global"])
    visuals = sorted((run / "visuals").glob("*.png"))
    # one best + one worst per epoch
    assert len(visuals) == 2 * len(rows), visuals
    assert any("best" in v.name for v in visuals)
    assert any("worst" in v.name for v in visuals)
    for v in visuals:
        assert v.name.startswith("epoch")


def test_tensorboard_events_written(run):
    """TB event files mirror metrics.jsonl (reference gets these from
    Catalyst's logdir writers, README.md:9)."""
    events = list(run.glob("events.out.tfevents.*"))
    assert events, "no TensorBoard event file in logdir"
    # readable scalars with the expected tags
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    acc = EventAccumulator(str(run))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/loss", "val/dice", "lr"} <= tags, tags
    assert len(acc.Scalars("val/dice")) == 3  # one per epoch


def test_checkpoint_contract(run):
    ckpt = load_checkpoint(run / "checkpoints" / "best.ckpt")
    # the model_state_dict key is the contract tta/ensemble consume
    assert "model_state_dict" in ckpt
    assert "params" in ckpt["model_state_dict"]
    assert "metric" in ckpt


def test_deep_supervision_training(small_config, tmp_path_factory):
    cfg = dict(small_config)
    cfg.update(model_name="unetplusplus_deepsup",
               model_params={"encoder_name": "resnet18", "deep_supervision": True,
                             "decoder_attention_type": "scse"},
               deep_supervision=True, criterion_ds="bce", num_epochs=1)
    models_root = tmp_path_factory.mktemp("models_ds")
    logdir = train_model("ds_exp", cfg, seed=1999, models_root=str(models_root))
    rows = [json.loads(l) for l in (logdir / "metrics.jsonl").read_text().splitlines()]
    assert np.isfinite(rows[0]["train_loss"])


def test_sharded_training_on_virtual_mesh(small_config, tmp_path_factory):
    """8-virtual-device CPU mesh: batch sharded over 'data'
    (the distributed_training.py role — SURVEY.md §4.4)."""
    assert jax.device_count() == 8, "conftest must force 8 CPU devices"
    cfg = dict(small_config)
    cfg.update(mesh_shape={"data": 4}, batch_size=4, num_epochs=1)
    models_root = tmp_path_factory.mktemp("models_mesh")
    logdir = train_model("mesh_exp", cfg, seed=1999, models_root=str(models_root))
    rows = [json.loads(l) for l in (logdir / "metrics.jsonl").read_text().splitlines()]
    assert np.isfinite(rows[0]["train_loss"])


def test_sharded_training_equals_single_device():
    """mesh={'data':4} must produce the SAME trajectory as mesh={'data':1}:
    per-step loss/dice and the final params agree to fp tolerance — the
    training analogue of test_sharded_tta's equality bar (SURVEY §2.11 DP)."""
    import jax.numpy as jnp
    from eyediseasesegmentation_tpu.train.trainer import Trainer

    base = {
        "dataset_name": "IDRiD", "lesion_type": "EX",
        "augmentation": "normal", "scale_size": 32, "batch_size": 4,
        "learning_rate": 1e-3, "weight_decay": 1e-5, "is_fp16": False,
        "model_name": "classic_unet",
        "model_params": {"filters": [4, 8], "classes": 1},
        "criterion": {"bce": 0.8, "log_dice": 0.2}, "pos_weights": [5.0],
        "optimizer": "adamw",
    }
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(3, 4, 32, 32, 3) * 255, jnp.float32)
    masks = jnp.asarray((rng.rand(3, 4, 32, 32) < 0.3), jnp.float32)

    results = []
    for n_dev in (1, 4):
        tr = Trainer({**base, "mesh_shape": {"data": n_dev}}, seed=1999)
        state = tr.init_state(jax.random.PRNGKey(0),
                              sample_shape=(4, 32, 32, 3))
        metrics = []
        for step in range(3):
            state, m = tr._train_step(state, images[step], masks[step],
                                      jax.random.PRNGKey(7),
                                      jnp.asarray(1e-3, jnp.float32))
            metrics.append({k: float(v) for k, v in m.items()})
        results.append((metrics, jax.device_get(state.params)))

    (m1, p1), (m4, p4) = results
    for s, (a, b) in enumerate(zip(m1, m4)):
        for k in ("loss", "dice", "iou"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-5, atol=1e-6,
                                       err_msg=f"step {s} metric {k}")
    flat1 = jax.tree_util.tree_leaves(p1)
    flat4 = jax.tree_util.tree_leaves(p4)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_resume_from_best_full(run, small_config):
    cfg = dict(small_config)
    cfg["num_epochs"] = 4  # one more than the original run
    cfg["resume_path"] = str(run / "checkpoints" / "best_full.ckpt")
    logdir = train_model("resume_exp", cfg, seed=1999,
                         models_root=str(run.parent.parent.parent))
    rows = [json.loads(l) for l in (logdir / "metrics.jsonl").read_text().splitlines()]
    # resumed at epoch 3 (after the 3 completed epochs) => exactly 1 new epoch
    assert [r["epoch"] for r in rows] == [3]


def test_remat_train_step_identical(tmp_path):
    """remat=True (jax.checkpoint over the forward) must be numerically
    identical to the plain step — it only changes the backward schedule."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eyediseasesegmentation_tpu.train.trainer import Trainer

    base = {
        "dataset_name": "IDRiD", "lesion_type": "EX",
        "augmentation": "normal", "scale_size": 32, "batch_size": 2,
        "learning_rate": 1e-3, "weight_decay": 1e-5, "is_fp16": False,
        "model_name": "classic_unet",
        "model_params": {"filters": [4, 8], "classes": 1},
        "criterion": {"bce": 0.8, "log_dice": 0.2}, "pos_weights": [5.0],
        "optimizer": "adamw", "mesh_shape": {"data": 1},
    }
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 32, 3) * 255, jnp.float32)
    masks = jnp.asarray((rng.rand(2, 32, 32) < 0.3), jnp.float32)

    losses = []
    for remat in (False, True):
        tr = Trainer({**base, "remat": remat}, seed=1999)
        state = tr.init_state(jax.random.PRNGKey(0),
                              sample_shape=(2, 32, 32, 3))
        state, m = tr._train_step(state, images, masks, jax.random.PRNGKey(1),
                                  jnp.asarray(1e-3, jnp.float32))
        state, m = tr._train_step(state, images, masks, jax.random.PRNGKey(2),
                                  jnp.asarray(1e-3, jnp.float32))
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-6)


def test_finetune_freezes_encoder(tmp_path):
    """finetune=True (reference train.py:230-240): encoder params AND encoder
    BN statistics must not move over train steps, while the decoder learns."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eyediseasesegmentation_tpu.train.trainer import Trainer

    base = {
        "dataset_name": "IDRiD", "lesion_type": "EX",
        "augmentation": "normal", "scale_size": 32, "batch_size": 2,
        "learning_rate": 1e-2, "weight_decay": 1e-2, "is_fp16": False,
        "model_name": "resnet18_unet32",
        "model_params": {"decoder_channels": [16, 8, 8, 8, 8], "classes": 1},
        "criterion": {"bce": 1.0}, "pos_weights": [5.0],
        "optimizer": "adamw", "mesh_shape": {"data": 1},
        "finetune": True,
    }
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 32, 3) * 255, jnp.float32)
    masks = jnp.asarray((rng.rand(2, 32, 32) < 0.3), jnp.float32)

    tr = Trainer(base, seed=1999)
    state0 = tr.init_state(jax.random.PRNGKey(0), sample_shape=(2, 32, 32, 3))
    # host copies: the train step donates its input state, deleting buffers
    snap = jax.tree_util.tree_map(lambda x: np.array(x, copy=True),
                                  {"enc": dict(state0.params)["encoder"],
                                   "bs": dict(state0.batch_stats)["encoder"],
                                   "dec": dict(state0.params)["decoder"]})
    enc0, bs0, dec0 = snap["enc"], snap["bs"], snap["dec"]

    state = state0
    for i in (1, 2):
        state, _ = tr._train_step(state, images, masks, jax.random.PRNGKey(i),
                                  jnp.asarray(1e-2, jnp.float32))

    enc1 = jax.tree_util.tree_map(np.asarray, dict(state.params)["encoder"])
    bs1 = jax.tree_util.tree_map(np.asarray, dict(state.batch_stats)["encoder"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, enc0, enc1)
    jax.tree_util.tree_map(np.testing.assert_array_equal, bs0, bs1)

    # decoder must actually learn (weight decay alone would also change it,
    # but gradients flow: at least one decoder kernel moves)
    dec1 = jax.tree_util.tree_map(np.asarray, dict(state.params)["decoder"])
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), dec0, dec1)
    assert max(jax.tree_util.tree_leaves(deltas)) > 0, "decoder did not move"

    # control: without finetune the encoder does move
    tr2 = Trainer({**base, "finetune": False}, seed=1999)
    s2 = tr2.init_state(jax.random.PRNGKey(0), sample_shape=(2, 32, 32, 3))
    s2, _ = tr2._train_step(s2, images, masks, jax.random.PRNGKey(1),
                            jnp.asarray(1e-2, jnp.float32))
    enc2 = jax.tree_util.tree_map(np.asarray, dict(s2.params)["encoder"])
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), enc0, enc2)
    assert max(jax.tree_util.tree_leaves(moved)) > 0, "control encoder frozen?"


def test_uint8_wire_step_matches_fp32(tmp_path):
    """The uint8 host→device wire format (4× less H2D) is EXACT: a train step
    fed uint8 pixels/masks must produce bit-identical loss and params to the
    fp32-fed step (the step promotes on device; decoded pixels are integral)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eyediseasesegmentation_tpu.train.trainer import Trainer

    base = {
        "dataset_name": "IDRiD", "lesion_type": "EX",
        "augmentation": "normal", "scale_size": 32, "batch_size": 2,
        "learning_rate": 1e-2, "weight_decay": 1e-2, "is_fp16": False,
        "model_name": "resnet18_unet32",
        "model_params": {"decoder_channels": [16, 8, 8, 8, 8], "classes": 1},
        "criterion": {"bce": 1.0}, "pos_weights": [5.0],
        "optimizer": "adamw", "mesh_shape": {"data": 1},
    }
    rng = np.random.RandomState(0)
    img_u8 = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    msk_u8 = (rng.rand(2, 32, 32) < 0.3).astype(np.uint8)

    tr = Trainer(base, seed=1999)
    assert tr._uint8_wire  # default wire format (gray=False)
    outs = {}
    for tag, img, msk in (("u8", img_u8, msk_u8),
                          ("f32", img_u8.astype(np.float32),
                           msk_u8.astype(np.float32))):
        state = tr.init_state(jax.random.PRNGKey(0), sample_shape=(2, 32, 32, 3))
        state, m = tr._train_step(state, jnp.asarray(img), jnp.asarray(msk),
                                  jax.random.PRNGKey(7),
                                  jnp.asarray(1e-2, jnp.float32))
        outs[tag] = (float(m["loss"]),
                     jax.tree_util.tree_map(np.asarray, state.params))
    assert outs["u8"][0] == outs["f32"][0]
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           outs["u8"][1], outs["f32"][1])
