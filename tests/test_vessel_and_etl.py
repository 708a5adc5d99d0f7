"""Vessel pipeline + offline ETL tests."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from eyediseasesegmentation_tpu.data.synthetic import (make_vessel_tree,
                                                       synthetic_fundus)


@pytest.fixture(scope="module")
def vessel_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("drive")
    make_vessel_tree(root, n_train=6, n_test=2, size=(64, 64))
    return root


def test_vessel_pipeline_e2e(vessel_root, tmp_path, monkeypatch):
    import sys
    sys.path.insert(0, "/root/repo")
    import pipeline_vessel as pv

    monkeypatch.chdir(tmp_path)
    override = {
        "dataset_name": "DRIVE", "lesion_type": "Vessel_DRIVE",
        "train_img_path": str(vessel_root / "train" / "image"),
        "train_mask_path": str(vessel_root / "train" / "mask"),
        "test_img_path": str(vessel_root / "test" / "image"),
        "test_mask_path": str(vessel_root / "test" / "mask"),
        "scale_size": 64, "num_epochs": 1, "batch_size": 2, "is_fp16": False,
        "augmentation": "normal",
        "model_name": "classic_unet",
        "model_params": {"filters": (8, 16), "classes": 1},
        "criterion": {"bce": 1.0}, "pos_weights": [5.0], "data_type": "all",
    }
    cfg_file = tmp_path / "override.json"
    cfg_file.write_text(json.dumps(override))
    args = {"createprob": "false", "best": "true", "tta": "hflip",
            "config": str(cfg_file), "exp_name": "vessel_e2e"}
    logdir, result = pv.start_experiment(args)
    assert 0.0 <= result["mean_auc"] <= 1.0
    assert "aucroc" in result["thresholds"]
    # ROC figure + result CSVs written
    assert (Path("outputs") / "DRIVE" / "result_assessment" / "Vessel_DRIVE"
            / "vessel_e2e" / "dice.csv").exists()


def test_tile_mode_training_e2e(vessel_root, tmp_path, monkeypatch):
    """data_type='tile': the trainer consumes img_mask.csv patch lists
    (reference train.py:77-110) and the pipeline infers tiled (tta.py:150) —
    patch-trained vessel models end to end."""
    import sys
    sys.path.insert(0, "/root/repo")
    import pipeline_vessel as pv
    from eyediseasesegmentation_tpu.data.patches import (build_dataframe,
                                                         build_patches)

    monkeypatch.chdir(tmp_path)
    imgs = sorted((vessel_root / "train" / "image").glob("*"))
    masks = sorted((vessel_root / "train" / "mask").glob("*"))
    splits = {"train": (imgs[:4], masks[:4]), "val": (imgs[4:], masks[4:])}
    for split, (si, sm) in splits.items():
        base = tmp_path / "data" / "processed" / "DRIVE" / split / "Vessel_DRIVE"
        build_patches(si, sm, base / "image", base / "mask",
                      window=32, min_overlap=8)
        build_dataframe(base / "image", base / "mask")

    override = {
        "dataset_name": "DRIVE", "lesion_type": "Vessel_DRIVE",
        "train_img_path": str(vessel_root / "train" / "image"),
        "train_mask_path": str(vessel_root / "train" / "mask"),
        "test_img_path": str(vessel_root / "test" / "image"),
        "test_mask_path": str(vessel_root / "test" / "mask"),
        "scale_size": 32, "num_epochs": 1, "batch_size": 2, "is_fp16": False,
        "augmentation": "normal",
        "model_name": "classic_unet",
        "model_params": {"filters": (8, 16), "classes": 1},
        "criterion": {"bce": 1.0}, "pos_weights": [5.0], "data_type": "tile",
    }
    cfg_file = tmp_path / "override.json"
    cfg_file.write_text(json.dumps(override))
    args = {"createprob": "false", "best": "true", "tta": "hflip",
            "config": str(cfg_file), "exp_name": "tile_e2e"}
    logdir, result = pv.start_experiment(args)
    assert (Path(logdir) / "checkpoints" / "best.ckpt").exists()
    assert 0.0 <= result["mean_auc"] <= 1.0


def test_build_patches_balances(tmp_path):
    from eyediseasesegmentation_tpu.data.patches import (build_dataframe,
                                                         build_patches)
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "img"; mask_dir = tmp_path / "msk"
    img_dir.mkdir(); mask_dir.mkdir()
    for i in range(2):
        img, mask = synthetic_fundus(rng, (160, 160), n_blobs=1)
        Image.fromarray(img).save(img_dir / f"im{i}.jpg")
        Image.fromarray(mask).save(mask_dir / f"im{i}.jpg")
    out_i = tmp_path / "out_img"; out_m = tmp_path / "out_msk"
    stats = build_patches(sorted(img_dir.glob("*")), sorted(mask_dir.glob("*")),
                          out_i, out_m, window=64, min_overlap=16)
    n_img = len(list(out_i.glob("*.jpg")))
    assert n_img == len(list(out_m.glob("*.jpg")))
    # negatives pruned down to at most the positive count
    assert stats["neg"] - stats["removed"] <= max(stats["pos"], 1)
    csv = build_dataframe(out_i, out_m)
    assert csv.exists()
    lines = csv.read_text().strip().splitlines()
    assert len(lines) == n_img + 1  # header + rows


def test_vessel_dataset_builder(tmp_path):
    from eyediseasesegmentation_tpu.data.builders import build_vessel_dataset
    rng = np.random.RandomState(0)
    src = tmp_path / "raw"; src.mkdir()
    imgs, masks = [], []
    for i in range(5):
        img, mask = synthetic_fundus(rng, (48, 48))
        ip = src / f"i{i}.png"; mp = src / f"m{i}.png"
        Image.fromarray(img).save(ip); Image.fromarray(mask).save(mp)
        imgs.append(ip); masks.append(mp)
    counts = build_vessel_dataset(imgs, masks, tmp_path / "proc", split=0.8)
    assert counts == {"train": 4, "test": 1}
    assert len(list((tmp_path / "proc" / "train" / "image").glob("*.jpg"))) == 4


def test_compute_mean_std(tmp_path):
    from eyediseasesegmentation_tpu.data.builders import compute_mean_std
    arr = np.full((8, 8, 3), 128, np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    mean, std = compute_mean_std([p], tmp_path / "DS.txt")
    np.testing.assert_allclose(mean, [128 / 255] * 3, atol=1e-3)
    np.testing.assert_allclose(std, [0, 0, 0], atol=1e-3)
    assert (tmp_path / "DS.txt").exists()


def test_black_mask(tmp_path):
    from eyediseasesegmentation_tpu.data.builders import build_black_mask
    rng = np.random.RandomState(0)
    img, _ = synthetic_fundus(rng, (64, 64))
    mask = build_black_mask(img)
    # FOV mask covers the bright circle, not the black corners
    assert mask[32, 32] == 255
    assert mask[0, 0] == 0


def test_make_multilesion(tmp_path):
    from eyediseasesegmentation_tpu.data.builders import make_multilesion
    dirs = {}
    for lesion in ("MA", "HE", "EX", "SE"):
        d = tmp_path / lesion
        d.mkdir()
        m = np.zeros((16, 16), np.uint8)
        m[{"MA": 0, "HE": 4, "EX": 8, "SE": 12}[lesion]:, :] = 255
        Image.fromarray(m).save(d / f"img_{lesion}.tif")
        dirs[lesion] = d
    outs = make_multilesion(dirs, ["img"], tmp_path / "fused")
    fused = np.asarray(Image.open(outs[0]))
    assert set(np.unique(fused)).issubset({0, 1, 10, 20, 30})
    assert fused[15, 0] == 30  # SE overwrites on overlap


def test_clahe_preprocessing(tmp_path):
    from eyediseasesegmentation_tpu.data.builders import prepare_clahe_images
    rng = np.random.RandomState(0)
    img, _ = synthetic_fundus(rng, (64, 64))
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p)
    outs = prepare_clahe_images([p], tmp_path / "Images_CLAHE")
    assert len(outs) == 1 and outs[0].exists()


def test_offline_augmentation(tmp_path):
    from eyediseasesegmentation_tpu.data.augment_offline import (augment_dataset,
                                                                 pad_to_square)
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "img"; mask_dir = tmp_path / "msk"
    img_dir.mkdir(); mask_dir.mkdir()
    img, mask = synthetic_fundus(rng, (32, 32))
    Image.fromarray(img).save(img_dir / "a.jpg")
    Image.fromarray(mask).save(mask_dir / "a.jpg")
    n = augment_dataset(img_dir, mask_dir, tmp_path / "oi", tmp_path / "om",
                        ops=("rotation", "flip", "zoom"), copies_per_op=2)
    assert n == 6
    assert len(list((tmp_path / "oi").glob("*.jpg"))) == 6
    padded = pad_to_square(np.asarray(img), 48)
    assert padded.shape == (48, 48, 3)
    pm = pad_to_square(np.asarray(mask), 48, is_mask=True)
    assert set(np.unique(pm)).issubset({0, 255})


def test_build_fgadr_dataset(tmp_path):
    """Working replacement for the reference's broken build_fgadr.py: pairs
    Seg-set masks by 8-char stem, seed-1999 split, layout consumable by
    get_datapath's FGADR branch."""
    from eyediseasesegmentation_tpu.data.builders import (FGADR_MASK_DIRS,
                                                          build_fgadr_dataset)
    from eyediseasesegmentation_tpu.data.paths import get_datapath

    rng = np.random.RandomState(0)
    seg = tmp_path / "Seg-set"
    (seg / "Original_Images").mkdir(parents=True)
    for d in FGADR_MASK_DIRS:
        (seg / d).mkdir()
    for i in range(5):
        img, mask = synthetic_fundus(rng, (32, 32))
        name = f"{i:04d}_img"  # stem prefix convention f[:8]
        Image.fromarray(img).save(seg / "Original_Images" / f"{name}.png")
        # EX masks for all, MA only for even images (missing-mask path)
        Image.fromarray(mask).save(seg / "HardExudate_Masks" / f"{name}.png")
        if i % 2 == 0:
            Image.fromarray(mask).save(
                seg / "Microaneurysms_Masks" / f"{name}.png")
    counts = build_fgadr_dataset(seg, tmp_path / "proc", split=0.8)
    assert counts == {"train": 4, "test": 1}
    for part, n in counts.items():
        root = tmp_path / "proc" / part
        assert len(list((root / "image").glob("*.png"))) == n
        for d in FGADR_MASK_DIRS:
            assert len(list((root / "label" / d).glob("*.png"))) == n
    imgs, masks = get_datapath(tmp_path / "proc" / "train" / "image",
                               tmp_path / "proc" / "train" / "label",
                               "EX_FGADR")
    assert len(imgs) == 4 and len(masks) == 4
    assert [p.stem for p in imgs] == [p.stem for p in masks]


def test_batch_iterator_workers_deterministic(tmp_path):
    """Thread-pooled decode returns identical batches in identical order."""
    from eyediseasesegmentation_tpu.data.datasets import batch_iterator

    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {"image": rng.rand(4, 4, 3).astype(np.float32),
                    "name": f"s{i}"}

    a = list(batch_iterator(DS(), 3, shuffle=True, seed=5, workers=0))
    b = list(batch_iterator(DS(), 3, shuffle=True, seed=5, workers=4))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])
        assert list(x["name"]) == list(y["name"])
        assert x["n_valid"] == y["n_valid"]
