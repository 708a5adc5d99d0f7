"""Metric-level AUC-PR parity: the BASELINE.md 1e-3 north star, closed at the
REPORTED-NUMBER level (round-4 verdict item 3).

The same weights (the hand-built TorchFlagship replica transferred into the
flax flagship) and the same on-disk images run through

  (a) the reference-shaped torch inference math — LongestMaxSize +
      PadIfNeeded(constant 0) + (x/255-mean)/std, D4 TTA with logits merged
      mean then one sigmoid (ttach SegmentationTTAWrapper, reference
      tta.py:92-121), center-crop of the pad, cv2.INTER_LINEAR resize back,
      GT riding the same compose (nearest for masks) — then mean per-image
      ``average_precision_score`` skipping empty-GT images (aucpr.py:17-30)
      and the 19-threshold PR sweep with its three optimal thresholds
      (aucpr.py:45-118); and

  (b) this repo's REAL ``infer.tta.test_tta`` path end-to-end (checkpoint
      load, TestSegmentation, TTAPredictor, fused batch metrics,
      pr_curve_report),

and the reported mean AUC-PR, sweep AUC-PR and all three optimal thresholds
must agree to ≤1e-3.  Two geometries: pad-only (no resize: ori 32×64 at
scale 64) and full resize→pad→crop→resize-back (ori 96×128 at scale 64,
which also exercises the reference's lossy GT roundtrip).  Logits-level
parity of the same model is pinned separately at 1e-4 by
tests/test_flagship_torch_oracle.py; this test pins everything AFTER the
logits too.
"""

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
sklearn_metrics = pytest.importorskip("sklearn.metrics")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from test_flagship_torch_oracle import BASE_DIM, TorchFlagship, transfer

SCALE = 32 * BASE_DIM  # 64: the reduced-res scale_size
IDRID_MEAN = np.array([0.44976714, 0.2186806, 0.06459363])
IDRID_STD = np.array([0.33224553, 0.17116262, 0.086509705])
THRESH_LIST = [0, 0.00001, 0.0001, 0.001, 0.01, 0.1, 0.2, 0.3, 0.4, 0.5,
               0.6, 0.7, 0.8, 0.9, 0.99, 0.999, 0.9999, 0.99999, 1]


# ---------------------------------------------------------------------------
# reference-shaped torch inference math
# ---------------------------------------------------------------------------

def _longest_max_size_shape(h, w, size):
    s = size / max(h, w)
    return max(1, round(h * s)), max(1, round(w * s))


def _pad_center(arr, size):
    h, w = arr.shape[:2]
    top, left = (size - h) // 2, (size - w) // 2
    widths = [(top, size - h - top), (left, size - w - left)]
    widths += [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, widths), (top, left)


def _torch_d4_probs(tf, x_chw):
    """sigmoid(mean over the 8 dihedral views of the inverse-view logits) —
    ttach d4 + merge_mode='mean', then the reference's single sigmoid
    (tta.py:92-113)."""
    x = torch.from_numpy(x_chw[None].astype(np.float32))
    logits = []
    with torch.no_grad():
        for flip in (False, True):
            for k in range(4):
                v = torch.flip(x, dims=[-1]) if flip else x
                v = torch.rot90(v, k, dims=(-2, -1))
                y = tf(v)
                y = torch.rot90(y, -k, dims=(-2, -1))
                if flip:
                    y = torch.flip(y, dims=[-1])
                logits.append(y)
    mean_logits = torch.stack(logits).mean(0)
    return torch.sigmoid(mean_logits)[0, 0].numpy()


def torch_reference_pairs(tf, img_paths, mask_paths, scale=SCALE):
    """Yield (pred, gt, name) exactly as the reference predict_generator
    (tta.py:108-121) + TestSegmentation mask compose (lesion_dataset.py:
    112-137) produce them."""
    out = []
    for ip, mp in zip(img_paths, mask_paths):
        img = np.asarray(Image.open(ip).convert("RGB"), np.uint8)
        mask = Image.open(mp).convert("L")
        mask = np.asarray(mask.point(lambda v: 255 if v > 50 else 0, "1"),
                          np.uint8)
        h, w = img.shape[:2]
        nh, nw = _longest_max_size_shape(h, w, scale)
        if (nh, nw) != (h, w):
            img_r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            mask_r = cv2.resize(mask, (nw, nh),
                                interpolation=cv2.INTER_NEAREST)
        else:
            img_r, mask_r = img, mask
        img_p, _ = _pad_center(img_r, scale)
        x = ((img_p / 255.0 - IDRID_MEAN) / IDRID_STD).transpose(2, 0, 1)

        prob = _torch_d4_probs(tf, x)
        # center-crop the pad away, then resize back to the original H×W
        top, left = (scale - nh) // 2, (scale - nw) // 2
        prob = prob[top:top + nh, left:left + nw]
        gt = mask_r  # pad+center-crop cancel exactly on the mask too
        if (nh, nw) != (h, w):
            prob = cv2.resize(prob.astype(np.float32), (w, h),
                              interpolation=cv2.INTER_LINEAR)
            gt = cv2.resize(gt, (w, h), interpolation=cv2.INTER_LINEAR)
        out.append((prob, gt.astype(np.uint8), Path(ip).name))
    return out


def ref_mean_auc(pairs):
    """aucpr.get_auc: mean per-image AP, empty-GT images skipped (l.17-30)."""
    vals = [sklearn_metrics.average_precision_score(gt.reshape(-1),
                                                    pred.reshape(-1))
            for pred, gt, _ in pairs if gt.sum() > 0]
    return float(np.mean(vals))


def ref_pr_sweep(pairs):
    """aucpr.plot_aucpr_curve math (l.53-98): 19-threshold dataset-global
    accumulation, 1e-7-smoothed SN/PPV, sklearn auc, three optima."""
    ts = np.array(THRESH_LIST)
    tp = np.zeros(len(ts))
    ap = np.zeros(len(ts))
    pp = np.zeros(len(ts))
    for pred, gt, _ in pairs:
        for i, t in enumerate(ts):
            arr = (pred > t).astype(np.uint8)
            tp[i] += np.sum(gt & arr)
            ap[i] += np.sum(gt)
            pp[i] += np.sum(arr)
    sn = (tp + 1e-7) / (ap + 1e-7)
    ppv = (tp + 1e-7) / (pp + 1e-7)
    f = (2 * sn * ppv) / (sn + ppv)
    aucpr = sklearn_metrics.auc(sn, ppv)
    opt0 = sorted(zip(np.abs(ppv - sn), THRESH_LIST))[0][1]
    opt1 = sorted(zip(np.sqrt((1 - ppv) ** 2 + (1 - sn) ** 2),
                      THRESH_LIST))[0][1]
    opt2 = sorted(zip(f, THRESH_LIST), key=lambda i: i[0], reverse=True)[0][1]
    return {"aucpr": float(aucpr), "optimal_threshold": opt0,
            "optimal_threshold_1": opt1, "optimal_threshold_2": opt2}


# ---------------------------------------------------------------------------
# shared model pair + fabricated run dir
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def model_pair():
    from eyediseasesegmentation_tpu import models as zoo

    tf = TorchFlagship().eval()
    model_params = {"encoder_name": "BoTSER50_Axial_Imagenet_3",
                    "decoder_attention_type": "scse", "base_dim": BASE_DIM,
                    "classes": 1, "drop_block_prob": 0.0,
                    "fast_inference": False}
    model = zoo.get_model("unetplusplusstar", dict(model_params),
                          training=False, dtype=jnp.float32)
    from functools import partial
    x = jnp.zeros((1, SCALE, SCALE, 3), jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    variables = transfer(tf, variables)
    return tf, model_params, variables


def _make_logdir(tmp_path, model_params, variables):
    from eyediseasesegmentation_tpu.train.checkpoint import save_checkpoint

    logdir = tmp_path / "parity_run"
    (logdir / "checkpoints").mkdir(parents=True)
    cfg = {"model_name": "unetplusplusstar", "model_params": model_params,
           "inference_dtype": "float32"}
    (logdir / "config.json").write_text(json.dumps(cfg))
    save_checkpoint(logdir / "checkpoints" / "best.ckpt",
                    {"model_state_dict": {
                        "params": variables["params"],
                        "batch_stats": variables["batch_stats"]}})
    return logdir


@pytest.mark.parametrize("ori_size", [(32, 64), (96, 128)],
                         ids=["pad_only", "resize_roundtrip"])
def test_aucpr_reported_numbers_match_reference(model_pair, tmp_path,
                                                ori_size, monkeypatch):
    from eyediseasesegmentation_tpu.data.synthetic import make_idrid_tree
    from eyediseasesegmentation_tpu.data import get_datapath
    from eyediseasesegmentation_tpu.infer.tta import test_tta

    tf, model_params, variables = model_pair
    logdir = _make_logdir(tmp_path, model_params, variables)

    data = tmp_path / "data"
    make_idrid_tree(data, lesion_type="EX", n_train=1, n_test=4,
                    size=ori_size)
    # blank one GT to pin the reference's skip-empty-images convention
    img_paths, mask_paths = get_datapath(data / "test" / "image",
                                         data / "test" / "label", "EX")
    empty = np.zeros(ori_size, np.uint8)
    Image.fromarray(empty).save(mask_paths[-1])

    cfg = {"dataset_name": "IDRiD", "lesion_type": "EX", "gray": False,
           "scale_size": SCALE, "out_dir": str(tmp_path / "out"),
           "test_img_path": str(data / "test" / "image"),
           "test_mask_path": str(data / "test" / "label")}
    monkeypatch.chdir(tmp_path)
    got = test_tta(logdir, cfg, {"best": "true", "tta": "d4",
                                 "createprob": "false"}, batch_size=2)

    pairs = torch_reference_pairs(tf, img_paths, mask_paths)
    want_mean = ref_mean_auc(pairs)
    want_sweep = ref_pr_sweep(pairs)

    assert abs(got["mean_auc"] - want_mean) <= 1e-3, (
        f"mean AUC-PR {got['mean_auc']:.6f} vs reference {want_mean:.6f}")
    assert abs(got["thresholds"]["aucpr"] - want_sweep["aucpr"]) <= 1e-3
    for key in ("optimal_threshold", "optimal_threshold_1",
                "optimal_threshold_2"):
        # fp32 representation of the discrete threshold list (0.6000000238…)
        assert got["thresholds"][key] == pytest.approx(want_sweep[key],
                                                       abs=1e-6), (
            key, got["thresholds"], want_sweep)


# ---------------------------------------------------------------------------
# vessel (ROC) path — reference tta_vessel.py: no resize, AUC-ROC,
# F-max optimal threshold (aucpr.py:120-205)
# ---------------------------------------------------------------------------

DRIVE_MEAN = np.array([0.49742976, 0.27066445, 0.16217253])
DRIVE_STD = np.array([0.34794736, 0.18998094, 0.1084089])


def test_aucroc_reported_numbers_match_reference(model_pair, tmp_path,
                                                 monkeypatch):
    from eyediseasesegmentation_tpu.data.synthetic import make_vessel_tree
    from eyediseasesegmentation_tpu.infer.tta import test_tta

    tf, model_params, variables = model_pair
    logdir = _make_logdir(tmp_path, model_params, variables)

    data = tmp_path / "data"
    make_vessel_tree(data, n_train=1, n_test=4, size=(SCALE, SCALE))
    mask_paths = sorted((data / "test" / "mask").glob("*.jpg"))
    img_paths = sorted((data / "test" / "image").glob("*.jpg"))
    Image.fromarray(np.zeros((SCALE, SCALE), np.uint8)).save(mask_paths[-1])

    cfg = {"dataset_name": "DRIVE", "lesion_type": "Vessel_DRIVE",
           "gray": False, "scale_size": SCALE,
           "out_dir": str(tmp_path / "out"),
           "test_img_path": str(data / "test" / "image"),
           "test_mask_path": str(data / "test" / "mask")}
    monkeypatch.chdir(tmp_path)
    got = test_tta(logdir, cfg, {"best": "true", "tta": "d4",
                                 "createprob": "false"}, batch_size=2,
                   metric="roc", resize=False)

    # torch reference math: no resize/pad (images pre-padded square,
    # tta_vessel.py:76), D4 logit-mean + sigmoid, GT as-is
    pairs = []
    for ip, mp in zip(img_paths, mask_paths):
        img = np.asarray(Image.open(ip).convert("RGB"), np.uint8)
        mask = Image.open(mp).convert("L")
        mask = np.asarray(mask.point(lambda v: 255 if v > 50 else 0, "1"),
                          np.uint8)
        x = ((img / 255.0 - DRIVE_MEAN) / DRIVE_STD).transpose(2, 0, 1)
        pairs.append((_torch_d4_probs(tf, x), mask, Path(ip).name))

    vals = [sklearn_metrics.roc_auc_score(gt.reshape(-1), pred.reshape(-1))
            for pred, gt, _ in pairs if gt.sum() > 0]
    want_mean = float(np.mean(vals))

    ts = np.array(THRESH_LIST)
    tp = np.zeros(len(ts)); ap = np.zeros(len(ts)); pp = np.zeros(len(ts))
    tn = np.zeros(len(ts)); an = np.zeros(len(ts))
    for pred, gt, _ in pairs:
        for i, t in enumerate(ts):
            arr = (pred > t).astype(np.uint8)
            tpi = np.sum(gt & arr)
            tp[i] += tpi
            ap[i] += np.sum(gt)
            ppi = np.sum(arr)
            pp[i] += ppi
            ani = gt.size - np.sum(gt)
            an[i] += ani
            tn[i] += ani - (ppi - tpi)
    sn = (tp + 1e-7) / (ap + 1e-7)
    sp = (tn + 1e-7) / (an + 1e-7)
    ppv = (tp + 1e-7) / (pp + 1e-7)
    fpr = 1 - sp
    want_aucroc = float(sklearn_metrics.auc(fpr, sn))
    f = (2 * sn * ppv) / (sn + ppv)
    want_opt = THRESH_LIST[int(np.argmax(f))]

    assert abs(got["mean_auc"] - want_mean) <= 1e-3, (got["mean_auc"],
                                                      want_mean)
    assert abs(got["thresholds"]["aucroc"] - want_aucroc) <= 1e-3
    assert got["thresholds"]["optimal_threshold_2"] == pytest.approx(
        want_opt, abs=1e-6), (got["thresholds"], want_opt)
