"""Golden-value tests: on-device metrics vs sklearn (SURVEY.md §4 implication (b))."""

import numpy as np
import pytest
import jax.numpy as jnp
from sklearn.metrics import average_precision_score, roc_auc_score, auc

from eyediseasesegmentation_tpu.ops import metrics as M


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_average_precision_matches_sklearn(seed):
    rng = np.random.RandomState(seed)
    scores = rng.rand(4096).astype(np.float32)
    labels = (rng.rand(4096) < 0.1).astype(np.float32)
    got = float(M.average_precision(jnp.asarray(scores), jnp.asarray(labels)))
    want = average_precision_score(labels, scores)
    assert abs(got - want) < 1e-5


def test_average_precision_with_ties():
    rng = np.random.RandomState(7)
    # quantized scores => heavy ties, exercises tie-block handling
    scores = np.round(rng.rand(2048) * 10) / 10
    labels = (rng.rand(2048) < 0.3).astype(np.float32)
    got = float(M.average_precision(jnp.asarray(scores.astype(np.float32)), jnp.asarray(labels)))
    want = average_precision_score(labels, scores)
    assert abs(got - want) < 1e-5


@pytest.mark.parametrize("seed", [0, 3])
def test_roc_auc_matches_sklearn(seed):
    rng = np.random.RandomState(seed)
    scores = np.round(rng.rand(2048) * 20) / 20  # include ties
    labels = (rng.rand(2048) < 0.25).astype(np.float32)
    got = float(M.roc_auc(jnp.asarray(scores.astype(np.float32)), jnp.asarray(labels)))
    want = roc_auc_score(labels, scores)
    assert abs(got - want) < 1e-5


def test_threshold_sweep_counts():
    rng = np.random.RandomState(0)
    probs = rng.rand(64, 64).astype(np.float32)
    gts = (rng.rand(64, 64) < 0.2).astype(np.uint8)
    tp, ap, pp, tn = M.threshold_sweep(jnp.asarray(probs), jnp.asarray(gts))
    for i, th in enumerate(M.THRESH_LIST):
        pred = (probs > th).astype(np.uint8)
        assert int(tp[i]) == int(np.sum(gts & pred))
        assert int(ap[i]) == int(np.sum(gts))
        assert int(pp[i]) == int(np.sum(pred))
        assert int(tn[i]) == int(np.sum((1 - gts) & (1 - pred)))


def test_pr_curve_and_auc_pipeline():
    rng = np.random.RandomState(1)
    # moderately informative scores
    gts = (rng.rand(8, 128, 128) < 0.1).astype(np.float32)
    probs = np.clip(gts * 0.6 + rng.rand(8, 128, 128) * 0.4, 0, 1).astype(np.float32)
    tp = np.zeros(len(M.THRESH_LIST)); ap = np.zeros_like(tp); pp = np.zeros_like(tp)
    for p, g in zip(probs, gts):
        t, a, q, _ = M.threshold_sweep(jnp.asarray(p), jnp.asarray(g))
        tp += np.asarray(t); ap += np.asarray(a); pp += np.asarray(q)
    sn, ppv = M.pr_from_counts(jnp.asarray(tp), jnp.asarray(ap), jnp.asarray(pp))
    aucpr = float(M.auc_trapezoid(jnp.asarray(sn), jnp.asarray(ppv)))
    # reference computes sklearn auc(recall, precision) in threshold order
    want = auc(np.asarray(sn), np.asarray(ppv))
    assert abs(aucpr - want) < 1e-5
    t0, t1, t2 = M.optimal_thresholds(sn, ppv)
    assert 0.0 <= float(t0) <= 1.0 and 0.0 <= float(t2) <= 1.0


def test_per_image_stats_empty_conventions():
    # empty GT and empty prediction => all ratios defined as 1 (stat_result.py:54-79)
    z = jnp.zeros((16, 16))
    stats = M.per_image_stats(z, z)
    for k in ("sn", "ppv", "iou", "dice"):
        assert float(stats[k]) == 1.0


def test_dice_iou_coeff():
    pred = jnp.array([[0.9, 0.1], [0.8, 0.2]])
    gt = jnp.array([[1.0, 0.0], [0.0, 0.0]])
    d = float(M.dice_coeff(pred, gt))
    i = float(M.iou_coeff(pred, gt))
    assert abs(d - 2 * 1 / (2 + 1)) < 1e-5
    assert abs(i - 1 / 2) < 1e-5


@pytest.mark.parametrize("score", ["ap", "roc"])
def test_batch_image_metrics_matches_per_image_loop(score):
    """The fused one-dispatch batch evaluator == the per-image host loop it
    replaced in infer.tta.test_tta (padding excluded, empty-GT skipped)."""
    rng = np.random.RandomState(0)
    B, H, W = 4, 17, 23
    probs = rng.rand(B, H, W).astype(np.float32)
    masks = (rng.rand(B, H, W) < 0.3).astype(np.float32)
    masks[1] = 0.0          # empty GT: excluded from the AP mean
    probs[3] = 0.9          # padded entry: excluded from everything
    valid = np.array([True, True, True, False])

    out = M.batch_image_metrics(jnp.asarray(probs), jnp.asarray(masks),
                                jnp.asarray(valid), score=score)

    fn = M.average_precision if score == "ap" else M.roc_auc
    ap_sum, ap_count, px = 0.0, 0, 0.0
    n_th = len(M.THRESH_LIST)
    tp = np.zeros(n_th); ap = np.zeros(n_th); pp = np.zeros(n_th); tn = np.zeros(n_th)
    for i in range(B):
        if not valid[i]:
            continue
        p, g = jnp.asarray(probs[i]), jnp.asarray(masks[i])
        if float(jnp.sum(g)) > 0:
            ap_sum += float(fn(p, g)); ap_count += 1
        t, a, q, n = M.threshold_sweep(p, g)
        tp += np.asarray(t); ap += np.asarray(a); pp += np.asarray(q)
        tn += np.asarray(n); px += H * W

    assert abs(float(out["ap_sum"]) - ap_sum) < 1e-4
    assert int(out["ap_count"]) == ap_count
    np.testing.assert_allclose(np.asarray(out["tp"]), tp, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["ap"]), ap, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["pp"]), pp, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["tn"]), tn, atol=1e-3)
    assert float(out["px"]) == px


def test_batch_image_metrics_scalar_n_valid_and_uint8_masks():
    """The scalar-n_valid form (expanded inside the jit) and uint8 GT wire
    must equal the explicit bool-mask fp32 form."""
    rng = np.random.RandomState(3)
    probs = rng.rand(3, 9, 11).astype(np.float32)
    masks = (rng.rand(3, 9, 11) < 0.4).astype(np.float32)
    a = M.batch_image_metrics(jnp.asarray(probs), jnp.asarray(masks),
                              jnp.asarray([True, True, False]))
    b = M.batch_image_metrics(jnp.asarray(probs),
                              jnp.asarray(masks.astype(np.uint8)), 2)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=0, atol=0)
