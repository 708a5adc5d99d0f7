"""Loss semantics tests, incl. cross-checks against torch (CPU) where available."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.ops import losses as L


@pytest.fixture
def logits_targets(rng):
    logits = rng.randn(2, 32, 32, 1).astype(np.float32)
    targets = (rng.rand(2, 32, 32, 1) < 0.3).astype(np.float32)
    return jnp.asarray(logits), jnp.asarray(targets)


def test_bce_matches_torch(logits_targets):
    torch = pytest.importorskip("torch")
    logits, targets = logits_targets
    got = float(L.soft_bce_with_logits(logits, targets))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(logits)), torch.from_numpy(np.asarray(targets))
    ).item()
    assert abs(got - want) < 1e-5


def test_wbce_pos_weight(logits_targets):
    torch = pytest.importorskip("torch")
    logits, targets = logits_targets
    got = float(L.weighted_bce_with_logits(logits, targets, pos_weights=[500.0]))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(logits)), torch.from_numpy(np.asarray(targets)),
        pos_weight=torch.tensor([500.0]),
    ).item()
    assert abs(got - want) / max(abs(want), 1) < 1e-5


def test_dice_loss_known_value():
    # perfect prediction (saturated logits) => dice ~ 1, loss ~ 0
    t = jnp.zeros((1, 8, 8, 1)).at[0, :4].set(1.0)
    logits = (t * 2 - 1) * 20.0
    assert float(L.dice_loss(logits, t)) < 1e-3
    assert float(L.jaccard_loss(logits, t)) < 1e-3
    # empty GT channel contributes 0 loss (toolbelt present-class mask)
    assert float(L.dice_loss(logits * 0 - 20.0, jnp.zeros((1, 8, 8, 1)))) == 0.0


def test_log_dice_is_neg_log():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    t = jnp.asarray((rng.rand(1, 16, 16, 1) < 0.4).astype(np.float32))
    d = 1.0 - float(L.dice_loss(logits, t))
    assert abs(float(L.dice_loss(logits, t, log_loss=True)) - (-np.log(d))) < 1e-4


def test_focal_matches_definition(logits_targets):
    logits, targets = logits_targets
    got = float(L.binary_focal_loss(logits, targets, gamma=1.5))
    p = jax.nn.sigmoid(logits)
    pt = p * targets + (1 - p) * (1 - targets)
    want = float(jnp.mean(-((1 - pt) ** 1.5) * jnp.log(pt)))
    assert abs(got - want) < 1e-4


def test_lovasz_grad_and_loss():
    # perfect separation => near-zero loss
    t = jnp.zeros((1, 8, 8, 1)).at[0, :4].set(1.0)
    logits = (t * 2 - 1) * 10.0
    assert float(L.lovasz_hinge(logits, t)) < 1e-3
    # symmetric lovasz finite and positive for noisy input
    rng = np.random.RandomState(0)
    lg = jnp.asarray(rng.randn(2, 16, 16, 1).astype(np.float32))
    tg = jnp.asarray((rng.rand(2, 16, 16, 1) < 0.5).astype(np.float32))
    v = float(L.symmetric_lovasz(lg, tg))
    assert np.isfinite(v) and v > 0


def test_lovasz_matches_reference_algorithm():
    """Cross-check against a direct numpy port of the Berman algorithm."""
    rng = np.random.RandomState(3)
    logits = rng.randn(256).astype(np.float32)
    labels = (rng.rand(256) < 0.4).astype(np.float32)

    def np_lovasz(logits, labels):
        signs = 2.0 * labels - 1.0
        errors = 1.0 - logits * signs
        order = np.argsort(-errors)
        e = errors[order]; gt = labels[order]
        gts = gt.sum()
        inter = gts - np.cumsum(gt)
        union = gts + np.cumsum(1 - gt)
        jac = 1.0 - inter / union
        if len(jac) > 1:
            jac[1:] = jac[1:] - jac[:-1]
        # reference lovasz.py:70: dot(elu(errors_sorted) + 1, grad)
        elu1 = np.where(e > 0, e + 1.0, np.exp(np.minimum(e, 0.0)))
        return (elu1 * jac).sum()

    got = float(L._lovasz_hinge_flat(jnp.asarray(logits), jnp.asarray(labels)))
    want = np_lovasz(logits, labels)
    assert abs(got - want) / max(abs(want), 1) < 1e-4


def test_topk_loss_finite(logits_targets):
    logits, targets = logits_targets
    v = float(L.topk_loss(logits, targets))
    assert np.isfinite(v) and v > 0


def test_compound_loss_weighted_sum(logits_targets):
    logits, targets = logits_targets
    fn = L.compound_loss({"bce": 0.8, "log_dice": 0.2})
    total, parts = fn(logits, targets)
    want = 0.8 * float(parts["bce"]) + 0.2 * float(parts["log_dice"])
    assert abs(float(total) - want) < 1e-5


def test_loss_registry_complete():
    for name in ["kl", "topk", "bce", "wbce", "log_bce", "soft_bce", "focal",
                 "jaccard", "log_jaccard", "dice", "log_dice", "lovasz",
                 "symmetric_lovasz"]:
        fn = L.get_loss(name, pos_weights=[2.0])
        assert callable(fn)
    with pytest.raises(KeyError):
        L.get_loss("nope")
