"""Segmentation losses (pure jnp on logits, NHWC).

Registry parity with reference ``src/main/losses.py:192-240``:
kl / topk / bce / wbce / log_bce / ce / soft_bce / focal / jaccard / lovasz /
symmetric_lovasz / log_jaccard / dice / log_dice.

Every loss is ``fn(logits, targets) -> scalar`` with logits/targets of shape
(B, H, W, C) (binary: C=1). Compound losses are weighted sums over the registry
(reference train.py:288-304 CriterionCallback + MetricAggregationCallback(sum)).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

EPS = 1e-7
LossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


# ---------------------------------------------------------------------------
# BCE family
# ---------------------------------------------------------------------------

def _bce_with_logits(logits, targets, pos_weight=None):
    """Elementwise BCE-with-logits, numerically stable."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is None:
        return -(targets * log_p + (1.0 - targets) * log_not_p)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def soft_bce_with_logits(logits, targets, smooth_factor: Optional[float] = None,
                         ignore_index: Optional[float] = None,
                         pos_weight=None):
    """pytorch_toolbelt SoftBCEWithLogitsLoss: optional label smoothing + ignore."""
    mask = None if ignore_index is None else (targets != ignore_index).astype(logits.dtype)
    if smooth_factor is not None:
        soft = (1.0 - targets) * smooth_factor + targets * (1.0 - smooth_factor)
    else:
        soft = targets
    loss = _bce_with_logits(logits, soft, pos_weight)
    return _masked_mean(loss, mask)


def weighted_bce_with_logits(logits, targets, pos_weights: Sequence[float] = (1.0,),
                             ignore_index: Optional[float] = -100):
    """Reference WeightedBCEWithLogits (losses.py:78-101): BCE w/ pos_weight,
    ignore mask multiplied in *before* the mean (mean over all elements)."""
    pw = jnp.asarray(pos_weights, logits.dtype)
    loss = _bce_with_logits(logits, targets, pw)
    if ignore_index is not None:
        loss = loss * (targets != ignore_index).astype(logits.dtype)
    return jnp.mean(loss)


def log_bce(logits, targets, smooth_factor: Optional[float] = 0.1,
            ignore_index: Optional[float] = None):
    """Reference LogBCE (losses.py:160-190): class-frequency weighted BCE where
    beta = per-image foreground frequency; positives weighted (1-beta)."""
    beta = jax.lax.stop_gradient(jnp.mean(targets, axis=(1, 2), keepdims=True))
    if smooth_factor is not None:
        soft = (1.0 - targets) * smooth_factor + targets * (1.0 - smooth_factor)
    else:
        soft = targets
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(1.0 - beta) * log_p * soft - beta * log_not_p * (1.0 - soft)
    if ignore_index is not None:
        loss = loss * (targets != ignore_index).astype(loss.dtype)
    return jnp.mean(loss)


def topk_loss(logits, targets):
    """Reference TopKLoss (losses.py:103-132): mean foreground BCE averaged with the
    mean of the top-|fg| hardest background BCEs (beta = 1/2).

    Dynamic k is handled TPU-style: sort background losses descending, include
    ranks < k via a mask (static shapes, traced k).
    """
    loss = _bce_with_logits(logits, targets).reshape(-1)
    t = targets.reshape(-1)
    fg = t == 1.0
    bg = t == 0.0
    n_fg = jnp.sum(fg)
    fg_mean = jnp.sum(loss * fg) / jnp.maximum(n_fg, 1.0)
    bg_loss = jnp.where(bg, loss, -jnp.inf)
    bg_sorted = jnp.sort(bg_loss)[::-1]
    ranks = jnp.arange(bg_sorted.shape[0])
    topk_mask = (ranks < n_fg) & jnp.isfinite(bg_sorted)
    topk_mean = jnp.sum(jnp.where(topk_mask, bg_sorted, 0.0)) / jnp.maximum(
        jnp.sum(topk_mask), 1.0)
    return 0.5 * fg_mean + 0.5 * topk_mean


def binary_focal_loss(logits, targets, gamma: float = 1.5,
                      alpha: Optional[float] = None,
                      ignore_index: Optional[float] = None):
    """pytorch_toolbelt BinaryFocalLoss(alpha=None, gamma=1.5) semantics."""
    mask = None if ignore_index is None else (targets != ignore_index).astype(logits.dtype)
    logpt = -_bce_with_logits(logits, targets)  # = log p_t
    pt = jnp.exp(logpt)
    loss = -((1.0 - pt) ** gamma) * logpt
    if alpha is not None:
        loss = loss * (alpha * targets + (1.0 - alpha) * (1.0 - targets))
    return _masked_mean(loss, mask)


def kl_with_logits(logits, targets):
    """Reference KLDivLossWithLogits (losses.py:134-158): KL between
    [sigmoid(x), sigmoid(-x)] and [t, 1-t], mean reduction over both channels."""
    log_p = jnp.stack([jax.nn.log_sigmoid(logits), jax.nn.log_sigmoid(-logits)], axis=-1)
    t = jnp.stack([targets, 1.0 - targets], axis=-1)
    # F.kl_div(log_p, t) = t * (log t - log_p); torch defines 0*log0 = 0
    kl = jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, EPS)) - log_p), 0.0)
    return jnp.mean(kl)


def cross_entropy(logits, targets):
    """Multiclass CE: logits (B,H,W,K), integer targets (B,H,W)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets.astype(jnp.int32), logits.shape[-1], dtype=logits.dtype)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


# ---------------------------------------------------------------------------
# Region losses (dice / jaccard)
# ---------------------------------------------------------------------------

def _soft_scores(logits, targets):
    """Binary-mode flattening as in pytorch_toolbelt: aggregate over batch+spatial."""
    p = jax.nn.sigmoid(logits)
    c = logits.shape[-1]
    p = p.reshape(-1, c)
    t = targets.reshape(-1, c)
    inter = jnp.sum(p * t, axis=0)
    cardinality = jnp.sum(p + t, axis=0)
    union = cardinality - inter
    gt_present = jnp.sum(t, axis=0) > 0
    return inter, cardinality, union, gt_present


def dice_loss(logits, targets, log_loss: bool = False, smooth: float = 0.0):
    """pytorch_toolbelt DiceLoss(mode='binary'): soft dice over the whole batch per
    channel; channels absent from GT contribute 0 (toolbelt's present-class mask)."""
    inter, card, _, present = _soft_scores(logits, targets)
    dice = (2.0 * inter + smooth) / jnp.maximum(card + smooth, EPS)
    loss = -jnp.log(jnp.maximum(dice, EPS)) if log_loss else 1.0 - dice
    loss = loss * present.astype(loss.dtype)
    return jnp.mean(loss)


def jaccard_loss(logits, targets, log_loss: bool = False, smooth: float = 0.0):
    inter, _, union, present = _soft_scores(logits, targets)
    jac = (inter + smooth) / jnp.maximum(union + smooth, EPS)
    loss = -jnp.log(jnp.maximum(jac, EPS)) if log_loss else 1.0 - jac
    loss = loss * present.astype(loss.dtype)
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# Lovász hinge (reference lovasz.py; Berman et al.)
# ---------------------------------------------------------------------------

def _lovasz_grad(gt_sorted):
    """Gradient of the Lovász extension w.r.t. sorted errors."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, EPS)
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_hinge_flat(logits, labels, valid=None):
    """Lovász hinge on flat logits/labels in {0,1}; ``valid`` masks padded pixels."""
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    if valid is not None:
        # push invalid pixels to the end of the descending sort with -inf error
        errors = jnp.where(valid, errors, -jnp.inf)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    labels_sorted = labels[order]
    if valid is not None:
        valid_sorted = valid[order].astype(logits.dtype)
        labels_sorted = labels_sorted * valid_sorted
        errors_sorted = jnp.where(jnp.isfinite(errors_sorted), errors_sorted, 0.0)
        grad = _lovasz_grad(labels_sorted) * valid_sorted
    else:
        grad = _lovasz_grad(labels_sorted)
    # reference lovasz.py:70 uses elu(errors)+1 (not relu): smooth, strictly
    # positive hinge — keeps gradient flowing for easy pixels near the margin
    return jnp.sum((jax.nn.elu(errors_sorted) + 1.0) * jax.lax.stop_gradient(grad))


def lovasz_hinge(logits, targets, per_image: bool = False):
    """Binary Lovász hinge (reference BinaryLovaszLoss(per_image=False),
    lovasz.py:187-194)."""
    c_logits = logits.reshape(logits.shape[0], -1)
    c_targets = targets.reshape(targets.shape[0], -1)
    if per_image:
        return jnp.mean(jax.vmap(_lovasz_hinge_flat)(c_logits, c_targets))
    return _lovasz_hinge_flat(c_logits.reshape(-1), c_targets.reshape(-1))


def symmetric_lovasz(logits, targets):
    """Reference SymmetricLovasz (losses.py:154-158) — note it calls lovasz_hinge
    with its default per_image=True."""
    def lh(lg, tg):
        return jnp.mean(jax.vmap(_lovasz_hinge_flat)(
            lg.reshape(lg.shape[0], -1), tg.reshape(tg.shape[0], -1)))
    return 0.5 * (lh(logits, targets) + lh(-logits, 1.0 - targets))


# ---------------------------------------------------------------------------
# Registry (reference losses.py:192-240)
# ---------------------------------------------------------------------------

def get_loss(loss_name: str, ignore_index=None, pos_weights: Sequence[float] = (1.0,)) -> LossFn:
    name = loss_name.lower()
    import functools
    table = {
        "kl": kl_with_logits,
        "topk": topk_loss,
        "bce": functools.partial(soft_bce_with_logits, ignore_index=ignore_index),
        "wbce": functools.partial(weighted_bce_with_logits, pos_weights=pos_weights,
                                  ignore_index=ignore_index if ignore_index is not None else -100),
        "log_bce": functools.partial(log_bce, ignore_index=ignore_index),
        "ce": cross_entropy,
        "soft_bce": functools.partial(soft_bce_with_logits, smooth_factor=0.1,
                                      ignore_index=ignore_index),
        "focal": functools.partial(binary_focal_loss, gamma=1.5, alpha=None,
                                   ignore_index=ignore_index),
        "jaccard": jaccard_loss,
        "log_jaccard": functools.partial(jaccard_loss, log_loss=True),
        "dice": dice_loss,
        "log_dice": functools.partial(dice_loss, log_loss=True),
        "lovasz": lovasz_hinge,
        "symmetric_lovasz": symmetric_lovasz,
    }
    if name not in table:
        raise KeyError(f"Unknown loss '{loss_name}'. Options: {sorted(table)}")
    return table[name]


def compound_loss(criterion: Dict[str, float], ignore_index=None,
                  pos_weights: Sequence[float] = (1.0,)):
    """Weighted-sum loss from a criterion dict like {'bce': 0.8, 'log_dice': 0.2}
    (reference config.py:173 + train.py:288-304). Returns (fn, per-term fns)."""
    terms = {name: get_loss(name, ignore_index, pos_weights) for name in criterion}

    def fn(logits, targets):
        parts = {name: terms[name](logits, targets) for name in terms}
        total = sum(criterion[name] * parts[name] for name in terms)
        return total, parts

    return fn
