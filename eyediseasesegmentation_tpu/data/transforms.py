"""Augmentation policies as pure, jittable functions of a PRNG key.

TPU re-design of the reference's albumentations policies
(``src/data/data_transform.py``): every policy maps
``(key, image[H,W,C] float 0..255, mask[H,W] float 0/1) -> (image, mask)`` with
static shapes, so augmentation vmaps over the batch and fuses into the compiled
train step (no host-side augmentation in the hot loop).

Stochastic gates are real branches (``lax.cond`` / ``lax.switch``): only the
taken op executes at runtime, so a policy costs its EXPECTED op sum rather
than the sum of every member (the earlier compute-and-select form always paid
the full-res warp, all three OneOf members, and both flip branches — measured
82 ms of a 502 ms train step @1024² bs2).  ``batch_train`` unrolls the small
static batch as per-sample graphs instead of vmapping — vmap would lower the
conds back to select-both-branches.  Per-sample keys and draw order are
unchanged, so the outputs are bit-identical to the vmap/select form (pinned by
tests/test_image_ops.py::test_batch_train_unroll_matches_vmap).
Policy registry parity: normal / easy / easy_v2 / medium / advanced /
advanced_vessel (reference src/data/__init__.py:4-14).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import image as I


def _maybe(key, p: float, fn, img, mask):
    """Apply fn with probability p (real branch: fn runs only when taken)."""
    k_gate, k_fn = jax.random.split(key)
    apply = jax.random.uniform(k_gate) < p

    def taken(op):
        out = fn(k_fn, op[0], op[1])
        return out if isinstance(out, tuple) else (out, op[1])

    return jax.lax.cond(apply, taken, lambda op: op, (img, mask))


def _img_only(fn):
    def wrapped(key, img, mask):
        return fn(key, img), mask
    return wrapped


def _vflip(key, img, mask):
    del key
    return I.vflip(img), I.vflip(mask)


def _hflip(key, img, mask):
    del key
    return I.hflip(img), I.hflip(mask)


def _rot90(key, img, mask):
    """RandomRotate90: k ~ uniform{0..3} (applied under an outer p-gate)."""
    k = jax.random.randint(key, (), 0, 4)

    def branch(i):
        return (lambda op: op) if i == 0 else (
            lambda op: (I.rot90(op[0], k=i), I.rot90(op[1], k=i)))

    return jax.lax.switch(k, [branch(i) for i in range(4)], (img, mask))


def _one_of(key, fns, img, mask, p: float):
    """albumentations OneOf: with prob p pick one member uniformly.

    Gated by ``lax.cond`` and picked by ``lax.switch`` so exactly ONE member
    executes at runtime (the select form evaluated every member always)."""
    k_gate, k_pick, k_fn = jax.random.split(key, 3)
    apply = jax.random.uniform(k_gate) < p
    idx = jax.random.randint(k_pick, (), 0, len(fns))

    def member(fn):
        def br(op):
            out = fn(k_fn, op[0], op[1])
            return out if isinstance(out, tuple) else (out, op[1])
        return br

    def taken(op):
        return jax.lax.switch(idx, [member(fn) for fn in fns], op)

    return jax.lax.cond(apply, taken, lambda op: op, (img, mask))


def _distortion_fns():
    return [
        lambda k, i, m: I.elastic_transform(k, i, m, alpha=120.0, sigma=120 * 0.05),
        lambda k, i, m: I.grid_distortion(k, i, m),
        lambda k, i, m: I.optical_distortion(k, i, m, distort_limit=2.0, shift_limit=0.5),
    ]


def _photometric_fns():
    return [
        _img_only(lambda k, i: I.random_contrast(k, i)),
        _img_only(lambda k, i: I.random_gamma(k, i)),
        _img_only(lambda k, i: I.random_brightness(k, i)),
    ]


def _clahe(key, img, mask):
    del key
    return I.clahe_rgb(img), mask


def _brightness_contrast(key, img, mask):
    k1, k2 = jax.random.split(key)
    img = I.random_brightness(k1, img)
    img = I.random_contrast(k2, img)
    return img, mask


class BaseTransform:
    """Shared structure of the reference policies (data_transform.py:15-53):
    ``train(key, img, mask)`` = resize → hard aug; ``test(img)`` = resize only.
    Images enter as float [0,255], any size; leave at (image_size, image_size)."""

    def __init__(self, image_size: int = 1024, preprocessing_fn: Optional[Callable] = None):
        self.image_size = image_size
        self.preprocessing_fn = preprocessing_fn

    # --- geometry ---
    def resize(self, img: jnp.ndarray) -> jnp.ndarray:
        return I.longest_max_size_pad(img, self.image_size)

    def resize_pair(self, img, mask):
        img = self.resize(img)
        m = mask[..., None] if mask.ndim == 2 else mask
        m = I.longest_max_size_pad(m, self.image_size, method="nearest")
        return img, (m[..., 0] if mask.ndim == 2 else m)

    # --- stochastic policy (override) ---
    def hard(self, key, img, mask):
        return img, mask

    # --- public API ---
    def train(self, key, img, mask):
        img, mask = self.resize_pair(img, mask)
        img, mask = self.hard(key, img, mask)
        if self.preprocessing_fn is not None:
            img = self.preprocessing_fn(img)
        return img, mask

    def test(self, img):
        img = self.resize(img)
        if self.preprocessing_fn is not None:
            img = self.preprocessing_fn(img)
        return img

    def batch_train(self, key, imgs, masks):
        """Per-sample keys; the (small, static) batch unrolls as separate
        per-sample graphs so the stochastic ``lax.cond`` gates stay REAL
        branches — vmap would lower them to compute-both-and-select, paying
        every policy member every step.  Bit-identical to the vmap form
        (same keys, same draw order); falls back to vmap for large batches
        where unrolled compile time would dominate."""
        b = imgs.shape[0]
        keys = jax.random.split(key, b)
        if b > 16:
            return jax.vmap(self.train)(keys, imgs, masks)
        outs = [self.train(keys[i], imgs[i], masks[i]) for i in range(b)]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))


class NormalTransform(BaseTransform):
    """vflip .5, hflip .5, rot90 .7, GaussNoise .5 (data_transform.py:55-72)."""

    def hard(self, key, img, mask):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        img, mask = _maybe(k1, 0.5, _vflip, img, mask)
        img, mask = _maybe(k2, 0.5, _hflip, img, mask)
        img, mask = _maybe(k3, 0.7, _rot90, img, mask)
        img, mask = _maybe(k4, 0.5, _img_only(I.gauss_noise), img, mask)
        return img, mask


class EasyTransform(BaseTransform):
    """vflip .5, rot90 .5, OneOf(distortions) .5, CLAHE .5,
    brightness/contrast .5, gamma .5 (data_transform.py:77-94)."""

    def hard(self, key, img, mask):
        ks = jax.random.split(key, 6)
        img, mask = _maybe(ks[0], 0.5, _vflip, img, mask)
        img, mask = _maybe(ks[1], 0.5, _rot90, img, mask)
        img, mask = _one_of(ks[2], _distortion_fns(), img, mask, p=0.5)
        img, mask = _maybe(ks[3], 0.5, _clahe, img, mask)
        img, mask = _maybe(ks[4], 0.5, _brightness_contrast, img, mask)
        img, mask = _maybe(ks[5], 0.5, _img_only(I.random_gamma), img, mask)
        return img, mask


class EasyTransformV2(BaseTransform):
    """vflip/hflip/rot90 .5, OneOf(distortions) .5, ShiftScaleRotate .5
    (data_transform.py:96-112)."""

    def hard(self, key, img, mask):
        ks = jax.random.split(key, 5)
        img, mask = _maybe(ks[0], 0.5, _vflip, img, mask)
        img, mask = _maybe(ks[1], 0.5, _hflip, img, mask)
        img, mask = _maybe(ks[2], 0.5, _rot90, img, mask)
        img, mask = _one_of(ks[3], _distortion_fns(), img, mask, p=0.5)
        img, mask = _maybe(ks[4], 0.5, I.shift_scale_rotate, img, mask)
        return img, mask


class MediumTransform(BaseTransform):
    """(data_transform.py:114-132)."""

    def hard(self, key, img, mask):
        ks = jax.random.split(key, 7)
        img, mask = _maybe(ks[0], 0.5, _vflip, img, mask)
        img, mask = _maybe(ks[1], 0.5, _hflip, img, mask)
        img, mask = _maybe(ks[2], 0.7, _rot90, img, mask)
        img, mask = _one_of(ks[3], _distortion_fns(), img, mask, p=0.5)
        img, mask = _maybe(ks[4], 0.5, _clahe, img, mask)
        img, mask = _maybe(ks[5], 0.5, _brightness_contrast, img, mask)
        img, mask = _maybe(ks[6], 0.5, _img_only(I.random_gamma), img, mask)
        return img, mask


class AdvancedTransform(BaseTransform):
    """hflip/vflip .5, rot90 .7, OneOf(contrast/gamma/brightness) .5,
    distortion group p=0 (kept for parity), ShiftScaleRotate .5, GaussNoise .5
    (data_transform.py:158-179)."""

    def hard(self, key, img, mask):
        ks = jax.random.split(key, 6)
        img, mask = _maybe(ks[0], 0.5, _hflip, img, mask)
        img, mask = _maybe(ks[1], 0.5, _vflip, img, mask)
        img, mask = _maybe(ks[2], 0.7, _rot90, img, mask)
        img, mask = _one_of(ks[3], _photometric_fns(), img, mask, p=0.5)
        # distortion OneOf has p=0.0 in the reference — intentionally skipped
        img, mask = _maybe(ks[4], 0.5, I.shift_scale_rotate, img, mask)
        img, mask = _maybe(ks[5], 0.5, _img_only(I.gauss_noise), img, mask)
        return img, mask


class AdvancedTransformVessel(AdvancedTransform):
    """Adds RandomScale[0.5, 2] (as a static-shape scale-about-center warp)
    before the advanced policy (data_transform.py:134-156)."""

    def hard(self, key, img, mask):
        k0, rest = jax.random.split(key)
        img, mask = _maybe(k0, 0.5, lambda k, i, m: I.random_scale(k, i, m, (0.5, 2.0)),
                           img, mask)
        return super().hard(rest, img, mask)


class NoOpTransform(BaseTransform):
    """Preprocessing-only (the vessel patch path trains on pre-augmented,
    pre-padded patches — reference train_vessel.py:219-233 uses no
    albumentations transform). Resize still applies for whole images."""

    pass


TRANSFORM_REGISTRY = {
    "none": NoOpTransform,
    "normal": NormalTransform,
    "easy": EasyTransform,
    "easy_v2": EasyTransformV2,
    "medium": MediumTransform,
    "advanced": AdvancedTransform,
    "advanced_vessel": AdvancedTransformVessel,
}


def get_transform(name: str):
    """Policy registry (reference src/data/__init__.py:4-14)."""
    try:
        return TRANSFORM_REGISTRY[name]
    except KeyError:
        raise KeyError(f"Unknown transform '{name}'. Options: {sorted(TRANSFORM_REGISTRY)}")
