"""On-device image primitives (pure jnp, jit/vmap-friendly, NHWC or HWC).

These replace the reference's host-side OpenCV/PIL/albumentations pipeline
(``src/data/data_transform.py``) with XLA-fused device ops so augmentation and
preprocessing run inside the compiled train step. Everything is a pure function of
its inputs (+ a PRNG key where stochastic); shapes are static.

Conventions: images are float32 in [0, 255] (matching albumentations' uint8 inputs)
unless stated; masks are float32 in {0, 1}, shape (H, W) or (H, W, 1).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Geometry: resize / pad / crop (reference NormalTransform.resize_transforms,
# data_transform.py:67-72 — LongestMaxSize + PadIfNeeded(border 0))
# ---------------------------------------------------------------------------

def longest_max_size_shape(h: int, w: int, max_size: int) -> Tuple[int, int]:
    """Static output shape of albumentations.LongestMaxSize."""
    scale = max_size / max(h, w)
    return max(1, round(h * scale)), max(1, round(w * scale))


def resize(img: jnp.ndarray, out_hw: Tuple[int, int], method: str = "linear") -> jnp.ndarray:
    """Bilinear resize of HWC (or HW) image. Static target shape.

    ``antialias=False`` on the linear path: cv2.INTER_LINEAR (what the whole
    reference pipeline resizes with — albumentations LongestMaxSize,
    GF.resize at tta.py:118-119) samples 2 neighbors per axis at half-pixel
    centers with NO antialiasing prefilter even when downscaling; jax's
    default antialias=True would low-pass first, shifting every model input
    and resized-back prediction away from the reference's values (the 1e-3
    AUC-PR parity contract, BASELINE.md). Upscales are unaffected."""
    if (img.shape[0], img.shape[1]) == tuple(out_hw):
        return img  # static no-op (e.g. pre-resized train batches)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    out = jax.image.resize(img, (out_hw[0], out_hw[1], img.shape[-1]),
                           method=method, antialias=False)
    return out[..., 0] if squeeze else out


def pad_to(img: jnp.ndarray, out_hw: Tuple[int, int], value: float = 0.0) -> jnp.ndarray:
    """Center-pad HWC image to ``out_hw`` (PadIfNeeded, border constant 0)."""
    h, w = img.shape[0], img.shape[1]
    ph, pw = out_hw[0] - h, out_hw[1] - w
    if ph == 0 and pw == 0:
        return img  # static no-op
    top, left = ph // 2, pw // 2
    widths = [(top, ph - top), (left, pw - left)] + [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, widths, constant_values=value)


def longest_max_size_pad(img: jnp.ndarray, size: int, method: str = "linear") -> jnp.ndarray:
    """LongestMaxSize(size) + center PadIfNeeded(size, size). Returns (size, size, C)."""
    h, w = img.shape[0], img.shape[1]
    nh, nw = longest_max_size_shape(h, w, size)
    return pad_to(resize(img, (nh, nw), method), (size, size))


def center_crop(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Center crop HWC/HW image (inverse of the eval-time pad; tta.py:115-117)."""
    h, w = img.shape[0], img.shape[1]
    top = (h - out_hw[0]) // 2
    left = (w - out_hw[1]) // 2
    return jax.lax.slice(
        img,
        (top, left) + (0,) * (img.ndim - 2),
        (top + out_hw[0], left + out_hw[1]) + img.shape[2:],
    )


# ---------------------------------------------------------------------------
# Color / normalization
# ---------------------------------------------------------------------------

LUMA = jnp.array([0.2989, 0.5870, 0.1140], jnp.float32)


def rgb_to_gray(img: jnp.ndarray, keep_channels: bool = True) -> jnp.ndarray:
    """Luma grayscale (reference lesion_dataset.py:70, archs/__init__.py:91-93)."""
    g = jnp.tensordot(img[..., :3], LUMA, axes=([-1], [0]))
    if keep_channels:
        g = g[..., None]
    return g


def normalize(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    """x/255 - mean then /std (reference archs/__init__.py:95-99)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img / 255.0 - mean) / std


def gaussian_kernel_1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: Optional[int] = None) -> jnp.ndarray:
    """Separable Gaussian blur of HWC image (cv2.GaussianBlur((0,0), sigma) ≈
    radius = round(4*sigma) for float input; cv2 uses int(sigma*4+0.5) per side)."""
    if radius is None:
        radius = max(1, int(round(4.0 * sigma)))
    h, w = img.shape[0], img.shape[1]
    radius = min(radius, h - 1, w - 1)  # reflect-pad needs pad < size
    k = gaussian_kernel_1d(sigma, radius)
    c = img.shape[-1]
    # reflect-101 border (cv2 default) then depthwise VALID separable conv
    x = jnp.pad(img, ((radius, radius), (radius, radius), (0, 0)), mode="reflect")[None]

    def conv1d(x, kern, axis):
        if axis == 1:  # H
            rhs = kern.reshape(2 * radius + 1, 1, 1, 1)
        else:  # W
            rhs = kern.reshape(1, 2 * radius + 1, 1, 1)
        rhs = jnp.tile(rhs, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, rhs, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    return conv1d(conv1d(x, k, 1), k, 2)[0]


def ben_color_device(img: jnp.ndarray, sigma: float = 10.0) -> jnp.ndarray:
    """Ben-Graham color enhancement, the addWeighted stage only
    (data_transform.py:199-203): 4*img - 4*blur(img) + 128, clipped to [0,255].
    The data-dependent gray-crop stage is host-side (dynamic shape)."""
    out = 4.0 * img - 4.0 * gaussian_blur(img, sigma) + 128.0
    return jnp.clip(out, 0.0, 255.0)


def binarize_mask(mask: jnp.ndarray, thresh: float = 50.0) -> jnp.ndarray:
    """Mask binarization `point(x>50 → 255)` → {0,1} (lesion_dataset.py:54-58)."""
    return (mask > thresh).astype(jnp.float32)


# ---------------------------------------------------------------------------
# D4 / flip views (geometry shared by augmentation and TTA)
# ---------------------------------------------------------------------------

def hflip(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., :, ::-1, :] if img.ndim >= 3 else img[:, ::-1]


def vflip(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., ::-1, :, :] if img.ndim >= 3 else img[::-1, :]


def rot90(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Rotate an HW(C) or NHW(C) image by k*90° in the HW plane."""
    axes = (-3, -2) if img.ndim >= 3 else (-2, -1)
    return jnp.rot90(img, k=k, axes=axes)


def d4_views(img: jnp.ndarray) -> jnp.ndarray:
    """All 8 dihedral views, stacked on a new leading axis.

    This is the TTA x8 batch (reference ttach d4, tta.py:90-99) computed as one
    device-side stack so all 8 forwards run as a single batched pass.
    Input (..., H, W, C) with H == W; output (8, ..., H, W, C).
    """
    views = []
    for flip in (False, True):
        base = hflip(img) if flip else img
        for k in range(4):
            views.append(rot90(base, k))
    return jnp.stack(views, axis=0)


def d4_inverse(views: jnp.ndarray) -> jnp.ndarray:
    """Invert :func:`d4_views` on predictions: (8, ..., H, W, C) → aligned views."""
    out = []
    i = 0
    for flip in (False, True):
        for k in range(4):
            v = rot90(views[i], -k)
            if flip:
                v = hflip(v)
            out.append(v)
            i += 1
    return jnp.stack(out, axis=0)


# ---------------------------------------------------------------------------
# Stochastic photometric ops (train-time augmentation)
# ---------------------------------------------------------------------------

def random_brightness(key, img, limit: float = 0.2):
    """albumentations RandomBrightness: img * (1 + alpha), alpha ~ U(-limit, limit)."""
    alpha = jax.random.uniform(key, (), minval=-limit, maxval=limit)
    return jnp.clip(img * (1.0 + alpha), 0.0, 255.0)


def random_contrast(key, img, limit: float = 0.2):
    """albumentations RandomContrast: mean-preserving contrast scale."""
    alpha = 1.0 + jax.random.uniform(key, (), minval=-limit, maxval=limit)
    mean = jnp.mean(rgb_to_gray(img, keep_channels=False)) if img.shape[-1] == 3 else jnp.mean(img)
    return jnp.clip(img * alpha + mean * (1.0 - alpha), 0.0, 255.0)


def random_gamma(key, img, gamma_limit=(0.8, 1.2)):
    """albumentations RandomGamma (limits given as 80..120 / 100)."""
    gamma = jax.random.uniform(key, (), minval=gamma_limit[0], maxval=gamma_limit[1])
    return jnp.clip(((img / 255.0) ** gamma) * 255.0, 0.0, 255.0)


def gauss_noise(key, img, var_limit=(10.0, 50.0)):
    """albumentations GaussNoise: additive N(0, sigma), sigma² ~ U(var_limit)."""
    k1, k2 = jax.random.split(key)
    var = jax.random.uniform(k1, (), minval=var_limit[0], maxval=var_limit[1])
    noise = jax.random.normal(k2, img.shape) * jnp.sqrt(var)
    return jnp.clip(img + noise, 0.0, 255.0)


# ---------------------------------------------------------------------------
# Coordinate-warp machinery (ShiftScaleRotate / elastic / grid / optical)
# ---------------------------------------------------------------------------

def _grid_hw(h: int, w: int):
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    return jnp.meshgrid(ys, xs, indexing="ij")


def warp_bilinear(img: jnp.ndarray, coords_y: jnp.ndarray, coords_x: jnp.ndarray,
                  order: int = 1) -> jnp.ndarray:
    """Sample HWC image at float coords (H', W') with bilinear interp, edge clamp."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    from jax.scipy.ndimage import map_coordinates

    def one_channel(ch):
        return map_coordinates(ch, [coords_y, coords_x], order=order, mode="nearest")

    out = jax.vmap(one_channel, in_axes=-1, out_axes=-1)(img)
    return out[..., 0] if squeeze else out


def shift_scale_rotate(key, img, mask=None, shift_limit=0.0625, scale_limit=0.1,
                       rotate_limit=45.0):
    """albumentations ShiftScaleRotate defaults (rotate ±45°, shift ±6.25%, scale ±10%)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angle = jax.random.uniform(k1, (), minval=-rotate_limit, maxval=rotate_limit) * jnp.pi / 180.0
    scale = 1.0 + jax.random.uniform(k2, (), minval=-scale_limit, maxval=scale_limit)
    dy = jax.random.uniform(k3, (), minval=-shift_limit, maxval=shift_limit) * h
    dx = jax.random.uniform(k4, (), minval=-shift_limit, maxval=shift_limit) * w
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    gy, gx = _grid_hw(h, w)
    # inverse map: output pixel -> input pixel
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    oy, ox = gy - cy - dy, gx - cx - dx
    sy = (cos * oy - sin * ox) / scale + cy
    sx = (sin * oy + cos * ox) / scale + cx
    out = warp_bilinear(img, sy, sx)
    if mask is not None:
        m = warp_bilinear(mask, sy, sx, order=0)
        return out, m
    return out


def elastic_transform(key, img, mask=None, alpha: float = 120.0, sigma: float = 6.0):
    """Elastic deformation (Simard et al.): random displacement field, blurred, scaled."""
    h, w = img.shape[0], img.shape[1]
    k1, k2 = jax.random.split(key)
    dy = gaussian_blur(jax.random.uniform(k1, (h, w, 1), minval=-1, maxval=1), sigma)[..., 0] * alpha / sigma
    dx = gaussian_blur(jax.random.uniform(k2, (h, w, 1), minval=-1, maxval=1), sigma)[..., 0] * alpha / sigma
    gy, gx = _grid_hw(h, w)
    out = warp_bilinear(img, gy + dy, gx + dx)
    if mask is not None:
        return out, warp_bilinear(mask, gy + dy, gx + dx, order=0)
    return out


def grid_distortion(key, img, mask=None, num_steps: int = 5, distort_limit: float = 0.3):
    """albumentations GridDistortion: per-grid-cell random step scaling."""
    h, w = img.shape[0], img.shape[1]
    k1, k2 = jax.random.split(key)

    def axis_map(k, size):
        steps = 1.0 + jax.random.uniform(k, (num_steps + 1,), minval=-distort_limit, maxval=distort_limit)
        cell = size // num_steps
        # cumulative positions of grid nodes after scaling each cell
        scaled = steps * cell
        pos = jnp.concatenate([jnp.zeros(1), jnp.cumsum(scaled)])
        pos = pos / pos[-1] * (size - 1)  # renormalize to full extent
        src_nodes = jnp.linspace(0, size - 1, num_steps + 2)
        coords = jnp.arange(size, dtype=jnp.float32)
        return jnp.interp(coords, pos, src_nodes)  # inverse map per axis

    my = axis_map(k1, h)
    mx = axis_map(k2, w)
    gy = jnp.broadcast_to(my[:, None], (h, w))
    gx = jnp.broadcast_to(mx[None, :], (h, w))
    out = warp_bilinear(img, gy, gx)
    if mask is not None:
        return out, warp_bilinear(mask, gy, gx, order=0)
    return out


def optical_distortion(key, img, mask=None, distort_limit: float = 2.0,
                       shift_limit: float = 0.5):
    """albumentations OpticalDistortion (barrel/pincushion) approximation."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    kdist = jax.random.uniform(k1, (), minval=-distort_limit, maxval=distort_limit)
    dy = jax.random.uniform(k2, (), minval=-shift_limit, maxval=shift_limit) * h * 0.1
    dx = jax.random.uniform(k3, (), minval=-shift_limit, maxval=shift_limit) * w * 0.1
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    gy, gx = _grid_hw(h, w)
    ny = (gy - cy) / cy
    nx = (gx - cx) / cx
    r2 = ny * ny + nx * nx
    factor = 1.0 / (1.0 + kdist * r2 * 0.25)
    sy = ny * factor * cy + cy + dy
    sx = nx * factor * cx + cx + dx
    out = warp_bilinear(img, sy, sx)
    if mask is not None:
        return out, warp_bilinear(mask, sy, sx, order=0)
    return out


def random_scale(key, img, mask=None, scale_limit=(0.5, 2.0), out_hw=None):
    """RandomScale (vessel policy, data_transform.py:141) realized as a scale-about-
    center warp at static output shape (TPU needs static shapes)."""
    h, w = img.shape[0], img.shape[1]
    scale = jax.random.uniform(key, (), minval=scale_limit[0], maxval=scale_limit[1])
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    gy, gx = _grid_hw(h, w)
    sy = (gy - cy) / scale + cy
    sx = (gx - cx) / scale + cx
    out = warp_bilinear(img, sy, sx)
    if mask is not None:
        return out, warp_bilinear(mask, sy, sx, order=0)
    return out


# ---------------------------------------------------------------------------
# CLAHE (on-device; replaces cv2.createCLAHE used by EasyTransform/MediumTransform
# and preprocess_gan.py). Tile histograms + clipped CDF + bilinear map blending.
# ---------------------------------------------------------------------------

def clahe(img: jnp.ndarray, clip_limit: float = 4.0, grid: Tuple[int, int] = (8, 8),
          nbins: int = 256) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization on an HW (single-channel,
    [0,255]) image. Vectorized: one-hot tile histograms, clip + redistribute,
    CDF lookup blended bilinearly between the 4 nearest tile mappings."""
    h, w = img.shape[0], img.shape[1]
    gh, gw = grid
    th, tw = h // gh, w // gw
    x = img[: gh * th, : gw * tw]
    vals = jnp.clip(x, 0, 255).astype(jnp.int32)
    tiles = vals.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(gh * gw, th * tw)
    onehot = jax.nn.one_hot(tiles, nbins, dtype=jnp.float32)
    hist = onehot.sum(axis=1)  # (gh*gw, nbins)
    # clip histogram and redistribute excess uniformly (cv2 semantics)
    limit = jnp.maximum(clip_limit * th * tw / nbins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / nbins
    cdf = jnp.cumsum(hist, axis=1)
    cdf = (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1e-6) * (nbins - 1)
    cdf = cdf.reshape(gh, gw, nbins)

    # bilinear blend between tile mappings at each pixel
    gy, gx = _grid_hw(h, w)
    ty = jnp.clip((gy + 0.5) / th - 0.5, 0.0, gh - 1.0)
    tx = jnp.clip((gx + 0.5) / tw - 0.5, 0.0, gw - 1.0)
    y0 = jnp.floor(ty).astype(jnp.int32)
    x0 = jnp.floor(tx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, gh - 1)
    x1 = jnp.minimum(x0 + 1, gw - 1)
    fy = ty - y0
    fx = tx - x0
    v = jnp.clip(img, 0, 255).astype(jnp.int32)

    def lookup(iy, ix):
        return cdf[iy, ix, v]

    m00 = lookup(y0, x0)
    m01 = lookup(y0, x1)
    m10 = lookup(y1, x0)
    m11 = lookup(y1, x1)
    out = (m00 * (1 - fy) * (1 - fx) + m01 * (1 - fy) * fx
           + m10 * fy * (1 - fx) + m11 * fy * fx)
    return out


def clahe_rgb(img: jnp.ndarray, clip_limit: float = 4.0, grid=(8, 8)) -> jnp.ndarray:
    """CLAHE on luminance, chroma preserved via per-pixel ratio (approximates the
    LAB-L CLAHE of preprocess_gan.py:18-57 without a full LAB round-trip)."""
    lum = rgb_to_gray(img, keep_channels=False)
    eq = clahe(lum, clip_limit, grid)
    ratio = eq / jnp.maximum(lum, 1.0)
    return jnp.clip(img * ratio[..., None], 0.0, 255.0)
