"""On-device sliding-window (tiled) inference.

Replaces the reference's host round-trip tiling loop (rasterio window reads +
cv2 resize + numpy paste, tta.py:196-213) with a single jitted ``lax.scan`` over a
static ``make_grid`` schedule: ``dynamic_slice`` the tile, resize to the model's
scale, predict, resize back, ``dynamic_update_slice`` into the canvas. Overlap
semantics match the reference (later tiles overwrite); ``blend='mean'`` offers a
quality upgrade with on-device weight accumulation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def tiled_predict(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    grid: jnp.ndarray,
    window: int,
    scale_size: int,
    blend: str = "overwrite",
) -> jnp.ndarray:
    """Predict a full-resolution probability map tile by tile, on device.

    Args:
      predict_fn: maps a (scale_size, scale_size, C) tile to (scale_size,
        scale_size) probabilities. Called once inside the scan (one compile).
      image: (H, W, C) full-resolution input.
      grid: (N, 4) int array of [x1, x2, y1, y2] from ``utils.make_grid`` —
        every tile must be ``window``×``window`` (make_grid guarantees this).
      window: static tile size in image pixels.
      scale_size: static model input size.
      blend: 'overwrite' (reference semantics, tta.py:213) or 'mean'.

    Returns (H, W) float32 probabilities.
    """
    h, w = image.shape[0], image.shape[1]
    canvas = jnp.zeros((h, w), jnp.float32)
    weight = jnp.zeros((h, w), jnp.float32)

    def body(carry, slice_xy):
        canvas, weight = carry
        x1, y1 = slice_xy[0], slice_xy[2]
        tile = jax.lax.dynamic_slice(image, (x1, y1, 0), (window, window, image.shape[2]))
        tile = jax.image.resize(tile, (scale_size, scale_size, image.shape[2]), "linear")
        probs = predict_fn(tile)
        probs = jax.image.resize(probs.astype(jnp.float32), (window, window), "linear")
        if blend == "overwrite":
            patch = jax.lax.dynamic_slice(canvas, (x1, y1), (window, window))
            canvas = jax.lax.dynamic_update_slice(canvas, probs, (x1, y1))
            del patch
        else:
            acc = jax.lax.dynamic_slice(canvas, (x1, y1), (window, window)) + probs
            canvas = jax.lax.dynamic_update_slice(canvas, acc, (x1, y1))
            wacc = jax.lax.dynamic_slice(weight, (x1, y1), (window, window)) + 1.0
            weight = jax.lax.dynamic_update_slice(weight, wacc, (x1, y1))
        return (canvas, weight), None

    (canvas, weight), _ = jax.lax.scan(body, (canvas, weight), grid)
    if blend == "mean":
        canvas = canvas / jnp.maximum(weight, 1.0)
    return canvas
