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
    image = image.astype(jnp.float32)  # accepts the uint8 wire format
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


def tiled_predict_sharded(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    grid: jnp.ndarray,
    window: int,
    scale_size: int,
    mesh,
    blend: str = "overwrite",
) -> jnp.ndarray:
    """``tiled_predict`` with the tile grid sharded over the mesh's ``data``
    axis — each chip scans its share of tiles against the (replicated) image,
    partial canvases are combined with collectives XLA lowers onto ICI.

    Semantics match the sequential scan exactly, including the reference's
    later-tiles-overwrite rule (tta.py:213): every tile carries its global
    grid index as a per-pixel priority; the combine keeps, per pixel, the
    value of the highest-priority covering tile (``pmax`` over priorities +
    masked ``psum``), which is precisely "last tile wins". ``blend='mean'``
    is a plain psum of canvas and weight.

    The grid is padded to a multiple of the axis size with degenerate
    repeats of tile 0 at priority -1 (they can never win a pixel).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    image = image.astype(jnp.float32)  # accepts the uint8 wire format
    n_dev = mesh.shape[DATA_AXIS]
    g = grid.shape[0]
    g_pad = -(-g // n_dev) * n_dev
    pad_rows = jnp.broadcast_to(grid[:1], (g_pad - g, 4))
    grid_p = jnp.concatenate([grid, pad_rows], axis=0)
    # global priority: real tiles 0..g-1, padding -1
    prio = jnp.concatenate([jnp.arange(g, dtype=jnp.float32),
                            jnp.full((g_pad - g,), -1.0, jnp.float32)])
    grid_p = grid_p.reshape(n_dev, g_pad // n_dev, 4)
    prio = prio.reshape(n_dev, g_pad // n_dev)

    h, w = image.shape[0], image.shape[1]

    def worker(image, my_grid, my_prio):
        my_grid, my_prio = my_grid[0], my_prio[0]  # strip sharded lead axis
        canvas = jnp.zeros((h, w), jnp.float32)
        pri = jnp.full((h, w), -2.0, jnp.float32)
        weight = jnp.zeros((h, w), jnp.float32)

        def body(carry, slice_p):
            canvas, pri, weight = carry
            x1, y1, p = (slice_p[0].astype(jnp.int32),
                         slice_p[2].astype(jnp.int32), slice_p[4])
            tile = jax.lax.dynamic_slice(
                image, (x1, y1, 0), (window, window, image.shape[2]))
            tile = jax.image.resize(
                tile, (scale_size, scale_size, image.shape[2]), "linear")
            probs = predict_fn(tile)
            probs = jax.image.resize(probs.astype(jnp.float32),
                                     (window, window), "linear")
            if blend == "overwrite":
                patch_p = jax.lax.dynamic_slice(pri, (x1, y1),
                                                (window, window))
                take = p >= 0  # padding rows never write
                newp = jnp.where(take, jnp.maximum(patch_p, p), patch_p)
                patch_c = jax.lax.dynamic_slice(canvas, (x1, y1),
                                                (window, window))
                newc = jnp.where(take & (p >= patch_p), probs, patch_c)
                canvas = jax.lax.dynamic_update_slice(canvas, newc, (x1, y1))
                pri = jax.lax.dynamic_update_slice(pri, newp, (x1, y1))
            else:
                scale = jnp.where(p >= 0, 1.0, 0.0)
                acc = jax.lax.dynamic_slice(canvas, (x1, y1),
                                            (window, window)) + probs * scale
                canvas = jax.lax.dynamic_update_slice(canvas, acc, (x1, y1))
                wacc = jax.lax.dynamic_slice(weight, (x1, y1),
                                             (window, window)) + scale
                weight = jax.lax.dynamic_update_slice(weight, wacc, (x1, y1))
            return (canvas, pri, weight), None

        sp = jnp.concatenate(
            [my_grid.astype(jnp.float32), my_prio[:, None]], axis=1)
        (canvas, pri, weight), _ = jax.lax.scan(
            body, (canvas, pri, weight), sp)
        if blend == "overwrite":
            best = jax.lax.pmax(pri, DATA_AXIS)
            mine = (pri == best) & (pri >= 0.0)
            return jax.lax.psum(jnp.where(mine, canvas, 0.0), DATA_AXIS)
        canvas = jax.lax.psum(canvas, DATA_AXIS)
        weight = jax.lax.psum(weight, DATA_AXIS)
        return canvas / jnp.maximum(weight, 1.0)

    return shard_map(
        worker, mesh=mesh,
        in_specs=(P(None, None, None), P(DATA_AXIS, None, None),
                  P(DATA_AXIS, None)),
        out_specs=P(None, None),
        check_vma=False,  # outputs are made replicated by the psum combine
    )(image, grid_p, prio)
