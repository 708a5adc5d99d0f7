"""Spatial (context-parallel) sharding: image rows over the mesh, halo
exchange over ICI.

The workload's "long context" is the spatial extent of full-resolution
fundus images (4288×2848 — SURVEY §5.7): the reference scales it by offline
patching and sliding-window tiling only. This module adds the TPU-native
third way: activations sharded along H across the mesh's devices, with
convolution halos exchanged via ``jax.lax.ppermute`` (one ICI hop per
neighbor) instead of ever gathering a full-resolution map on one chip —
the honest context-parallel analogue for a conv net.

Primitives (all used inside ``shard_map`` over a 1-axis mesh):
* ``halo_exchange``      — append neighbor edge rows (zeros at image edges)
* ``conv3x3_spatial``    — SAME 3×3 conv on H-sharded activations
* ``pool2x_spatial``     — 2×2 stride-2 max/avg pool (alignment-safe: local
                           row counts stay even)
* ``upsample2x_spatial`` — bilinear ×2 with the half-pixel edge clamp
                           reproduced across shard boundaries

``spatial_predict`` runs a user conv-stack over an H-sharded image from the
host side. Exactness vs the unsharded ops is pinned by
tests/test_spatial_sharding.py on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str = DATA_AXIS,
                  axis: int = 1) -> jnp.ndarray:
    """Append ``halo`` rows from each neighbor along the sharded spatial axis.

    x: local block, e.g. (B, h_local, W, C) with ``axis`` the sharded dim.
    Returns the block extended to h_local + 2·halo; the first/last device
    get zero rows at the outer edge (== zero padding of the global image).
    ``jax.lax.ppermute`` leaves receivers with no sender at zero, which
    gives exactly that.
    """
    n = jax.lax.psum(1, axis_name)
    take_last = [slice(None)] * x.ndim
    take_last[axis] = slice(-halo, None)
    take_first = [slice(None)] * x.ndim
    take_first[axis] = slice(None, halo)
    # my last rows -> next device's top halo
    top = jax.lax.ppermute(x[tuple(take_last)], axis_name,
                           [(i, i + 1) for i in range(n - 1)])
    # my first rows -> previous device's bottom halo
    bottom = jax.lax.ppermute(x[tuple(take_first)], axis_name,
                              [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([top, x, bottom], axis=axis)


def _conv3x3_local(x, kernel, dtype):
    """SAME-in-W, VALID-in-H 3×3 conv on a halo-extended local block."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1),
        ((0, 0), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3x3_spatial(x, kernel, axis_name: str = DATA_AXIS,
                    dtype=jnp.float32):
    """3×3 SAME conv on an H-sharded (B, h_local, W, C) block: exchange a
    1-row halo, convolve VALID over rows. Equals the unsharded SAME conv."""
    return _conv3x3_local(halo_exchange(x, 1, axis_name), kernel, dtype)


def pool2x_spatial(x, kind: str = "max"):
    """2×2 stride-2 pooling; needs even local row count (global H divisible
    by 2·n_devices), in which case windows never straddle a shard edge."""
    assert x.shape[1] % 2 == 0, "local rows must be even"
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def upsample2x_spatial(x, axis_name: str = DATA_AXIS):
    """Bilinear ×2 (half-pixel centers, edge clamp) of an H-sharded block.

    Interior rows need one neighbor row each way; the global edge clamp is
    reproduced by re-clamping to the local edge only on the devices that own
    the global first/last row.
    """
    n, h, w, c = x.shape
    idx = jax.lax.axis_index(axis_name)
    ndev = jax.lax.psum(1, axis_name)
    xh = halo_exchange(x, 1, axis_name)  # (n, h+2, w, c); zeros at edges
    # rows: out[2i]   = 0.25*xh[i-1] + 0.75*xh[i]   (clamped at global top)
    #       out[2i+1] = 0.75*xh[i]   + 0.25*xh[i+1] (clamped at global bottom)
    prev_r, cur_r, next_r = xh[:, :-2], xh[:, 1:-1], xh[:, 2:]
    # replace the zero halo with the clamped edge row where this device owns
    # the global boundary
    prev_r = jnp.where(
        (idx == 0) & (jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1) == 0),
        cur_r, prev_r)
    next_r = jnp.where(
        (idx == ndev - 1)
        & (jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1) == h - 1),
        cur_r, next_r)
    even = 0.25 * prev_r + 0.75 * cur_r
    odd = 0.75 * cur_r + 0.25 * next_r
    y = jnp.stack([even, odd], axis=2).reshape(n, 2 * h, w, c)
    # cols: local, standard banded blend with edge clamp
    left = jnp.concatenate([y[:, :, :1], y[:, :, :-1]], axis=2)
    right = jnp.concatenate([y[:, :, 1:], y[:, :, -1:]], axis=2)
    even_c = 0.25 * left + 0.75 * y
    odd_c = 0.75 * y + 0.25 * right
    return jnp.stack([even_c, odd_c], axis=3).reshape(n, 2 * h, 2 * w, c)


def spatial_predict(fn: Callable, image: jnp.ndarray, mesh: Mesh,
                    axis_name: str = DATA_AXIS) -> jnp.ndarray:
    """Run ``fn`` (built from the spatial primitives above) over an
    H-sharded image without gathering full-resolution activations.

    image: (B, H, W, C) with H divisible by the mesh axis size; fn maps a
    local (B, h, W, C) block to a local output block (same h or 2h etc.).
    """
    spec = P(None, axis_name, None, None)
    sharded = shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return sharded(image)
