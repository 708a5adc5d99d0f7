"""Pallas 3×3 SAME conv as 9 shifted MXU matmuls (round-2 groundwork).

The UNet++ decoder's 3×3 convs at 256²-512² with 64-256 output channels run at
50-65% MXU under XLA and dominate the flagship's runtime (PERFORMANCE.md).
This kernel reformulates conv3×3 as Σ_{dy,dx} shift(x)·W[dy,dx] — each term a
(rows × Cin)·(Cin × Cout) matmul — with the input row-tiled plus a 1-row halo
DMA'd from HBM into VMEM (BlockSpecs cannot overlap, so the halo copy is
manual). The epilogue (affine + ReLU, i.e. folded BN) is fused.

Status: correctness-complete experiment record — compiles and runs on v5e
(448→64@512² bs8: 35.5 ms vs XLA's fused 23.6 ms; the gap is the serial halo
DMA). Round 2 instead closed the decoder gap with exact XLA-level layout
rewrites (ops/packed.py — see PERFORMANCE.md): the padding probe showed
traffic already at logical bandwidth, so a fused Pallas node would at best
match XLA's conv while adding Mosaic risk. Kept as the measured baseline any
future Pallas conv work must beat, with the constraint list below.
NOT wired into the model (XLA remains the default).

Mosaic constraints found while building this (see also PERFORMANCE.md):
* strided-destination DMA (two sliced dims) crashes the compiler — DMA full
  rows, do W-halo shifts in-register via jnp.pad+slice (pltpu.roll crashes)
* the (th, W, C) → (th·W, C) flatten requires C % 128 == 0 — channels are
  zero-padded outside the kernel
* keep the (th+2, W, C) tile within ~6 MB of VMEM
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _kernel(x_hbm, w_ref, scale_ref, bias_ref, out_ref, x_tile, sem,
            *, th, H, W, cin, cout, relu, dtype, main_rows):
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * th

    # ---- halo DMA: rows [row0-1, row0+th+1) with edge rows zeroed ----
    x_tile[...] = jnp.zeros_like(x_tile)
    n_rows = th + 2
    # clamp the copy range into the image
    src_lo = jnp.maximum(row0 - 1, 0)
    src_hi = jnp.minimum(row0 + th + 1, H)
    dst_lo = src_lo - (row0 - 1)          # 0 or 1
    size = src_hi - src_lo
    # DMA sizes must be static: copy main_rows (= min(th+1, H)) rows from
    # src_lo, then fix the one remaining interior-halo row when it exists.
    # tile is (th+2, W, cin), zeroed (strided-destination DMA crashes mosaic,
    # so W-halo shifts happen in-register via pad+slice below)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(src_lo, main_rows), :, :],
        x_tile.at[pl.ds(dst_lo, main_rows), :, :],
        sem,
    )
    copy.start()
    copy.wait()

    @pl.when(size > main_rows)
    def _():
        tail = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_lo + main_rows, 1), :, :],
            x_tile.at[pl.ds(dst_lo + main_rows, 1), :, :],
            sem,
        )
        tail.start()
        tail.wait()

    # ---- 9 shifted matmuls accumulated in fp32 ----
    acc = jnp.zeros((th * W, cout), _F32)
    for dy in range(3):
        rows = x_tile[dy:dy + th, :, :]               # (th, W, cin)
        for dx in range(3):
            if dx == 0:   # shift right: col j reads col j-1, col 0 zero
                xs = jnp.pad(rows, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
            elif dx == 2:  # shift left
                xs = jnp.pad(rows, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
            else:
                xs = rows
            acc = acc + jnp.dot(xs.reshape(th * W, cin), w_ref[dy, dx],
                                preferred_element_type=_F32)
    y = acc * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[...] = y.reshape(1, th, W, cout).astype(out_ref.dtype)


def conv3x3_bn_relu(x: jnp.ndarray, w: jnp.ndarray,
                    scale: Optional[jnp.ndarray] = None,
                    bias: Optional[jnp.ndarray] = None,
                    relu: bool = True, tile_rows: Optional[int] = None,
                    interpret: bool = False,
                    vmem_budget: int = 6 * 2 ** 20) -> jnp.ndarray:
    """Fused 3×3 SAME conv + per-channel affine + ReLU.

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; H divisible by tile_rows.
    Cin is zero-padded to a multiple of 128 (mosaic requires a 128-multiple
    lane dim for the in-kernel flatten); tile_rows auto-sizes to the VMEM
    budget when not given.
    """
    n, H, W, cin = x.shape
    cout = w.shape[-1]
    pad_c = (-cin) % 128
    if pad_c and not interpret:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        cin += pad_c
    if tile_rows is None:
        bytes_per_row = W * cin * x.dtype.itemsize
        tile_rows = max(8, (vmem_budget // bytes_per_row) - 2)
    th = min(tile_rows, H)
    while H % th != 0:
        th -= 1
    assert H % th == 0, (H, th)
    scale = jnp.ones((cout,), _F32) if scale is None else scale
    bias = jnp.zeros((cout,), _F32) if bias is None else bias
    dtype = x.dtype
    kernel = functools.partial(_kernel, th=th, H=H, W=W, cin=cin, cout=cout,
                               relu=relu, dtype=dtype,
                               main_rows=min(th + 1, H))
    return pl.pallas_call(
        kernel,
        grid=(n, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full input stays in HBM
            pl.BlockSpec((3, 3, cin, cout), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, H, W, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W, cin), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, w.astype(dtype), scale.reshape(1, cout), bias.reshape(1, cout))
