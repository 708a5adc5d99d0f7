"""Fused scSE-gated 3×3 conv Pallas kernel for the UNet++ decoder tail.

The flagship's tail nodes (cout 32-64 at 512², reference
unetplusplusstar.py:71-161) cost 17-28 ms each on v5e under the XLA fast
path — 2-3× their logical floor — because the work is spread over separate
HBM passes (scSE spatial-gate read, gated conv, packed-layout inflation:
PERFORMANCE.md round-3 profile). This kernel collapses the whole
gate+conv1+BN+ReLU stage into ONE read of the input parts:

* **tap-grouped matmuls**: conv3×3 with cout<128 wastes MXU lanes (N=cout).
  Grouping g = 128//cout taps into one (W, C)·(C, g·cout) matmul fills the
  lanes, with a static skip of groups whose taps all land outside the tile
  (≈1.2× logical FLOPs at th=4/cout=64) — less than the 16/9 (s2d) / 4/3
  (H2) packed-layout forms; the shifted-tap accumulation runs on the VPU.
* **in-register scSE spatial gate**: the sSE 1×1-conv logit is computed per
  row from the already-resident tile (the separate full-tensor gate read
  disappears); the channel gate (from pooled means — cheap, fuses into
  producer epilogues) is precomputed outside and passed per batch.
* **lagged pipeline with a carried halo** (the double-buffered DMA the
  round-1 kernel lacked, without any manual DMA): the grid runs
  nchunks+1 steps; step i computes OUTPUT block i-1 from the carried copy
  of input block i-1 (VMEM scratch), the carried last row of block i-2,
  and the first row of the freshly streamed block i. Pallas's own pipeline
  double-buffers the input blocks, so chunk i+1 streams from HBM while
  chunk i computes. Manual `make_async_copy` halo DMA is impossible here:
  Mosaic rejects HBM slices whose minor dim is not a multiple of 128
  (bisected: ci=64/192/448 fail, ci=128 and W·ci-flattened pass), while
  ordinary BlockSpec blocks with the full channel dim are legal.
* **virtual concat**: each part arrives as its own operand and rows are
  assembled into one (th+2, W, ΣC) VMEM tile — the concatenation never
  exists in HBM, and the MXU contracts over the full ΣC (per-part K=64
  matmuls would pad K to 128 and inflate the FLOPs ~25%).

Numerics: matmuls accumulate f32 (preferred_element_type); the gate and the
affine epilogue (folded eval BatchNorm) run f32; output is cast to the
compute dtype. Exactness vs the plain composition is pinned by
tests/test_pallas_scse_conv.py (interpret mode on CPU, 1e-5).

Mosaic constraints honored (found by bisection, see pallas_conv.py and
PERFORMANCE.md): no 3D transposes / batched matmuls / 1D-vector broadcasts
(all row ops are 2D); column shifts via roll+iota-mask, NOT pad+slice
(tpu.concatenate rejects the 64-lane-offset tap blocks: "result/input
offset mismatch on non-concat dimension"); (1, C) blocks of a (B, C)
operand violate the (8, 128) min-tile rule — pass the full array and index
by program_id instead.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _tap_groups(cout: int) -> Tuple[int, List[List[Tuple[int, int]]]]:
    """Split the 9 taps (dy,dx) into groups of g = max(1, 128//cout)."""
    g = max(1, 128 // cout)
    taps = [(dy, dx) for dy in range(3) for dx in range(3)]
    groups = [taps[i:i + g] for i in range(0, 9, g)]
    return g, groups


def _shift_cols(y: jnp.ndarray, s: int) -> jnp.ndarray:
    """(W, C) shifted along W: z[w] = y[w+s], zero fill, s ∈ {-1, 0, 1}."""
    if s == 0:
        return y
    W = y.shape[0]
    z = jnp.roll(y, -s, axis=0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    mask = (w_iota < W - 1) if s > 0 else (w_iota >= 1)
    return jnp.where(mask, z, 0.0)


def _kernel(gc_ref, wsse_ref, bsse_ref, wm_ref, scale_ref, bias_ref,
            *refs, th, cin_list, cout, groups, relu, gated, nchunks,
            out_dtype):
    n_parts = len(cin_list)
    parts_in = refs[:n_parts]                       # (1, th, W, ci) blocks
    out_ref = refs[n_parts]                         # (1, th, W, cout)
    prevs = refs[n_parts + 1:2 * n_parts + 1]       # (th+1, W, ci) carried
    acc_ref = refs[2 * n_parts + 1]                 # (th, W, cout) f32
    # (a per-dx accumulator variant — shift once per output row instead of
    # per tap-slot — measured SLOWER: the 3× accumulator zeroing/traffic
    # cost more than the rolls it saved, and +1MB VMEM broke th=4 at ΣC=448)

    b = pl.program_id(0)
    i = pl.program_id(1)
    W = prevs[0].shape[1]

    @pl.when(i > 0)
    def _compute():
        # out block i-1 = input rows (i-1)*th .. i*th-1; halo rows are the
        # carried last row of block i-2 (prevs[th]) and the first row of the
        # streaming block i. Rows assemble by VALUE-level lane concat — no
        # (th+2, W, ΣC) staging buffer (VMEM was the limiter at ΣC=448).
        acc_ref[...] = jnp.zeros_like(acc_ref)
        gc_row = gc_ref[b].reshape(1, -1)           # (1, ΣC) f32
        wsse_row = wsse_ref[0].reshape(1, -1)       # (1, ΣC) f32
        bsse = bsse_ref[0, 0]

        def part_row(p, j):
            # j indexes input rows (i-1)*th-1+j; j=0 top halo, j=th+1 bottom
            if j == 0:
                return prevs[p][th]
            if j <= th:
                return prevs[p][j - 1]
            return parts_in[p][0, 0]

        def do_rows(js):
            # PAIRED rows: one (len(js)·W, ΣC) assembly and one matmul per
            # tap group — M=2W fills the MXU pipeline that M=W left idle
            # and halves the per-row gate/concat fixed costs
            cols = []
            for p in range(n_parts):
                rs = [part_row(p, j) for j in js]
                cols.append(rs[0] if len(rs) == 1
                            else jnp.concatenate(rs, axis=0))
            xrow = cols[0] if n_parts == 1 else jnp.concatenate(cols, axis=1)
            # image-border halo rows are zero (SAME padding): zero their
            # VALUES so their fused-matmul contribution vanishes
            M = xrow.shape[0]
            if js[0] == 0 or js[-1] == th + 1:
                r_iota = jax.lax.broadcasted_iota(jnp.int32, xrow.shape, 0)
                if js[0] == 0:
                    xrow = jnp.where(jnp.logical_or(i > 1, r_iota >= W),
                                     xrow, 0)
                if js[-1] == th + 1:
                    xrow = jnp.where(jnp.logical_or(i < nchunks,
                                                    r_iota < M - W), xrow, 0)
            if gated:
                # f32 accumulation for the sSE logit; the gating multiply
                # itself runs in the compute dtype (house numerics — matches
                # SCSEAttention's p * (gate_c + gate_s) in p.dtype, and
                # halves the per-row register pressure)
                t = jnp.sum(xrow.astype(_F32) * wsse_row, axis=1,
                            keepdims=True)                         # (M, 1)
                gate = gc_row + jax.nn.sigmoid(t + bsse)           # (M, ΣC)
                xg = xrow * gate.astype(xrow.dtype)
            else:
                xg = xrow
            for m, taps in enumerate(groups):
                used = [(r, idx, dy, dx)
                        for r, j in enumerate(js)
                        for idx, (dy, dx) in enumerate(taps)
                        if 0 <= j - dy < th]
                if not used:
                    continue  # whole group outside the tile: skip the matmul
                y = jnp.dot(xg, wm_ref[m], preferred_element_type=_F32)
                for r, idx, dy, dx in used:
                    blk = y[r * W:(r + 1) * W, idx * cout:(idx + 1) * cout]
                    acc_ref[js[r] - dy] += _shift_cols(blk, dx - 1)

        rows = list(range(th + 2))
        for k in range(0, len(rows) - 1, 2):
            do_rows(rows[k:k + 2])
        if len(rows) % 2:
            do_rows(rows[-1:])

        scale_row = scale_ref[0].reshape(1, -1)
        bias_row = bias_ref[0].reshape(1, -1)
        for io in range(th):
            yrow = acc_ref[io] * scale_row + bias_row
            if relu:
                yrow = jnp.maximum(yrow, 0.0)
            out_ref[0, io] = yrow.astype(out_dtype)

    # carry update (every step): halo row (= prev block's last row) moves to
    # prevs[th], then rows 0..th-1 <- current block
    @pl.when(i < nchunks)
    def _carry():
        for p in range(n_parts):
            prevs[p][th] = prevs[p][th - 1]
            prevs[p][0:th] = parts_in[p][0]


def scse_conv3x3_bn_relu(
        parts: Sequence[jnp.ndarray],
        gate_c: jnp.ndarray,
        sse_kernel: jnp.ndarray,
        sse_bias: jnp.ndarray,
        k3: jnp.ndarray,
        scale: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        relu: bool = True,
        gated: bool = True,
        tile_rows: int = 4,
        interpret: bool = False) -> jnp.ndarray:
    """Fused scse-gate → 3×3 SAME conv (virtual concat) → affine → ReLU.

    Computes ``affine(conv3x3(cat(parts) * (gate_c + sigmoid(sse))))`` where
    ``sse = conv1x1(cat(parts), sse_kernel) + sse_bias`` — the decode-node
    stage attention1∘conv1∘BN∘ReLU of reference unetplusplusstar.py:71-161
    in eval mode, in one HBM pass.

    parts: list of (B, H, W, ci) maps at output resolution (part 0 already
      ×2-upsampled by the caller). gate_c: (B, ΣC) f32 — ALREADY sigmoided
      channel gate. sse_kernel: (ΣC,) f32; sse_bias: scalar f32.
    k3: (3, 3, ΣC, cout) HWIO; scale/bias: (cout,) folded BN (None = id).
    ``gated=False`` skips the scSE gate entirely (plain conv3×3+affine+ReLU
    over the virtual concat — the decode node's conv2 stage).
    Returns (B, H, W, cout) in parts[0].dtype.
    """
    parts = list(parts)
    B, H, W, _ = parts[0].shape
    cin_list = [int(p.shape[-1]) for p in parts]
    C = sum(cin_list)
    cout = int(k3.shape[-1])
    g, groups = _tap_groups(cout)
    n_mat = len(groups)

    th = min(tile_rows, H)
    while H % th != 0:
        th -= 1
    nchunks = H // th

    dtype = parts[0].dtype
    # tap-group weight matrices: wm[m][:, idx*cout:(idx+1)*cout] = k3[dy, dx]
    wm = jnp.zeros((n_mat, C, g * cout), k3.dtype)
    for m, taps in enumerate(groups):
        for idx, (dy, dx) in enumerate(taps):
            wm = wm.at[m, :, idx * cout:(idx + 1) * cout].set(k3[dy, dx])
    wm = wm.astype(dtype)

    scale = jnp.ones((cout,), _F32) if scale is None else scale
    bias = jnp.zeros((cout,), _F32) if bias is None else bias

    kern = functools.partial(
        _kernel, th=th, cin_list=cin_list, cout=cout, groups=groups,
        relu=relu, gated=gated, nchunks=nchunks, out_dtype=dtype)

    def in_map(b, i):
        return (b, jnp.minimum(i, nchunks - 1), 0, 0)

    def out_map(b, i):
        return (b, jnp.maximum(i - 1, 0), 0, 0)

    part_specs = [
        pl.BlockSpec((1, th, W, ci), in_map, memory_space=pltpu.VMEM)
        for ci in cin_list
    ]
    return pl.pallas_call(
        kern,
        grid=(B, nchunks + 1),
        in_specs=[
            pl.BlockSpec((B, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # gate_c (full: a
            # (1, C) block would violate the (8, 128) min-tile rule)
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # sse_kernel
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # sse_bias
            pl.BlockSpec((n_mat, C, g * cout), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),          # wm
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # scale
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # bias
        ] + part_specs,
        out_specs=pl.BlockSpec((1, th, W, cout), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), dtype),
        scratch_shapes=(
            [pltpu.VMEM((th + 1, W, ci), dtype) for ci in cin_list]  # prevs
            + [pltpu.VMEM((th, W, cout), _F32)]),                    # acc
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(gate_c.astype(_F32),
      sse_kernel.reshape(1, C).astype(_F32),
      sse_bias.reshape(1, 1).astype(_F32),
      wm,
      scale.reshape(1, cout).astype(_F32),
      bias.reshape(1, cout).astype(_F32),
      *parts)
