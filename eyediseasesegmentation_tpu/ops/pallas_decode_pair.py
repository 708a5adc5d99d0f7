"""Two-conv fused decode-node Pallas kernel (the round-3 verdict's "one node
wider" fusion boundary).

``scse_conv3x3_pair`` computes the WHOLE decode-node conv stack of reference
unetplusplusstar.py:71-161 in eval mode —

    y1 = relu(affine1(conv3x3(cat(parts) * scse_gate)))      # attention1+conv1+BN
    y2 = relu(affine2(conv3x3(y1)))                          # conv2+BN
    csum[b, c] = sum_{h,w} y2[b, h, w, c]                    # gate-reduce epilogue

— in ONE pass over the inputs: ``y1`` never exists in HBM, and the channel
sums that attention2 (and, through it, every consumer node's scSE channel
gate) needs are produced as a kernel epilogue instead of a separate full read
of ``y2``.  That epilogue is what round 3's single-conv kernel
(`pallas_scse_conv.py`) lost to XLA: with the custom call in the graph, the
consumer's pooled-mean reduce could no longer fuse into the producer's
epilogue, costing an extra HBM pass per tail node (PERFORMANCE.md round-3
ledger).  Here the reduce rides the kernel's own output loop.

Structure (extends the single-conv kernel's lagged pipeline one stage
deeper): the grid runs ``nchunks+2`` steps; step i

  * streams input block i of every part (Pallas double-buffers),
  * stage A computes y1 block i-1 from the carried part rows (exactly the
    round-3 kernel: tap-grouped MXU matmuls over the virtual concat,
    in-register sSE row gate, paired rows for M=2W),
  * stage B computes y2 block i-2 from the carried y1 rows (block i-2),
    the carried last row of block i-3, and the first row of the freshly
    computed y1 block i-1 — and accumulates its row sums into the csum
    scratch, written out on the final step.

All Mosaic constraints honored as bisected in pallas_scse_conv.py /
pallas_conv.py: 2D row ops only, roll+iota-mask column shifts, no manual
halo DMA (carried VMEM scratch instead), full-array blocks for small
operands.  Exactness vs the plain composition is pinned by
tests/test_pallas_decode_pair.py (interpret mode, 1e-5).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_scse_conv import _shift_cols, _tap_groups

_F32 = jnp.float32


def _build_wm(k3: jnp.ndarray, groups, g: int, dtype) -> jnp.ndarray:
    """Tap-group weight matrices: wm[m][:, i*cout:(i+1)*cout] = k3[dy, dx]."""
    C, cout = int(k3.shape[2]), int(k3.shape[3])
    wm = jnp.zeros((len(groups), C, g * cout), k3.dtype)
    for m, taps in enumerate(groups):
        for idx, (dy, dx) in enumerate(taps):
            wm = wm.at[m, :, idx * cout:(idx + 1) * cout].set(k3[dy, dx])
    return wm.astype(dtype)


def _kernel(gc_ref, wsse_ref, bsse_ref, wm1_ref, s1_ref, b1_ref,
            wm2_ref, s2_ref, b2_ref, *refs,
            th, cin_list, cout, groups1, groups2, relu, gated, nchunks,
            out_dtype, up0=False, th2=0):
    n_parts = len(cin_list)
    parts_in = refs[:n_parts]                        # (1, th, W, ci) blocks
    out_ref = refs[n_parts]                          # (1, th, W, cout) y2
    csum_ref = refs[n_parts + 1]                     # (B, cout) f32
    prevs = refs[n_parts + 2:2 * n_parts + 2]        # (th+1, W, ci) carried
    y1_prev = refs[2 * n_parts + 2]                  # (th+1, W, cout) carried
    y1_cur = refs[2 * n_parts + 3]                   # (th, W, cout) fresh
    acc1 = refs[2 * n_parts + 4]                     # (th, W, cout) f32
    acc2 = refs[2 * n_parts + 5]                     # (th, W, cout) f32
    csum_acc = refs[2 * n_parts + 6]                 # (8, cout) f32

    b = pl.program_id(0)
    i = pl.program_id(1)
    W = prevs[0].shape[1]

    @pl.when(i == 0)
    def _zero_csum():
        csum_acc[...] = jnp.zeros_like(csum_acc)

    # ---- stage A: y1 block i-1 (identical math to pallas_scse_conv) ----
    @pl.when(jnp.logical_and(i > 0, i <= nchunks))
    def _stage_a():
        acc1[...] = jnp.zeros_like(acc1)
        gc_row = gc_ref[b].reshape(1, -1)            # (1, ΣC) f32
        wsse_row = wsse_ref[0].reshape(1, -1)        # (1, ΣC) f32
        bsse = bsse_ref[0, 0]

        def half0_row(jh):
            # up_part0: part 0 streams W-upsampled at HALF height; jh indexes
            # half rows with the same lagged-block convention (jh=0 top halo
            # = last row of half block i-2, 1..th2 = half block i-1, th2+1 =
            # first row of the freshly streamed half block i)
            if jh == 0:
                return prevs[0][th2]
            if jh <= th2:
                return prevs[0][jh - 1]
            return parts_in[0][0, 0]

        def part_row(p, j):
            if p == 0 and up0:
                # reconstruct full-res row j by the H-direction half of the
                # bilinear ×2 (half-pixel centers): even output rows are
                # 0.25·hr[m-1]+0.75·hr[m], odd are 0.75·hr[m]+0.25·hr[m+1];
                # relative to this block that is rows ⌊j/2⌋, ⌊j/2⌋+1 with
                # weights (.75,.25) for even j, (.25,.75) for odd j
                w_lo, w_hi = (0.75, 0.25) if j % 2 == 0 else (0.25, 0.75)
                rl = half0_row(j // 2).astype(_F32)
                rh = half0_row(j // 2 + 1).astype(_F32)
                r = w_lo * rl + w_hi * rh
                # bilinear edge clamp: global row 0 reads half row -1 → 0
                # (j=1 in the first block); global row H-1 reads half row
                # H/2 → H/2-1 (j=th in the last block).  Must be a SELECT,
                # not a weight blend — the clamped-away operand is
                # uninitialized scratch (NaN·0 = NaN).  Predicate is the
                # kernel's bisection-proven scalar∨iota 2D form.
                r_io = jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
                if j == 1:
                    r = jnp.where(jnp.logical_or(i != 1, r_io < 0), r, rh)
                if j == th:
                    r = jnp.where(jnp.logical_or(i != nchunks, r_io < 0),
                                  r, rl)
                return r.astype(out_dtype)
            if j == 0:
                return prevs[p][th]
            if j <= th:
                return prevs[p][j - 1]
            return parts_in[p][0, 0]

        def do_rows(js):
            cols = []
            for p in range(n_parts):
                rs = [part_row(p, j) for j in js]
                cols.append(rs[0] if len(rs) == 1
                            else jnp.concatenate(rs, axis=0))
            xrow = cols[0] if n_parts == 1 else jnp.concatenate(cols, axis=1)
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
                t = jnp.sum(xrow.astype(_F32) * wsse_row, axis=1,
                            keepdims=True)
                gate = gc_row + jax.nn.sigmoid(t + bsse)
                xg = xrow * gate.astype(xrow.dtype)
            else:
                xg = xrow
            for m, taps in enumerate(groups1):
                used = [(r, idx, dy, dx)
                        for r, j in enumerate(js)
                        for idx, (dy, dx) in enumerate(taps)
                        if 0 <= j - dy < th]
                if not used:
                    continue
                y = jnp.dot(xg, wm1_ref[m], preferred_element_type=_F32)
                for r, idx, dy, dx in used:
                    blk = y[r * W:(r + 1) * W, idx * cout:(idx + 1) * cout]
                    acc1[js[r] - dy] += _shift_cols(blk, dx - 1)

        rows = list(range(th + 2))
        for k in range(0, len(rows) - 1, 2):
            do_rows(rows[k:k + 2])
        if len(rows) % 2:
            do_rows(rows[-1:])

        scale_row = s1_ref[0].reshape(1, -1)
        bias_row = b1_ref[0].reshape(1, -1)
        for io in range(th):
            yrow = acc1[io] * scale_row + bias_row
            if relu:
                yrow = jnp.maximum(yrow, 0.0)
            y1_cur[io] = yrow.astype(out_dtype)

    # ---- stage B: y2 block i-2 from the carried y1 rows ----
    @pl.when(i > 1)
    def _stage_b():
        acc2[...] = jnp.zeros_like(acc2)

        def y1_row(j):
            # j indexes y1 rows (i-2)*th-1+j; j=0 top halo (last row of
            # block i-3), j in 1..th = block i-2, j=th+1 bottom halo (first
            # row of block i-1, freshly computed this step)
            if j == 0:
                return y1_prev[th]
            if j <= th:
                return y1_prev[j - 1]
            return y1_cur[0]

        def do_rows(js):
            rs = [y1_row(j) for j in js]
            xrow = rs[0] if len(rs) == 1 else jnp.concatenate(rs, axis=0)
            M = xrow.shape[0]
            if js[0] == 0 or js[-1] == th + 1:
                r_iota = jax.lax.broadcasted_iota(jnp.int32, xrow.shape, 0)
                if js[0] == 0:
                    xrow = jnp.where(jnp.logical_or(i > 2, r_iota >= W),
                                     xrow, 0)
                if js[-1] == th + 1:
                    xrow = jnp.where(jnp.logical_or(i < nchunks + 1,
                                                    r_iota < M - W), xrow, 0)
            for m, taps in enumerate(groups2):
                used = [(r, idx, dy, dx)
                        for r, j in enumerate(js)
                        for idx, (dy, dx) in enumerate(taps)
                        if 0 <= j - dy < th]
                if not used:
                    continue
                y = jnp.dot(xrow, wm2_ref[m], preferred_element_type=_F32)
                for r, idx, dy, dx in used:
                    blk = y[r * W:(r + 1) * W, idx * cout:(idx + 1) * cout]
                    acc2[js[r] - dy] += _shift_cols(blk, dx - 1)

        rows = list(range(th + 2))
        for k in range(0, len(rows) - 1, 2):
            do_rows(rows[k:k + 2])
        if len(rows) % 2:
            do_rows(rows[-1:])

        scale_row = s2_ref[0].reshape(1, -1)
        bias_row = b2_ref[0].reshape(1, -1)
        part = jnp.zeros((1, cout), _F32)
        for io in range(th):
            yrow = acc2[io] * scale_row + bias_row
            if relu:
                yrow = jnp.maximum(yrow, 0.0)
            out_ref[0, io] = yrow.astype(out_dtype)
            part += jnp.sum(yrow, axis=0, keepdims=True)
        # gate-reduce epilogue: accumulate this block's channel sums
        csum_acc[b % 8] += part[0]

    @pl.when(i == nchunks + 1)
    def _emit_csum():
        csum_ref[b] = csum_acc[b % 8]
        # reset the slot for the next batch element sharing it (B > 8)
        csum_acc[b % 8] = jnp.zeros((cout,), _F32)

    # ---- carry updates ----
    @pl.when(i < nchunks)
    def _carry_parts():
        for p in range(n_parts):
            t = th2 if (p == 0 and up0) else th
            prevs[p][t] = prevs[p][t - 1]
            prevs[p][0:t] = parts_in[p][0]

    @pl.when(jnp.logical_and(i > 0, i <= nchunks))
    def _carry_y1():
        y1_prev[th] = y1_prev[th - 1]
        y1_prev[0:th] = y1_cur[...]


def scse_conv3x3_pair(
        parts: Sequence[jnp.ndarray],
        gate_c: jnp.ndarray,
        sse_kernel: jnp.ndarray,
        sse_bias: jnp.ndarray,
        k1: jnp.ndarray,
        scale1: Optional[jnp.ndarray],
        bias1: Optional[jnp.ndarray],
        k2: jnp.ndarray,
        scale2: Optional[jnp.ndarray],
        bias2: Optional[jnp.ndarray],
        relu: bool = True,
        gated: bool = True,
        tile_rows: int = 4,
        up_part0: bool = False,
        interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode-node conv stack + channel-sum epilogue (see module doc).

    parts: list of (B, H, W, ci) maps at output resolution (part 0 already
      ×2-upsampled by the caller).  With ``up_part0=True`` part 0 is instead
      the (B, H/2, W, c0) W-UPSAMPLED half-height map (``upsample2x_w``) and
      the H-direction bilinear runs in-kernel — the full-res upsampled map
      never exists in HBM.  gate_c: (B, ΣC) f32 ALREADY-sigmoided
      channel gate; sse_kernel: (ΣC,) f32; sse_bias: scalar f32.
    k1: (3, 3, ΣC, cout); k2: (3, 3, cout, cout) HWIO.  scale*/bias*:
    (cout,) folded eval-BN affines (None = identity).

    Returns ``(y2, csum)`` with y2 (B, H, W, cout) in parts[0].dtype and
    csum (B, cout) f32 = y2.sum(axis=(1, 2)) — attention2's channel gate
    (and through it every consumer's) divides by H·W outside.
    """
    parts = list(parts)
    if up_part0:
        B, Hh, W, _ = parts[0].shape
        H = 2 * Hh
        assert all(p.shape[1] == H and p.shape[2] == W for p in parts[1:]), \
            [p.shape for p in parts]
    else:
        B, H, W, _ = parts[0].shape
    cin_list = [int(p.shape[-1]) for p in parts]
    C = sum(cin_list)
    cout = int(k1.shape[-1])
    assert k2.shape == (3, 3, cout, cout), k2.shape
    g1, groups1 = _tap_groups(cout)
    g2, groups2 = _tap_groups(cout)

    dtype = parts[0].dtype

    def _fits(th):
        """Scoped-VMEM working-set estimate for row-tile ``th`` (double-
        buffered IO blocks + carried scratch), calibrated against Mosaic's
        accounting (reported 16.14 M for x_2_3 at th=4/W=512 where this raw
        sum gives ~7.9 M → factor ≈2.05; we use 2.3 + a 15.2 M budget
        against the 16 M scoped limit). The first on-chip 1024² run OOM'd
        the stack by 0.9% at the widest node — shrink th instead of failing."""
        bpe = jnp.dtype(dtype).itemsize
        th2l = th // 2
        blk = sum((th2l if (p == 0 and up_part0) else th) * W * ci
                  for p, ci in enumerate(cin_list)) * bpe * 2
        blk += th * W * cout * bpe * 2                      # y2 out block
        scr = sum(((th2l if (p == 0 and up_part0) else th) + 1) * W * ci
                  for p, ci in enumerate(cin_list)) * bpe   # prevs
        scr += (2 * th + 1) * W * cout * bpe                # y1_prev + y1_cur
        scr += 2 * th * W * cout * 4                        # acc1 + acc2 f32
        wts = (len(groups1) * C + len(groups2) * cout) * g1 * cout * bpe
        return (blk + scr + wts) * 2.3 < 15.2e6

    th = min(tile_rows, H)
    step = 2 if up_part0 else 1
    if up_part0 and th % 2:  # keep th even; stepping by 2 preserves it
        th = max(2, th - 1)
    while th > step and (H % th != 0 or not _fits(th)):
        th -= step
    nchunks = H // th
    th2 = th // 2
    assert all(p.dtype == dtype for p in parts), (
        "mixed part dtypes feed single-dtype VMEM scratch: "
        f"{[str(p.dtype) for p in parts]}")
    wm1 = _build_wm(k1, groups1, g1, dtype)
    wm2 = _build_wm(k2, groups2, g2, dtype)

    def aff(s, bvec):
        s = jnp.ones((cout,), _F32) if s is None else s
        bvec = jnp.zeros((cout,), _F32) if bvec is None else bvec
        return s.reshape(1, cout).astype(_F32), bvec.reshape(1, cout).astype(_F32)

    s1, b1 = aff(scale1, bias1)
    s2, b2 = aff(scale2, bias2)

    kern = functools.partial(
        _kernel, th=th, cin_list=cin_list, cout=cout, groups1=groups1,
        groups2=groups2, relu=relu, gated=gated, nchunks=nchunks,
        out_dtype=dtype, up0=up_part0, th2=th2)

    def in_map(b, i):
        return (b, jnp.minimum(i, nchunks - 1), 0, 0)

    def out_map(b, i):
        return (b, jnp.clip(i - 2, 0, nchunks - 1), 0, 0)

    part_specs = [
        pl.BlockSpec((1, th2 if (p == 0 and up_part0) else th, W, ci),
                     in_map, memory_space=pltpu.VMEM)
        for p, ci in enumerate(cin_list)
    ]
    y2, csum = pl.pallas_call(
        kern,
        grid=(B, nchunks + 2),
        in_specs=[
            pl.BlockSpec((B, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # gate_c
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # sse_kernel
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # sse_bias
            pl.BlockSpec((len(groups1), C, g1 * cout),
                         lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),          # wm1
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # scale1
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # bias1
            pl.BlockSpec((len(groups2), cout, g2 * cout),
                         lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),          # wm2
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # scale2
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),          # bias2
        ] + part_specs,
        out_specs=[
            pl.BlockSpec((1, th, W, cout), out_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, cout), dtype),
            jax.ShapeDtypeStruct((B, cout), _F32),
        ],
        scratch_shapes=(
            [pltpu.VMEM(((th2 if (p == 0 and up_part0) else th) + 1, W, ci),
                        dtype)
             for p, ci in enumerate(cin_list)]                       # prevs
            + [pltpu.VMEM((th + 1, W, cout), dtype),                 # y1_prev
               pltpu.VMEM((th, W, cout), dtype),                     # y1_cur
               pltpu.VMEM((th, W, cout), _F32),                      # acc1
               pltpu.VMEM((th, W, cout), _F32),                      # acc2
               pltpu.VMEM((8, cout), _F32)]),                        # csum
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(gate_c.astype(_F32),
      sse_kernel.reshape(1, C).astype(_F32),
      sse_bias.reshape(1, 1).astype(_F32),
      wm1, s1, b1, wm2, s2, b2,
      *parts)
    return y2, csum
