"""Space-to-depth packed conv rewrites for the high-res decoder tail.

The UNet++ tail (nodes at 512²/1024² with 16-64 output channels) runs at
3-25 TF/s under plain XLA on TPU v5e: output channels < 128 waste MXU lanes
and every elementwise pass over a lane-padded map costs 8× its logical bytes
(PERFORMANCE.md roofline). These transforms re-express the same math with
≥128-channel operands:

* ``conv3x3_s2d_out``  —  3×3 SAME conv emitted directly in space-to-depth
  packed layout: one stride-2 4×4 conv whose kernel holds the four output
  phases' 3×3 taps. Exactly ``space_to_depth(conv3x3_same(x, k))``.
* ``phase_upconv_s2d`` —  the fusion conv3×3(bilinear_up2(x)) computed at
  INPUT resolution as one 3×3 conv to 4·cout channels (each output phase of
  the ×2-upsampled conv is a 3-tap filter of x per dim), plus exact border
  strips for the bilinear edge clamp / zero-pad interaction. Exactly
  ``space_to_depth(conv3x3_same(upsample2x(x), k))`` and ~4× faster than
  materializing the upsample (measured 16.1 → 4.1 ms at the flagship's
  x_1_3 shape).
* packed param/gate helpers for running BN / scSE on packed tensors with the
  logical (unpacked) parameters.

Packed layout convention (matches ``ops.fastconv.space_to_depth``): packed
channel index = (a·2 + b)·C + c for intra-block offset (a, b) — i.e. the
logical channel axis is tiled four times, phase-major.

Reference parity: these rewrite the decode blocks of
reference ``src/main/archs/unetplusplusstar.py:71-161`` bit-for-bit (up to
float reassociation); exactness is pinned by tests/test_packed_tail.py.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .fastconv import depth_to_space, space_to_depth  # noqa: F401 (re-export)

# Per-dim composition matrices: row s∈{-1,0,1} (tap on x), col p∈{0,1,2}
# (logical 3-tap kernel index), for output phase a of conv3x3(bilinear_up2):
#   y[2i+a] = Σ_s Σ_p A_a[s,p]·W[p]·x[i+s]   (interior rows)
_A0 = np.array([[0.75, 0.25, 0.0],
                [0.25, 0.75, 0.75],
                [0.0, 0.0, 0.25]], np.float32)
_A1 = np.array([[0.25, 0.0, 0.0],
                [0.75, 0.75, 0.25],
                [0.0, 0.25, 0.75]], np.float32)


def make_stride2_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,cout) HWIO → (4,4,cin,4·cout) stride-2 kernel.

    out[I,J,(a·2+b)·cout+co] of the stride-2 conv (padding (1,2)) equals
    conv3x3_same(x)[2I+a, 2J+b, co]: tap (r,c) = (a+dy+1, b+dx+1)."""
    cin, cout = k3.shape[2], k3.shape[3]
    k4 = jnp.zeros((4, 4, cin, 4 * cout), k3.dtype)
    for a in (0, 1):
        for b in (0, 1):
            g = a * 2 + b
            k4 = k4.at[a:a + 3, b:b + 3, :, g * cout:(g + 1) * cout].set(k3)
    return k4


def conv3x3_s2d_out(parts, k3: jnp.ndarray, dtype=jnp.bfloat16,
                    scales=None) -> jnp.ndarray:
    """3×3 SAME conv over the (virtual) concat of ``parts``, output packed.

    parts: list of (N,H,W,Ci) with even H,W; k3: (3,3,ΣCi,cout).
    ``scales``: optional per-part elementwise multipliers (broadcastable to
    the part) applied on the fly — XLA fuses them into the conv input, so a
    gated conv costs the same as a plain one (measured 11.1 vs 10.9 ms at
    the x_1_3 shape). Returns (N,H/2,W/2,4·cout) ==
    space_to_depth(conv3x3_same(cat(scaled parts), k3))."""
    parts = list(parts) if isinstance(parts, (list, tuple)) else [parts]
    y = None
    off = 0
    for i, p in enumerate(parts):
        c = p.shape[-1]
        if scales is not None and scales[i] is not None:
            p = p * scales[i].astype(p.dtype)
        k4 = make_stride2_kernel(k3[:, :, off:off + c]).astype(dtype)
        yp = jax.lax.conv_general_dilated(
            p.astype(dtype), k4, window_strides=(2, 2),
            padding=((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = yp if y is None else y + yp
        off += c
    return y


def make_h2_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,cout) HWIO → (4,3,cin,2·cout) stride-(2,1) kernel.

    out[I,j,a·cout+co] of the stride-(2,1) conv (padding rows (1,2), cols
    (1,1)) equals conv3x3_same(x)[2I+a, j, co]: row tap r = a+dy."""
    cin, cout = k3.shape[2], k3.shape[3]
    k4 = jnp.zeros((4, 3, cin, 2 * cout), k3.dtype)
    for a in (0, 1):
        k4 = k4.at[a:a + 3, :, :, a * cout:(a + 1) * cout].set(k3)
    return k4


def conv3x3_h2_out(parts, k3: jnp.ndarray, dtype=jnp.bfloat16,
                   scales=None) -> jnp.ndarray:
    """3×3 SAME conv over the (virtual) concat of ``parts``, output packed
    along H only (factor 2, phase-major: channel a·cout+co = logical row
    2I+a). 4/3 logical FLOPs for 2·cout lanes — the measured sweet spot for
    the cout=64 tail (tools/bench_wpack.py: beats the 16/9 full-s2d form by
    ~15-20%). Returns (N,H/2,W,2·cout)."""
    parts = list(parts) if isinstance(parts, (list, tuple)) else [parts]
    y = None
    off = 0
    for i, p in enumerate(parts):
        c = p.shape[-1]
        if scales is not None and scales[i] is not None:
            p = p * scales[i].astype(p.dtype)
        k4 = make_h2_kernel(k3[:, :, off:off + c]).astype(dtype)
        yp = jax.lax.conv_general_dilated(
            p.astype(dtype), k4, window_strides=(2, 1),
            padding=((1, 2), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = yp if y is None else y + yp
        off += c
    return y


def make_h2_packed_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,cout) → (3,3,2·cin,2·cout) for conv on H2-packed data: input
    channel p·cin+c is logical row 2I+p; output phase a taps logical row
    2I+a+dy-1 = packed row I+((a+dy-1)>>1), phase (a+dy-1)&1. 2× logical
    FLOPs (vs 4× for the full-s2d packed conv)."""
    cin, cout = k3.shape[2], k3.shape[3]
    kp = jnp.zeros((3, 3, 2 * cin, 2 * cout), k3.dtype)
    for a in (0, 1):
        for dy in range(3):
            o = a + dy - 1
            pr, ph = (o >> 1) + 1, o & 1
            kp = kp.at[pr, :, ph * cin:(ph + 1) * cin,
                       a * cout:(a + 1) * cout].set(k3[dy])
    return kp


def conv3x3_h2(parts, k3: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """3×3 SAME conv with H2-packed input(s) and H2-packed output.

    parts: (N,H/2,W,2·Ci) H2-packed; k3: (3,3,ΣCi,cout) logical."""
    parts = list(parts) if isinstance(parts, (list, tuple)) else [parts]
    y = None
    off = 0
    for p in parts:
        c = p.shape[-1] // 2
        kp = make_h2_packed_kernel(k3[:, :, off:off + c]).astype(dtype)
        yp = jax.lax.conv_general_dilated(
            p.astype(dtype), kp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = yp if y is None else y + yp
        off += c
    return y


def unpack_h2(y: jnp.ndarray) -> jnp.ndarray:
    """(N,H/2,W,2·C) H2-packed (phase-major) → (N,H,W,C) logical."""
    n, hp, w, c2 = y.shape
    c = c2 // 2
    return (y.reshape(n, hp, w, 2, c).transpose(0, 1, 3, 2, 4)
            .reshape(n, 2 * hp, w, c))


def pack_h2(x: jnp.ndarray) -> jnp.ndarray:
    """(N,H,W,C) → (N,H/2,W,2·C) H2-packed (phase-major)."""
    n, h, w, c = x.shape
    return (x.reshape(n, h // 2, 2, w, c).transpose(0, 1, 3, 2, 4)
            .reshape(n, h // 2, w, 2 * c))


def make_phase_up_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,cout) → (3,3,cin,4·cout) phase kernel K_ph with
    conv3x3_same(K_ph)(x)[i,j,(a·2+b)·cout+co] ==
    conv3x3_same(k3)(bilinear_up2(x))[2i+a, 2j+b, co] at interior pixels."""
    a_mats = (jnp.asarray(_A0), jnp.asarray(_A1))
    cout = k3.shape[3]
    blocks = []
    for a in (0, 1):
        for b in (0, 1):
            blocks.append(jnp.einsum("sp,tq,pqio->stio",
                                     a_mats[a], a_mats[b],
                                     k3.astype(jnp.float32)))
    return jnp.concatenate(blocks, axis=-1).astype(k3.dtype)


def _up2_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear ×2 along axis 1 (edge clamp, half-pixel centers)."""
    from ..models.modules.layers import _up2_matrix
    U = jnp.asarray(_up2_matrix(x.shape[1]), jnp.float32)
    return jnp.einsum("Hh,nhwc->nHwc", U, x.astype(jnp.float32))


def _up2_cols(x: jnp.ndarray) -> jnp.ndarray:
    return _up2_rows(x.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)


def _conv3x3(x, k, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def phase_upconv_s2d(x: jnp.ndarray, k3: jnp.ndarray,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """space_to_depth(conv3x3_same(bilinear_up2(x), k3)), computed at input
    resolution: interior via the phase kernel, borders (where the bilinear
    edge clamp and the conv zero-pad interact) via exact 2-pixel strips.

    x: (N,H,W,cin); returns (N,H,W,4·cout)."""
    n, h, w, cin = x.shape
    cout = k3.shape[3]
    kph = make_phase_up_kernel(k3).astype(dtype)
    y = _conv3x3(x, kph, dtype)  # (n,h,w,4cout), interior-exact

    k3d = k3.astype(dtype)

    # --- top/bottom: logical output rows {0,1} and {2h-2, 2h-1} ---
    # need up rows -1..2 (zero at -1) and 2h-3..2h (zero at 2h)
    u_top = _up2_cols(_up2_rows(x[:, :3])[:, :3])   # up rows 0..2, full width
    u_top = jnp.pad(u_top, ((0, 0), (1, 0), (0, 0), (0, 0)))
    # width: SAME zero-pad; rows: VALID over the 4-row slab → 2 rows out
    y_top = jax.lax.conv_general_dilated(
        u_top.astype(dtype), k3d, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    u_bot = _up2_cols(_up2_rows(x[:, -3:])[:, -3:])
    u_bot = jnp.pad(u_bot, ((0, 0), (0, 1), (0, 0), (0, 0)))
    y_bot = jax.lax.conv_general_dilated(
        u_bot.astype(dtype), k3d, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.at[:, :1].set(space_to_depth(y_top))
    y = y.at[:, -1:].set(space_to_depth(y_bot))

    # --- left/right: logical cols {0,1}, {2w-2, 2w-1}, full height (corners
    # included, so column strips must come after row strips) ---
    xl = x[:, :, :3].transpose(0, 2, 1, 3)
    u_l = _up2_rows(_up2_rows(xl)[:, :3].transpose(0, 2, 1, 3))  # (n,2h,3,cin)
    u_l = jnp.pad(u_l.astype(dtype), ((0, 0), (0, 0), (1, 0), (0, 0)))
    y_l = jax.lax.conv_general_dilated(
        u_l, k3d, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xr = x[:, :, -3:].transpose(0, 2, 1, 3)
    u_r = _up2_rows(_up2_rows(xr)[:, -3:].transpose(0, 2, 1, 3))
    u_r = jnp.pad(u_r.astype(dtype), ((0, 0), (0, 0), (0, 1), (0, 0)))
    y_r = jax.lax.conv_general_dilated(
        u_r, k3d, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.at[:, :, :1].set(space_to_depth(y_l))
    y = y.at[:, :, -1:].set(space_to_depth(y_r))
    return y


def phase_upconv_s2d_packed(xp: jnp.ndarray, k3: jnp.ndarray,
                            dtype=jnp.bfloat16) -> jnp.ndarray:
    """``phase_upconv_s2d`` with a PACKED input, double-packed output.

    xp: (N, h/2, w/2, 4·cin) = space_to_depth(x) for logical x (N, h, w, cin).
    Returns (N, h/2, w/2, 16·cout) == s2d(phase_upconv_s2d(x, k3)) ==
    s2d(s2d(conv3x3_same(bilinear_up2(x), k3))).

    Keeps the x_0_3 → x_0_4 → head chain in ≥128-lane layouts: the logical
    (h, w, cin) and (2h, 2w, cout) maps (32/16 channels at 512²/1024² in the
    flagship — 4-8× lane-padding waste) are never materialized.

    Channel layout of the output: (A·2+B)·4·cout + (a·2+b)·cout + c, where
    (A, B) is the outer (h-grid) phase and (a, b) the inner (2h-grid) phase.
    """
    from .fastconv import pack_kernel_3x3

    n, hp, wp, cin4 = xp.shape
    cin, cout = cin4 // 4, k3.shape[3]
    co4 = 4 * cout

    # interior: pack the phase kernel once more; packed zero padding of one
    # h-grid ring == what the unpacked interior conv saw, so interior values
    # match phase_upconv_s2d's pre-strip output exactly
    kph = make_phase_up_kernel(k3)                      # (3,3,cin,4·cout)
    kpp = pack_kernel_3x3(kph).astype(dtype)            # (3,3,4·cin,16·cout)
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), kpp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # border strips need the logical edge rows/cols of x — d2s'd thin slices
    x_top = depth_to_space(xp[:, :2])[:, :3]            # logical rows 0..2
    x_bot = depth_to_space(xp[:, -2:])[:, -3:]
    x_l = depth_to_space(xp[:, :, :2])[:, :, :3]
    x_r = depth_to_space(xp[:, :, -2:])[:, :, -3:]
    k3d = k3.astype(dtype)

    # top/bottom: logical 2h-rows {0,1} / {2h-2,2h-1} = h-row 0 / h-1 with
    # outer phase A=0 / A=1 → channel halves [0:8co] / [8co:16co] of the
    # first / last packed row
    u_top = _up2_cols(_up2_rows(x_top)[:, :3])
    u_top = jnp.pad(u_top, ((0, 0), (1, 0), (0, 0), (0, 0)))
    y_top = jax.lax.conv_general_dilated(
        u_top.astype(dtype), k3d, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))     # (n,2,w,cout)
    s_top = space_to_depth(y_top)                        # (n,1,w/2·... )
    # s2d over (2, w): (n,1,w/2,4co) with channels (a,b,c); fold col parity B:
    s_top = s_top.reshape(n, 1, wp, 2, co4).reshape(n, 1, wp, 2 * co4)
    u_bot = _up2_cols(_up2_rows(x_bot)[:, -3:])
    u_bot = jnp.pad(u_bot, ((0, 0), (0, 1), (0, 0), (0, 0)))
    y_bot = jax.lax.conv_general_dilated(
        u_bot.astype(dtype), k3d, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s_bot = space_to_depth(y_bot).reshape(n, 1, wp, 2 * co4)
    y = y.at[:, :1, :, : 2 * co4].set(s_top)
    y = y.at[:, -1:, :, 2 * co4:].set(s_bot)

    # left/right: full height incl. corners (must come after row strips);
    # logical 2w-cols {0,1} / {2w-2,2w-1} = w-col 0 / w-1 with outer B=0/1 →
    # channels (A·2+B)·4co for A ∈ {0,1}
    def col_strip(x_side, take_last):
        xs = x_side.transpose(0, 2, 1, 3)               # (n,3,h,cin)
        u = _up2_rows(xs)                                # rows = cols upsampled
        u = u[:, -3:] if take_last else u[:, :3]
        u = _up2_rows(u.transpose(0, 2, 1, 3))           # (n,2h,3,cin)
        pad_cfg = ((0, 0), (0, 0), (0, 1), (0, 0)) if take_last else \
            ((0, 0), (0, 0), (1, 0), (0, 0))
        u = jnp.pad(u.astype(dtype), pad_cfg)
        ys = jax.lax.conv_general_dilated(
            u, k3d, (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (n,2h,2,cout)
        s = space_to_depth(ys)                           # (n,h,1,4co) (a,b,c)
        # fold row parity A: (n, h/2, A, 1, 4co)
        return s.reshape(n, hp, 2, 1, co4)
    s_l = col_strip(x_l, False)
    s_r = col_strip(x_r, True)
    y = y.at[:, :, :1, 0:co4].set(s_l[:, :, 0])                  # A=0,B=0
    y = y.at[:, :, :1, 2 * co4:3 * co4].set(s_l[:, :, 1])        # A=1,B=0
    y = y.at[:, :, -1:, co4:2 * co4].set(s_r[:, :, 0])           # A=0,B=1
    y = y.at[:, :, -1:, 3 * co4:].set(s_r[:, :, 1])              # A=1,B=1
    return y


def stem7_s2d(x: jnp.ndarray, k7: jnp.ndarray,
              dtype=jnp.bfloat16) -> jnp.ndarray:
    """Stride-2 7×7 SAME conv (ResNet stem) via space-to-depth input packing.

    The plain stem (3→64 @1024²) runs ~10 ms on v5e: Cin=3 wastes the MXU
    K axis and the 64-lane output map is elementwise-padded. Packing turns it
    into a stride-1 4×4 conv over (H/2, W/2, 12) — the stride-2 output grid
    IS the packed grid: logical tap t (of 7, offset t-3) at output phase a
    satisfies 2·di + a + 3 = t for packed row offset di ∈ {-2..1}.
    Exact: packed zero padding (2,1) reproduces the logical 3-pixel zero pad.

    x: (N,H,W,cin) with even H,W; k7: (7,7,cin,cout) HWIO.
    Returns (N,H/2,W/2,cout) == lax.conv(x, k7, stride 2, pad 3).
    """
    cin, cout = k7.shape[2], k7.shape[3]
    xp = space_to_depth(x)  # channel order (a,b,cin)
    k4 = jnp.zeros((4, 4, 4 * cin, cout), k7.dtype)
    for a in (0, 1):
        for b in (0, 1):
            g = (a * 2 + b) * cin
            for di in range(-2, 2):
                t = 2 * di + a + 3
                if not 0 <= t <= 6:
                    continue
                for dj in range(-2, 2):
                    u = 2 * dj + b + 3
                    if not 0 <= u <= 6:
                        continue
                    k4 = k4.at[di + 2, dj + 2, g:g + cin, :].set(k7[t, u])
    return jax.lax.conv_general_dilated(
        xp.astype(dtype), k4.astype(dtype), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stem7_s2d2(x: jnp.ndarray, k7: jnp.ndarray,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """Stride-2 7×7 stem conv with DOUBLE space-to-depth input packing and
    f4-packed output. The conv alone wins on v5e (1.21 vs 3.45 ms at
    8×1024²: the MXU K axis sees 48 input channels and the output fills
    4·cout lanes) but the full stem chain (conv + packed BN/ReLU + d2s)
    measured 7.0-8.5 ms vs 6.2 ms for the single-s2d form — NOT wired into
    the encoders; kept as the measured record for future stem work.

    x: (N,H,W,cin), H,W divisible by 4; k7: (7,7,cin,cout).
    Returns (N,H/4,W/4,4·cout) == space_to_depth(stem conv output): a 3×3
    stride-1 conv over the twice-packed (H/4,W/4,16·cin) grid. Derivation:
    logical output row p = 2P+a taps logical input rows 4P+2a+t-3 for
    t ∈ 0..6; writing 2a+t-3 = 4·dP+α with α ∈ 0..3 gives dP ∈ {-1,0,1}.
    The packed one-block zero pad covers the logical 3-pixel pad exactly
    (the unreachable 4th pad pixel has a zero kernel slot).
    """
    cin, cout = k7.shape[2], k7.shape[3]
    xp = space_to_depth(space_to_depth(x))  # ch ((a2,b2),(a1,b1),c)
    k = jnp.zeros((3, 3, 16 * cin, 4 * cout), k7.dtype)
    for a in (0, 1):
        for b in (0, 1):
            g = (a * 2 + b) * cout
            for dP in (-1, 0, 1):
                for alpha in range(4):
                    t = 4 * dP + alpha + 3 - 2 * a
                    if not 0 <= t <= 6:
                        continue
                    for dQ in (-1, 0, 1):
                        for beta in range(4):
                            u = 4 * dQ + beta + 3 - 2 * b
                            if not 0 <= u <= 6:
                                continue
                            ci = (((alpha >> 1) * 2 + (beta >> 1)) * 4
                                  + (alpha & 1) * 2 + (beta & 1)) * cin
                            k = k.at[dP + 1, dQ + 1, ci:ci + cin,
                                     g:g + cout].set(k7[t, u])
    return jax.lax.conv_general_dilated(
        xp.astype(dtype), k.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# Packed-tensor helpers (logical params on packed data)
# ---------------------------------------------------------------------------

def tile_channels(v: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """Per-logical-channel vector → packed channels ((a,b,C) phase-major)."""
    return jnp.tile(v, factor)


def packed_spatial_mean(xp: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """(N,H,W,factor·C) packed → (N,1,1,C) logical spatial mean (exact:
    each phase group holds an equal share of the logical pixels)."""
    n = xp.shape[0]
    c = xp.shape[-1] // factor
    m = jnp.mean(xp.astype(jnp.float32), axis=(1, 2))  # (N, factor*C)
    return m.reshape(n, factor, c).mean(axis=1).reshape(n, 1, 1, c)


def packed_spatial_gate(xp: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """1×1 conv (C→1) of the LOGICAL map, evaluated on packed data:
    returns the per-phase gate (N,H,W,factor). kernel: (1,1,C,1)."""
    n, h, w, cf = xp.shape
    c = cf // factor
    k = kernel.reshape(c).astype(xp.dtype)
    t = jnp.einsum("nhwgc,c->nhwg", xp.reshape(n, h, w, factor, c), k)
    return t + bias.astype(t.dtype)


def mul_per_phase(xp: jnp.ndarray, gate: jnp.ndarray,
                  factor: int = 4) -> jnp.ndarray:
    """Multiply packed (N,H,W,factor·C) by a per-phase gate (N,H,W,factor)."""
    n, h, w, cf = xp.shape
    c = cf // factor
    y = xp.reshape(n, h, w, factor, c) * gate[..., None].astype(xp.dtype)
    return y.reshape(n, h, w, cf)
