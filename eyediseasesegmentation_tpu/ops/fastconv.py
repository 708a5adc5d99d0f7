"""Space-to-depth packed 3×3 convolution for tiny-channel, high-resolution maps.

TPU convs with C « 128 are bandwidth-trapped: Mosaic pads the channel (lane)
dimension to 128, so a 16-channel 1024² conv reads 8× the logical bytes
(measured ~4.7 TF/s / 65 GB/s on v5e). Packing 2×2 spatial blocks into channels
(space-to-depth) turns a (H, W, C) 3×3 conv into an equivalent (H/2, W/2, 4C)
3×3 conv with 4C output channels — same logical bytes in a 4×-wider lane
layout (measured ~3× faster for C ≤ 32).

The packed kernel is built from the logical (3,3,Cin,Cout) HWIO weights:
logical tap (dy,dx) connecting output sub-position (a,b) to input sub-position
((a+dy) mod 2, (b+dx) mod 2) lands in packed tap ((a+dy)//2+1, (b+dx)//2+1)
at input group (c*2+d), output group (a*2+b). Exactness: zero-padding one
packed block equals logical 1-pixel zero padding (the kernel only references
the sub-rows it needs).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C); channel order (c, d, C)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 4C) -> (N, 2H, 2W, C); inverse of :func:`space_to_depth`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def pack_kernel_3x3(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO -> (3, 3, 4Cin, 4Cout) packed kernel."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    packed = jnp.zeros((3, 3, 4 * cin, 4 * cout), kernel.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    di, c = divmod(a + dy, 2)
                    dj, d = divmod(b + dx, 2)
                    ig = c * 2 + d
                    og = a * 2 + b
                    packed = packed.at[
                        di + 1, dj + 1,
                        ig * cin:(ig + 1) * cin,
                        og * cout:(og + 1) * cout,
                    ].set(kernel[dy + 1, dx + 1])
    return packed


def conv3x3_s2d(x: jnp.ndarray, kernel: jnp.ndarray,
                compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """3×3 SAME stride-1 conv via space-to-depth packing.

    x: (N, H, W, Cin) with even H, W; kernel: (3, 3, Cin, Cout) HWIO.
    Bit-equivalent (up to dot-product order) to lax conv with SAME padding.
    """
    packed = pack_kernel_3x3(kernel).astype(compute_dtype)
    xp = space_to_depth(x.astype(compute_dtype))
    y = jax.lax.conv_general_dilated(
        xp, packed, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(y)


def should_pack(h: int, w: int, cin: int, cout: int,
                min_size: int = 512, max_channels: int = 32) -> bool:
    """Heuristic from v5e measurements: packing wins when both channel counts
    are tiny and the map is large; for C >= 64 the 4x FLOP cost loses."""
    return (cin <= max_channels and cout <= max_channels
            and h >= min_size and w >= min_size and h % 2 == 0 and w % 2 == 0)
