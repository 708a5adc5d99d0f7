"""UNet 3+ with full-scale skip connections.

Parity with reference ``unet3plus.py`` (UNet_3Plus / UNet_3Plus_DeepSup,
l.553-556): every decoder level aggregates ALL encoder scales (downsampled) and
all deeper decoder levels (upsampled), each mapped to ``cat_channels`` and fused.
Deep supervision returns (d1, [d2..d5]).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules.layers import ConvBNReLU, DoubleConv, SegmentationHead, maxpool2x

Dtype = Any


def _resize_to(x, target_hw):
    n, h, w, c = x.shape
    if (h, w) == tuple(target_hw):
        return x
    return jax.image.resize(x, (n, target_hw[0], target_hw[1], c), "bilinear")


class UNet3Plus(nn.Module):
    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    cat_channels: int = 64
    classes: int = 1
    deep_supervision: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # encoder
        encs = []
        y = x
        for i, ch in enumerate(self.filters):
            if i > 0:
                y = maxpool2x(y)
            y = DoubleConv(ch, dtype=self.dtype, name=f"enc{i}")(y, train)
            encs.append(y)

        n_levels = len(self.filters)
        fuse_ch = self.cat_channels * n_levels
        # decoder: d[level] for level n_levels-2 .. 0 ; d[n_levels-1] = encs[-1]
        decs = {n_levels - 1: encs[-1]}
        for level in range(n_levels - 2, -1, -1):
            target_hw = encs[level].shape[1:3]
            parts = []
            # encoder features at this and shallower levels (maxpool down,
            # matching the reference's scale-k maxpools)
            for src in range(level + 1):
                f = encs[src]
                if src < level:
                    k = 2 ** (level - src)
                    f = nn.max_pool(f, (k, k), strides=(k, k))
                parts.append(ConvBNReLU(self.cat_channels, 3, drop_block_prob=0.0,
                                        dtype=self.dtype,
                                        name=f"d{level}_e{src}")(f, train))
            # deeper decoder features (bilinear up)
            for src in range(level + 1, n_levels):
                f = _resize_to(decs[src], target_hw)
                parts.append(ConvBNReLU(self.cat_channels, 3, drop_block_prob=0.0,
                                        dtype=self.dtype,
                                        name=f"d{level}_d{src}")(f, train))
            y = jnp.concatenate(parts, axis=-1)
            decs[level] = ConvBNReLU(fuse_ch, 3, drop_block_prob=0.0,
                                     dtype=self.dtype, name=f"d{level}_fuse")(y, train)

        d1 = SegmentationHead(self.classes, dtype=self.dtype,
                              name="head0")(decs[0])
        if self.deep_supervision:
            outs = []
            in_hw = x.shape[1:3]
            for level in range(1, n_levels):
                h = SegmentationHead(self.classes, dtype=self.dtype,
                                     name=f"head{level}")(decs[level])
                outs.append(_resize_to(h, in_hw))
            return d1, outs
        return d1
