"""Classic from-scratch U-Net variants.

Parity with reference ``LeeJunHyun_impl.py`` (U_Net / AttU_Net / R2U_Net /
R2AttU_Net, l.139-446), ``rcnn_unet.py`` (R2U_Net) and ``sa_unet.py``
(spatial-attention U-Net with DropBlock, l.46-123).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules.layers import (AttentionGate, BatchNorm, CBAMSpatial, ConvBNReLU,
                             DoubleConv, DropBlock2d, SegmentationHead,
                             maxpool2x, upsample2x)

Dtype = Any


class RecurrentConv(nn.Module):
    """Recurrent conv block: y_{t+1} = conv(x + y_t) (reference rrcnn.py:8-24)."""

    features: int
    t: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")
        bn = BatchNorm(dtype=self.dtype, name="bn")
        y = nn.relu(bn(conv(x), train))
        for _ in range(self.t):
            y = nn.relu(bn(conv(x + y), train))
        return y


class RRCNNBlock(nn.Module):
    """Residual recurrent block (reference rrcnn.py:26-46)."""

    features: int
    t: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(x)
        y = RecurrentConv(self.features, self.t, dtype=self.dtype, name="rc1")(x1, train)
        y = RecurrentConv(self.features, self.t, dtype=self.dtype, name="rc2")(y, train)
        return x1 + y


class _UNetBase(nn.Module):
    """Shared encoder-decoder scaffold for the classic variants."""

    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    classes: int = 1
    block: str = "double"   # 'double' | 'rrcnn'
    use_attention_gate: bool = False
    drop_block_prob: float = 0.0
    dtype: Dtype = jnp.float32

    def _block(self, ch, name):
        if self.block == "rrcnn":
            return RRCNNBlock(ch, dtype=self.dtype, name=name)
        return DoubleConv(ch, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        y = x
        for i, ch in enumerate(self.filters):
            y = self._block(ch, f"enc{i}")(y, train)
            if self.drop_block_prob > 0:
                y = DropBlock2d(self.drop_block_prob, name=f"enc{i}_db")(y, train)
            if i < len(self.filters) - 1:
                skips.append(y)
                y = maxpool2x(y)
        if self.drop_block_prob > 0:
            # SA-UNet: spatial attention at the bottleneck (sa_unet.py:46-123)
            y = CBAMSpatial(dtype=self.dtype, name="bottleneck_sa")(y)
        for i, ch in enumerate(reversed(self.filters[:-1])):
            y = upsample2x(y)
            y = ConvBNReLU(ch, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"up{i}_conv")(y, train)
            skip = skips[-(i + 1)]
            if self.use_attention_gate:
                skip = AttentionGate(max(ch // 2, 8), dtype=self.dtype,
                                     name=f"gate{i}")(y, skip, train)
            y = jnp.concatenate([y, skip], axis=-1)
            y = self._block(ch, f"dec{i}")(y, train)
        return SegmentationHead(self.classes, kernel_size=1, dtype=self.dtype,
                                name="segmentation_head")(y)


class ClassicUNet(_UNetBase):
    pass


class AttUNet(_UNetBase):
    use_attention_gate: bool = True


class R2UNet(_UNetBase):
    block: str = "rrcnn"


class R2AttUNet(_UNetBase):
    block: str = "rrcnn"
    use_attention_gate: bool = True


class SAUnet(_UNetBase):
    filters: Sequence[int] = (16, 32, 64, 128)
    drop_block_prob: float = 0.1
