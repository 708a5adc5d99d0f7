"""DeepLabV3+ segmentation.

Parity with reference ``deeplab.py`` (resnet34_deeplab128 etc.) and
``deep_supdeeplabv3plus.py`` ('deeplabv3plus_deepsup'): encoder + ASPP on the
deepest feature, /4 low-level projection, fused decoder, optional deep
supervision on the ASPP branch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoders import get_encoder
from .modules.layers import ASPP, ConvBNReLU, SegmentationHead

Dtype = Any


class DeepLabV3Plus(nn.Module):
    encoder_name: str = "resnet50"
    aspp_channels: int = 256
    decoder_channels: int = 128
    classes: int = 1
    deep_supervision: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        features = encoder(x, train)
        low = features[2]   # /4
        high = features[5]  # /32
        a = ASPP(self.aspp_channels, dtype=self.dtype, name="aspp")(high, train)
        n, h, w, c = a.shape
        a_up = jax.image.resize(a, (n, h * 8, w * 8, c), "bilinear")  # -> /4
        lo = ConvBNReLU(48, 1, drop_block_prob=0.0, dtype=self.dtype,
                        name="low_proj")(low, train)
        y = jnp.concatenate([a_up, lo], axis=-1)
        y = ConvBNReLU(self.decoder_channels, 3, drop_block_prob=0.0,
                       dtype=self.dtype, name="fuse1")(y, train)
        y = ConvBNReLU(self.decoder_channels, 3, drop_block_prob=0.0,
                       dtype=self.dtype, name="fuse2")(y, train)
        mask = SegmentationHead(self.classes, upsampling=4, dtype=self.dtype,
                                name="segmentation_head")(y)
        if self.deep_supervision:
            aux = SegmentationHead(self.classes, upsampling=32, dtype=self.dtype,
                                   name="aux_head")(a)
            return mask, [aux]
        return mask
