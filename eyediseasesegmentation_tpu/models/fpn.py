"""FPN segmentation (concatenation merge).

Parity with reference ``fpn.py`` FPNCatSegmentationModel (factories
resnet34_fpncat128 / seresnext50_fpncat128 / resnet152_fpncat256, l.132-171):
lateral 1×1 convs + top-down pathway, per-level segmentation blocks upsampled to
/4 and concatenated, final head upsampled to input resolution.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoders import get_encoder
from .modules.layers import ConvBNReLU, SegmentationHead, upsample2x

Dtype = Any


class FPN(nn.Module):
    encoder_name: str = "resnet34"
    fpn_channels: int = 128
    seg_channels: int = 64
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        features = encoder(x, train)
        c1, c2, c3, c4 = features[2], features[3], features[4], features[5]
        # lateral + top-down
        p4 = nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="lat4")(c4)
        p3 = nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="lat3")(c3) + upsample2x(p4)
        p2 = nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="lat2")(c2) + upsample2x(p3)
        p1 = nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="lat1")(c1) + upsample2x(p2)
        # per-level segmentation blocks, upsampled to the /4 level and concat
        outs = []
        for i, (p, factor) in enumerate(((p1, 1), (p2, 2), (p3, 4), (p4, 8))):
            s = ConvBNReLU(self.seg_channels, 3, drop_block_prob=0.0,
                           dtype=self.dtype, name=f"seg{i}")(p, train)
            if factor > 1:
                n, h, w, c = s.shape
                s = jax.image.resize(s, (n, h * factor, w * factor, c), "bilinear")
            outs.append(s)
        y = jnp.concatenate(outs, axis=-1)
        y = ConvBNReLU(self.seg_channels * 2, 3, drop_block_prob=0.0,
                       dtype=self.dtype, name="fuse")(y, train)
        return SegmentationHead(self.classes, upsampling=4, dtype=self.dtype,
                                name="segmentation_head")(y)
