"""Attention U-Net over pyramid encoders.

Parity with reference ``attentionunet.py``: encoder backbone + decoder whose skip
connections pass through additive attention gates; optional deep supervision
returns (final, [side outputs]) (reference l.186-208).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoders import get_encoder
from .modules.layers import (AttentionGate, ConvBNReLU, SegmentationHead,
                             upsample2x)

Dtype = Any


class AttentionUnet(nn.Module):
    encoder_name: str = "resnet50"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    classes: int = 1
    deep_supervision: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        features = encoder(x, train)
        feats = features[1:][::-1]  # head first: c4, c3, c2, c1, c0
        y = feats[0]
        skips = feats[1:]
        preds = []
        for i, out_ch in enumerate(self.decoder_channels):
            y_up = upsample2x(y)
            if i < len(skips):
                skip = skips[i]
                gated = AttentionGate(max(out_ch // 2, 8), dtype=self.dtype,
                                      name=f"gate{i}")(y_up, skip, train)
                y_up = jnp.concatenate([y_up, gated], axis=-1)
            y = ConvBNReLU(out_ch, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"dec{i}_conv1")(y_up, train)
            y = ConvBNReLU(out_ch, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"dec{i}_conv2")(y, train)
            preds.append(y)
        final = SegmentationHead(self.classes, dtype=self.dtype,
                                 name="segmentation_head")(preds[-1])
        if self.deep_supervision:
            side = [
                SegmentationHead(self.classes, dtype=self.dtype,
                                 name=f"side_head{i}")(p)
                for i, p in enumerate(preds[1:-1])
            ]
            return final, side
        return final
