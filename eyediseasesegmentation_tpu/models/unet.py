"""Plain encoder-decoder U-Nets (smp.Unet equivalents).

Covers the reference's smp-by-name path (train.py:168-170) and the
pytorch_toolbelt UNet factories (unets.py:181-270) with native flax encoders.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .decoders import UnetDecoder
from .encoders import get_encoder
from .modules.layers import ClassificationHead, SegmentationHead

Dtype = Any


class Unet(nn.Module):
    encoder_name: str = "resnet34"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_attention_type: Optional[str] = None
    classes: int = 1
    clf_head: bool = False
    drop_block_prob: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        features = encoder(x, train)
        y = UnetDecoder(
            encoder_channels=[f.shape[-1] for f in features],
            decoder_channels=self.decoder_channels,
            attention_type=self.decoder_attention_type,
            drop_block_prob=self.drop_block_prob,
            dtype=self.dtype,
            name="decoder",
        )(features, train)
        mask = SegmentationHead(self.classes, dtype=self.dtype,
                                name="segmentation_head")(y)
        if self.clf_head:
            clf = ClassificationHead(self.classes, dtype=self.dtype,
                                     name="classification_head")(features[-1], train)
            return mask, clf
        return mask
