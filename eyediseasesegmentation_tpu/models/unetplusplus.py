"""UNet++ with optional deep supervision (smp-style).

Parity with reference ``deep_supunetplusplus.py`` (registry 'unetplusplus_deepsup'):
any registered encoder + the nested dense decoder; deep supervision returns
(x_0_4 head, [x_3_3, x_2_3, x_1_3] heads) (reference l.136-139, 258-270).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .decoders import UnetPlusPlusDecoder
from .encoders import get_encoder
from .modules.layers import ClassificationHead, SegmentationHead

Dtype = Any


class UnetPlusPlus(nn.Module):
    encoder_name: str = "resnet34"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_attention_type: Optional[str] = None
    classes: int = 1
    deep_supervision: bool = False
    clf_head: bool = False
    drop_block_prob: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, enc_channels = get_encoder(self.encoder_name, dtype=self.dtype)
        features = encoder(x, train)
        out = UnetPlusPlusDecoder(
            encoder_channels=enc_channels,
            decoder_channels=self.decoder_channels,
            attention_type=self.decoder_attention_type,
            deep_supervision=self.deep_supervision,
            star=False,
            drop_block_prob=self.drop_block_prob,
            dtype=self.dtype,
            name="decoder",
        )(features, train)
        head = SegmentationHead(self.classes, dtype=self.dtype,
                                name="segmentation_head")
        clf = None
        if self.clf_head:
            clf = ClassificationHead(self.classes, dtype=self.dtype,
                                     name="classification_head")(features[-1], train)
        if self.deep_supervision:
            final, deeps = out
            mask = head(final)
            ds = [SegmentationHead(self.classes, dtype=self.dtype,
                                   name=f"deep_head{i}")(f) for i, f in enumerate(deeps)]
            return (mask, ds, clf) if self.clf_head else (mask, ds)
        mask = head(out)
        return (mask, clf) if self.clf_head else mask
