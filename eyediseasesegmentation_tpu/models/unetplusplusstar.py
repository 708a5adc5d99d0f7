"""UnetPlusPlusStar — the proposed architecture (flagship).

BoT/axial SE-ResNet50 encoder + UNet++ dense decoder with cross-axial-attention
skip gates + segmentation / deep-supervision / classification heads.
Behavioral parity with reference ``src/main/archs/unetplusplusstar.py:400-517``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .decoders import UnetPlusPlusDecoder
from .encoders import get_encoder
from .modules.layers import ClassificationHead, SegmentationHead

Dtype = Any


class UnetPlusPlusStar(nn.Module):
    """Returns logits; with deep supervision (mask, [ds3, ds2, ds1]); with
    clf_head additionally the classification logits (reference forward
    l.465-488)."""

    encoder_name: str = "BoTSER50_Axial_Imagenet_3"
    encoder_depth: int = 5
    decoder_use_batchnorm: bool = True
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_attention_type: Optional[str] = None
    base_dim: int = 32
    classes: int = 1
    deep_supervision: bool = False
    drop_block_prob: float = 0.1
    clf_head: bool = False
    # eval-only s2d-packed rewrite of the decoder tail (ops/packed.py);
    # None = auto (enabled on TPU). Exact up to float reassociation.
    fast_inference: Optional[bool] = None
    fast_min_res: int = 512
    # fused Pallas decode-node kernel for the fast tail's skip nodes
    # (ops/pallas_scse_conv.py). Exact up to float reassociation; OPT-IN:
    # the kernel beats the XLA H2 form per isolated node (x_1_3 27.4 vs
    # 29.9 ms) but loses in-graph (207 vs 194 ms full forward) because the
    # custom call blocks the cross-node gate-reduce fusions the XLA path
    # gets for free (PERFORMANCE.md round-3).
    pallas_tail: Any = None
    # packed fast tail under TRAINING (grad-safe packed DropBlock/BN; the
    # backward convs inherit the packed layouts' full-lane MXU utilization)
    fast_train: bool = False
    # per-block gradient rematerialization under train: one remat segment per
    # encoder block / decoder grid node — the activation peak drops to about
    # one segment's working set (whole-model jax.checkpoint recomputes in a
    # single giant segment and barely lowers the peak)
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax

        fast = (jax.default_backend() == "tpu"
                if self.fast_inference is None else self.fast_inference)
        encoder, enc_channels = get_encoder(
            self.encoder_name, base_dim=self.base_dim, dtype=self.dtype,
            fast_inference=fast, remat=self.remat)
        features = encoder(x, train)

        clf = None
        if self.clf_head:
            clf = ClassificationHead(self.classes, dropout=0.1, dtype=self.dtype,
                                     name="classification_head")(features[-1], train)

        pallas_tail = (False if self.pallas_tail is None
                       else (fast and self.pallas_tail))
        decoder_out = UnetPlusPlusDecoder(
            encoder_channels=enc_channels,
            decoder_channels=self.decoder_channels,
            base_dim=self.base_dim,
            attention_type=self.decoder_attention_type,
            deep_supervision=self.deep_supervision,
            star=True,
            drop_block_prob=self.drop_block_prob,
            fast_inference=fast,
            fast_min_res=self.fast_min_res,
            pallas_tail=pallas_tail,
            fast_train=self.fast_train and fast,
            packed_final=True,
            remat=self.remat,
            dtype=self.dtype,
            name="decoder",
        )(features, train)

        final_map = decoder_out[0] if self.deep_supervision else decoder_out
        # s2d-packed handoff: spatial ratio 2 -> factor 4, 4 -> factor 16
        ratio = x.shape[1] // final_map.shape[1]
        seg_head = SegmentationHead(self.classes, kernel_size=3,
                                    packed_in=ratio * ratio if ratio > 1 else 0,
                                    dtype=self.dtype,
                                    name="segmentation_head")
        if self.deep_supervision:
            final, deeps = decoder_out
            mask = seg_head(final)
            ds_masks = [
                SegmentationHead(self.classes, kernel_size=3, dtype=self.dtype,
                                 name=f"deep_head{i}")(f)
                for i, f in enumerate(deeps)
            ]
            if self.clf_head:
                return mask, ds_masks, clf
            return mask, ds_masks
        mask = seg_head(decoder_out)
        if self.clf_head:
            return mask, clf
        return mask
