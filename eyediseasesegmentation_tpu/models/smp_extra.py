"""The remaining smp model families reachable through name reflection.

The reference resolves ANY ``smp.<ClassName>`` by name at train time
(``src/main/train.py:167-179``) — beyond the families its configs actually
use (Unet/UnetPlusPlus/FPN/DeepLabV3Plus, implemented in their own modules),
that surface exposes Linknet, PSPNet, PAN, MAnet and DeepLabV3.  These are
structural re-implementations of the smp architectures (flax, NHWC,
encoder-agnostic over this repo's 6-level feature pyramid), registered under
the same class names so a reference config that named one keeps working.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoders import get_encoder
from .modules.layers import (ASPP, BatchNorm, ConvBNReLU, SegmentationHead,
                             upsample2x)

Dtype = Any


def _resize_to(x, hw, method="bilinear"):
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, hw[0], hw[1], c), method)


class _TransposeX2(nn.Module):
    """ConvTranspose(k4, s2, p1) + BN + ReLU (smp linknet TransposeX2)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = BatchNorm(dtype=self.dtype)(y, train)
        return nn.relu(y)


class Linknet(nn.Module):
    """LinkNet (smp.Linknet): 1×1 squeeze → ×2 transposed conv → 1×1 expand
    per decode block, residual ADD of the skip (not concat)."""

    encoder_name: str = "resnet34"
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        feats = encoder(x, train)[1:][::-1]  # head-first: /32../2
        y = feats[0]
        skips = feats[1:] + [None]
        out_ch = [f.shape[-1] for f in feats[1:]] + [32]
        for i, out in enumerate(out_ch):
            cin = y.shape[-1]
            y = ConvBNReLU(max(cin // 4, 16), 1, drop_block_prob=0.0,
                           dtype=self.dtype, name=f"block{i}_squeeze")(y, train)
            y = _TransposeX2(max(cin // 4, 16), dtype=self.dtype,
                             name=f"block{i}_up")(y, train)
            y = ConvBNReLU(out, 1, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"block{i}_expand")(y, train)
            if skips[i] is not None:
                y = y + skips[i].astype(y.dtype)
        return SegmentationHead(self.classes, dtype=self.dtype,
                                name="segmentation_head")(y)


class PSPModule(nn.Module):
    """Pyramid pooling (PSPNet): global pools at grid sizes (1,2,3,6),
    1×1 conv + BN + ReLU each, upsample, concat with the input."""

    out_channels: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        branch_ch = self.out_channels // len(self.sizes)
        outs = [x]
        for i, s in enumerate(self.sizes):
            g = min(s, h, w)
            p = nn.avg_pool(x, (h // g, w // g), strides=(h // g, w // g))
            p = ConvBNReLU(branch_ch, 1, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"branch{i}")(p, train)
            outs.append(_resize_to(p, (h, w)))
        y = jnp.concatenate(outs, axis=-1)
        return ConvBNReLU(self.out_channels, 1, drop_block_prob=0.0,
                          dtype=self.dtype, name="bottleneck")(y, train)


class PSPNet(nn.Module):
    """PSPNet (smp.PSPNet): PSP pooling over the /32 feature, dropout,
    3×3 head upsampled back to input resolution."""

    encoder_name: str = "resnet34"
    psp_out_channels: int = 512
    dropout: float = 0.2
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        feats = encoder(x, train)
        y = PSPModule(self.psp_out_channels, dtype=self.dtype,
                      name="psp")(feats[5], train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return SegmentationHead(self.classes, upsampling=32, dtype=self.dtype,
                                name="segmentation_head")(y)


class DeepLabV3(nn.Module):
    """DeepLabV3 (smp.DeepLabV3): ASPP over /32 + 3×3 fuse, ×32 head —
    V3+ without the low-level skip path (deeplabv3plus.py has V3+)."""

    encoder_name: str = "resnet34"
    aspp_channels: int = 256
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        feats = encoder(x, train)
        y = ASPP(self.aspp_channels, dtype=self.dtype, name="aspp")(feats[5], train)
        y = ConvBNReLU(self.aspp_channels, 3, drop_block_prob=0.0,
                       dtype=self.dtype, name="fuse")(y, train)
        return SegmentationHead(self.classes, upsampling=32, dtype=self.dtype,
                                name="segmentation_head")(y)


class _FPABlock(nn.Module):
    """Feature Pyramid Attention (PAN center): global-pool branch + 1×1
    mid branch + a 7/5/3 downsample-upsample attention pyramid."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        # global context branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBNReLU(self.features, 1, drop_block_prob=0.0,
                       dtype=self.dtype, name="glob")(g, train)
        g = jnp.broadcast_to(g, (n, h, w, self.features))
        # mid 1x1
        m = ConvBNReLU(self.features, 1, drop_block_prob=0.0,
                       dtype=self.dtype, name="mid")(x, train)
        # pyramid: /2 (7x7), /4 (5x5), /8 (3x3) then merge back up.  On
        # tiny maps only as many levels as halving allows (static shapes).
        def down(z, k, name):
            z = nn.avg_pool(z, (2, 2), strides=(2, 2))
            return ConvBNReLU(self.features, min(k, z.shape[1]),
                              drop_block_prob=0.0,
                              dtype=self.dtype, name=name)(z, train)
        levels, z = [], x
        for i, k in enumerate((7, 5, 3)):
            if z.shape[1] < 2 or z.shape[2] < 2:
                break
            z = down(z, k, f"py{i + 1}")
            levels.append(z)
        if levels:
            u = levels[-1]
            for lower in levels[-2::-1]:
                u = _resize_to(u, lower.shape[1:3]) + lower
            u = _resize_to(u, (h, w))
        else:
            u = jnp.ones((n, h, w, self.features), x.dtype)
        return m * u + g


class _GAUBlock(nn.Module):
    """Global Attention Upsample (PAN): low-level features gated by the
    pooled high-level context, plus the upsampled high-level map."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, high, low, train: bool = False):
        lo = ConvBNReLU(self.features, 3, drop_block_prob=0.0,
                        dtype=self.dtype, name="low_conv")(low, train)
        g = jnp.mean(high, axis=(1, 2), keepdims=True)
        g = ConvBNReLU(self.features, 1, drop_block_prob=0.0,
                       dtype=self.dtype, name="gate")(g, train)
        g = jax.nn.sigmoid(g.astype(jnp.float32)).astype(lo.dtype)
        hi = high
        if hi.shape[-1] != self.features:
            hi = ConvBNReLU(self.features, 1, drop_block_prob=0.0,
                            dtype=self.dtype, name="high_proj")(hi, train)
        hi = _resize_to(hi, low.shape[1:3])
        return hi + lo * g


class PAN(nn.Module):
    """Pyramid Attention Network (smp.PAN): FPA center on /32, GAU decode
    blocks up to /4, ×4 head."""

    encoder_name: str = "resnet34"
    decoder_channels: int = 32
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        feats = encoder(x, train)
        y = _FPABlock(self.decoder_channels, dtype=self.dtype,
                      name="fpa")(feats[5], train)
        for i, skip in enumerate((feats[4], feats[3], feats[2])):
            y = _GAUBlock(self.decoder_channels, dtype=self.dtype,
                          name=f"gau{i}")(y, skip, train)
        return SegmentationHead(self.classes, upsampling=4, dtype=self.dtype,
                                name="segmentation_head")(y)


class _PABBlock(nn.Module):
    """Position attention (MAnet center): spatial self-attention at reduced
    channel width over the /32 map."""

    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        ck = max(c // self.reduction, 1)
        q = nn.Conv(ck, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="q")(x).reshape(n, h * w, ck)
        k = nn.Conv(ck, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="k")(x).reshape(n, h * w, ck)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="v")(x).reshape(n, h * w, c)
        att = jax.nn.softmax(
            jnp.einsum("nqc,nkc->nqk", q, k).astype(jnp.float32), axis=-1)
        y = jnp.einsum("nqk,nkc->nqc", att.astype(v.dtype), v)
        return x + y.reshape(n, h, w, c)


class _MFABBlock(nn.Module):
    """Multi-scale Fusion Attention (MAnet decode): upsample + concat skip,
    channel attention from BOTH the high and low pooled contexts."""

    features: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        hi_c = x.shape[-1]
        def se(z, name):
            c = z.shape[-1]
            s = jnp.mean(z, axis=(1, 2), keepdims=True)
            s = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_fc1")(s)
            s = nn.relu(s)
            s = nn.Conv(hi_c, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_fc2")(s)
            return jax.nn.sigmoid(s.astype(jnp.float32)).astype(z.dtype)
        att = se(x, "hi")
        x = upsample2x(x)
        if skip is not None:
            att = att + se(skip, "lo")
            x = x * att
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        y = ConvBNReLU(self.features, 3, drop_block_prob=0.0,
                       dtype=self.dtype, name="conv1")(x, train)
        return ConvBNReLU(self.features, 3, drop_block_prob=0.0,
                          dtype=self.dtype, name="conv2")(y, train)


class MAnet(nn.Module):
    """Multi-scale Attention Net (smp.MAnet): PAB center + MFAB decoder."""

    encoder_name: str = "resnet34"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = get_encoder(self.encoder_name, dtype=self.dtype)
        feats = encoder(x, train)[1:][::-1]
        y = _PABBlock(dtype=self.dtype, name="pab")(feats[0], train)
        skips = feats[1:] + [None]
        for i, out in enumerate(self.decoder_channels):
            y = _MFABBlock(out, dtype=self.dtype,
                           name=f"block{i}")(y, skips[i], train)
        return SegmentationHead(self.classes, dtype=self.dtype,
                                name="segmentation_head")(y)
