"""Remaining zoo families: MedT axial U-Nets, DoubleU-Net, HED-UNet, DcUnet,
ResUNet++, HuBMAP seresnext101, HRNet, UneXt50.

Parity targets (each class docstring cites its reference file).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encoders import ResNetEncoder, get_encoder
from .modules.layers import (ASPP, BatchNorm, CBAM, ConvBNReLU, DoubleConv,
                             SEBlock, SegmentationHead, maxpool2x, upsample2x)

Dtype = Any


# ---------------------------------------------------------------------------
# MedT family (reference axial_attentionunet.py — Axial-DeepLab lineage:
# gated axial attention, ResAxialAttentionUNet, MedT global+local branches)
# ---------------------------------------------------------------------------

class GatedAxialAttention(nn.Module):
    """Axial attention with learnable gates on the positional terms
    (reference axial_attentionunet.py AxialAttention_dynamic): logits =
    g_qr·qr + g_kr·kr + dots; output = g_v·(attn·v) + g_rv·(attn·r_v).
    Input (b, L, C); gated variant of Axial-DeepLab's position-sensitive att."""

    dim: int
    in_channels: int
    heads: int = 8
    gated: bool = True
    use_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H = max(min(self.heads, self.in_channels // 2), 1)
        dh = max(self.in_channels // H, 1)
        dq = max(dh // 2, 4)
        b, L, C = x.shape
        qkv = nn.Dense(H * (2 * dq + dh), use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(x)
        qkv = BatchNorm(dtype=self.dtype, name="qkv_bn")(qkv, train)
        qkv = qkv.reshape(b, L, H, 2 * dq + dh)
        q, k, v = (qkv[..., :dq], qkv[..., dq:2 * dq], qkv[..., 2 * dq:])
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(dq)
        out_pos = 0.0
        if self.use_pos:
            table = self.param("relative", nn.initializers.normal(1.0),
                               (2 * dq + dh, 2 * self.dim - 1), jnp.float32)
            idx = (np.arange(self.dim)[:, None] - np.arange(self.dim)[None, :]
                   + self.dim - 1)
            emb = table[:, idx.reshape(-1)].reshape(-1, self.dim, self.dim)
            r_q, r_k, r_v = emb[:dq], emb[dq:2 * dq], emb[2 * dq:]
            qr = jnp.einsum("blhd,dlm->bhlm", q, r_q.astype(q.dtype))
            kr = jnp.einsum("bmhd,dlm->bhlm", k, r_k.astype(k.dtype))
            if self.gated:
                g_qr = self.param("gate_qr", nn.initializers.ones, (), jnp.float32)
                g_kr = self.param("gate_kr", nn.initializers.ones, (), jnp.float32)
                qr, kr = qr * g_qr, kr * g_kr
            logits = logits + qr + kr
        attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v)
        if self.use_pos:
            rv = jnp.einsum("bhlm,dlm->blhd", attn, r_v.astype(attn.dtype))
            if self.gated:
                g_v = self.param("gate_v", nn.initializers.ones, (), jnp.float32)
                g_rv = self.param("gate_rv", nn.initializers.ones, (), jnp.float32)
                out = out * g_v + rv * g_rv
            else:
                out = out + rv
        out = out.reshape(b, L, H * dh)
        return nn.Dense(self.in_channels, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class MedTAxialBlock(nn.Module):
    """Residual height+width axial attention block (medt_net building block)."""

    features: int
    dim: int
    heads: int = 8
    gated: bool = True
    use_pos: bool = True
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        y = nn.Conv(self.features // 2, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        y = nn.relu(BatchNorm(dtype=self.dtype)(y, train))
        c = y.shape[-1]
        cols = y.transpose(0, 2, 1, 3).reshape(b * w, h, c)
        cols = GatedAxialAttention(h, c, self.heads, self.gated, self.use_pos,
                                   dtype=self.dtype, name="height")(cols, train)
        rows = (cols.reshape(b, w, h, c).transpose(0, 2, 1, 3)
                .reshape(b * h, w, c))
        rows = GatedAxialAttention(w, c, self.heads, self.gated, self.use_pos,
                                   dtype=self.dtype, name="width")(rows, train)
        y = rows.reshape(b, h, w, c)
        if self.strides > 1:
            y = nn.avg_pool(y, (self.strides,) * 2, strides=(self.strides,) * 2)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(nn.relu(y))
        y = BatchNorm(dtype=self.dtype)(y, train)
        sc = x
        if self.strides > 1 or x.shape[-1] != self.features:
            sc = nn.Conv(self.features, (1, 1),
                         strides=(self.strides,) * 2, use_bias=False,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
            sc = BatchNorm(dtype=self.dtype)(sc, train)
        return nn.relu(y + sc)


class ResAxialAttentionUNet(nn.Module):
    """Axial-attention U-Net (reference axial_attentionunet.py:499+):
    conv stem, axial-attention stages, light conv decoder."""

    base: int = 32
    gated: bool = True
    use_pos: bool = True
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, _ = x.shape
        y = ConvBNReLU(self.base, 7, strides=2, drop_block_prob=0.0,
                       dtype=self.dtype, name="stem1")(x, train)
        y = ConvBNReLU(self.base, 3, drop_block_prob=0.0, dtype=self.dtype,
                       name="stem2")(y, train)  # /2
        feats = []
        ch = self.base
        for i, stride in enumerate((1, 2, 2, 2)):
            ch2 = ch * (2 if stride == 2 else 1)
            dim = y.shape[1] // stride
            y = MedTAxialBlock(ch2, dim, gated=self.gated, use_pos=self.use_pos,
                               strides=stride, dtype=self.dtype,
                               name=f"axial{i}")(y, train)
            ch = ch2
            feats.append(y)
        # decoder: upsample + add skip + conv
        y = feats[-1]
        for i, skip in enumerate(reversed(feats[:-1])):
            y = upsample2x(y)
            y = ConvBNReLU(skip.shape[-1], 3, drop_block_prob=0.0,
                           dtype=self.dtype, name=f"dec{i}")(y, train)
            y = y + skip
        y = upsample2x(y)  # back to /1
        y = ConvBNReLU(self.base, 3, drop_block_prob=0.0, dtype=self.dtype,
                       name="dec_final")(y, train)
        return SegmentationHead(self.classes, dtype=self.dtype,
                                name="segmentation_head")(y)


class MedT(nn.Module):
    """Medical Transformer: shallow global branch + 4×4-patch local branch,
    predictions added (reference medt_net, axial_attentionunet.py:499-666)."""

    base: int = 16
    classes: int = 1
    patch_grid: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, _ = x.shape
        global_out = ResAxialAttentionUNet(self.base, gated=True, classes=self.classes,
                                           dtype=self.dtype,
                                           name="global_branch")(x, train)
        g = self.patch_grid
        ph, pw = H // g, W // g
        patches = x.reshape(n, g, ph, g, pw, 3).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(n * g * g, ph, pw, 3)
        local = ResAxialAttentionUNet(self.base, gated=True, classes=self.classes,
                                      dtype=self.dtype,
                                      name="local_branch")(patches, train)
        local = local.reshape(n, g, g, ph, pw, self.classes)
        local = local.transpose(0, 1, 3, 2, 4, 5).reshape(n, H, W, self.classes)
        return global_out + local


# ---------------------------------------------------------------------------
# DoubleU-Net (reference doubleunet.py / dbunet.py)
# ---------------------------------------------------------------------------

class VGGEncoder(nn.Module):
    """VGG19-style encoder for the dbunet variant (reference dbunet.py:53-161)."""

    widths: Sequence[int] = (64, 128, 256, 512, 512)
    convs_per_stage: Sequence[int] = (2, 2, 4, 4, 4)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = [x]
        y = x
        for s, (w, n_convs) in enumerate(zip(self.widths, self.convs_per_stage)):
            if s > 0:
                y = maxpool2x(y)
            for i in range(n_convs):
                y = ConvBNReLU(w, 3, drop_block_prob=0.0, dtype=self.dtype,
                               name=f"s{s}c{i}")(y, train)
            feats.append(y)
        return feats  # [x, /1, /2, /4, /8, /16]


class DoubleUnet(nn.Module):
    """Two cascaded U-Nets: net1's sigmoid output gates the input of net2;
    net2's decoder uses skips from BOTH encoders; ASPP at each bottleneck
    (reference doubleunet.py:177-187 factories, dbunet.py DUNet)."""

    encoder_name: str = "resnet50"  # or 'vgg'
    decoder_channels: Sequence[int] = (256, 128, 64, 32)
    classes: int = 1
    dtype: Dtype = jnp.float32

    def _encode(self, name, x, train):
        if self.encoder_name == "vgg":
            feats = VGGEncoder(dtype=self.dtype, name=name)(x, train)
            return feats[2:], feats  # skips at /2../16
        enc, _ = get_encoder(self.encoder_name, dtype=self.dtype,
                             module_name=name)
        feats = enc(x, train)
        return feats[1:], feats

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, _ = x.shape
        f1, _ = self._encode("encoder1", x, train)
        y = ASPP(128, dtype=self.dtype, name="aspp1")(f1[-1], train)
        skips1 = f1[:-1][::-1]
        for i, ch in enumerate(self.decoder_channels):
            y = upsample2x(y)
            if i < len(skips1):
                y = jnp.concatenate([y, skips1[i]], axis=-1)
            y = ConvBNReLU(ch, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"dec1_{i}")(y, train)
        if y.shape[1] != H:
            y = jax.image.resize(y, (n, H, W, y.shape[-1]), "bilinear")
        out1 = SegmentationHead(self.classes, dtype=self.dtype, name="head1")(y)

        x2 = x * jax.nn.sigmoid(out1.astype(self.dtype))
        f2, _ = self._encode("encoder2", x2, train)
        y = ASPP(128, dtype=self.dtype, name="aspp2")(f2[-1], train)
        skips2 = f2[:-1][::-1]
        for i, ch in enumerate(self.decoder_channels):
            y = upsample2x(y)
            cat = [y]
            if i < len(skips1):
                cat += [skips1[i], skips2[i]]
            y = jnp.concatenate(cat, axis=-1) if len(cat) > 1 else y
            y = ConvBNReLU(ch, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"dec2_{i}")(y, train)
        if y.shape[1] != H:
            y = jax.image.resize(y, (n, H, W, y.shape[-1]), "bilinear")
        out2 = SegmentationHead(self.classes, dtype=self.dtype, name="head2")(y)
        return out2


# ---------------------------------------------------------------------------
# HED-UNet (reference hed.py): multiscale edge+seg with attention merging
# ---------------------------------------------------------------------------

class _HEDBlock(nn.Module):
    """HED-UNet conv block: 'double' (hed_unet), 'res' (hed_resunet) or
    'dense' (hed_denseunet) — reference hed.py factories l.267+."""

    features: int
    kind: str = "double"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "double":
            return DoubleConv(self.features, dtype=self.dtype)(x, train)
        if self.kind == "res":
            y = ConvBNReLU(self.features, 3, drop_block_prob=0.0,
                           dtype=self.dtype, name="c1")(x, train)
            y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32, name="c2")(y)
            y = BatchNorm(dtype=self.dtype, name="bn")(y, train)
            sc = nn.Conv(self.features, (1, 1), use_bias=False,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="sc")(x)
            return nn.relu(y + sc)
        # dense: two growth convs concatenated then projected
        g = max(self.features // 2, 8)
        a = ConvBNReLU(g, 3, drop_block_prob=0.0, dtype=self.dtype,
                       name="d1")(x, train)
        b = ConvBNReLU(g, 3, drop_block_prob=0.0, dtype=self.dtype,
                       name="d2")(jnp.concatenate([x, a], -1), train)
        return ConvBNReLU(self.features, 1, drop_block_prob=0.0,
                          dtype=self.dtype,
                          name="proj")(jnp.concatenate([x, a, b], -1), train)


class HEDUNet(nn.Module):
    """U-Net whose decoder emits a prediction at every scale; the final output
    is an attention-weighted hypercolumn merge; a parallel edge stack is
    supervised the same way (reference hed.py:173-266)."""

    base: int = 16
    depth: int = 4
    classes: int = 1
    block: str = "double"  # double | res | dense
    deep_supervision: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, _ = x.shape
        skips = []
        y = x
        for i in range(self.depth):
            y = _HEDBlock(self.base * (2 ** i), self.block, dtype=self.dtype,
                          name=f"enc{i}")(y, train)
            skips.append(y)
            y = maxpool2x(y)
        y = _HEDBlock(self.base * (2 ** self.depth), self.block,
                      dtype=self.dtype, name="bottleneck")(y, train)
        preds = []
        for i in range(self.depth - 1, -1, -1):
            y = upsample2x(y)
            y = jnp.concatenate([y, skips[i]], axis=-1)
            y = _HEDBlock(self.base * (2 ** i), self.block, dtype=self.dtype,
                          name=f"dec{i}")(y, train)
            p = nn.Conv(2 * self.classes, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"pred{i}")(y)
            preds.append(jax.image.resize(
                p.astype(jnp.float32), (n, H, W, 2 * self.classes), "bilinear"))
        stack = jnp.stack(preds, axis=1)  # (n, S, H, W, 2C): [seg, edge]
        att = nn.Conv(len(preds), (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="merge_att")(
            jnp.concatenate(preds, axis=-1).astype(self.dtype))
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
        merged = jnp.einsum("nshwc,nhws->nhwc", stack, att)
        seg = merged[..., :self.classes]
        if self.deep_supervision:
            return seg, [p[..., :self.classes] for p in preds[:-1]]
        return seg


# ---------------------------------------------------------------------------
# DC-UNet (reference dcunet.py): dual-channel multi-res blocks
# ---------------------------------------------------------------------------

class DCBlock(nn.Module):
    """Two parallel 3-conv chains (multi-res style) concatenated + residual."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = max(self.features // 2, 8)

        def chain(name):
            y = x
            outs = []
            for i, f in enumerate((w // 2, w // 2, w)):
                y = ConvBNReLU(f, 3, drop_block_prob=0.0, dtype=self.dtype,
                               name=f"{name}{i}")(y, train)
                outs.append(y)
            return jnp.concatenate(outs, axis=-1)

        a = chain("a")
        b = chain("b")
        y = jnp.concatenate([a, b], axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(y)
        y = BatchNorm(dtype=self.dtype, name="proj_bn")(y, train)
        sc = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="sc")(x)
        return nn.relu(y + BatchNorm(dtype=self.dtype, name="sc_bn")(sc, train))


class DcUnet(nn.Module):
    """Dual-channel U-Net (reference dcunet.py:219+)."""

    filters: Sequence[int] = (32, 64, 128, 256)
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        y = x
        for i, f in enumerate(self.filters):
            y = DCBlock(f, dtype=self.dtype, name=f"enc{i}")(y, train)
            if i < len(self.filters) - 1:
                skips.append(y)
                y = maxpool2x(y)
        for i, f in enumerate(reversed(self.filters[:-1])):
            y = upsample2x(y)
            y = jnp.concatenate([y, skips[-(i + 1)]], axis=-1)
            y = DCBlock(f, dtype=self.dtype, name=f"dec{i}")(y, train)
        return SegmentationHead(self.classes, kernel_size=1, dtype=self.dtype,
                                name="segmentation_head")(y)


# ---------------------------------------------------------------------------
# ResUNet++ (reference resunetplusplus.py: SE + ASPP + attention)
# ---------------------------------------------------------------------------

class ResUnetPlusPlus(nn.Module):
    filters: Sequence[int] = (16, 32, 64, 128)
    classes: int = 1
    dtype: Dtype = jnp.float32

    def _res_block(self, y, f, name, train, strides=1):
        sc = nn.Conv(f, (1, 1), strides=(strides, strides), use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name=f"{name}_sc")(y)
        z = ConvBNReLU(f, 3, strides=strides, drop_block_prob=0.0,
                       dtype=self.dtype, name=f"{name}_c1")(y, train)
        z = nn.Conv(f, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"{name}_c2")(z)
        z = BatchNorm(dtype=self.dtype, name=f"{name}_bn")(z, train)
        return nn.relu(z + sc)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        skips = []
        y = self._res_block(x, f[0], "enc0", train)
        for i in range(1, len(f)):
            skips.append(SEBlock(dtype=self.dtype, name=f"se{i}")(y))
            y = self._res_block(y, f[i], f"enc{i}", train, strides=2)
        y = ASPP(f[-1], dtype=self.dtype, name="bridge")(y, train)
        for i in range(len(f) - 1):
            y = upsample2x(y)
            skip = skips[-(i + 1)]
            y = jnp.concatenate([y, skip], axis=-1)
            y = self._res_block(y, skip.shape[-1], f"dec{i}", train)
        y = ASPP(f[0], dtype=self.dtype, name="out_aspp")(y, train)
        return SegmentationHead(self.classes, kernel_size=1, dtype=self.dtype,
                                name="segmentation_head")(y)


# ---------------------------------------------------------------------------
# HuBMAP UNET_SERESNEXT101 (reference hubmap_kaggle.py:113-241)
# ---------------------------------------------------------------------------

class UnetSEResNext101(nn.Module):
    """SE-ResNeXt101 encoder + CBAM decode blocks + hypercolumn head + clf
    head with inference-time early-exit zero mask (clf_threshold,
    hubmap_kaggle.py:188-202); deep supervision returns [s4..s1]."""

    decoder_channels: int = 64
    classes: int = 1
    clf_head: bool = True
    clf_threshold: Optional[float] = None
    deep_supervision: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, _ = x.shape
        enc, _ = get_encoder("seresnext101", dtype=self.dtype)
        feats = enc(x, train)
        _, c0, c1, c2, c3, c4 = feats
        dc = self.decoder_channels

        clf = None
        if self.clf_head:
            s = jnp.mean(c4, axis=(1, 2))
            s = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32)(s)
            s = jax.nn.elu(s)
            clf = nn.Dense(self.classes, dtype=self.dtype,
                           param_dtype=jnp.float32)(s).astype(jnp.float32)

        def decode(name, t, up=True):
            t = ConvBNReLU(dc, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"{name}_conv")(t, train)
            t = CBAM(dtype=self.dtype, name=f"{name}_cbam")(t)
            return upsample2x(t) if up else t

        y5 = decode("center", c4, up=False)
        y4 = decode("dec4", jnp.concatenate([c4, y5], -1))   # /16
        y3 = decode("dec3", jnp.concatenate([c3, y4], -1))   # /8
        y2 = decode("dec2", jnp.concatenate([c2, y3], -1))   # /4
        y1 = decode("dec1", jnp.concatenate([c1, y2], -1))   # /2
        y0 = decode("dec0", jnp.concatenate([c0, y1], -1))   # /1

        def up_to(t):
            return jax.image.resize(t, (n, H, W, t.shape[-1]), "bilinear")

        hyper = jnp.concatenate([up_to(t) for t in (y0, y1, y2, y3, y4)], -1)
        logits = nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="final")(
            ConvBNReLU(dc, 3, drop_block_prob=0.0, dtype=self.dtype,
                       name="hyper_conv")(hyper, train)).astype(jnp.float32)

        if (not train) and self.clf_head and self.clf_threshold is not None:
            keep = (jax.nn.sigmoid(clf) > self.clf_threshold).astype(jnp.float32)
            logits = logits * keep[:, None, None, :] + (
                -100.0) * (1 - keep[:, None, None, :])
        if self.deep_supervision:
            deeps = [SegmentationHead(self.classes, dtype=self.dtype,
                                      name=f"deep{i}")(t)
                     for i, t in enumerate((y4, y3, y2, y1))]
            return (logits, deeps, clf) if self.clf_head else (logits, deeps)
        return (logits, clf) if self.clf_head else logits


# ---------------------------------------------------------------------------
# HRNetV2 (reference hrnet.py hrnet18/34/48 → pytorch_toolbelt
# HRNetV2Encoder{18,34,48} + HRNetSegmentationDecoder) — real 4-stage topology
# ---------------------------------------------------------------------------

class _HRFuse(nn.Module):
    """Full cross-resolution fusion (HRNetV2 fuse_layers): every branch
    receives every other — 1×1 conv + upsample from lower resolutions, chains
    of stride-2 3×3 convs from higher resolutions — summed then ReLU."""

    widths: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        bn = lambda name: BatchNorm(dtype=self.dtype, name=name)
        n = xs[0].shape[0]
        fused = []
        for i in range(len(xs)):
            th, tw = xs[i].shape[1], xs[i].shape[2]
            acc = xs[i]
            for j in range(len(xs)):
                if i == j:
                    continue
                s = xs[j]
                if j > i:  # lower res -> 1x1 conv, BN, upsample 2^(j-i)
                    s = nn.Conv(self.widths[i], (1, 1), use_bias=False,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=f"f{j}to{i}_conv")(s)
                    s = bn(f"f{j}to{i}_bn")(s, train)
                    s = jax.image.resize(s, (n, th, tw, self.widths[i]),
                                         "bilinear")
                else:  # higher res -> chain of stride-2 3x3 convs
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.widths[i] if last else self.widths[j]
                        s = nn.Conv(ch, (3, 3), strides=(2, 2),
                                    padding=[(1, 1), (1, 1)], use_bias=False,
                                    dtype=self.dtype, param_dtype=jnp.float32,
                                    name=f"f{j}to{i}_conv{k}")(s)
                        s = bn(f"f{j}to{i}_bn{k}")(s, train)
                        if not last:
                            s = nn.relu(s)
                acc = acc + s
            fused.append(nn.relu(acc))
        return fused


class _HRModule(nn.Module):
    """One HRNet exchange module: 4 BasicBlocks per branch + full fusion."""

    widths: Sequence[int]
    n_blocks: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from .encoders import BasicBlock
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.n_blocks):
                x = BasicBlock(self.widths[i], dtype=self.dtype,
                               name=f"b{i}_blk{b}")(x, train)
            ys.append(x)
        return _HRFuse(self.widths, dtype=self.dtype, name="fuse")(ys, train)


class HRNet(nn.Module):
    """HRNetV2 segmentation (reference hrnet.py:39-51 maps hrnet18/34/48 to
    pytorch_toolbelt HRNetV2 encoders). Standard topology for every width:
    stem (2× stride-2 conv) → stage1 (4 bottlenecks, 256ch) → 4-branch
    pyramid [C,2C,4C,8C] with 1/4/3 exchange modules in stages 2/3/4 (4
    BasicBlocks per branch per module) → HRNetV2 head: upsample-all-to-/4
    concat + 1×1 conv + classes, bilinear ×4 to full size."""

    width: int = 18
    classes: int = 1
    dtype: Dtype = jnp.float32

    # official HRNetV2 module counts (same for all widths)
    stage_modules: Sequence[int] = (1, 4, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .encoders import Bottleneck
        n, H, W, _ = x.shape
        w = self.width
        widths = [w, 2 * w, 4 * w, 8 * w]

        # stem: /4
        y = ConvBNReLU(64, 3, strides=2, drop_block_prob=0.0,
                       dtype=self.dtype, name="stem1")(x, train)
        y = ConvBNReLU(64, 3, strides=2, drop_block_prob=0.0,
                       dtype=self.dtype, name="stem2")(y, train)
        # stage1: 4 bottleneck blocks at 64 (256 out)
        for b in range(4):
            y = Bottleneck(64, dtype=self.dtype, name=f"layer1_blk{b}")(y, train)

        # transitions add one lower-resolution branch per stage; existing
        # branches pass through (HRNetV2 only inserts a conv on width change,
        # which only happens at the stage-1 -> stage-2 boundary)
        branches = [
            ConvBNReLU(widths[0], 3, drop_block_prob=0.0, dtype=self.dtype,
                       name="trans1_b0")(y, train),
            ConvBNReLU(widths[1], 3, strides=2, drop_block_prob=0.0,
                       dtype=self.dtype, name="trans1_b1")(y, train),
        ]
        for stage, n_modules in enumerate(self.stage_modules):
            if stage > 0:
                branches.append(
                    ConvBNReLU(widths[len(branches)], 3, strides=2,
                               drop_block_prob=0.0, dtype=self.dtype,
                               name=f"trans{stage + 1}")(branches[-1], train))
            ws = widths[:len(branches)]
            for m in range(n_modules):
                branches = _HRModule(ws, dtype=self.dtype,
                                     name=f"stage{stage + 2}_m{m}")(branches,
                                                                    train)

        # HRNetV2 head: upsample all to /4, concat, 1x1 conv, classes, x4 up
        h4, w4 = branches[0].shape[1], branches[0].shape[2]
        ups = [branches[0]] + [
            jax.image.resize(b, (n, h4, w4, b.shape[-1]), "bilinear")
            for b in branches[1:]]
        y = jnp.concatenate(ups, axis=-1)
        y = ConvBNReLU(sum(widths), 1, drop_block_prob=0.0, dtype=self.dtype,
                       name="head_conv")(y, train)
        return SegmentationHead(self.classes, upsampling=4, dtype=self.dtype,
                                name="segmentation_head")(y)


# ---------------------------------------------------------------------------
# UneXt50 (reference unet.py:99+): resnext50 + ASPP + FPN hypercolumn
# ---------------------------------------------------------------------------

class UneXt50(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32)
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, _ = x.shape
        enc = ResNetEncoder(stage_sizes=(3, 4, 6, 3), block="bottleneck",
                            groups=32, dtype=self.dtype, name="encoder")
        feats = enc(x, train)
        y = ASPP(256, dtype=self.dtype, name="aspp")(feats[5], train)
        skips = [feats[4], feats[3], feats[2], feats[1]]
        hyper = []
        for i, ch in enumerate(self.decoder_channels):
            y = upsample2x(y)
            y = jnp.concatenate([y, skips[i]], axis=-1)
            y = ConvBNReLU(ch, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"dec{i}")(y, train)
            hyper.append(y)
        # FPN hypercolumn: project deeper decoder features to /2 and concat
        h2, w2 = hyper[-1].shape[1], hyper[-1].shape[2]
        cols = [hyper[-1]]
        for i, t in enumerate(hyper[:-1]):
            t = nn.Conv(16, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"fpn{i}")(t)
            cols.append(jax.image.resize(t, (n, h2, w2, 16), "bilinear"))
        y = jnp.concatenate(cols, axis=-1)
        y = ConvBNReLU(64, 3, drop_block_prob=0.0, dtype=self.dtype,
                       name="fuse")(y, train)
        return SegmentationHead(self.classes, upsampling=2, dtype=self.dtype,
                                name="segmentation_head")(y)
