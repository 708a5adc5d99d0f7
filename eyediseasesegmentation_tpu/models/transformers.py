"""Transformer segmentation families: Segformer-star, Swinformer-star, TransUNet.

Parity targets:
* ``SegformerStar`` (reference segformerstar.py) — MixVisionTransformer encoder
  (overlapped patch embedding, spatial-reduction attention, Mix-FFN; mit_b0/b1/b2
  depth configs, l.350-398) + the "star" decoder: CBAM decode blocks and an
  attention-merged hypercolumn (5 per-scale prediction heads weighted by a
  softmax over 5 query heads, l.553-606), deep supervision [s4..s1] and a
  LayerNorm-MLP classification head (l.608-619).
* ``SwinformerStar`` (swinformerstar.py) — the same star decoder on a Swin
  backbone (windowed MSA with relative position bias + shifted windows,
  modules/swin_transformer.py).
* ``TransUnet`` (transunet.py) — ViT bottleneck encoder (optionally hybrid with
  a ResNet feature pyramid) + cascaded upsampling decoder; factories
  TransUnet_B16 / TransUnet_R50 (l.519-546).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules.layers import (BatchNorm, CBAM, ConvBNReLU, SegmentationHead,
                             upsample2x)

Dtype = Any


# ---------------------------------------------------------------------------
# MixVisionTransformer (Segformer) encoder
# ---------------------------------------------------------------------------

class OverlapPatchEmbed(nn.Module):
    features: int
    patch: int = 7
    stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.patch, self.patch),
                    strides=(self.stride, self.stride), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        n, h, w, c = x.shape
        x = nn.LayerNorm(dtype=self.dtype)(x.reshape(n, h * w, c))
        return x, (h, w)


class SRAttention(nn.Module):
    """Efficient self-attention with spatial reduction (Segformer)."""

    features: int
    heads: int
    sr_ratio: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        n, L, c = x.shape
        h, w = hw
        head_dim = self.features // self.heads
        q = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(x)
        kv_in = x
        if self.sr_ratio > 1:
            r = self.sr_ratio
            kv_in = x.reshape(n, h, w, c)
            kv_in = nn.Conv(self.features, (r, r), strides=(r, r),
                            dtype=self.dtype, param_dtype=jnp.float32)(kv_in)
            kv_in = kv_in.reshape(n, -1, self.features)
            kv_in = nn.LayerNorm(dtype=self.dtype)(kv_in)
        k = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(kv_in)
        v = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(kv_in)

        def split(t):
            return t.reshape(n, -1, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(head_dim)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, L, self.features)
        return nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(out)


class MixFFN(nn.Module):
    """FFN with a 3×3 depthwise conv between the dense layers (Mix-FFN)."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        n, L, c = x.shape
        h, w = hw
        y = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y2 = y.reshape(n, h, w, self.hidden)
        y2 = nn.Conv(self.hidden, (3, 3), padding="SAME",
                     feature_group_count=self.hidden, dtype=self.dtype,
                     param_dtype=jnp.float32)(y2)
        y = jax.nn.gelu(y2.reshape(n, L, self.hidden))
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(y)


class MixViTBlock(nn.Module):
    features: int
    heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + SRAttention(self.features, self.heads, self.sr_ratio,
                            dtype=self.dtype)(y, hw)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        return x + MixFFN(self.features * self.mlp_ratio, dtype=self.dtype)(y, hw)


MIT_CONFIGS = {
    # dims / heads / depths / sr_ratios of mit_b0-b2 (segformerstar.py:350-398)
    "mit_b0": dict(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "mit_b2": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
}
MIT_HEADS = (1, 2, 5, 8)
MIT_SR = (8, 4, 2, 1)


class MixVisionTransformer(nn.Module):
    variant: str = "mit_b0"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = MIT_CONFIGS[self.variant]
        feats = []
        for stage, (dim, depth) in enumerate(zip(cfg["dims"], cfg["depths"])):
            patch, stride = (7, 4) if stage == 0 else (3, 2)
            seq, (h, w) = OverlapPatchEmbed(dim, patch, stride, dtype=self.dtype,
                                            name=f"embed{stage}")(x)
            for i in range(depth):
                seq = MixViTBlock(dim, MIT_HEADS[stage], MIT_SR[stage],
                                  dtype=self.dtype,
                                  name=f"stage{stage}_block{i}")(seq, (h, w))
            seq = nn.LayerNorm(dtype=self.dtype, name=f"norm{stage}")(seq)
            x = seq.reshape(seq.shape[0], h, w, dim)
            feats.append(x)
        return feats  # [/4, /8, /16, /32]


# ---------------------------------------------------------------------------
# Swin backbone
# ---------------------------------------------------------------------------

class WindowAttention(nn.Module):
    features: int
    heads: int
    window: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (num_windows*B, window*window, C)
        nW, L, c = x.shape
        ws = self.window
        head_dim = self.features // self.heads
        qkv = nn.Dense(3 * self.features, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
        qkv = qkv.reshape(nW, L, 3, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(head_dim)
        # relative position bias
        table = self.param("rel_bias",
                           nn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, self.heads), jnp.float32)
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :] + ws - 1
        idx = rel[0] * (2 * ws - 1) + rel[1]
        bias = table[idx.reshape(-1)].reshape(L, L, self.heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nWin = mask.shape[0]
            attn = attn.reshape(nW // nWin, nWin, self.heads, L, L)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nW, self.heads, L, L)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nW, L, self.features)
        return nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(out)


def _window_partition(x, ws):
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(windows, ws, h, w):
    n = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(n, h // ws, w // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h, w, -1)


class SwinBlock(nn.Module):
    features: int
    heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        # reference semantics (modules/swin_transformer.py): the feature map
        # is zero-PADDED up to window multiples, attended (pad tokens join
        # their edge windows unmasked in the non-shifted case, exactly like
        # the torch code), and cropped back; window stays the nominal 7 so
        # the relative-position tables keep their canonical (2·7−1)² shape
        # (required for pretrained Swin import). If the map is smaller than
        # the window, the window shrinks to it and shift turns off.
        ws = min(self.window, h, w)
        shift = self.shift if (self.shift and min(h, w) > ws) else 0
        shift = min(shift, ws - 1) if shift else 0
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        hp, wp = h + pad_h, w + pad_w
        y = nn.LayerNorm(dtype=self.dtype)(x)
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            # attention mask separating rolled-over regions (built on the
            # PADDED canvas, swin_transformer.py attn_mask)
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = _window_partition(jnp.asarray(img_mask), ws)[..., 0]
            mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            mask = None
        windows = _window_partition(y, ws)
        att = WindowAttention(self.features, self.heads, ws,
                              dtype=self.dtype)(windows, mask)
        y = _window_reverse(att, ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w]
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.features * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = jax.nn.gelu(y)
        y = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(y)
        return x + y


SWIN_CONFIGS = {
    "swin_tiny": dict(dims=(96, 192, 384, 768), depths=(2, 2, 6, 2),
                      heads=(3, 6, 12, 24)),
    "swin_small": dict(dims=(96, 192, 384, 768), depths=(2, 2, 18, 2),
                       heads=(3, 6, 12, 24)),
}


class SwinTransformer(nn.Module):
    """Swin backbone returning the 4-level pyramid [/4, /8, /16, /32]
    (modules/swin_transformer.py)."""

    variant: str = "swin_tiny"
    window: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = SWIN_CONFIGS[self.variant]
        n = x.shape[0]
        # patch embedding /4
        x = nn.Conv(cfg["dims"][0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        feats = []
        for stage, (dim, depth, heads) in enumerate(zip(cfg["dims"],
                                                        cfg["depths"],
                                                        cfg["heads"])):
            if stage > 0:  # patch merging: 2x2 -> linear
                nh, hh, ww, cc = x.shape
                x = x.reshape(nh, hh // 2, 2, ww // 2, 2, cc)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(nh, hh // 2, ww // 2, 4 * cc)
                x = nn.LayerNorm(dtype=self.dtype)(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            for i in range(depth):
                x = SwinBlock(dim, heads, self.window,
                              shift=0 if i % 2 == 0 else self.window // 2,
                              dtype=self.dtype,
                              name=f"stage{stage}_block{i}")(x)
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# Star decoder (segformerstar.py:400-619) shared by both *Star models
# ---------------------------------------------------------------------------

class StarDecoder(nn.Module):
    """CBAM decode blocks + attention-merged hypercolumn over 5 scales."""

    center_channels: int = 512
    decoder_channels: int = 64
    classes: int = 1
    deep_supervision: bool = False
    clf_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], out_hw: Tuple[int, int],
                 train: bool = False):
        x1, x2, x3, x4 = feats  # /4, /8, /16, /32
        dc = self.decoder_channels

        clf = None
        if self.clf_head:
            s = jnp.mean(x4, axis=(1, 2))
            s = nn.LayerNorm(dtype=self.dtype)(s)
            s = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32)(s)
            s = jax.nn.elu(s)
            s = nn.LayerNorm(dtype=self.dtype)(s)
            clf = nn.Dense(self.classes, dtype=self.dtype,
                           param_dtype=jnp.float32)(s).astype(jnp.float32)

        def decode(name, x, up=True):
            y = ConvBNReLU(dc, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"{name}_conv")(x, train)
            y = CBAM(dtype=self.dtype, name=f"{name}_cbam")(y)
            return upsample2x(y) if up else y

        y5 = decode("center", x4, up=False)
        y4 = decode("dec4", jnp.concatenate([x4, y5], -1))            # /16
        y3 = decode("dec3", jnp.concatenate([x3, y4], -1))            # /8
        y2 = decode("dec2", jnp.concatenate([x2, y3], -1))            # /4
        y1 = decode("dec1", jnp.concatenate([x1, y2], -1))            # /2
        y0 = decode("dec0", y1)                                        # /1

        def up_to(y, hw):
            n, h, w, c = y.shape
            if (h, w) == tuple(hw):
                return y
            return jax.image.resize(y, (n, hw[0], hw[1], c), "bilinear")

        ups = [up_to(t, out_hw) for t in (y0, y1, y2, y3, y4)]
        preds = [nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"deep{i}")(u)
                 for i, u in enumerate(ups)]
        queries = [nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name=f"que{i}")(u)
                   for i, u in enumerate(ups)]
        p = jnp.stack(preds, axis=1).astype(jnp.float32)    # (B, 5, H, W, C)
        q = jnp.stack(queries, axis=1).astype(jnp.float32)
        attn = jax.nn.softmax(q, axis=1)
        combined = jnp.sum(attn * p, axis=1)

        if self.deep_supervision:
            deeps = [preds[4], preds[3], preds[2], preds[1]]  # [s4..s1]
            deeps = [d.astype(jnp.float32) for d in deeps]
            return (combined, deeps, clf) if self.clf_head else (combined, deeps)
        return (combined, clf) if self.clf_head else combined


class SegformerStar(nn.Module):
    """MixViT encoder + star decoder (reference segformerstar.py)."""

    encoder_name: str = "mit_b0"
    classes: int = 1
    deep_supervision: bool = False
    clf_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MixVisionTransformer(self.encoder_name, dtype=self.dtype,
                                     name="encoder")(x, train)
        return StarDecoder(classes=self.classes,
                           deep_supervision=self.deep_supervision,
                           clf_head=self.clf_head, dtype=self.dtype,
                           name="decoder")(feats, x.shape[1:3], train)


class SwinformerStar(nn.Module):
    """Swin backbone + star decoder (reference swinformerstar.py)."""

    encoder_name: str = "swin_tiny"
    classes: int = 1
    deep_supervision: bool = False
    clf_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = SwinTransformer(self.encoder_name, dtype=self.dtype,
                                name="encoder")(x, train)
        return StarDecoder(classes=self.classes,
                           deep_supervision=self.deep_supervision,
                           clf_head=self.clf_head, dtype=self.dtype,
                           name="decoder")(feats, x.shape[1:3], train)


# ---------------------------------------------------------------------------
# TransUNet
# ---------------------------------------------------------------------------

class ViTBlock(nn.Module):
    features: int
    heads: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, L, c = x.shape
        head_dim = self.features // self.heads
        y = nn.LayerNorm(dtype=self.dtype)(x)
        qkv = nn.Dense(3 * self.features, dtype=self.dtype,
                       param_dtype=jnp.float32)(y)
        qkv = qkv.reshape(n, L, 3, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(head_dim)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        o = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(n, L, self.features)
        x = x + nn.Dense(self.features, dtype=self.dtype,
                         param_dtype=jnp.float32)(o)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.features * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = jax.nn.gelu(y)
        return x + nn.Dense(self.features, dtype=self.dtype,
                            param_dtype=jnp.float32)(y)


class StdConv(nn.Module):
    """Weight-standardized conv (reference vit_res_encoder.py:18-26): the
    kernel is normalized over (H, W, Cin) per output channel, biased var."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features), jnp.float32)
        m = kernel.mean(axis=(0, 1, 2), keepdims=True)
        v = kernel.var(axis=(0, 1, 2), keepdims=True)  # biased, as torch
        ks = (kernel - m) * jax.lax.rsqrt(v + 1e-5)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), ks.astype(self.dtype),
            (self.strides, self.strides), self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class PreActBottleneck(nn.Module):
    """ResNetV2 bottleneck (vit_res_encoder.py:38-74): StdConv + GroupNorm,
    gn applied AFTER each conv (the torch port's order), per-channel
    GroupNorm on the projection."""

    cout: int
    cmid: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gn = lambda groups, name: nn.GroupNorm(num_groups=groups,
                                               epsilon=1e-6, dtype=self.dtype,
                                               name=name)
        residual = x
        if self.strides != 1 or x.shape[-1] != self.cout:
            residual = StdConv(self.cout, 1, self.strides, "VALID",
                               dtype=self.dtype, name="downsample")(x)
            residual = gn(self.cout, "gn_proj")(residual)
        y = nn.relu(gn(32, "gn1")(StdConv(self.cmid, 1, 1, "VALID",
                                          dtype=self.dtype, name="conv1")(x)))
        y = nn.relu(gn(32, "gn2")(StdConv(self.cmid, 3, self.strides,
                                          [(1, 1), (1, 1)], dtype=self.dtype,
                                          name="conv2")(y)))
        y = gn(32, "gn3")(StdConv(self.cout, 1, 1, "VALID", dtype=self.dtype,
                                  name="conv3")(y))
        return nn.relu(residual + y)


class ResNetV2Trunk(nn.Module):
    """The TransUNet-R50 hybrid trunk (vit_res_encoder.py:113-159):
    StdConv7×7/2 root + VALID 3×3/2 maxpool + three pre-act stages, with the
    reference's odd-size quirk reproduced exactly — the pool is unpadded, so
    the running map is one pixel short and each stage's skip feature is
    zero-padded bottom/right to the canonical H/4·2^-i size while the trunk
    continues at the odd size.

    Returns (final /16 map, [skip /8, skip /4, skip /2]).
    """

    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # GroupNorm is stateless
        width = int(64 * self.width_factor)
        in_size = x.shape[1]
        y = StdConv(width, 7, 2, [(3, 3), (3, 3)], dtype=self.dtype,
                    name="root_conv")(x)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="root_gn")(y)
        y = nn.relu(y)
        feats = [y]
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="VALID")
        stages = [(width * 4, width, 1), (width * 8, width * 2, 2),
                  (width * 16, width * 4, 2)]
        for si, (cout, cmid, stride) in enumerate(stages):
            for u in range(self.block_units[si]):
                y = PreActBottleneck(
                    cout, cmid, strides=stride if u == 0 else 1,
                    dtype=self.dtype, name=f"block{si + 1}_unit{u + 1}")(y)
            if si < 2:
                right = in_size // (4 * (si + 1))  # vit_res_encoder.py:146
                pad = right - y.shape[1]
                assert 0 <= pad < 3, (y.shape, right)
                feats.append(jnp.pad(
                    y, ((0, 0), (0, pad), (0, pad), (0, 0))) if pad else y)
        return y, feats[::-1]


class TransUnet(nn.Module):
    """ViT bottleneck + cascaded upsampler (reference transunet.py).

    ``hybrid=True`` (TransUnet_R50): a weight-standardized ResNetV2 trunk
    (StdConv + GroupNorm pre-act bottlenecks, blocks (3,4,9) — the official
    R50-ViT hybrid) provides the /2,/4,/8 skip features and the ViT runs on
    its /16 feature map; ``hybrid=False`` (TransUnet_B16): pure patch
    embedding, no skips.
    """

    hidden: int = 256
    depth: int = 4
    heads: int = 8
    hybrid: bool = True
    decoder_channels: Sequence[int] = (256, 128, 64, 16)
    classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, _ = x.shape
        skips = []
        if self.hybrid:
            trunk = ResNetV2Trunk(dtype=self.dtype, name="trunk")
            y, skips = trunk(x, train)  # /16, [/8, /4, /2]
            y = nn.Conv(self.hidden, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="patch_proj")(y)
        else:
            y = nn.Conv(self.hidden, (16, 16), strides=(16, 16),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="patch_embed")(x)
        nh, hh, ww, c = y.shape
        seq = y.reshape(nh, hh * ww, c)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hh * ww, c), jnp.float32)
        seq = seq + pos.astype(seq.dtype)
        for i in range(self.depth):
            seq = ViTBlock(self.hidden, self.heads, dtype=self.dtype,
                           name=f"vit{i}")(seq)
        seq = nn.LayerNorm(dtype=self.dtype)(seq)
        y = seq.reshape(nh, hh, ww, c)

        for i, ch in enumerate(self.decoder_channels):
            y = upsample2x(y)
            if i < len(skips):
                y = jnp.concatenate([y, skips[i]], axis=-1)
            y = ConvBNReLU(ch, 3, drop_block_prob=0.0, dtype=self.dtype,
                           name=f"dec{i}")(y, train)
        if y.shape[1] != H:
            y = jax.image.resize(y, (n, H, W, y.shape[-1]), "bilinear")
        return SegmentationHead(self.classes, dtype=self.dtype,
                                name="segmentation_head")(y)


# ---------------------------------------------------------------------------
# TransUnetV2 — the self_attention_cv variant (reference transunetv2.py)
# ---------------------------------------------------------------------------

class _SacvBottleneck(nn.Module):
    """Single ResNet bottleneck as in self_attention_cv's bottleneck_layer
    (reference transunetv2.py:45-47 uses one per stage, stride 2):
    1×1 → BN/ReLU → 3×3(stride) → BN/ReLU → 1×1 → BN, projection shortcut."""

    out_ch: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.out_ch // 4
        s = (self.stride, self.stride)
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = nn.relu(BatchNorm(dtype=self.dtype, name="bn1")(y, train))
        y = nn.Conv(width, (3, 3), strides=s, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = nn.relu(BatchNorm(dtype=self.dtype, name="bn2")(y, train))
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(y)
        y = BatchNorm(dtype=self.dtype, name="bn3")(y, train)
        sc = nn.Conv(self.out_ch, (1, 1), strides=s, use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="downsample")(x)
        sc = BatchNorm(dtype=self.dtype, name="bn_down")(sc, train)
        return nn.relu(y + sc)


class _SacvPostNormBlock(nn.Module):
    """Post-norm transformer block (self_attention_cv TransformerBlock,
    prenorm=False): x = LN(MHSA(x) + x); x = LN(MLP(x) + x)."""

    features: int
    heads: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, L, c = x.shape
        head_dim = self.features // self.heads
        qkv = nn.Dense(3 * self.features, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(n, L, 3, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(head_dim)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        o = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(n, L, self.features)
        o = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(o)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + o)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp1")(x)
        y = jax.nn.gelu(y)
        y = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


class TransUnetV2(nn.Module):
    """The self_attention_cv TransUnet variant (reference transunetv2.py).

    Distinct from :class:`TransUnet` (the official-paper R50/B16 hybrid):
    7×7/2 stem to 128ch, THREE single bottlenecks (×2 channels, /2 each) to
    1024ch at /16, a post-norm ViT (patch 1, dim 1024, 12 blocks, 4 heads,
    MLP 1024) over the /16 tokens, a 3×3 conv to 512, then Up blocks
    (bilinear ×2 + skip concat + single 3×3 conv+BN+ReLU) mirroring
    transunetv2.py:60-79's dec1-dec4 and the final 1×1 head.
    """

    classes: int = 1
    vit_blocks: int = 12
    vit_heads: int = 4
    vit_mlp: int = 1024
    inplanes: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, _ = x.shape
        vit_ch = self.inplanes * 8

        y = nn.Conv(self.inplanes, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="init_conv")(x)
        x2 = nn.relu(BatchNorm(dtype=self.dtype, name="init_bn")(y, train))
        x4 = _SacvBottleneck(self.inplanes * 2, dtype=self.dtype,
                             name="conv1")(x2, train)
        x8 = _SacvBottleneck(self.inplanes * 4, dtype=self.dtype,
                             name="conv2")(x4, train)
        x16 = _SacvBottleneck(vit_ch, dtype=self.dtype,
                              name="conv3")(x8, train)

        nh, hh, ww, c = x16.shape
        seq = x16.reshape(nh, hh * ww, c)
        # patch_dim=1 ViT: linear patch projection + learnable pos embedding
        seq = nn.Dense(vit_ch, dtype=self.dtype, param_dtype=jnp.float32,
                       name="project_patches")(seq)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hh * ww, vit_ch), jnp.float32)
        seq = seq + pos.astype(seq.dtype)
        for i in range(self.vit_blocks):
            seq = _SacvPostNormBlock(vit_ch, self.vit_heads, self.vit_mlp,
                                     dtype=self.dtype, name=f"vit{i}")(seq)
        y = seq.reshape(nh, hh, ww, vit_ch)

        def single_conv(y, out_ch, name):
            y = nn.Conv(out_ch, (3, 3), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_conv")(y)
            return nn.relu(BatchNorm(dtype=self.dtype,
                                     name=f"{name}_bn")(y, train))

        y = single_conv(y, 512, "vit_conv")
        for i, (skip, out_ch) in enumerate(
                [(x8, 256), (x4, 128), (x2, 64), (None, 16)]):
            b, h, w, cc = y.shape
            y = jax.image.resize(y, (b, 2 * h, 2 * w, cc), "bilinear")
            if skip is not None:
                y = jnp.concatenate([skip.astype(y.dtype), y], axis=-1)
            y = single_conv(y, out_ch, f"dec{i + 1}")
        return nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="head")(
                           y).astype(jnp.float32)
