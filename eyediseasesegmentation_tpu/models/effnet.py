"""EfficientNet / MobileNetV3 / DenseNet feature-pyramid encoders.

Native flax implementations standing in for the timm/pytorch_toolbelt encoders
the reference pulls for its UNet/attention-UNet/double-UNet factories
(unets.py:181-270, attentionunet.py:223-250, doubleunet.py:177-187).
All return the 6-level pyramid [x, /2, /4, /8, /16, /32].
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules.layers import BatchNorm, SEBlock

Dtype = Any


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excite."""

    features: int
    expand: int = 6
    kernel: int = 3
    strides: int = 1
    se_ratio: float = 0.25
    activation: str = "silu"  # 'silu' (effnet) | 'hardswish' (mobilenetv3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = jax.nn.silu if self.activation == "silu" else jax.nn.hard_swish
        cin = x.shape[-1]
        mid = cin * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
            y = BatchNorm(dtype=self.dtype)(y, train)
            y = act(y)
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding="SAME",
                    feature_group_count=mid, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = act(y)
        if self.se_ratio > 0:
            y = SEBlock(reduction=int(1 / self.se_ratio), dtype=self.dtype)(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        if self.strides == 1 and cin == self.features:
            y = y + x
        return y


# EfficientNet-B0 base stage spec: (expand, channels, repeats, stride, kernel)
_EFFNET_B0 = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
_EFFNET_SCALE = {"b0": (1.0, 1.0), "b2": (1.1, 1.2), "b4": (1.4, 1.8)}


def _round_filters(f, mult):
    f *= mult
    new = max(8, int(f + 4) // 8 * 8)
    if new < 0.9 * f:
        new += 8
    return int(new)


class EfficientNetEncoder(nn.Module):
    variant: str = "b0"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        wmult, dmult = _EFFNET_SCALE[self.variant]
        feats = [x]
        y = nn.Conv(_round_filters(32, wmult), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem")(x)
        y = BatchNorm(dtype=self.dtype, name="stem_bn")(y, train)
        y = jax.nn.silu(y)
        last_reduction = 2
        for si, (expand, ch, reps, stride, kernel) in enumerate(_EFFNET_B0):
            ch = _round_filters(ch, wmult)
            reps = int(math.ceil(reps * dmult))
            for i in range(reps):
                s = stride if i == 0 else 1
                if s == 2:
                    feats.append(y)
                y = MBConv(ch, expand, kernel, s, dtype=self.dtype,
                           name=f"stage{si}_block{i}")(y, train)
        feats.append(y)
        return feats  # [x, /2, /4, /8, /16, /32]


class MobileNetV3Encoder(nn.Module):
    """Compact MobileNetV3-large-style encoder."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        feats = [x]
        y = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem")(x)
        y = BatchNorm(dtype=self.dtype, name="stem_bn")(y, train)
        y = jax.nn.hard_swish(y)
        spec = [  # (features, expand, kernel, stride)
            (16, 1, 3, 1), (24, 4, 3, 2), (24, 3, 3, 1),
            (40, 3, 5, 2), (40, 3, 5, 1),
            (80, 6, 3, 2), (80, 2, 3, 1), (112, 6, 3, 1),
            (160, 6, 5, 2), (160, 6, 5, 1),
        ]
        for i, (ch, expand, kernel, stride) in enumerate(spec):
            if stride == 2:
                feats.append(y)
            y = MBConv(ch, expand, kernel, stride, activation="hardswish",
                       dtype=self.dtype, name=f"block{i}")(y, train)
        feats.append(y)
        return feats


class DenseBlock(nn.Module):
    layers: int
    growth: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.layers):
            y = BatchNorm(dtype=self.dtype, name=f"bn{i}a")(x, train)
            y = nn.relu(y)
            y = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}a")(y)
            y = BatchNorm(dtype=self.dtype, name=f"bn{i}b")(y, train)
            y = nn.relu(y)
            y = nn.Conv(self.growth, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}b")(y)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class DenseNetEncoder(nn.Module):
    """DenseNet-121 feature pyramid."""

    block_layers: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        feats = [x]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(x)
        y = BatchNorm(dtype=self.dtype, name="stem_bn")(y, train)
        y = nn.relu(y)
        feats.append(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, layers in enumerate(self.block_layers):
            y = DenseBlock(layers, self.growth, dtype=self.dtype,
                           name=f"dense{i}")(y, train)
            if i < len(self.block_layers) - 1:
                feats.append(y)
                # transition: 1x1 halve channels + avgpool 2
                y = BatchNorm(dtype=self.dtype, name=f"trans{i}_bn")(y, train)
                y = nn.relu(y)
                y = nn.Conv(y.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"trans{i}_conv")(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        feats.append(y)
        return feats
