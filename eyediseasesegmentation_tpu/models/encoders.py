"""Feature-pyramid encoders (flax, NHWC).

The reference pulls encoders from pytorch_toolbelt / timm / smp. The TPU build
implements the family natively: a generic ResNet encoder (basic/bottleneck, with
optional squeeze-excite and grouped convs for the SE-ResNeXt variants), plus the
proposed BoTSER50 — an SE-ResNet50 whose layer4 is replaced by axial-attention
blocks (reference unetplusplusstar.py:279-394).

Every encoder returns the 6-level feature list
``[x, c0(/2), c1(/4), c2(/8), c3(/16), c4(/32)]`` matching the reference's
``out_channels`` convention (e.g. BoTSER50: [3, 64, 256, 512, 1024, 2048],
unetplusplusstar.py:330).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .modules.layers import BatchNorm, SEBlock
from .modules.axial import AxialAttentionBlock

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    use_se: bool = False
    frozen_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: BatchNorm(dtype=self.dtype, frozen=self.frozen_bn, name=name)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = nn.relu(bn("bn1")(y, train))
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = bn("bn2")(y, train)
        if self.use_se:
            y = SEBlock(dtype=self.dtype, name="se")(y)
        if x.shape[-1] != self.features or self.strides != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.strides, self.strides),
                        use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                        name="down_conv")(x)
            x = bn("down_bn")(x, train)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    features: int  # inner width; output = out_features or 4x
    strides: int = 1
    groups: int = 1
    use_se: bool = False
    frozen_bn: bool = False
    out_features: int = 0  # 0 => features * expansion
    dtype: Dtype = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: BatchNorm(dtype=self.dtype, frozen=self.frozen_bn, name=name)
        out_ch = self.out_features or self.features * self.expansion
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = nn.relu(bn("bn1")(y, train))
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    feature_group_count=self.groups,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = nn.relu(bn("bn2")(y, train))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(y)
        y = bn("bn3")(y, train)
        if self.use_se:
            y = SEBlock(dtype=self.dtype, name="se")(y)
        if x.shape[-1] != out_ch or self.strides != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.strides, self.strides),
                        use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                        name="down_conv")(x)
            x = bn("down_bn")(x, train)
        return nn.relu(y + x)


class _StemConv(nn.Module):
    """7×7 stride-2 stem conv with the same param tree as nn.Conv
    ('kernel', HWIO) and exact s2d fast paths (ops/packed.stem7_s2d /
    stem7_s2d2). mode: 'normal' | 's2d' (logical output) | 's2d2'
    (double-packed input, f4-PACKED output — caller runs BN packed and
    depth_to_space's afterwards; the measured-fastest form on v5e)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str = "normal"):
        import jax as _jax

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, x.shape[-1], self.features), jnp.float32)
        if mode == "s2d2":
            from ..ops.packed import stem7_s2d2
            return stem7_s2d2(x, kernel, dtype=self.dtype)
        if mode == "s2d":
            from ..ops.packed import stem7_s2d
            return stem7_s2d(x, kernel, dtype=self.dtype)
        return _jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (2, 2),
            ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNetEncoder(nn.Module):
    """Generic ResNet-family encoder producing the 6-level feature pyramid."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    use_se: bool = False
    groups: int = 1
    stem_width: int = 64
    num_stages: int = 4
    frozen_bn: bool = False
    # bottleneck inner width multiplier: 1.0 for ResNet, 2.0 for the
    # ResNeXt-32x4d family (torch width = planes*(4/64)*32 = 2*planes) —
    # required for pretrained se_resnext weight import to be shape-exact
    width_factor: float = 1.0
    # eval-only exact s2d rewrite of the 7×7/2 stem (ops/packed.stem7_s2d,
    # ~10→~2 ms on v5e at 8×1024²); None = auto (enabled on TPU)
    fast_inference: Any = None
    # per-block gradient rematerialization under train (memory/compute trade)
    remat: bool = False
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> List[int]:
        exp = 4 if self.block == "bottleneck" else 1
        chans = [3, self.stem_width]
        for i in range(self.num_stages):
            chans.append(self.stem_width * (2 ** i) * exp)
        return chans

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax as _jax

        feats = [x]
        fast = (_jax.default_backend() == "tpu"
                if self.fast_inference is None else self.fast_inference)
        fast = fast and not train and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        # stem: conv7x7 s2 + BN + ReLU (pool applied before stage 1, feature
        # extracted pre-pool — reference unetplusplusstar.py:286-287).
        # NOTE: the double-s2d stem (stem7_s2d2, 'f16-in') wins in isolation
        # (1.21 vs 3.45 ms conv-only) but LOSES end-to-end with its BN+d2s
        # chain (7.0-8.5 vs 6.2 ms measured on v5e) — single s2d stays.
        y = _StemConv(self.stem_width, dtype=self.dtype,
                      name="stem_conv")(x, "s2d" if fast else "normal")
        y = BatchNorm(dtype=self.dtype, frozen=self.frozen_bn,
                      name="stem_bn")(y, train)
        y = nn.relu(y)
        feats.append(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.remat and train:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        for stage, n_blocks in enumerate(self.stage_sizes[: self.num_stages]):
            planes = self.stem_width * (2 ** stage)
            width = int(planes * self.width_factor)
            for i in range(n_blocks):
                strides = 2 if (i == 0 and stage > 0) else 1
                kwargs = dict(use_se=self.use_se, frozen_bn=self.frozen_bn,
                              dtype=self.dtype)
                if block_cls is Bottleneck:
                    kwargs["groups"] = self.groups
                    kwargs["out_features"] = planes * Bottleneck.expansion
                y = block_cls(width, strides=strides,
                              name=f"layer{stage + 1}_block{i}", **kwargs)(y, train)
            feats.append(y)
        return feats


class BoTSER50Encoder(nn.Module):
    """SE-ResNet50 stem+layers1-3 with layer4 replaced by axial-attention blocks
    (reference BoTSER50, unetplusplusstar.py:279-352).

    layer4 = first_block(1024→2048, downsample, dim=2·base_dim) followed by the
    SAME axial block applied twice (the reference reuses one module instance —
    weights shared; nn.Sequential(first_block, block, block), l.322-327).

    ``pretrained`` freezes BN statistics in layers 0-3 (set_bn_eval semantics).
    """

    base_dim: int = 32
    use_axial: bool = True
    num_transblocks: int = 3  # kept for config parity (layer4 depth is fixed at 3)
    pretrained: bool = False
    fast_inference: Any = None  # s2d stem rewrite; None = auto (TPU)
    remat: bool = False  # per-block gradient remat under train
    dtype: Dtype = jnp.float32

    out_channels: Tuple[int, ...] = (3, 64, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ResNetEncoder(
            stage_sizes=(3, 4, 6, 3), block="bottleneck", use_se=True,
            num_stages=3, frozen_bn=self.pretrained,
            fast_inference=self.fast_inference, remat=self.remat,
            dtype=self.dtype,
            name="seresnet",
        )
        feats = backbone(x, train)  # [x, c0, c1(256,/4), c2(512,/8), c3(1024,/16)]
        y = feats[-1]
        if self.use_axial:
            axial_cls = (nn.remat(AxialAttentionBlock, static_argnums=(2,))
                         if self.remat and train else AxialAttentionBlock)
            first_block = axial_cls(
                in_channels=1024, out_channels=2048, down_sample=True,
                dim=self.base_dim * 2, heads=8, dtype=self.dtype, name="layer4_first")
            shared_block = axial_cls(
                in_channels=2048, out_channels=2048, down_sample=False,
                dim=self.base_dim, heads=8, dtype=self.dtype, name="layer4_shared")
            y = first_block(y, train)
            y = shared_block(y, train)
            y = shared_block(y, train)  # second call: same instance => shared params
        else:
            # 'BoTSER50_Imagenet' (use_axial=False): the reference's else
            # branch is dead code — it references `first_block`, defined only
            # under use_axial, so constructing it raises NameError
            # (unetplusplusstar.py:311-328). We substitute a working stride-2
            # SE-bottleneck stage.
            for i in range(3):
                y = Bottleneck(512, strides=2 if i == 0 else 1, use_se=True,
                               dtype=self.dtype, name=f"layer4_block{i}")(y, train)
        feats.append(y)
        return feats


class SwinPyramidEncoder(nn.Module):
    """Swin backbone adapted to the 6-level pyramid interface the U-Net
    decoders expect: a conv stem supplies the /2 skip, the Swin stages supply
    /4../32 (used by swin_tiny/swin_small attention-UNets,
    reference attentionunet.py:223-250)."""

    variant: str = "swin_tiny"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .transformers import SwinTransformer

        stem = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME",
                       use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="stem")(x)
        stem = BatchNorm(dtype=self.dtype, name="stem_bn")(stem, train)
        stem = nn.relu(stem)
        feats = SwinTransformer(self.variant, dtype=self.dtype,
                                name="swin")(x, train)
        return [x, stem] + feats


# --- encoder registry -------------------------------------------------------

ENCODER_CONFIGS = {
    # the 5 BoTSER50 configs of unetplusplusstar.py:370-394
    "BoTSER50_Axial_Imagenet": dict(pretrained=True, use_axial=True, num_transblocks=1),
    "BoTSER50_Axial_Imagenet_2": dict(pretrained=True, use_axial=True, num_transblocks=2),
    "BoTSER50_Axial_Imagenet_3": dict(pretrained=True, use_axial=True, num_transblocks=3),
    "BoTSER50_Axial_scratch": dict(pretrained=False, use_axial=True),
    "BoTSER50_Imagenet": dict(pretrained=True, use_axial=False),
}

RESNET_CONFIGS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block="basic"),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), block="basic"),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), block="bottleneck"),
    "resnet101": dict(stage_sizes=(3, 4, 23, 3), block="bottleneck"),
    "resnet152": dict(stage_sizes=(3, 8, 36, 3), block="bottleneck"),
    "seresnet50": dict(stage_sizes=(3, 4, 6, 3), block="bottleneck", use_se=True),
    "seresnext50": dict(stage_sizes=(3, 4, 6, 3), block="bottleneck", use_se=True,
                        groups=32, width_factor=2.0),
    "seresnext101": dict(stage_sizes=(3, 4, 23, 3), block="bottleneck", use_se=True,
                         groups=32, width_factor=2.0),
}


def get_encoder(name: str, base_dim: int = 32, frozen_bn: bool = False,
                dtype: Dtype = jnp.float32, module_name: str = "encoder",
                fast_inference=None, remat: bool = False):
    """Build an encoder module + its out_channels list by registry name."""
    if name in ENCODER_CONFIGS:
        cfg = ENCODER_CONFIGS[name]
        enc = BoTSER50Encoder(base_dim=base_dim, dtype=dtype, name=module_name,
                              fast_inference=fast_inference, remat=remat, **cfg)
        return enc, list(enc.out_channels)
    if name in RESNET_CONFIGS:
        enc = ResNetEncoder(frozen_bn=frozen_bn, dtype=dtype, name=module_name,
                            fast_inference=fast_inference, remat=remat,
                            **RESNET_CONFIGS[name])
        return enc, enc.out_channels
    if name in ("efficientnet-b0", "efficientnet-b2", "efficientnet-b4"):
        from .effnet import EfficientNetEncoder, _round_filters, _EFFNET_SCALE
        variant = name.split("-")[1]
        enc = EfficientNetEncoder(variant=variant, dtype=dtype, name=module_name)
        w = _EFFNET_SCALE[variant][0]
        # /2 feature is stage0's output (pre-downsample append)
        chans = [3] + [_round_filters(c, w) for c in (16, 24, 40, 112, 320)]
        return enc, chans
    if name == "mobilenetv3":
        from .effnet import MobileNetV3Encoder
        return (MobileNetV3Encoder(dtype=dtype, name=module_name),
                [3, 16, 24, 40, 112, 160])
    if name == "densenet121":
        from .effnet import DenseNetEncoder
        return (DenseNetEncoder(dtype=dtype, name=module_name),
                [3, 64, 256, 512, 1024, 1024])
    if name in ("swin_tiny", "swin_small"):
        enc = SwinPyramidEncoder(variant=name, dtype=dtype, name=module_name)
        from .transformers import SWIN_CONFIGS
        dims = SWIN_CONFIGS[name]["dims"]
        return enc, [3, 64] + list(dims)
    raise KeyError(f"Unknown encoder '{name}'. Options: "
                   f"{sorted(ENCODER_CONFIGS) + sorted(RESNET_CONFIGS)} + "
                   f"efficientnet-b0/b2/b4, mobilenetv3, densenet121")
