from .layers import (
    ConvBNReLU,
    Conv2d,
    DepthwiseSeparableConv2d,
    DropBlock2d,
    SegmentationHead,
    ClassificationHead,
    SCSEAttention,
    Attention,
    SEBlock,
    CBAMSpatial,
    CBAMChannel,
    CBAM,
    AttentionGate,
    ASPP,
    DoubleConv,
)
from .axial import (
    RelativePosEnc2D,
    AxialAttention,
    CrossAxialAttention,
    AxialAttentionBlock,
)

__all__ = [
    "ConvBNReLU", "Conv2d", "DepthwiseSeparableConv2d",
    "DropBlock2d", "SegmentationHead", "ClassificationHead",
    "SCSEAttention", "Attention", "SEBlock", "CBAMSpatial", "CBAMChannel", "CBAM",
    "AttentionGate", "ASPP", "DoubleConv",
    "RelativePosEnc2D", "AxialAttention", "CrossAxialAttention", "AxialAttentionBlock",
]
