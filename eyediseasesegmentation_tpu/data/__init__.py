from .transforms import get_transform, TRANSFORM_REGISTRY
from .paths import lesion_dict, get_datapath, Lesion
from .datasets import OneLesionSegmentation, TestSegmentation, batch_iterator

__all__ = [
    "get_transform", "TRANSFORM_REGISTRY",
    "lesion_dict", "get_datapath", "Lesion",
    "OneLesionSegmentation", "TestSegmentation", "batch_iterator",
]
