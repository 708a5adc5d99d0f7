from .tta import TTAPredictor, test_tta, tta_patches, load_model_for_inference
from .ensemble import predict as ensemble_predict

__all__ = ["TTAPredictor", "test_tta", "tta_patches", "load_model_for_inference",
           "ensemble_predict"]
