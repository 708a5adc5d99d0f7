"""Model zoo registry.

Mirrors the reference registry surface (``src/main/archs/__init__.py:7-120``):
``MODEL_REGISTRY`` name → factory, ``get_model(name, params, training)`` with the
same inference-time demotions (clfhead/pretrained/encoder_weights/deep_supervision
forced off when ``training=False``), ``list_models()``, and
``get_preprocessing_fn(dataset_name, grayscale)`` with the per-dataset channel
statistics (archs/__init__.py:61-99 — these are dataset facts, reproduced verbatim).

The zoo is grown model-family by model-family; every entry here is a real, tested
flax implementation (no stubs).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .unet import Unet
from .unetplusplus import UnetPlusPlus
from .unetplusplusstar import UnetPlusPlusStar
from .attentionunet import AttentionUnet
from .fpn import FPN
from .deeplabv3plus import DeepLabV3Plus
from .unet3plus import UNet3Plus
from .classic import ClassicUNet, AttUNet, R2UNet, R2AttUNet, SAUnet
from .transformers import (SegformerStar, SwinformerStar, TransUnet,
                            TransUnetV2)
from .misc import (DcUnet, DoubleUnet, HEDUNet, HRNet, MedT,
                   ResAxialAttentionUNet, ResUnetPlusPlus, UneXt50,
                   UnetSEResNext101)
from .smp_extra import DeepLabV3, Linknet, MAnet, PAN, PSPNet

__all__ = ["MODEL_REGISTRY", "list_models", "get_model", "get_preprocessing_fn"]


def _factory(cls, **fixed):
    def make(**params):
        return _build(cls, {**fixed, **params})
    return make


def _build(cls, params: Dict[str, Any]):
    # translate reference param spellings
    aliases = {
        "clfhead": "clf_head",
        "encoder_weights": None,   # torch-pretrained source: not applicable
        "pretrained": None,
        "decoder_use_batchnorm": None,  # decoders are always BN here
        "encoder_depth": None,
        "activation": None,
        "num_transblocks": None,   # consumed via encoder_name configs
        "in_channels": None,
    }
    out: Dict[str, Any] = {}
    field_names = {f.name for f in dataclasses.fields(cls)}
    for k, v in params.items():
        k2 = aliases.get(k, k)
        if k2 is None:
            continue
        if k2 in field_names:
            out[k2] = v
    return cls(**out)


MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {
    # --- proposed architecture (reference unetplusplusstar.py) ---
    "unetplusplusstar": _factory(UnetPlusPlusStar),
    # --- UNet++ family (deep_supunetplusplus.py) ---
    "unetplusplus_deepsup": _factory(UnetPlusPlus),
    # --- plain UNets (unets.py:181-270 + smp.Unet path train.py:168-170) ---
    "Unet": _factory(Unet),
    "resnet18_unet32": _factory(Unet, encoder_name="resnet18"),
    "resnet34_unet32": _factory(Unet, encoder_name="resnet34"),
    "resnet50_unet32": _factory(Unet, encoder_name="resnet50"),
    "seresnet50_unet32": _factory(Unet, encoder_name="seresnet50"),
    "b4_unet32": _factory(Unet, encoder_name="efficientnet-b4"),
    "b2_effunet32": _factory(Unet, encoder_name="efficientnet-b2"),
    "b4_effunet32": _factory(Unet, encoder_name="efficientnet-b4"),
    # --- attention U-Nets (attentionunet.py:223-250) ---
    "resnet50_attunet": _factory(AttentionUnet, encoder_name="resnet50"),
    "seresnet50_attunet": _factory(AttentionUnet, encoder_name="seresnet50"),
    "efficientnetb2_attunet": _factory(AttentionUnet, encoder_name="efficientnet-b2"),
    "mobilenetv3_attunet": _factory(AttentionUnet, encoder_name="mobilenetv3"),
    "swin_tiny_attunet": _factory(AttentionUnet, encoder_name="swin_tiny"),
    "swin_small_attunet": _factory(AttentionUnet, encoder_name="swin_small"),
    # --- HRNet (hrnet.py:39-51) ---
    "hrnet18": _factory(HRNet, width=18),
    "hrnet34": _factory(HRNet, width=34),
    "hrnet48": _factory(HRNet, width=48),
    # --- DoubleU-Nets (doubleunet.py:177-187, dbunet.py) ---
    "resnet50_doubleunet": _factory(DoubleUnet, encoder_name="resnet50"),
    "efficientnetb2_doubleunet": _factory(DoubleUnet, encoder_name="efficientnet-b2"),
    "mobilenetv3_doubleunet": _factory(DoubleUnet, encoder_name="mobilenetv3"),
    "vgg_doubleunet": _factory(DoubleUnet, encoder_name="vgg"),
    # --- UneXt50 (unet.py:99+, mymodel.py) ---
    "unet_resnext50_ssl": _factory(UneXt50),
    # --- recurrent / spatial-attention (rcnn_unet.py, sa_unet.py) ---
    "rrcnn_unet": _factory(R2UNet),
    "sa_unet": _factory(SAUnet),
    "classic_unet": _factory(ClassicUNet),
    # --- HED family (hed.py:267+) ---
    "hed_unet": _factory(HEDUNet, block="double"),
    "hed_resunet": _factory(HEDUNet, block="res"),
    "hed_denseunet": _factory(HEDUNet, block="dense"),
    # --- FPN family (fpn.py:132-171) ---
    "b2_fpn_cat": _factory(FPN, encoder_name="efficientnet-b2", fpn_channels=128),
    "resnet34_fpncat128": _factory(FPN, encoder_name="resnet34", fpn_channels=128),
    "seresnext50_fpncat128": _factory(FPN, encoder_name="seresnext50", fpn_channels=128),
    "resnet152_fpncat256": _factory(FPN, encoder_name="resnet152", fpn_channels=256),
    # --- DeepLab (deeplab.py:47-53 + deep_supdeeplabv3plus.py) ---
    "resnet34_deeplab128": _factory(DeepLabV3Plus, encoder_name="resnet34"),
    "deeplabv3plus_deepsup": _factory(DeepLabV3Plus),
    "seresnext101_deeplab256": _factory(DeepLabV3Plus, encoder_name="seresnext101"),
    # --- TransUNet family (transunet.py:519-546, transunetv2.py) ---
    "transunet_r50": _factory(TransUnet, hybrid=True),
    "transunet_b16": _factory(TransUnet, hybrid=False),
    "TransUnet_V2": _factory(TransUnetV2),
    # --- UNet3+ (unet3plus.py:553-556) ---
    "Unet3Plus_Base": _factory(UNet3Plus),
    "Unet3Plus_DS": _factory(UNet3Plus, deep_supervision=True),
    # --- classic implementations (LeeJunHyun_impl.py:139-446) ---
    "LeeJunHyun_impl_att": _factory(AttUNet),
    "LeeJunHyun_impl_R2U_Net": _factory(R2UNet),
    "LeeJunHyun_impl_R2AttU_Net": _factory(R2AttUNet),
    # --- MedT axial family (axial_attentionunet.py:668-683) ---
    "axialatt_unet": _factory(ResAxialAttentionUNet, gated=False),
    "gated": _factory(ResAxialAttentionUNet, gated=True),
    "medt": _factory(MedT),
    "logo": _factory(MedT, patch_grid=2),
    "axialattwopo_unet": _factory(ResAxialAttentionUNet, gated=False, use_pos=False),
    # --- DC-UNet / ResUNet++ (dcunet.py, resunetplusplus.py) ---
    "dcunet": _factory(DcUnet),
    "resunetplusplus": _factory(ResUnetPlusPlus),
    # --- HuBMAP (hubmap_kaggle.py:113-241) ---
    "hubmap_kaggle": _factory(UnetSEResNext101),
    # --- transformer-star (segformerstar.py, swinformerstar.py) ---
    "SegFormerStar": _factory(SegformerStar),
    "SwinformerStar": _factory(SwinformerStar),
    # --- smp class-name reflection surface (reference train.py:167-179:
    # any `smp.<ClassName>` resolves by name with model_params) ---
    "UnetPlusPlus": _factory(UnetPlusPlus),
    "FPN": _factory(FPN),
    "DeepLabV3Plus": _factory(DeepLabV3Plus),
    "Linknet": _factory(Linknet),
    "PSPNet": _factory(PSPNet),
    "DeepLabV3": _factory(DeepLabV3),
    "PAN": _factory(PAN),
    "MAnet": _factory(MAnet),
}


def list_models():
    return list(MODEL_REGISTRY.keys())


def get_model(model_name: str, params: Optional[Dict[str, Any]] = None,
              training: bool = True, dtype=jnp.float32):
    """Registry factory with the reference's inference-time demotions
    (archs/__init__.py:104-120)."""
    try:
        model_fn = MODEL_REGISTRY[model_name]
    except KeyError:
        raise KeyError(
            f"Cannot find {model_name}, available options are {list_models()}")
    params = dict(params or {})
    if not training:
        # Demote unconditionally: the reference's configs always carry these
        # keys (clfhead/deep_supervision are required ctor args there), so its
        # key-presence check amounts to "always off at inference" — including
        # for registry entries that bake them on (Unet3Plus_DS, hubmap_kaggle).
        params.pop("clfhead", None)
        params["clf_head"] = False
        params["pretrained"] = False
        params["encoder_weights"] = None
        params["deep_supervision"] = False
    params["dtype"] = dtype
    return model_fn(**params)


# per-dataset channel statistics (reference archs/__init__.py:61-89)
DATASET_STATS = {
    "IDRiD": ([0.44976714, 0.2186806, 0.06459363],
              [0.33224553, 0.17116262, 0.086509705]),
    "FGADR": ([0.4554011, 0.2591345, 0.13285689],
              [0.28593522, 0.185085, 0.13528904]),
    "DDR": ([0.31897065, 0.19916488, 0.08322998],
            [0.32040685, 0.20822203, 0.114768185]),
    "DRIVE": ([0.49742976, 0.27066445, 0.16217253],
              [0.34794736, 0.18998094, 0.1084089]),
    "HRF": ([0.6273858, 0.20169912, 0.10424815],
            [0.2866019, 0.11408445, 0.060513902]),
    "CHASEDB1": ([0.4527923, 0.16221291, 0.028265305],
                 [0.36041078, 0.14167951, 0.036878455]),
}


def get_preprocessing_fn(dataset_name: str, grayscale: bool = False):
    """Return (fn, mean, std); fn maps [0,255] images to normalized floats
    (reference archs/__init__.py:61-99). Works on numpy or jnp arrays."""
    mean, std = DATASET_STATS.get(dataset_name, DATASET_STATS["IDRiD"])
    if grayscale:
        luma = (0.2989, 0.5870, 0.1140)
        mean = sum(m * w for m, w in zip(mean, luma))
        std = sum(s * w for s, w in zip(std, luma))

    def preprocessing(x, mean=mean, std=std):
        x = x / 255.0
        return (x - np.asarray(mean)) / np.asarray(std)

    return preprocessing, mean, std
