"""Extended model zoo: build-forward shape checks for every registry family
(the reference's per-file __main__ smoke checks, SURVEY.md §4.1)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu import models as zoo


def _forward(model, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    return model.apply(variables, x, train=False)


def test_registry_covers_reference_names():
    """Every name in the reference MODEL_REGISTRY (archs/__init__.py:7-59)
    must exist here."""
    reference_names = [
        "resnet50_attunet", "seresnet50_attunet", "efficientnetb2_attunet",
        "mobilenetv3_attunet", "swin_tiny_attunet", "swin_small_attunet",
        "hrnet18", "hrnet34", "hrnet48",
        "resnet50_doubleunet", "efficientnetb2_doubleunet",
        "mobilenetv3_doubleunet", "vgg_doubleunet",
        "unet_resnext50_ssl", "rrcnn_unet", "sa_unet",
        "hed_unet", "hed_resunet", "hed_denseunet",
        "resnet18_unet32", "resnet34_unet32", "resnet50_unet32",
        "b4_unet32", "b4_effunet32", "b2_effunet32",
        "b2_fpn_cat", "seresnext50_fpncat128", "resnet34_fpncat128",
        "resnet152_fpncat256", "transunet_r50", "transunet_b16",
        "unetplusplusstar", "LeeJunHyun_impl_att", "LeeJunHyun_impl_R2U_Net",
        "LeeJunHyun_impl_R2AttU_Net", "Unet3Plus_Base", "Unet3Plus_DS",
        "axialatt_unet", "gated", "medt", "logo", "axialattwopo_unet",
        "dcunet", "resunetplusplus", "unetplusplus_deepsup", "hubmap_kaggle",
        "deeplabv3plus_deepsup", "TransUnet_V2", "SegFormerStar",
        "SwinformerStar",
    ]
    missing = [n for n in reference_names if n not in zoo.MODEL_REGISTRY]
    assert not missing, f"missing registry entries: {missing}"


FAMILIES = [
    ("b2_effunet32", {}),
    ("mobilenetv3_attunet", {}),
    ("hrnet18", {}),
    ("hed_unet", {"base": 8, "depth": 3}),
    ("hed_resunet", {"base": 8, "depth": 3}),
    ("hed_denseunet", {"base": 8, "depth": 3}),
    ("dcunet", {"filters": (8, 16, 32)}),
    ("resunetplusplus", {"filters": (8, 16, 32)}),
    ("unet_resnext50_ssl", {}),
    ("transunet_b16", {"hidden": 64, "depth": 1, "heads": 4}),
    ("TransUnet_V2", {"vit_blocks": 1, "vit_heads": 2, "vit_mlp": 64,
                      "inplanes": 16}),
]


@pytest.mark.parametrize("name,params", FAMILIES)
def test_extended_zoo_forward(name, params):
    out = _forward(zoo.get_model(name, params))
    assert out.shape == (1, 64, 64, 1), f"{name}: {out.shape}"


def test_hrnet_param_counts_match_timm():
    """Real HRNetV2 topology: param counts within 15% of the timm backbones
    the reference maps to (hrnet.py:39-51 → HRNetV2Encoder18/48)."""
    import numpy as np
    from functools import partial
    for name, timm_params in (("hrnet18", 9.6e6), ("hrnet48", 65.9e6)):
        model = zoo.get_model(name, {})
        shapes = jax.eval_shape(partial(model.init, train=False),
                                {"params": jax.random.PRNGKey(0)},
                                jnp.zeros((1, 64, 64, 3)))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(shapes["params"]))
        assert abs(n - timm_params) / timm_params < 0.15, (name, n)


def test_transunet_r50():
    out = _forward(zoo.get_model("transunet_r50",
                                 {"hidden": 64, "depth": 1, "heads": 4}))
    assert out.shape == (1, 64, 64, 1)


def test_doubleunet_variants():
    for enc in ("resnet50", "vgg"):
        out = _forward(zoo.get_model(f"{'resnet50' if enc == 'resnet50' else 'vgg'}_doubleunet",
                                     {"decoder_channels": (32, 16, 8, 8)}))
        assert out.shape == (1, 64, 64, 1)


def test_segformer_star_full_output():
    model = zoo.get_model("SegFormerStar",
                          {"encoder_name": "mit_b0", "deep_supervision": True,
                           "clf_head": True})
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    combined, deeps, clf = model.apply(variables, x, train=False)
    assert combined.shape == (1, 64, 64, 1)
    assert len(deeps) == 4
    assert clf.shape == (1, 1)


def test_swinformer_star():
    out = _forward(zoo.get_model("SwinformerStar",
                                 {"encoder_name": "swin_tiny"}),
                   shape=(1, 64, 64, 3))
    assert out.shape == (1, 64, 64, 1)


def test_swin_attunet():
    out = _forward(zoo.get_model("swin_tiny_attunet"))
    assert out.shape == (1, 64, 64, 1)


def test_medt_family():
    for name, params in (("axialatt_unet", {"base": 8}),
                         ("gated", {"base": 8}),
                         ("axialattwopo_unet", {"base": 8}),
                         ("medt", {"base": 8, "patch_grid": 2})):
        out = _forward(zoo.get_model(name, params))
        assert out.shape == (1, 64, 64, 1), name


def test_hubmap_clf_early_exit():
    model = zoo.get_model("hubmap_kaggle",
                          {"clf_head": True, "clf_threshold": 0.99,
                           "decoder_channels": 16})
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    logits, clf = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 64, 1) and clf.shape == (1, 1)
    # with an extreme threshold the mask must be suppressed to large negatives
    if float(jax.nn.sigmoid(clf)[0, 0]) < 0.99:
        assert float(jnp.max(logits)) <= -99.0


def test_stdconv_matches_torch():
    """Weight-standardized conv == the reference StdConv2d math
    (vit_res_encoder.py:18-26: biased var over (Cin,H,W) per out channel)."""
    import numpy as np
    import torch
    import torch.nn.functional as F
    from eyediseasesegmentation_tpu.models.transformers import StdConv

    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 10, 5).astype(np.float32)
    k = rng.randn(3, 3, 5, 7).astype(np.float32)

    mod = StdConv(7, 3, 1, [(1, 1), (1, 1)])
    out = mod.apply({"params": {"kernel": jnp.asarray(k)}}, jnp.asarray(x))

    w = torch.tensor(k.transpose(3, 2, 0, 1))  # OIHW
    v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
    w = (w - m) / torch.sqrt(v + 1e-5)
    ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), w, padding=1)
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
