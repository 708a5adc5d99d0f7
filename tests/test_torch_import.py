"""PyTorch→JAX weight importer: numerical equivalence against a torch replica."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eyediseasesegmentation_tpu.models.encoders import ResNetEncoder  # noqa: E402
from eyediseasesegmentation_tpu.utils import torch_import as TI  # noqa: E402


class TorchSEBottleneck(tnn.Module):
    """senet-style SE bottleneck (test oracle, senet naming via state_dict keys)."""

    def __init__(self, cin, width, stride=1, reduction=16, out=None,
                 groups=1, downsample=True):
        super().__init__()
        out = out or width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                bias=False, groups=groups)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.se_module = tnn.Module()
        self.se_module.fc1 = tnn.Conv2d(out, out // reduction, 1)
        self.se_module.fc2 = tnn.Conv2d(out // reduction, out, 1)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, out, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        s = torch.nn.functional.adaptive_avg_pool2d(y, 1)
        s = torch.relu(self.se_module.fc1(s))
        s = torch.sigmoid(self.se_module.fc2(s))
        y = y * s
        sc = self.downsample(x) if self.downsample is not None else x
        return torch.relu(y + sc)


class TorchStem(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.pool = tnn.MaxPool2d(3, stride=2, padding=1)

    def forward(self, x):
        return self.pool(torch.relu(self.bn1(self.conv1(x))))


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    stem = TorchStem().eval()
    block = TorchSEBottleneck(64, 64).eval()
    # randomize BN stats so eval mode is non-trivial
    for m in list(stem.modules()) + list(block.modules()):
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    return stem, block


def _state_dict(stem, block):
    sd = {}
    for k, v in stem.state_dict().items():
        sd[f"layer0.{k}"] = v
    for k, v in block.state_dict().items():
        sd[f"layer1.0.{k}"] = v
    return sd


def test_conv_and_dense_layout():
    w = torch.arange(2 * 3 * 3 * 3, dtype=torch.float32).reshape(2, 3, 3, 3)
    hwio = TI.conv_kernel(w)
    assert hwio.shape == (3, 3, 3, 2)
    lin = torch.arange(6, dtype=torch.float32).reshape(2, 3)
    assert TI.dense_kernel(lin).shape == (3, 2)


def test_imported_encoder_matches_torch(torch_net):
    stem, block = torch_net
    enc = ResNetEncoder(stage_sizes=(1,), block="bottleneck", use_se=True,
                        num_stages=1, dtype=jnp.float32)
    x_np = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def unfreeze(d):
        return {k: unfreeze(v) for k, v in d.items()} if hasattr(d, "items") else d

    params, bs = unfreeze(params), unfreeze(bs)
    report = TI.import_se_resnet50(_state_dict(stem, block), params, bs,
                                   prefix=(), num_stages=1)
    assert not report["missing_in_jax"], report["missing_in_jax"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert len(report["loaded"]) > 20

    feats = enc.apply({"params": params, "batch_stats": bs},
                      jnp.asarray(x_np), train=False)
    got = np.asarray(feats[-1])  # stage-1 output

    with torch.no_grad():
        t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        want = block(stem(t)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def _randomize_bn(modules):
    for m in modules:
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


class TorchSEResNet50Trunk(tnn.Module):
    """Full senet se_resnet50 layers 0-3 (the part BoTSER50 imports,
    reference unetplusplusstar.py:282-287)."""

    def __init__(self):
        super().__init__()
        self.stem = TorchStem()
        stage_sizes = {1: 3, 2: 4, 3: 6}
        self.stages = tnn.ModuleList()
        cin = 64
        for s, n in stage_sizes.items():
            width = 64 * 2 ** (s - 1)
            blocks = []
            for b in range(n):
                blocks.append(TorchSEBottleneck(
                    cin, width, stride=2 if (b == 0 and s > 1) else 1,
                    downsample=(b == 0)))
                cin = width * 4
            self.stages.append(tnn.ModuleList(blocks))

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            for blk in stage:
                x = blk(x)
        return x

    def senet_state_dict(self):
        sd = {}
        for k, v in self.stem.state_dict().items():
            sd[f"layer0.{k}"] = v
        for si, stage in enumerate(self.stages):
            for bi, blk in enumerate(stage):
                for k, v in blk.state_dict().items():
                    sd[f"layer{si + 1}.{bi}.{k}"] = v
        return sd


def test_full_se_resnet50_import_matches_torch():
    """End-to-end: a complete se_resnet50-layout state_dict imported into the
    BoTSER50 backbone matches the torch forward (VERDICT #3 done-criterion)."""
    torch.manual_seed(1)
    trunk = TorchSEResNet50Trunk().eval()
    _randomize_bn(trunk.modules())

    enc = ResNetEncoder(stage_sizes=(3, 4, 6, 3), block="bottleneck",
                        use_se=True, num_stages=3, dtype=jnp.float32)
    x_np = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)

    new_vars, report = TI.import_torch_checkpoint(
        trunk.senet_state_dict(), variables, arch="se_resnet50",
        encoder_key="params_has_no_encoder_key_so_fall_back")
    assert not report["missing_in_jax"], report["missing_in_jax"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["unused_torch"], report["unused_torch"][:5]
    # everything below layer4 loaded: 3 stages x (conv/bn x3 + se x2 + ds)
    assert len(report["loaded"]) > 250

    feats = enc.apply({"params": new_vars["params"],
                       "batch_stats": new_vars["batch_stats"]},
                      jnp.asarray(x_np), train=False)
    got = np.asarray(feats[-1])
    with torch.no_grad():
        want = trunk(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_seresnext_grouped_import_matches_torch():
    """se_resnext 32x4d block: grouped 3×3 conv import is layout-exact
    (reference hubmap_kaggle.py:124 loads se_resnext101)."""
    torch.manual_seed(2)
    stem = TorchStem().eval()
    # resnext101 layer1 block0: width 128 (=2x planes), groups 32, out 256
    block = TorchSEBottleneck(64, 128, out=256, groups=32).eval()
    _randomize_bn(list(stem.modules()) + list(block.modules()))

    enc = ResNetEncoder(stage_sizes=(1,), block="bottleneck", use_se=True,
                        groups=32, width_factor=2.0, num_stages=1,
                        dtype=jnp.float32)
    x_np = np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)

    sd = {f"layer0.{k}": v for k, v in stem.state_dict().items()}
    sd.update({f"layer1.0.{k}": v for k, v in block.state_dict().items()})
    new_vars, report = TI.import_torch_checkpoint(
        sd, variables, arch="se_resnext101")
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing_in_jax"], report["missing_in_jax"]

    feats = enc.apply({"params": new_vars["params"],
                       "batch_stats": new_vars["batch_stats"]},
                      jnp.asarray(x_np), train=False)
    with torch.no_grad():
        want = block(stem(torch.from_numpy(x_np.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(feats[-1]),
                               want.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_rel_bias_table_resize():
    """Swin relative-position-bias bicubic resize (reference
    checkpoint.py:229-243): identity when sizes match, exact shape + finite
    values + corner preservation-ish when resized."""
    t = np.random.RandomState(0).randn(13 * 13, 4).astype(np.float32)
    same = TI.resize_rel_bias_table(t, 13 * 13)
    np.testing.assert_array_equal(same, t)
    small = TI.resize_rel_bias_table(t, 7 * 7)
    assert small.shape == (49, 4)
    assert np.isfinite(small).all()
    # constant tables resize to the same constant
    const = np.full((169, 2), 3.5, np.float32)
    out = TI.resize_rel_bias_table(const, 25)
    np.testing.assert_allclose(out, 3.5, rtol=1e-5)


def test_swin_import_covers_tree():
    """Official-Swin-layout state_dict maps onto the flax SwinTransformer:
    every block's qkv/proj/mlp/norms + interpolated bias tables load."""
    from eyediseasesegmentation_tpu.models.transformers import SwinTransformer

    model = SwinTransformer("swin_tiny")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # synthetic official-layout checkpoint (window 7 tables: 169 rows)
    dims = (96, 192, 384, 768)
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 24)
    rng = np.random.RandomState(0)
    sd = {
        "patch_embed.proj.weight": rng.randn(96, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(96).astype(np.float32),
        "patch_embed.norm.weight": rng.randn(96).astype(np.float32),
        "patch_embed.norm.bias": rng.randn(96).astype(np.float32),
    }
    for s, (dim, depth, h) in enumerate(zip(dims, depths, heads)):
        if s > 0:
            sd[f"layers.{s - 1}.downsample.reduction.weight"] = (
                rng.randn(dim, 4 * dims[s - 1]).astype(np.float32))
            sd[f"layers.{s - 1}.downsample.norm.weight"] = (
                rng.randn(4 * dims[s - 1]).astype(np.float32))
            sd[f"layers.{s - 1}.downsample.norm.bias"] = (
                rng.randn(4 * dims[s - 1]).astype(np.float32))
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            sd[f"{p}.norm1.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.norm1.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.norm2.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.norm2.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32)
            sd[f"{p}.attn.qkv.bias"] = rng.randn(3 * dim).astype(np.float32)
            sd[f"{p}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32)
            sd[f"{p}.attn.proj.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * dim, dim).astype(np.float32)
            sd[f"{p}.mlp.fc1.bias"] = rng.randn(4 * dim).astype(np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim).astype(np.float32)
            sd[f"{p}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.attn.relative_position_bias_table"] = (
                rng.randn(169, h).astype(np.float32))
            sd[f"{p}.attn.relative_position_index"] = np.zeros((49, 49), np.int64)

    new_vars, report = TI.import_torch_checkpoint(sd, variables,
                                                  arch="swin_tiny")
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["missing_in_jax"], report["missing_in_jax"][:5]
    assert not report["unused_torch"], report["unused_torch"][:5]
    # model still runs with imported params
    feats = model.apply(new_vars, x, train=False)
    assert feats[-1].shape == (1, 2, 2, 768)


def test_flagship_bootstrap_from_pretrained(tmp_path):
    """The flagship (BoTSER50 encoder) starts from imported se_resnet50
    weights via the Trainer config path (encoder_weights)."""
    from eyediseasesegmentation_tpu import models as zoo

    torch.manual_seed(3)
    trunk = TorchSEResNet50Trunk()
    ckpt = tmp_path / "se_resnet50.pth"
    torch.save(trunk.senet_state_dict(), ckpt)

    model = zoo.get_model(
        "unetplusplusstar",
        {"encoder_name": "BoTSER50_Axial_Imagenet_3", "base_dim": 2,
         "classes": 1}, training=False, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    from functools import partial
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)

    before = np.asarray(
        variables["params"]["encoder"]["seresnet"]["stem_conv"]["kernel"])
    new_vars, report = TI.import_torch_checkpoint(str(ckpt), variables,
                                                  arch="se_resnet50")
    after = np.asarray(
        new_vars["params"]["encoder"]["seresnet"]["stem_conv"]["kernel"])
    assert not np.allclose(before, after)
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["missing_in_jax"], report["missing_in_jax"][:5]
    want = TI.conv_kernel(trunk.senet_state_dict()["layer0.conv1.weight"])
    np.testing.assert_allclose(after, want, rtol=1e-6)
    # forward still valid from the imported state
    out = model.apply(new_vars, x, train=False)
    if isinstance(out, tuple):
        out = out[0]
    assert out.shape == (1, 64, 64, 1)
    assert bool(jnp.isfinite(out).all())


def test_load_torch_checkpoint_unwrap(tmp_path, torch_net):
    stem, block = torch_net
    sd = _state_dict(stem, block)
    wrapped = {"model_state_dict": {f"module.{k}": v for k, v in sd.items()}}
    p = tmp_path / "ckpt.pth"
    torch.save(wrapped, p)
    loaded = TI.load_torch_checkpoint(p)
    assert set(loaded) == set(sd)


def test_mit_import_covers_tree_and_matches_torch_block():
    """Official Segformer/MixViT layout maps onto MixVisionTransformer
    (segformerstar.py:139-347 modules, loaded at l.401-414), and a full
    torch oracle of one SR-attention block matches the flax forward."""
    import torch
    import torch.nn.functional as F
    from eyediseasesegmentation_tpu.models.transformers import (
        MIT_CONFIGS, MixVisionTransformer)

    model = MixVisionTransformer("mit_b0")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    dims = MIT_CONFIGS["mit_b0"]["dims"]
    depths = MIT_CONFIGS["mit_b0"]["depths"]
    srs = (8, 4, 2, 1)
    rng = np.random.RandomState(0)

    def r(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    sd = {}
    for s, (dim, depth) in enumerate(zip(dims, depths)):
        cin = 3 if s == 0 else dims[s - 1]
        patch = 7 if s == 0 else 3
        sd[f"patch_embed{s + 1}.proj.weight"] = r(dim, cin, patch, patch)
        sd[f"patch_embed{s + 1}.proj.bias"] = r(dim)
        sd[f"patch_embed{s + 1}.norm.weight"] = r(dim)
        sd[f"patch_embed{s + 1}.norm.bias"] = r(dim)
        for i in range(depth):
            p = f"block{s + 1}.{i}"
            for nm in ("norm1", "norm2"):
                sd[f"{p}.{nm}.weight"] = r(dim)
                sd[f"{p}.{nm}.bias"] = r(dim)
            sd[f"{p}.attn.q.weight"] = r(dim, dim)
            sd[f"{p}.attn.q.bias"] = r(dim)
            sd[f"{p}.attn.kv.weight"] = r(2 * dim, dim)
            sd[f"{p}.attn.kv.bias"] = r(2 * dim)
            sd[f"{p}.attn.proj.weight"] = r(dim, dim)
            sd[f"{p}.attn.proj.bias"] = r(dim)
            if srs[s] > 1:
                sd[f"{p}.attn.sr.weight"] = r(dim, dim, srs[s], srs[s])
                sd[f"{p}.attn.sr.bias"] = r(dim)
                sd[f"{p}.attn.norm.weight"] = r(dim)
                sd[f"{p}.attn.norm.bias"] = r(dim)
            sd[f"{p}.mlp.fc1.weight"] = r(4 * dim, dim)
            sd[f"{p}.mlp.fc1.bias"] = r(4 * dim)
            sd[f"{p}.mlp.dwconv.dwconv.weight"] = r(4 * dim, 1, 3, 3)
            sd[f"{p}.mlp.dwconv.dwconv.bias"] = r(4 * dim)
            sd[f"{p}.mlp.fc2.weight"] = r(dim, 4 * dim)
            sd[f"{p}.mlp.fc2.bias"] = r(dim)
        sd[f"norm{s + 1}.weight"] = r(dim)
        sd[f"norm{s + 1}.bias"] = r(dim)

    new_vars, report = TI.import_torch_checkpoint(sd, variables, arch="mit_b0",
                                                  encoder_key="params")
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["missing_in_jax"], report["missing_in_jax"][:5]
    assert not report["unused_torch"], report["unused_torch"][:5]
    feats = model.apply(new_vars, x, train=False)
    assert feats[-1].shape == (1, 2, 2, dims[-1])

    # ---- torch oracle for stage-0 block 0 (the SR-attention + Mix-FFN) ----
    dim, sr, heads = dims[0], srs[0], 1
    h = w = 16
    seq = (rng.randn(1, h * w, dim) * 0.5).astype(np.float32)

    def t(name):
        return torch.tensor(sd[name])

    xt = torch.tensor(seq)
    y = F.layer_norm(xt, (dim,), t("block1.0.norm1.weight"),
                     t("block1.0.norm1.bias"))
    q = F.linear(y, t("block1.0.attn.q.weight"), t("block1.0.attn.q.bias"))
    y2d = y.transpose(1, 2).reshape(1, dim, h, w)
    y2d = F.conv2d(y2d, t("block1.0.attn.sr.weight"),
                   t("block1.0.attn.sr.bias"), stride=sr)
    kv_in = y2d.reshape(1, dim, -1).transpose(1, 2)
    kv_in = F.layer_norm(kv_in, (dim,), t("block1.0.attn.norm.weight"),
                         t("block1.0.attn.norm.bias"))
    kv = F.linear(kv_in, t("block1.0.attn.kv.weight"),
                  t("block1.0.attn.kv.bias"))
    k, v = kv[..., :dim], kv[..., dim:]
    att = torch.softmax(q @ k.transpose(1, 2) / np.sqrt(dim / heads), dim=-1)
    out = att @ v
    out = F.linear(out, t("block1.0.attn.proj.weight"),
                   t("block1.0.attn.proj.bias"))
    xt = xt + out
    y = F.layer_norm(xt, (dim,), t("block1.0.norm2.weight"),
                     t("block1.0.norm2.bias"))
    y = F.linear(y, t("block1.0.mlp.fc1.weight"), t("block1.0.mlp.fc1.bias"))
    y2d = y.transpose(1, 2).reshape(1, 4 * dim, h, w)
    y2d = F.conv2d(y2d, t("block1.0.mlp.dwconv.dwconv.weight"),
                   t("block1.0.mlp.dwconv.dwconv.bias"), padding=1,
                   groups=4 * dim)
    y = F.gelu(y2d.reshape(1, 4 * dim, -1).transpose(1, 2))
    y = F.linear(y, t("block1.0.mlp.fc2.weight"), t("block1.0.mlp.fc2.bias"))
    ref = (xt + y).numpy()

    from eyediseasesegmentation_tpu.models.transformers import MixViTBlock
    blk = MixViTBlock(dim, heads, sr)
    blk_params = new_vars["params"]["stage0_block0"]
    got = blk.apply({"params": blk_params["MixViTBlock_0"]
                     if "MixViTBlock_0" in blk_params else blk_params},
                    jnp.asarray(seq), (h, w))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_vit_npz_import_covers_tree():
    """Official ViT .npz layout (R50+ViT hybrid) maps onto TransUnet: fused
    qkv assembled from split q/k/v, MLP loaded (the reference comments that
    part out), ResNetV2 trunk conv/gn, cls-token drop + pos-grid resize."""
    from eyediseasesegmentation_tpu.models.transformers import TransUnet

    model = TransUnet(hidden=64, depth=2, heads=4, hybrid=True,
                      decoder_channels=(32, 16, 8, 8))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    params = variables["params"]
    rng = np.random.RandomState(0)

    def r(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    npz = {}
    # trunk: derive shapes from the flax tree (axes identical, HWIO)
    trunk = params["trunk"]
    npz["conv_root/kernel"] = r(*trunk["root_conv"]["kernel"].shape)
    gnc = trunk["root_gn"]["scale"].shape[0]
    npz["gn_root/scale"] = r(1, 1, 1, gnc)
    npz["gn_root/bias"] = r(1, 1, 1, gnc)
    import re as _re
    for name, sub in trunk.items():
        m = _re.match(r"block(\d+)_unit(\d+)$", name)
        if not m:
            continue
        broot = f"block{m.group(1)}/unit{m.group(2)}"
        for conv in ("conv1", "conv2", "conv3"):
            npz[f"{broot}/{conv}/kernel"] = r(*sub[conv]["kernel"].shape)
        for gn in ("gn1", "gn2", "gn3"):
            c = sub[gn]["scale"].shape[0]
            npz[f"{broot}/{gn}/scale"] = r(1, 1, 1, c)
            npz[f"{broot}/{gn}/bias"] = r(1, 1, 1, c)
        if "downsample" in sub:
            npz[f"{broot}/conv_proj/kernel"] = r(*sub["downsample"]["kernel"].shape)
            c = sub["gn_proj"]["scale"].shape[0]
            npz[f"{broot}/gn_proj/scale"] = r(1, 1, 1, c)
            npz[f"{broot}/gn_proj/bias"] = r(1, 1, 1, c)
    npz["embedding/kernel"] = r(*params["patch_proj"]["kernel"].shape)
    npz["embedding/bias"] = r(64)
    npz["Transformer/encoder_norm/scale"] = r(64)
    npz["Transformer/encoder_norm/bias"] = r(64)
    # official grid 14x14 + cls -> resized to the model's 4x4
    npz["Transformer/posembed_input/pos_embedding"] = r(1, 197, 64)
    for i in range(2):
        root = f"Transformer/encoderblock_{i}"
        att = "MultiHeadDotProductAttention_1"
        for nm in ("query", "key", "value"):
            npz[f"{root}/{att}/{nm}/kernel"] = r(64, 4, 16)
            npz[f"{root}/{att}/{nm}/bias"] = r(4, 16)
        npz[f"{root}/{att}/out/kernel"] = r(4, 16, 64)
        npz[f"{root}/{att}/out/bias"] = r(64)
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            npz[f"{root}/{ln}/scale"] = r(64)
            npz[f"{root}/{ln}/bias"] = r(64)
        npz[f"{root}/MlpBlock_3/Dense_0/kernel"] = r(64, 256)
        npz[f"{root}/MlpBlock_3/Dense_0/bias"] = r(256)
        npz[f"{root}/MlpBlock_3/Dense_1/kernel"] = r(256, 64)
        npz[f"{root}/MlpBlock_3/Dense_1/bias"] = r(64)

    new_vars, report = TI.import_vit_npz(npz, variables, hybrid=True)
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["missing_in_jax"], report["missing_in_jax"][:5]
    assert not report["unused_torch"], report["unused_torch"][:5]
    out = model.apply(new_vars, x, train=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()
