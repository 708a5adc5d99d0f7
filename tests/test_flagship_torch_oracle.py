"""FULL-flagship cross-framework oracle (round-3 verdict #3).

A complete hand-built torch replica of the reference UnetPlusPlusStar
(src/main/archs/unetplusplusstar.py:400-488): SE-ResNet50 stem+layers1-3,
axial layer4 (shared block applied twice), the UNet++ dense-grid decoder with
scSE attention on plain nodes and cross-axial skip gates on layer-0/1 nodes,
and the 3×3 segmentation head.  Every torch weight and BN running statistic is
copied into the flax flagship; eval-mode logits must agree to ≤1e-4 at a
reduced size (64², base_dim=2).  This is the strongest attainable proxy for
the 1e-3 AUC-PR parity target in a zero-egress environment: the assembled
encoder+decoder+heads forward is pinned, not just the per-block oracles.

Reuses the block-level torch oracles: TorchStem/TorchSEBottleneck
(test_torch_import.py) and TorchAxial/TorchCrossAxial
(test_axial_torch_oracle.py, pinned at 1e-5 incl. gradients).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_torch_import import TorchStem, TorchSEBottleneck, _randomize_bn
from test_axial_torch_oracle import (TorchAxial, TorchCrossAxial,
                                     _axial_variables, _cross_variables, _np)

BASE_DIM = 2          # input 32*base_dim = 64²
DECODER_CH = (256, 128, 64, 32, 16)


# ---------------------------------------------------------------------------
# torch replica
# ---------------------------------------------------------------------------

class TorchSCSE(tnn.Module):
    """smp md.Attention('scse'): x·sigmoid(cSE(x)) + x·sigmoid(sSE(x))."""

    def __init__(self, c, reduction=16):
        super().__init__()
        self.cse1 = tnn.Conv2d(c, max(c // reduction, 1), 1)
        self.cse2 = tnn.Conv2d(max(c // reduction, 1), c, 1)
        self.sse = tnn.Conv2d(c, 1, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = torch.sigmoid(self.cse2(torch.relu(self.cse1(s))))
        t = torch.sigmoid(self.sse(x))
        return x * s + x * t


class TorchConv2dReLU(tnn.Module):
    """conv3×3(pad 1, no bias) → [DropBlock: eval no-op] → BN → ReLU
    (reference Conv2dReLU, unetplusplusstar.py:22-63)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TorchAxialBlock(tnn.Module):
    """Reference AxialAttentionBlock (axial_attention_v2.py:223-281)."""

    D_IN = 512

    def __init__(self, cin, cout, down_sample, dim, heads=8):
        super().__init__()
        self.dim, self.down_sample = dim, down_sample
        d = self.D_IN
        self.in_conv = tnn.Conv2d(cin, d, 1, bias=False)
        self.in_bn = tnn.BatchNorm2d(d)
        self.height_att = TorchAxial(dim=dim, in_channels=d, heads=heads, dkq=8)
        self.width_att = TorchAxial(dim=dim, in_channels=d, heads=heads, dkq=8)
        self.out_conv = tnn.Conv2d(d, cout, 1, bias=False)
        self.out_bn = tnn.BatchNorm2d(cout)
        if down_sample:
            self.shortcut_conv = tnn.Conv2d(cin, cout, 3, stride=2, padding=1)
            self.shortcut_bn = tnn.BatchNorm2d(cout)
            self.att_down_bn = tnn.BatchNorm2d(d)

    def forward(self, x_in):
        x = torch.relu(self.in_bn(self.in_conv(x_in)))
        b, c, h, w = x.shape
        cols = x.permute(0, 3, 1, 2).reshape(b * w, c, h)      # (b w) c h
        cols = self.height_att(cols)
        rows = (cols.reshape(b, w, c, h).permute(0, 3, 2, 1)
                    .reshape(b * h, c, w))                     # (b h) c w
        rows = self.width_att(rows)
        x = rows.reshape(b, h, c, w).permute(0, 2, 1, 3)       # b c h w
        shortcut = x_in
        if self.down_sample:
            shortcut = self.shortcut_bn(self.shortcut_conv(x_in))
            x = self.att_down_bn(F.avg_pool2d(x, 2))
        x = torch.relu(x)
        return torch.relu(self.out_bn(self.out_conv(x)) + shortcut)


class TorchDecoderBlock(tnn.Module):
    """Reference DecoderBlock (unetplusplusstar.py:71-161)."""

    def __init__(self, cin, skip_ch, cout, base_dim, level=0, use_catt=False):
        super().__init__()
        self.use_catt = use_catt
        self.dim = base_dim * (2 ** level)
        self.conv1 = TorchConv2dReLU(cin + skip_ch, cout)
        self.conv2 = TorchConv2dReLU(cout, cout)
        if use_catt:
            c16 = skip_ch // 16
            self.init_conv = tnn.Conv2d(skip_ch, c16, 1)
            self.init_bn = tnn.BatchNorm2d(c16)
            self.h_catt = TorchCrossAxial(dim=self.dim, in_channels=cin,
                                          in_skip_channels=c16, heads=4, dkq=8)
            self.w_catt = TorchCrossAxial(dim=self.dim, in_channels=cin,
                                          in_skip_channels=c16, heads=4, dkq=8)
            self.down_sample = tnn.Conv2d(skip_ch, c16, 1, bias=False)
            self.up_sample = tnn.Conv2d(c16, skip_ch, 1, bias=False)
        else:
            if skip_ch > 0:
                self.attention1 = TorchSCSE(cin + skip_ch)
            self.attention2 = TorchSCSE(cout)

    def forward(self, x, skip=None):
        x_up = F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=False)
        if skip is not None:
            if self.use_catt:
                ori_skip = self.down_sample(skip)
                s = torch.relu(self.init_bn(self.init_conv(
                    F.max_pool2d(skip, 2))))
                b, c, h, w = x.shape
                x_1 = x.permute(0, 3, 1, 2).reshape(b * w, c, h)
                s = s.permute(0, 3, 1, 2).reshape(b * w, -1, h)
                s = self.h_catt(x_1, s)                         # (b w) c16 h
                x_2 = x.permute(0, 2, 1, 3).reshape(b * h, c, w)
                s = (s.reshape(b, w, -1, h).permute(0, 3, 2, 1)
                      .reshape(b * h, -1, w))
                s = self.w_catt(x_2, s)
                s = s.reshape(b, h, -1, w).permute(0, 2, 1, 3)  # b c16 h w
                gate = F.interpolate(torch.sigmoid(s), scale_factor=2,
                                     mode="bilinear", align_corners=False)
                gated = self.up_sample(ori_skip * gate)
                x_up = torch.cat([x_up, gated], dim=1)
            else:
                x_up = self.attention1(torch.cat([x_up, skip], dim=1))
        y = self.conv2(self.conv1(x_up))
        if not self.use_catt:
            y = self.attention2(y)
        return y


class TorchFlagship(tnn.Module):
    """Assembled reference UnetPlusPlusStar at base_dim=2 / 64² input."""

    def __init__(self, base_dim=BASE_DIM, decoder_channels=DECODER_CH):
        super().__init__()
        torch.manual_seed(7)
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
        self.layer4_first = TorchAxialBlock(1024, 2048, True, base_dim * 2)
        self.layer4_shared = TorchAxialBlock(2048, 2048, False, base_dim)

        enc = [2048, 1024, 512, 256, 64]
        in_ch = [enc[0]] + list(decoder_channels[:-1])
        skip_ch = enc[1:] + [0]
        out_ch = list(decoder_channels)
        self.depth = len(in_ch) - 1
        blocks = {}
        for layer_idx in range(self.depth):
            for depth_idx in range(layer_idx + 1):
                if depth_idx == 0:
                    ci = in_ch[layer_idx]
                    si = skip_ch[layer_idx] * (layer_idx + 1)
                    co = out_ch[layer_idx]
                else:
                    co = skip_ch[layer_idx]
                    si = skip_ch[layer_idx] * (layer_idx + 1 - depth_idx)
                    ci = skip_ch[layer_idx - 1]
                blocks[f"x_{depth_idx}_{layer_idx}"] = TorchDecoderBlock(
                    ci, si, co, base_dim, level=layer_idx,
                    use_catt=layer_idx in (0, 1))
        blocks[f"x_0_{self.depth}"] = TorchDecoderBlock(
            in_ch[-1], 0, out_ch[-1], base_dim)
        self.blocks = tnn.ModuleDict(blocks)
        self.seg_head = tnn.Conv2d(out_ch[-1], 1, 3, padding=1)
        _randomize_bn(self.modules())

    def features(self, x):
        f1 = torch.relu(self.stem.bn1(self.stem.conv1(x)))
        y = self.stem.pool(f1)
        feats = [x, f1]
        for stage in self.stages:
            for blk in stage:
                y = blk(y)
            feats.append(y)
        y = self.layer4_first(feats[-1])
        y = self.layer4_shared(y)
        y = self.layer4_shared(y)
        feats.append(y)
        return feats

    def forward(self, x):
        feats = self.features(x)[1:][::-1]
        dense = {}
        for d in range(self.depth):
            dense[f"x_{d}_{d}"] = self.blocks[f"x_{d}_{d}"](
                feats[d], feats[d + 1])
        for layer_idx in range(1, self.depth):
            for depth_idx in range(self.depth - layer_idx):
                li = depth_idx + layer_idx
                cat = torch.cat(
                    [dense[f"x_{i}_{li}"] for i in range(depth_idx + 1, li + 1)]
                    + [feats[li + 1]], dim=1)
                dense[f"x_{depth_idx}_{li}"] = self.blocks[
                    f"x_{depth_idx}_{li}"](dense[f"x_{depth_idx}_{li - 1}"], cat)
        final = self.blocks[f"x_0_{self.depth}"](dense[f"x_0_{self.depth - 1}"])
        return self.seg_head(final)


# ---------------------------------------------------------------------------
# torch → flax weight transfer
# ---------------------------------------------------------------------------

def _set_conv(dst, conv):
    want = tuple(dst["kernel"].shape)
    k = _np(conv.weight).transpose(2, 3, 1, 0)  # OIHW → HWIO
    assert k.shape == want, (k.shape, want)
    dst["kernel"] = k
    if conv.bias is not None:
        dst["bias"] = _np(conv.bias)


def _set_bn(pdst, sdst, bn):
    pdst["scale"] = _np(bn.weight)
    pdst["bias"] = _np(bn.bias)
    sdst["mean"] = _np(bn.running_mean)
    sdst["var"] = _np(bn.running_var)


def _set_dense_from_1x1(dst, conv):
    dst["kernel"] = _np(conv.weight)[:, :, 0, 0].T
    dst["bias"] = _np(conv.bias)


def _set_scse(dst, scse: TorchSCSE):
    _set_conv(dst["Conv_0"], scse.cse1)
    _set_conv(dst["Conv_1"], scse.cse2)
    dst["sse_kernel"] = _np(scse.sse.weight).transpose(2, 3, 1, 0)
    dst["sse_bias"] = _np(scse.sse.bias)


def _set_bottleneck(p, s, blk: TorchSEBottleneck):
    for i in (1, 2, 3):
        _set_conv(p[f"conv{i}"], getattr(blk, f"conv{i}"))
        _set_bn(p[f"bn{i}"], s[f"bn{i}"], getattr(blk, f"bn{i}"))
    _set_dense_from_1x1(p["se"]["Dense_0"], blk.se_module.fc1)
    _set_dense_from_1x1(p["se"]["Dense_1"], blk.se_module.fc2)
    if blk.downsample is not None:
        _set_conv(p["down_conv"], blk.downsample[0])
        _set_bn(p["down_bn"], s["down_bn"], blk.downsample[1])


def _set_axial_block(p, s, blk: TorchAxialBlock):
    _set_conv(p["in_conv"], blk.in_conv)
    _set_bn(p["in_bn"], s["in_bn"], blk.in_bn)
    _set_conv(p["out_conv"], blk.out_conv)
    _set_bn(p["out_bn"], s["out_bn"], blk.out_bn)
    for name in ("height_att", "width_att"):
        av = _axial_variables(getattr(blk, name))
        p[name] = av["params"]
        s[name] = av["batch_stats"]
    if blk.down_sample:
        _set_conv(p["shortcut_conv"], blk.shortcut_conv)
        _set_bn(p["shortcut_bn"], s["shortcut_bn"], blk.shortcut_bn)
        _set_bn(p["att_down_bn"], s["att_down_bn"], blk.att_down_bn)


def _set_decoder_block(p, s, blk: TorchDecoderBlock):
    for name in ("conv1", "conv2"):
        tcb = getattr(blk, name)
        _set_conv(p[name]["conv"], tcb.conv)
        _set_bn(p[name]["BatchNorm_0"], s[name]["BatchNorm_0"], tcb.bn)
    if blk.use_catt:
        _set_conv(p["down_sample"], blk.down_sample)
        _set_conv(p["init_conv"], blk.init_conv)
        _set_bn(p["init_bn"], s["init_bn"], blk.init_bn)
        _set_conv(p["up_sample"], blk.up_sample)
        for name in ("h_catt", "w_catt"):
            cv = _cross_variables(getattr(blk, name))
            p[name] = cv["params"]
            s[name] = cv["batch_stats"]
    else:
        if hasattr(blk, "attention1"):
            _set_scse(p["attention1"]["SCSEAttention_0"], blk.attention1)
        _set_scse(p["attention2"]["SCSEAttention_0"], blk.attention2)


def _to_mutable(d):
    return ({k: _to_mutable(v) for k, v in d.items()}
            if hasattr(d, "items") else d)


def transfer(tf: TorchFlagship, variables):
    p = _to_mutable(variables["params"])
    s = _to_mutable(variables["batch_stats"])
    enc_p, enc_s = p["encoder"], s["encoder"]
    _set_conv({"kernel": enc_p["seresnet"]["stem_conv"]["kernel"]},
              tf.stem.conv1)  # shape check only
    enc_p["seresnet"]["stem_conv"]["kernel"] = (
        _np(tf.stem.conv1.weight).transpose(2, 3, 1, 0))
    _set_bn(enc_p["seresnet"]["stem_bn"], enc_s["seresnet"]["stem_bn"],
            tf.stem.bn1)
    for si, stage in enumerate(tf.stages):
        for bi, blk in enumerate(stage):
            key = f"layer{si + 1}_block{bi}"
            _set_bottleneck(enc_p["seresnet"][key], enc_s["seresnet"][key], blk)
    _set_axial_block(enc_p["layer4_first"], enc_s["layer4_first"],
                     tf.layer4_first)
    _set_axial_block(enc_p["layer4_shared"], enc_s["layer4_shared"],
                     tf.layer4_shared)
    for key, blk in tf.blocks.items():
        _set_decoder_block(p["decoder"][key], s["decoder"][key], blk)
    _set_conv(p["segmentation_head"]["conv"], tf.seg_head)
    return {"params": p, "batch_stats": s}


# ---------------------------------------------------------------------------
# the oracle
# ---------------------------------------------------------------------------

def test_full_flagship_matches_torch():
    from eyediseasesegmentation_tpu import models as zoo

    tf = TorchFlagship().eval()

    model = zoo.get_model(
        "unetplusplusstar",
        {"encoder_name": "BoTSER50_Axial_Imagenet_3",
         "decoder_attention_type": "scse", "base_dim": BASE_DIM,
         "classes": 1, "drop_block_prob": 0.0, "fast_inference": False},
        training=False, dtype=jnp.float32)
    size = 32 * BASE_DIM
    x_np = (np.random.RandomState(0).rand(1, size, size, 3)
            .astype(np.float32) * 2 - 1)
    from functools import partial
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x_np))

    variables = transfer(tf, variables)

    got = np.asarray(jax.jit(partial(model.apply, train=False))(
        variables, jnp.asarray(x_np)))
    with torch.no_grad():
        want = tf(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    assert got.shape == want.shape == (1, size, size, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_full_flagship_fast_inference_matches_torch():
    """The s2d/H2-packed fast eval tail must agree with the same torch oracle
    (exactness of the packed rewrites against the cross-framework reference,
    not merely against the plain flax path)."""
    from eyediseasesegmentation_tpu import models as zoo

    tf = TorchFlagship().eval()
    model = zoo.get_model(
        "unetplusplusstar",
        {"encoder_name": "BoTSER50_Axial_Imagenet_3",
         "decoder_attention_type": "scse", "base_dim": BASE_DIM,
         "classes": 1, "drop_block_prob": 0.0, "fast_inference": True,
         "fast_min_res": 16},
        training=False, dtype=jnp.float32)
    size = 32 * BASE_DIM
    x_np = (np.random.RandomState(1).rand(1, size, size, 3)
            .astype(np.float32) * 2 - 1)
    from functools import partial
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x_np))
    variables = transfer(tf, variables)
    got = np.asarray(jax.jit(partial(model.apply, train=False))(
        variables, jnp.asarray(x_np)))
    with torch.no_grad():
        want = tf(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_full_flagship_gradient_matches_torch():
    """Full-model BACKWARD parity: d/d(input) of a random linear functional
    of the logits, through the entire assembled flagship (eval-mode BN), must
    match torch autograd.  With the forward oracle above this pins the whole
    Jacobian-vector machinery cross-framework — the strongest attainable
    training-path parity evidence in a zero-egress env (reference
    unetplusplusstar.py:400-488)."""
    from functools import partial

    from eyediseasesegmentation_tpu import models as zoo

    tf = TorchFlagship().eval()
    model = zoo.get_model(
        "unetplusplusstar",
        {"encoder_name": "BoTSER50_Axial_Imagenet_3",
         "decoder_attention_type": "scse", "base_dim": BASE_DIM,
         "classes": 1, "drop_block_prob": 0.0, "fast_inference": False},
        training=False, dtype=jnp.float32)
    size = 32 * BASE_DIM
    rng = np.random.RandomState(4)
    x_np = rng.rand(1, size, size, 3).astype(np.float32) * 2 - 1
    w_np = (rng.rand(1, size, size, 1).astype(np.float32) - 0.5)

    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x_np))
    variables = transfer(tf, variables)

    def loss_fn(xx):
        out = model.apply(variables, xx, train=False)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32) * jnp.asarray(w_np))

    got = np.asarray(jax.jit(jax.grad(loss_fn))(jnp.asarray(x_np)))

    xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2)).requires_grad_(True)
    wt = torch.from_numpy(w_np.transpose(0, 3, 1, 2))
    (tf(xt) * wt).sum().backward()
    want = xt.grad.numpy().transpose(0, 2, 3, 1)

    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4 * scale)
