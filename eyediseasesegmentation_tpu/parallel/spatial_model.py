"""Context-parallel (H-sharded) inference for the flagship UnetPlusPlusStar.

Runs the model's high-resolution stages with activations sharded along image
height across the mesh, halo-exchanging conv borders over ICI
(``parallel.spatial`` primitives), so no full-resolution activation is ever
materialized on one chip:

* sharded FRONT: stem 7x7/2 conv + BN + ReLU (-> c0 at /2) and the 3x3/2
  maxpool (-> /4),
* replicated MIDDLE: everything at /4 resolution and below — encoder layers
  1-4 (SE bottlenecks + the axial-attention layer4) and the decoder's
  low/mid grid nodes (x_0_0 .. x_2_2, x_1_2, x_0_2, including the
  cross-axial-attention gates) — applied through the ordinary flax modules
  on the gathered /4 map,
* sharded TAIL: the high-resolution decoder chain x_3_3 -> x_2_3 -> x_1_3 ->
  x_0_3 -> x_0_4 -> segmentation head (conv/BN/scSE/bilinear-up only),
  with scSE channel gates reduced across shards via ``psum``.

Design note (SURVEY §5.7 / round-2 review item 4): what blocks a fully
H-sharded forward is the axial attention's height axis — a sequence-parallel
axial attention would attend across shard boundaries. Here that never
happens: all axial/cross-axial blocks run at /4 resolution or below (1/16th
of the pixels), where an all-gather is cheap, so they execute inside the
replicated middle. The memory-dominant /2 and full-resolution maps stay
sharded end-to-end, which is the capability offline patching / tiling cannot
give: whole-image inference with peak activation memory ~1/n_devices.

Exactness vs the unsharded normal path (``fast_inference=False``) is pinned
by tests/test_spatial_sharding.py on the virtual 8-device CPU mesh.

Reference parity: the computation equals reference
``src/main/archs/unetplusplusstar.py:400-517`` at eval; the sharding has no
reference analogue (the reference scales spatially by offline patch
extraction only, build_patches.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from .spatial import halo_exchange

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# sharded primitives (inside shard_map)
# ---------------------------------------------------------------------------

def _conv_spatial(x, kernel, stride: int, pad: int, axis_name: str, dtype):
    """kxk SAME-style conv on an H-sharded block: ``pad``-row halo exchange,
    VALID over rows, explicit zero pad over cols. Requires even local rows
    for stride 2 (global H divisible by 2*n_devices)."""
    xh = halo_exchange(x, pad, axis_name) if pad else x
    return jax.lax.conv_general_dilated(
        xh.astype(dtype), kernel.astype(dtype), (stride, stride),
        ((0, 0), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _maxpool3x3s2_spatial(x, axis_name: str):
    """3x3 stride-2 maxpool, pad 1 (ResNet stem pool). Pool padding must be
    -inf, so the zero halo rows ppermute leaves at the global edges are
    overwritten."""
    xh = halo_exchange(x, 1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    neg = jnp.full_like(xh[:, :1], -jnp.inf)
    top = jnp.where(idx == 0, neg, xh[:, :1])
    bot = jnp.where(idx == n - 1, neg, xh[:, -1:])
    xh = jnp.concatenate([top, xh[:, 1:-1], bot], axis=1)
    xh = jnp.pad(xh, ((0, 0), (0, 0), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    return jax.lax.reduce_window(xh, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _global_mean(p, axis_name):
    """(B, h_local, W, C) -> (B, 1, 1, C) mean over the GLOBAL spatial extent
    (equal local row counts, so psum of sums / global count is exact)."""
    s = jnp.sum(p.astype(_F32), axis=(1, 2), keepdims=True)
    total = jax.lax.psum(s, axis_name)
    n = jax.lax.psum(1, axis_name)
    return total / (n * p.shape[1] * p.shape[2])


def _up2_cols_local(y):
    """Bilinear x2 along W (half-pixel centers, edge clamp) — W is unsharded."""
    n, h, w, c = y.shape
    left = jnp.concatenate([y[:, :, :1], y[:, :, :-1]], axis=2)
    right = jnp.concatenate([y[:, :, 1:], y[:, :, -1:]], axis=2)
    even = 0.25 * left + 0.75 * y
    odd = 0.75 * y + 0.25 * right
    return jnp.stack([even, odd], axis=3).reshape(n, h, 2 * w, c)


def _up2_rows_sharded(x, axis_name):
    """Bilinear x2 along sharded H: 1-row halo; the global edge clamp is
    reproduced on the devices owning the global first/last row."""
    n, h, w, c = x.shape
    idx = jax.lax.axis_index(axis_name)
    ndev = jax.lax.psum(1, axis_name)
    xh = halo_exchange(x, 1, axis_name)
    prev_r, cur_r, next_r = xh[:, :-2], xh[:, 1:-1], xh[:, 2:]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    prev_r = jnp.where((idx == 0) & (row == 0), cur_r, prev_r)
    next_r = jnp.where((idx == ndev - 1) & (row == h - 1), cur_r, next_r)
    even = 0.25 * prev_r + 0.75 * cur_r
    odd = 0.75 * cur_r + 0.25 * next_r
    return jnp.stack([even, odd], axis=2).reshape(n, 2 * h, w, c)


def _up2_sharded(x, axis_name):
    return _up2_cols_local(_up2_rows_sharded(x, axis_name))


def _up2_rows_slice(x_full, idx, h_out_local):
    """Local H-shard of bilinear-x2-along-H of a REPLICATED map: device
    ``idx`` computes output rows [idx*h_out_local, (idx+1)*h_out_local).
    Edge-replicating the input once makes the blend unconditional."""
    xe = jnp.concatenate([x_full[:, :1], x_full, x_full[:, -1:]], axis=1)
    hin = h_out_local // 2
    sl = jax.lax.dynamic_slice_in_dim(xe, idx * hin, hin + 2, axis=1)
    prev_r, cur_r, next_r = sl[:, :-2], sl[:, 1:-1], sl[:, 2:]
    even = 0.25 * prev_r + 0.75 * cur_r
    odd = 0.75 * cur_r + 0.25 * next_r
    n, h, w, c = cur_r.shape
    return jnp.stack([even, odd], axis=2).reshape(n, 2 * h, w, c)


def _up2_from_replicated(x_full, axis_name):
    """Local H-shard of upsample2x(replicated /4 map): each device slices its
    input rows (+1 halo each way from the replicated copy) and blends."""
    idx = jax.lax.axis_index(axis_name)
    ndev = jax.lax.psum(1, axis_name)
    h_out_local = 2 * x_full.shape[1] // ndev
    return _up2_cols_local(_up2_rows_slice(x_full, idx, h_out_local))


# ---------------------------------------------------------------------------
# folded-parameter helpers
# ---------------------------------------------------------------------------

def _bn_fold(params: Dict, stats: Dict, eps: float = 1e-5):
    """Eval BatchNorm -> per-channel (scale, bias), fp32 (layers.BatchNorm)."""
    scale = params["scale"] * jax.lax.rsqrt(stats["var"] + eps)
    return scale, params["bias"] - stats["mean"] * scale


def _affine(x, scale, bias, dtype):
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    return y.astype(dtype)


def _scse_spatial(p: Dict, parts: List[jnp.ndarray], axis_name: str, dtype):
    """SCSEAttention over the virtual concat of H-sharded parts: channel gate
    from psum'd global means, spatial gate local (1x1 conv has no halo)."""
    a = p["SCSEAttention_0"]
    means = jnp.concatenate(
        [_global_mean(q, axis_name).astype(dtype) for q in parts], axis=-1)
    k0, b0 = a["Conv_0"]["kernel"], a["Conv_0"]["bias"]
    k1, b1 = a["Conv_1"]["kernel"], a["Conv_1"]["bias"]
    s = jnp.einsum("bijc,co->bijo", means, k0[0, 0].astype(dtype)) + b0.astype(dtype)
    s = jax.nn.relu(s)
    s = jnp.einsum("bijc,co->bijo", s, k1[0, 0].astype(dtype)) + b1.astype(dtype)
    gate_c = jax.nn.sigmoid(s)                       # (B,1,1,C_total)
    t = None
    offset = 0
    for q in parts:
        cq = q.shape[-1]
        w1 = a["sse_kernel"][0, 0, offset:offset + cq, 0].astype(dtype)
        tq = (q.astype(dtype) * w1).sum(-1, dtype=_F32)
        t = tq if t is None else t + tq
        offset += cq
    gate_s = jax.nn.sigmoid(t + a["sse_bias"].astype(t.dtype))[..., None]
    out = []
    offset = 0
    for q in parts:
        cq = q.shape[-1]
        gc = gate_c[..., offset:offset + cq]
        out.append(q * (gc + gate_s).astype(q.dtype))
        offset += cq
    return out


def _conv_bn_relu_parts(p: Dict, s: Dict, parts: List[jnp.ndarray],
                        axis_name: str, dtype):
    """ConvBNReLU over the virtual concat of H-sharded parts (column-split
    conv sum, like layers.Conv2d's list path), eval BN folded."""
    kernel = p["conv"]["kernel"]
    y = None
    offset = 0
    for q in parts:
        cq = q.shape[-1]
        yq = _conv_spatial(q, kernel[:, :, offset:offset + cq], 1, 1,
                           axis_name, dtype)
        y = yq if y is None else y + yq
        offset += cq
    scale, bias = _bn_fold(p["BatchNorm_0"], s["BatchNorm_0"])
    return jax.nn.relu(_affine(y, scale, bias, dtype))


def _decode_tail_node(p: Dict, s: Dict, up: jnp.ndarray,
                      skips: List[jnp.ndarray], axis_name: str, dtype):
    """DecoderBlock normal path on H-sharded data: [up] + skips gated by scSE,
    conv1, conv2, scSE again (decoders.DecoderBlock.__call__, non-catt)."""
    parts = [up] + skips
    if "attention1" in p:
        parts = _scse_spatial(p["attention1"], parts, axis_name, dtype)
    y = _conv_bn_relu_parts(p["conv1"], s["conv1"], parts, axis_name, dtype)
    y = _conv_bn_relu_parts(p["conv2"], s["conv2"], [y], axis_name, dtype)
    if "attention2" in p:
        y = _scse_spatial(p["attention2"], [y], axis_name, dtype)[0]
    return y


# ---------------------------------------------------------------------------
# the full spatially-sharded flagship forward
# ---------------------------------------------------------------------------

def spatial_flagship_predict(variables: Dict, x: jnp.ndarray, mesh: Mesh,
                             *, base_dim: int,
                             decoder_channels=(256, 128, 64, 32, 16),
                             attention_type: Optional[str] = "scse",
                             axis_name: str = DATA_AXIS,
                             dtype: Any = _F32) -> jnp.ndarray:
    """Eval forward of UnetPlusPlusStar (BoTSER50_Axial encoder, no deep
    supervision / clf head) with H-sharded front and tail.

    x: (B, H, W, 3) raw (already normalized) input; H divisible by
    4 * mesh axis size (stride alignment) — e.g. 256/512/1024 on 8 devices.
    Returns (B, H, W, classes) fp32 logits == the unsharded normal path.
    """
    from ..models.decoders import DecoderBlock
    from ..models.encoders import Bottleneck
    from ..models.modules.axial import AxialAttentionBlock

    enc_p = variables["params"]["encoder"]
    enc_s = variables["batch_stats"]["encoder"]
    dec_p = variables["params"]["decoder"]
    dec_s = variables["batch_stats"]["decoder"]
    head_p = variables["params"]["segmentation_head"]

    spec = P(None, axis_name, None, None)
    rep = P()

    # ---- sharded FRONT: stem + maxpool ----
    sn_p, sn_s = enc_p["seresnet"], enc_s["seresnet"]

    def front(xl, k7, bn_scale, bn_bias):
        y = _conv_spatial(xl, k7, 2, 3, axis_name, dtype)
        c0 = jax.nn.relu(_affine(y, bn_scale, bn_bias, dtype))
        return c0, _maxpool3x3s2_spatial(c0, axis_name)

    st_scale, st_bias = _bn_fold(sn_p["stem_bn"], sn_s["stem_bn"])
    c0, p0 = shard_map(front, mesh=mesh, in_specs=(spec, rep, rep, rep),
                       out_specs=(spec, spec))(
        x, sn_p["stem_conv"]["kernel"], st_scale, st_bias)

    # ---- replicated MIDDLE (everything at /4 and below) ----
    p0 = jax.device_put(p0, NamedSharding(mesh, rep))  # gather the /4 map

    def block_apply(mod, params, stats, *args):
        return mod.apply({"params": params, "batch_stats": stats}, *args,
                         train=False)

    # encoder layers 1-3 (SE bottlenecks; encoders.ResNetEncoder)
    y = p0
    feats = [None, c0]  # input slot unused; c0 stays sharded
    for stage, n_blocks in enumerate((3, 4, 6)):
        planes = 64 * (2 ** stage)
        for i in range(n_blocks):
            name = f"layer{stage + 1}_block{i}"
            blk = Bottleneck(planes, strides=2 if (i == 0 and stage > 0) else 1,
                             use_se=True, out_features=planes * 4, dtype=dtype)
            y = block_apply(blk, sn_p[name], sn_s[name], y)
        feats.append(y)
    # layer4: axial attention (encoders.BoTSER50Encoder; the shared block is
    # applied twice with the same weights)
    first = AxialAttentionBlock(in_channels=1024, out_channels=2048,
                                down_sample=True, dim=base_dim * 2, heads=8,
                                dtype=dtype)
    shared = AxialAttentionBlock(in_channels=2048, out_channels=2048,
                                 down_sample=False, dim=base_dim, heads=8,
                                 dtype=dtype)
    y = block_apply(first, enc_p["layer4_first"], enc_s["layer4_first"], y)
    y = block_apply(shared, enc_p["layer4_shared"], enc_s["layer4_shared"], y)
    y = block_apply(shared, enc_p["layer4_shared"], enc_s["layer4_shared"], y)
    feats.append(y)

    # decoder mid/low grid nodes (channel algebra of UnetPlusPlusDecoder)
    enc_ch = [2048, 1024, 512, 256, 64]
    out_channels = list(decoder_channels)
    in_channels = [enc_ch[0]] + out_channels[:-1]
    skip_channels = enc_ch[1:] + [0]
    fr = [feats[5], feats[4], feats[3], feats[2]]  # c4(/32)..c1(/4)

    def mid_block(d, l, xin, skips):
        if d == 0:
            in_ch, out_ch = in_channels[l], out_channels[l]
        else:
            in_ch, out_ch = skip_channels[l - 1], skip_channels[l]
        skip_ch = skip_channels[l] * (l + 1 - d)
        blk = DecoderBlock(in_ch, skip_ch, out_ch, base_dim=base_dim, level=l,
                           use_catt=l in (0, 1), attention_type=attention_type,
                           drop_block_prob=0.0, dtype=dtype)
        name = f"x_{d}_{l}"
        return blk.apply({"params": dec_p[name], "batch_stats": dec_s[name]},
                         xin, skips, train=False)

    x00 = mid_block(0, 0, fr[0], fr[1])
    x11 = mid_block(1, 1, fr[1], fr[2])
    x22 = mid_block(2, 2, fr[2], fr[3])
    x01 = mid_block(0, 1, x00, [x11, fr[2]])
    x12 = mid_block(1, 2, x11, [x22, fr[3]])
    x02 = mid_block(0, 2, x01, [x12, x22, fr[3]])

    # ---- sharded TAIL: x_3_3 .. x_0_4 + head ----
    def tail(c0l, c1, x22f, x12f, x02f, tp, ts, hp):
        up = _up2_from_replicated(c1, axis_name)
        x33 = _decode_tail_node(tp["x_3_3"], ts["x_3_3"], up, [c0l],
                                axis_name, dtype)
        up = _up2_from_replicated(x22f, axis_name)
        x23 = _decode_tail_node(tp["x_2_3"], ts["x_2_3"], up, [x33, c0l],
                                axis_name, dtype)
        up = _up2_from_replicated(x12f, axis_name)
        x13 = _decode_tail_node(tp["x_1_3"], ts["x_1_3"], up, [x23, x33, c0l],
                                axis_name, dtype)
        up = _up2_from_replicated(x02f, axis_name)
        x03 = _decode_tail_node(tp["x_0_3"], ts["x_0_3"], up,
                                [x13, x23, x33, c0l], axis_name, dtype)
        up = _up2_sharded(x03, axis_name)
        x04 = _decode_tail_node(tp["x_0_4"], ts["x_0_4"], up, [],
                                axis_name, dtype)
        logits = _conv_spatial(x04, hp["conv"]["kernel"], 1, 1,
                               axis_name, dtype)
        logits = logits + hp["conv"]["bias"].astype(logits.dtype)
        return logits.astype(_F32)

    tail_p = {k: dec_p[k] for k in ("x_3_3", "x_2_3", "x_1_3", "x_0_3", "x_0_4")}
    tail_s = {k: dec_s[k] for k in ("x_3_3", "x_2_3", "x_1_3", "x_0_3", "x_0_4")}
    return shard_map(
        tail, mesh=mesh,
        in_specs=(spec, rep, rep, rep, rep, rep, rep, rep),
        out_specs=spec,
    )(c0, fr[3], x22, x12, x02, tail_p, tail_s, head_p)
