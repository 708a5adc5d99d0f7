"""U-Net family decoders (flax, NHWC).

``DecoderBlock`` reproduces the reference's block (unetplusplusstar.py:71-161):
bilinear ×2 upsample; skip gated either by smp attention ('scse') or — in the
star variant — by height+width *cross-axial attention* computed at C/16 width,
sigmoid-upsampled and multiplied onto the 1×1-downsampled skip before
re-expansion (l.105-148). ``UnetPlusPlusDecoder`` implements the nested dense
grid with the channel algebra skip_ch·(layer+1−depth) (l.214-235) and deep
supervision taps (x_3_3, x_2_3, x_1_3; l.239-263). ``UnetDecoder`` is the plain
smp.Unet decoder used by the baseline configs.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules.layers import (Attention, BatchNorm, ConvBNReLU,
                             upsample2x, upsample2x_w)
from .modules.axial import CrossAxialAttention

Dtype = Any


class DecoderBlock(nn.Module):
    in_channels: int
    skip_channels: int
    out_channels: int
    base_dim: int = 32
    level: int = 0
    use_catt: bool = False
    attention_type: Optional[str] = None
    drop_block_prob: float = 0.1
    fast_tail: bool = False    # eval-only s2d-packed rewrite (ops/packed.py)
    keep_packed: bool = False  # fast path: skip the final depth_to_space
    packed_input: int = 1      # 4: x arrives s2d-packed (no-skip fast only)
    # pallas_tail: route the skip nodes of the fast tail through a fused
    # Pallas decode-node kernel instead of the H2/s2d packed-layout XLA
    # forms (eval only — the kernels have no vjp). True/"v1": the
    # single-conv kernel (ops/pallas_scse_conv.py, conv1 stage fused,
    # conv2 stays an XLA s2d rewrite). "pair": the two-conv kernel
    # (ops/pallas_decode_pair.py) — conv1+conv2 in one HBM pass plus the
    # channel-sum gate-reduce epilogue attention2 consumes, so the custom
    # call no longer costs the consumer's fused mean-reduce.
    pallas_tail: Any = False
    # fast_train: run the packed fast tail under TRAINING too (grad-safe:
    # packed DropBlock/BatchNorm are exact vs the logical path, all packed
    # ops are jnp/lax and differentiate in packed space)
    fast_train: bool = False
    dtype: Dtype = jnp.float32

    def _pallas_call(self, x, skip, train):
        """attention1+conv1+BN+ReLU as ONE fused Pallas pass, conv2+BN+ReLU
        as a second (ungated) pass, attention2 in plain NHWC. Same params
        and module names as the normal path."""
        skips = list(skip) if isinstance(skip, (list, tuple)) else [skip]
        gate_c, sse_k, sse_b = Attention(
            self.attention_type, raw_gates=True, up_part0=True,
            dtype=self.dtype, name="attention1")([x] + skips)
        parts = [upsample2x(x)] + skips
        gate = None if gate_c is None else (gate_c, sse_k, sse_b)
        y = ConvBNReLU(self.out_channels, 3,
                       drop_block_prob=self.drop_block_prob, mode="pallas",
                       dtype=self.dtype, name="conv1")(parts, train, gate=gate)
        # conv2 stays an XLA s2d rewrite: measured 3.8 vs 6.6 ms (64ch) /
        # 3.0 vs 7.1 ms (32ch) against the ungated kernel at 512² — the
        # single-part kernel pays K-padding (64→128) and per-row overhead
        from ..ops.packed import depth_to_space
        y = ConvBNReLU(self.out_channels, 3,
                       drop_block_prob=self.drop_block_prob, mode="s2d_out",
                       packed_factor=4, dtype=self.dtype,
                       name="conv2")([y], train)
        y = Attention(self.attention_type, packed=4, dtype=self.dtype,
                      name="attention2")(y)
        return depth_to_space(y)

    def _pallas_pair_call(self, x, skip, train, up_in_kernel=False):
        """attention1+conv1+BN+ReLU+conv2+BN+ReLU as ONE fused Pallas pass
        that also emits attention2's pooled channel sums (the gate-reduce
        epilogue); attention2's gating multiply stays a plain-NHWC XLA op so
        consumer reductions fuse into it. Same params/module names as the
        normal path.

        up_in_kernel ("pair_up"): part 0 is handed to the kernel W-upsampled
        at half height and the H-direction bilinear runs in-kernel — the
        full-res ×2-upsampled map never materializes in HBM (halves that
        intermediate's write+read traffic and its VMEM stream)."""
        import jax as _jax

        from ..ops.pallas_decode_pair import scse_conv3x3_pair

        skips = list(skip) if isinstance(skip, (list, tuple)) else [skip]
        gate_c, sse_k, sse_b = Attention(
            self.attention_type, raw_gates=True, up_part0=True,
            dtype=self.dtype, name="attention1")([x] + skips)
        parts = [upsample2x_w(x) if up_in_kernel else upsample2x(x)] + skips
        # Unify part dtypes to the module compute dtype: the previous pair
        # node's fp32 gate epilogue (csum/hw) promotes its output, so x can
        # arrive fp32 while skips are bf16 — the kernel's carried VMEM
        # scratch is single-dtype, and the plain path's convs would cast to
        # self.dtype here anyway.
        parts = [p.astype(self.dtype) for p in parts]
        k1, s1, b1 = ConvBNReLU(self.out_channels, 3,
                                drop_block_prob=self.drop_block_prob,
                                mode="pallas_params", dtype=self.dtype,
                                name="conv1")(parts, train)
        k2, s2, b2 = ConvBNReLU(
            self.out_channels, 3, drop_block_prob=self.drop_block_prob,
            mode="pallas_params", dtype=self.dtype, name="conv2")(
                [jax.ShapeDtypeStruct((1, 1, 1, self.out_channels),
                                      self.dtype)], train)
        gated = gate_c is not None
        if not gated:
            C = sum(p.shape[-1] for p in parts)
            gate_c = jnp.zeros((parts[0].shape[0], C), jnp.float32)
            sse_k, sse_b = jnp.zeros((C,), jnp.float32), jnp.float32(0.0)
        y2, csum = scse_conv3x3_pair(
            parts, gate_c, sse_k, sse_b, k1, s1, b1, k2, s2, b2,
            gated=gated, up_part0=up_in_kernel,
            interpret=_jax.default_backend() != "tpu")
        hw = y2.shape[1] * y2.shape[2]
        out = Attention(self.attention_type, dtype=self.dtype,
                        name="attention2")(y2, mean_override=csum / hw)
        # the fp32 csum gate promotes the gating multiply; keep the node's
        # output map in compute dtype or every downstream full-res
        # intermediate doubles its HBM footprint (OOM at 24 views/1024²)
        return out.astype(self.dtype)

    def _fast_call(self, x, skip, train):
        """Same math as the normal path, emitted in s2d-packed layout: the
        tail nodes (cout < 128 at ≥512²) run at 3-25 TF/s in plain NHWC on
        v5e (lane padding + N<128 MXU waste); packed they use full lanes.
        Parameters and module names are identical to the normal path.

        ``packed_input=4`` (no-skip nodes): x is already s2d-packed and the
        whole node runs double-packed (factor 16) — the flagship's final
        x_0_3→x_0_4 chain then never materializes a <128-lane map."""
        from ..ops.packed import depth_to_space, unpack_h2

        assert not self.use_catt
        if (self.pallas_tail and not train and skip is not None
                and self.packed_input == 1 and not self.keep_packed):
            if self.pallas_tail == "pair":
                return self._pallas_pair_call(x, skip, train)
            if self.pallas_tail == "pair_up":
                return self._pallas_pair_call(x, skip, train,
                                              up_in_kernel=True)
            return self._pallas_call(x, skip, train)
        # H2 layout (pack along H only) where 2·cout fills the MXU lanes:
        # 4/3-inflation conv1 + 2×-inflation conv2 measured faster than the
        # 16/9 / 4× full-s2d forms at cout=64 (tools/bench_wpack.py); the
        # cout<64 nodes keep full s2d (128 lanes need factor 4 there)
        h2 = (skip is not None and self.packed_input == 1
              and not self.keep_packed and self.out_channels >= 64)
        pf = 2 if h2 else 4 * self.packed_input
        if skip is not None:
            assert self.packed_input == 1
            skips = list(skip) if isinstance(skip, (list, tuple)) else [skip]
            # gates computed WITHOUT touching the upsampled map (up_part0:
            # mean/conv1x1 commute with bilinear up2 — exact), then fused
            # into conv1's input reads instead of materializing gated parts
            gate_c, gate_s = Attention(self.attention_type, return_gates=True,
                                       up_part0=True, dtype=self.dtype,
                                       name="attention1")([x] + skips)
            parts = [upsample2x(x)] + skips
            scales = None
            if gate_c is not None:
                scales, off = [], 0
                for p in parts:
                    cp = p.shape[-1]
                    scales.append(gate_c[..., off:off + cp] + gate_s)
                    off += cp
            y = ConvBNReLU(self.out_channels, 3,
                           drop_block_prob=self.drop_block_prob,
                           mode="h2_out" if h2 else "s2d_out",
                           packed_factor=pf,
                           dtype=self.dtype, name="conv1")(
                               parts, train, scales=scales)
        else:
            y = ConvBNReLU(self.out_channels, 3,
                           drop_block_prob=self.drop_block_prob,
                           mode="phase_up", packed_factor=pf,
                           dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNReLU(self.out_channels, 3,
                       drop_block_prob=self.drop_block_prob,
                       mode="h2_in" if h2 else "packed_in", packed_factor=pf,
                       dtype=self.dtype, name="conv2")(y, train)
        # at h2 nodes the gating multiply and the H2 un-interleave fuse into
        # one pass (SCSEAttention.unpack_h2)
        y = Attention(self.attention_type, packed=pf,
                      unpack_h2=h2 and not self.keep_packed,
                      dtype=self.dtype, name="attention2")(y)
        if self.keep_packed:
            return y
        if h2:
            return unpack_h2(y) if self.attention_type is None else y
        for _ in range(pf.bit_length() // 2):
            y = depth_to_space(y)
        return y

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        if self.fast_tail and (not train or self.fast_train):
            return self._fast_call(x, skip, train)
        dim = self.base_dim * (2 ** self.level)
        x_up = upsample2x(x)
        if skip is not None:
            if self.use_catt and isinstance(skip, (list, tuple)):
                # cross-attention path needs the actual tensor (low-res, cheap)
                skip = jnp.concatenate(list(skip), axis=-1)
            if self.use_catt:
                b, h, w, _ = x.shape
                c16 = self.skip_channels // 16
                # ori_skip: 1x1 channel reduction at skip (2x) resolution (l.137)
                ori_skip = nn.Conv(c16, (1, 1), use_bias=False, dtype=self.dtype,
                                   param_dtype=jnp.float32, name="down_sample")(skip)
                # init_conv: maxpool to x's resolution + 1x1 + BN + ReLU (l.105-110)
                s = nn.max_pool(skip, (2, 2), strides=(2, 2))
                s = nn.Conv(c16, (1, 1), use_bias=True, dtype=self.dtype,
                            param_dtype=jnp.float32, name="init_conv")(s)
                s = BatchNorm(dtype=self.dtype, name="init_bn")(s, train)
                s = nn.relu(s)

                # height cross-attention: sequences are columns of length h
                x_cols = x.transpose(0, 2, 1, 3).reshape(b * w, h, x.shape[-1])
                s_cols = s.transpose(0, 2, 1, 3).reshape(b * w, h, c16)
                s_cols = CrossAxialAttention(
                    dim, in_channels=self.in_channels, in_skip_channels=c16,
                    heads=4, dim_head_kq=8, dtype=self.dtype, name="h_catt",
                )(x_cols, s_cols, train)

                # width cross-attention: sequences are rows of length w
                x_rows = x.reshape(b * h, w, x.shape[-1])
                s_rows = (s_cols.reshape(b, w, h, c16)
                               .transpose(0, 2, 1, 3)
                               .reshape(b * h, w, c16))
                s_rows = CrossAxialAttention(
                    dim, in_channels=self.in_channels, in_skip_channels=c16,
                    heads=4, dim_head_kq=8, dtype=self.dtype, name="w_catt",
                )(x_rows, s_rows, train)
                s = s_rows.reshape(b, h, w, c16)

                # sigmoid gate, upsampled to skip resolution (l.113-117,146-148)
                gate = upsample2x(jax.nn.sigmoid(s).astype(self.dtype))
                gated = ori_skip * gate
                gated = nn.Conv(self.skip_channels, (1, 1), use_bias=False,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name="up_sample")(gated)
                x_up = [x_up, gated]  # virtual concat (split conv, no copy)
            else:
                # scse over + conv over the VIRTUAL concat: the parts are
                # gated and convolved column-split — exactly equal to
                # cat->attention->conv without materializing the cat
                parts = [x_up] + (list(skip) if isinstance(skip, (list, tuple))
                                  else [skip])
                x_up = Attention(self.attention_type, dtype=self.dtype,
                                 name="attention1")(parts)
        y = ConvBNReLU(self.out_channels, 3, drop_block_prob=self.drop_block_prob,
                       dtype=self.dtype, name="conv1")(x_up, train)
        y = ConvBNReLU(self.out_channels, 3, drop_block_prob=self.drop_block_prob,
                       dtype=self.dtype, name="conv2")(y, train)
        if not self.use_catt:
            y = Attention(self.attention_type, dtype=self.dtype, name="attention2")(y)
        return y


class UnetDecoder(nn.Module):
    """Plain smp.Unet decoder: 5 decode blocks over the reversed feature pyramid."""

    encoder_channels: Sequence[int]
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention_type: Optional[str] = None
    drop_block_prob: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        feats = features[1:][::-1]  # drop input, head first
        enc_ch = [f.shape[-1] for f in feats]
        in_ch = [enc_ch[0]] + list(self.decoder_channels[:-1])
        skip_ch = enc_ch[1:] + [0]
        x = feats[0]
        skips = feats[1:]
        for i, out in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(
                in_ch[i], skip_ch[i], out, attention_type=self.attention_type,
                drop_block_prob=self.drop_block_prob, dtype=self.dtype,
                name=f"block{i}",
            )(x, skip, train)
        return x


class UnetPlusPlusDecoder(nn.Module):
    """Nested UNet++ dense-grid decoder (reference unetplusplusstar.py:185-263).

    ``star=True`` enables cross-axial-attention skip gating on grid nodes with
    layer_idx 0 or 1 (x_0_0, x_0_1, x_1_1 — reference l.226-229).
    Returns (final, [x_3_3, x_2_3, x_1_3]) when ``deep_supervision``.
    """

    encoder_channels: Sequence[int]
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    base_dim: int = 32
    attention_type: Optional[str] = None
    deep_supervision: bool = False
    star: bool = False
    drop_block_prob: float = 0.1
    # eval-only s2d-packed rewrite of the high-res tail (ops/packed.py):
    # nodes with out_channels < 128 at resolution >= fast_min_res
    fast_inference: bool = False
    fast_min_res: int = 512
    packed_final: bool = False  # hand the final map to the head s2d-packed
    pallas_tail: Any = False    # fused Pallas kernel(s): True/"v1", "pair", "pair_up"
    fast_train: bool = False    # packed fast tail under training (grad-safe)
    # per-node gradient rematerialization: each grid node's activations are
    # recomputed during backward (segment = one DecoderBlock), cutting the
    # training activation peak without the whole-graph remat's single giant
    # recompute segment
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        enc = list(self.encoder_channels[1:])[::-1]  # head first
        head = enc[0]
        in_channels = [head] + list(self.decoder_channels[:-1])
        skip_channels = enc[1:] + [0]
        out_channels = list(self.decoder_channels)
        depth = len(in_channels) - 1

        def node_fast(xin, skips, out_ch, use_catt):
            if (not self.fast_inference or (train and not self.fast_train)
                    or use_catt or out_ch >= 128):
                return False
            h, w = xin.shape[1], xin.shape[2]
            if 2 * h < self.fast_min_res or h < 3 or w < 3:
                return False
            return all(s.shape[1] == 2 * h and s.shape[2] == 2 * w
                       for s in skips)

        def make_block(depth_idx, layer_idx, fast=False, keep_packed=False):
            if depth_idx == 0:
                in_ch = in_channels[layer_idx]
                skip_ch = skip_channels[layer_idx] * (layer_idx + 1)
                out_ch = out_channels[layer_idx]
            else:
                out_ch = skip_channels[layer_idx]
                skip_ch = skip_channels[layer_idx] * (layer_idx + 1 - depth_idx)
                in_ch = skip_channels[layer_idx - 1]
            use_catt = self.star and layer_idx in (0, 1)
            cls = (nn.remat(DecoderBlock, static_argnums=(3,))
                   if self.remat and train else DecoderBlock)
            return cls(
                in_ch, skip_ch, out_ch, base_dim=self.base_dim, level=layer_idx,
                use_catt=use_catt, attention_type=self.attention_type,
                drop_block_prob=self.drop_block_prob, fast_tail=fast,
                keep_packed=keep_packed, pallas_tail=self.pallas_tail,
                fast_train=self.fast_train, dtype=self.dtype,
                name=f"x_{depth_idx}_{layer_idx}",
            )

        def node_out_ch(depth_idx, layer_idx):
            return (out_channels[layer_idx] if depth_idx == 0
                    else skip_channels[layer_idx])

        feats = features[1:][::-1]
        dense = {}
        # layer 0: the backbone column x_d_d (reference forward l.243-247)
        for d in range(depth):
            fast = node_fast(feats[d], [feats[d + 1]], node_out_ch(d, d),
                             self.star and d in (0, 1))
            dense[f"x_{d}_{d}"] = make_block(d, d, fast)(
                feats[d], feats[d + 1], train)
        # layers 1..depth-1: dense connections (l.249-257)
        prod_packed = False
        for layer_idx in range(1, depth):
            for depth_idx in range(depth - layer_idx):
                li = depth_idx + layer_idx
                # virtual concat: the block gates + convolves the parts
                # column-split, never materializing the concatenation
                cat = ([dense[f"x_{idx}_{li}"] for idx in range(depth_idx + 1, li + 1)]
                       + [feats[li + 1]])
                xin = dense[f"x_{depth_idx}_{li - 1}"]
                fast = node_fast(xin, cat, node_out_ch(depth_idx, li),
                                 self.star and li in (0, 1))
                keep = False
                if depth_idx == 0 and li == depth - 1 and fast:
                    # the final x_0_depth block consumes this node alone: if
                    # both run fast, hand it over s2d-packed (the <128-lane
                    # logical map is then never materialized)
                    h2, w2 = 2 * xin.shape[1], 2 * xin.shape[2]
                    keep = bool(out_channels[-1] < 128
                                and 2 * h2 >= self.fast_min_res
                                and h2 >= 4 and w2 >= 4)
                    prod_packed = keep
                dense[f"x_{depth_idx}_{li}"] = make_block(
                    depth_idx, li, fast, keep_packed=keep)(xin, cat, train)
        # final no-skip block x_0_depth (l.237,259)
        xin = dense[f"x_0_{depth - 1}"]
        if prod_packed:
            fast = True
        else:
            fast = node_fast(xin, [], out_channels[-1], False)
        final_cls = (nn.remat(DecoderBlock, static_argnums=(3,))
                     if self.remat and train else DecoderBlock)
        dense[f"x_0_{depth}"] = final_cls(
            in_channels[-1], 0, out_channels[-1], base_dim=self.base_dim,
            attention_type=self.attention_type,
            drop_block_prob=self.drop_block_prob, fast_tail=fast,
            keep_packed=fast and self.packed_final,
            packed_input=4 if prod_packed else 1,
            fast_train=self.fast_train, dtype=self.dtype,
            name=f"x_0_{depth}",
        )(xin, None, train)

        final = dense[f"x_0_{depth}"]
        if self.deep_supervision:
            return final, [dense["x_3_3"], dense["x_2_3"], dense["x_1_3"]]
        return final
