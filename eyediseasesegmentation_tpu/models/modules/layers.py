"""Shared model building blocks (flax, NHWC, bf16-compute / fp32-param policy).

Capability parity with the reference's ``archs/modules/`` + smp base modules:
Conv2dReLU with DropBlock (unetplusplusstar.py:22-63), SE block (se_block.py),
scSE attention (smp md.Attention('scse')), CBAM (attention_block.py), attention
gate (attention_block.py:8+), ASPP (aspp.py), DropBlock2d (dropblock.py),
Segmentation/Classification heads (unetplusplusstar.py:163-183).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BatchNorm(nn.Module):
    """BatchNorm2d: fp32 statistics, bandwidth-lean eval path.

    Training computes batch statistics in fp32 (flax BatchNorm). Eval folds the
    running stats + affine into one per-channel (scale, bias) in fp32 and
    applies it in the compute dtype — a single fused multiply-add instead of
    bf16→fp32→bf16 round trips at every normalization (HBM-bound at 1024²).

    ``frozen=True`` reproduces the reference's frozen-BN-on-pretrained-layers
    behavior (set_bn_eval, unetplusplusstar.py:268-277): running stats are used
    even in training and never updated.
    """

    dtype: Dtype = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5
    frozen: bool = False
    packed: int = 1  # s2d pack factor of the input; params stay logical

    @nn.compact
    def __call__(self, x, train: bool = False, fold_only: bool = False):
        # fold_only: x is the channel COUNT; declare the identical params /
        # running stats and return the folded eval (scale, bias) f32 pair for
        # a fused consumer (the Pallas decode-node kernel) instead of
        # applying them
        c = (int(x) if fold_only else x.shape[-1]) // self.packed
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if fold_only:
            assert not train and self.packed == 1
            scale = gamma * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return scale, beta - ra_mean.value * scale
        use_running = (not train) or self.frozen
        if use_running:
            scale = gamma * jax.lax.rsqrt(ra_var.value + self.epsilon)
            bias = beta - ra_mean.value * scale
            if self.packed > 1:
                scale = jnp.tile(scale, self.packed)
                bias = jnp.tile(bias, self.packed)
            y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
            return y.astype(self.dtype)
        xf = x.astype(jnp.float32)
        if self.packed > 1:
            # packed train mode (the grad-safe packed tail): batch statistics
            # per LOGICAL channel — phases are just spatial positions, so the
            # reduce covers the same elements as the logical path (equal up
            # to reassociation)
            n, h, w, cf = xf.shape
            xf = xf.reshape(n, h, w, self.packed, c)
        axes = tuple(range(xf.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * gamma + beta
        if self.packed > 1:
            y = y.reshape(x.shape)
        return y.astype(self.dtype)


class DropBlock2d(nn.Module):
    """Structured dropout over contiguous blocks (timm DropBlock2d semantics,
    used inside Conv2dReLU, unetplusplusstar.py:49). Stateless: a pure function
    of the 'dropout' PRNG collection; identity when not training or prob == 0."""

    drop_prob: float = 0.1
    block_size: int = 7
    # packed: the input lives in a packed layout (2 = H2 phase-major along
    # H, 4 = space-to-depth); the mask is generated at the LOGICAL
    # resolution with the same rng stream and then packed, so the kept
    # elements are bit-identical to the logical path's (the grad-safe
    # packed train tail)
    packed: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.drop_prob <= 0.0:
            return x
        pf = self.packed
        n = x.shape[0]
        if pf == 1:
            h, w = x.shape[1], x.shape[2]
        elif pf == 2:
            h, w = 2 * x.shape[1], x.shape[2]
        else:
            assert pf in (4, 16)
            k = pf.bit_length() // 2  # 4 -> 1× s2d, 16 -> 2×
            h, w = x.shape[1] << k, x.shape[2] << k
        bs = min(self.block_size, h, w)
        total = h * w
        valid = (h - bs + 1) * (w - bs + 1)
        gamma = self.drop_prob * total / (bs ** 2) / max(valid, 1)
        key = self.make_rng("dropout")
        noise = jax.random.bernoulli(key, gamma, (n, h, w, 1)).astype(x.dtype)
        # expand block centers to block_size x block_size via max-pool
        block_mask = nn.max_pool(noise, (bs, bs), strides=(1, 1), padding="SAME")
        keep = 1.0 - block_mask
        norm = keep.size / jnp.maximum(jnp.sum(keep), 1.0)
        if pf > 1:
            from ...ops import packed as PK
            if pf == 2:
                kp = PK.pack_h2(keep)
            else:
                kp = keep
                for _ in range(pf.bit_length() // 2):
                    kp = PK.space_to_depth(kp)
            c = x.shape[-1] // pf
            kp = jnp.broadcast_to(kp[..., None], kp.shape + (c,))
            keep = kp.reshape(x.shape[:-1] + (pf * c,))
        return x * keep * norm.astype(x.dtype)


class Conv2d(nn.Module):
    """Thin conv wrapper that routes tiny-channel high-res 3×3 convs through
    the space-to-depth packed path (``ops.fastconv`` — ~3× on v5e, see module
    docstring there); everything else through lax conv. Param layout matches
    nn.Conv ('kernel' HWIO, optional 'bias').

    ``mode`` selects an exact layout rewrite for the decoder tail
    (ops/packed.py; params stay in the logical layout):
      * 'normal'    — plain NHWC in/out
      * 's2d_out'   — unpacked input(s), space-to-depth packed output
      * 'packed_in' — packed input(s) (packed_factor× channels), packed output
      * 'phase_up'  — input is the PRE-upsample map (unpacked if
                      packed_factor == 4, s2d-packed if 16); computes
                      conv3x3(bilinear_up2(x)) fused, packed output
      * 'h2_out'    — unpacked input(s), output packed along H only
                      (factor 2; 4/3 FLOPs for 2·cout lanes)
      * 'h2_in'     — H2-packed input(s), H2-packed output (2× FLOPs)
    ``packed_factor``: pack depth of the packed side — 2 (H2 modes), 4 (one
    s2d) or 16 (two); the output of non-'normal' modes carries
    features × packed_factor channels.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = True
    feature_group_count: int = 1
    mode: str = "normal"
    packed_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scales=None, params_only: bool = False):
        from ...ops.fastconv import conv3x3_s2d, pack_kernel_3x3, should_pack
        from ...ops import packed as PK

        if params_only:
            # declare the identical logical params and hand them to a fused
            # consumer (the Pallas decode-node kernel)
            parts = list(x) if isinstance(x, (list, tuple)) else [x]
            cin = sum(p.shape[-1] for p in parts)
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.kernel_size, self.kernel_size, cin, self.features),
                jnp.float32)
            if not self.use_bias:
                return kernel, None
            return kernel, self.param("bias", nn.initializers.zeros,
                                      (self.features,), jnp.float32)

        k = self.kernel_size
        pf = self.packed_factor
        assert scales is None or self.mode in ("s2d_out", "h2_out")
        if self.mode != "normal":
            assert k == 3 and self.strides == 1 and self.feature_group_count == 1
            assert pf in (2, 4, 16)
            parts = list(x) if isinstance(x, (list, tuple)) else [x]
            in_pf = {"packed_in": pf, "phase_up": pf // 4, "s2d_out": 1,
                     "h2_out": 1, "h2_in": 2}[self.mode]
            cin = sum(p.shape[-1] for p in parts) // in_pf
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (k, k, cin, self.features), jnp.float32)
            if self.mode == "s2d_out":
                y = PK.conv3x3_s2d_out(parts, kernel, dtype=self.dtype,
                                       scales=scales)
            elif self.mode == "h2_out":
                y = PK.conv3x3_h2_out(parts, kernel, dtype=self.dtype,
                                      scales=scales)
            elif self.mode == "h2_in":
                y = PK.conv3x3_h2(parts, kernel, dtype=self.dtype)
            elif self.mode == "phase_up":
                assert len(parts) == 1
                fn = (PK.phase_upconv_s2d if pf == 4
                      else PK.phase_upconv_s2d_packed)
                y = fn(parts[0], kernel, dtype=self.dtype)
            else:  # packed_in
                y = None
                off = 0
                for p in parts:
                    c = p.shape[-1] // pf
                    kp = kernel[:, :, off:off + c]
                    for _ in range(pf.bit_length() // 2):  # 4→1×, 16→2×
                        kp = pack_kernel_3x3(kp)
                    yp = jax.lax.conv_general_dilated(
                        p.astype(self.dtype), kp.astype(self.dtype), (1, 1),
                        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    y = yp if y is None else y + yp
                    off += c
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + PK.tile_channels(bias, pf).astype(y.dtype)
            return y
        # a list input means "conv over the concat of these parts" computed
        # WITHOUT materializing the concat: conv(cat(a,b), W) =
        # conv(a, W_a) + conv(b, W_b) — ~20% faster on v5e and saves the
        # concat's HBM round-trip (see PERFORMANCE.md)
        parts = list(x) if isinstance(x, (list, tuple)) else [x]
        cin = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin // self.feature_group_count, self.features), jnp.float32)
        if (len(parts) == 1 and k == 3 and self.strides == 1
                and self.feature_group_count == 1
                and should_pack(parts[0].shape[1], parts[0].shape[2], cin,
                                self.features)):
            y = conv3x3_s2d(parts[0], kernel, compute_dtype=self.dtype)
        else:
            y = None
            offset = 0
            for p in parts:
                c = p.shape[-1]
                kp = kernel if len(parts) == 1 else kernel[:, :, offset:offset + c]
                yp = jax.lax.conv_general_dilated(
                    p.astype(self.dtype), kp.astype(self.dtype),
                    window_strides=(self.strides, self.strides),
                    padding="SAME" if k > 1 else "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=self.feature_group_count)
                y = yp if y is None else y + yp
                offset += c
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class ConvBNReLU(nn.Module):
    """conv → DropBlock → BN → ReLU (the reference Conv2dReLU,
    unetplusplusstar.py:22-63). ``mode`` (eval-only layout rewrite, see
    Conv2d): for non-'normal' modes the output is s2d-packed and BN runs
    with packed=4."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_batchnorm: bool = True
    drop_block_prob: float = 0.1
    mode: str = "normal"
    packed_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, scales=None, gate=None):
        if self.mode == "pallas_params":
            # declare the identical params (same scopes as the normal path)
            # and hand them to a fused consumer — the two-conv decode-node
            # kernel (ops/pallas_decode_pair.py) consumes conv1's AND conv2's
            # params in one pallas_call
            parts = list(x) if isinstance(x, (list, tuple)) else [x]
            kernel, conv_bias = Conv2d(
                self.features, kernel_size=self.kernel_size,
                strides=self.strides, use_bias=not self.use_batchnorm,
                dtype=self.dtype, name="conv")(parts, params_only=True)
            if self.use_batchnorm:
                scale, bias = BatchNorm(dtype=self.dtype)(
                    self.features, fold_only=True)
            else:
                scale, bias = None, conv_bias
            return kernel, scale, bias
        if self.mode == "pallas":
            # whole stage (optional scSE input gate -> conv3x3 over the
            # virtual concat -> folded BN -> ReLU) as ONE Pallas kernel /
            # HBM pass (ops/pallas_scse_conv.py). Params and module names
            # are identical to the normal path. ``gate`` is the raw-gates
            # triple from Attention(raw_gates=True), or None for the
            # ungated conv2 form.
            import jax as _jax
            from ...ops.pallas_scse_conv import scse_conv3x3_bn_relu

            assert not train, "pallas ConvBNReLU is an eval-only rewrite"
            parts = list(x) if isinstance(x, (list, tuple)) else [x]
            parts = [p.astype(self.dtype) for p in parts]
            kernel, conv_bias = Conv2d(
                self.features, kernel_size=self.kernel_size,
                strides=self.strides, use_bias=not self.use_batchnorm,
                dtype=self.dtype, name="conv")(parts, params_only=True)
            if self.use_batchnorm:
                scale, bias = BatchNorm(dtype=self.dtype)(
                    self.features, fold_only=True)
            else:
                scale, bias = None, conv_bias
            C = sum(p.shape[-1] for p in parts)
            gated = gate is not None
            if not gated:
                gate = (jnp.zeros((parts[0].shape[0], C), jnp.float32),
                        jnp.zeros((C,), jnp.float32), jnp.float32(0.0))
            return scse_conv3x3_bn_relu(
                parts, *gate, kernel, scale, bias, relu=True, gated=gated,
                interpret=_jax.default_backend() != "tpu")
        x = Conv2d(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            use_bias=not self.use_batchnorm,
            mode=self.mode,
            packed_factor=self.packed_factor,
            dtype=self.dtype,
            name="conv",
        )(x, scales=scales)
        pf = 1 if self.mode == "normal" else self.packed_factor
        # the packed DropBlock draws the identical logical mask from the
        # same rng stream, so train mode is exact vs the normal path
        x = DropBlock2d(self.drop_block_prob, block_size=7, packed=pf)(x, train)
        if self.use_batchnorm:
            x = BatchNorm(dtype=self.dtype, packed=pf)(x, train)
        return nn.relu(x)


class SEBlock(nn.Module):
    """Squeeze-excite (reference se_block.py:10-26; also SENet encoders)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(max(c // self.reduction, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class SCSEAttention(nn.Module):
    """Concurrent spatial & channel SE (smp md.Attention('scse'), used as the
    decoder attention for non-cross-attention blocks, unetplusplusstar.py:122-124).

    Accepts a list input ("the concat of these parts") and then returns the
    gated parts WITHOUT materializing the concat: the channel gate is computed
    from the concatenated pooled means (tiny), the spatial gate's 1×1 conv
    splits by columns, and each part is gated independently — exactly
    scse(cat(parts)) split back into parts.
    """

    reduction: int = 16
    packed: int = 1  # 4: input is one s2d-packed tensor, params logical
    # unpack_h2: input is H2-packed (packed == 2, phase-major along H); emit
    # the gated output UNPACKED — the gating multiply and the H2 un-
    # interleave fuse into one pass (measured 1.06 vs 1.87 + 1.72 ms split
    # at the x_1_3 shape, tools/bench_wpack2 probes).
    unpack_h2: bool = False
    # return_gates: return (channel_gate (N,1,1,C), spatial_gate (N,H,W,1))
    # instead of gated parts — the fast tail path fuses the multiply into the
    # following conv's input instead of materializing gated maps.
    return_gates: bool = False
    # raw_gates: return (channel_gate (N,C) f32, sse_kernel (C,) f32,
    # sse_bias () f32) — the Pallas decode-node kernel computes the spatial
    # gate itself from its resident tile, so only the pooled-mean channel
    # gate and the raw sSE 1×1 params leave this module.
    raw_gates: bool = False
    # up_part0: part 0 is the PRE-×2-upsample map: its pooled mean equals the
    # upsampled map's (bilinear columns sum to 2) and its sSE contribution is
    # upsampled after the 1×1 conv (conv1x1 ∘ up2 == up2 ∘ conv1x1) — the big
    # upsampled tensor is never read for gate computation. Exact.
    up_part0: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mean_override=None):
        if self.packed > 1:
            assert mean_override is None
            return self._packed_call(x)
        parts = list(x) if isinstance(x, (list, tuple)) else None
        xs = parts if parts is not None else [x]
        c = sum(p.shape[-1] for p in xs)
        # channel SE gate from pooled means (pooling commutes with concat).
        # mean_override: (N, C) f32 pooled means already produced by a fused
        # producer's gate-reduce epilogue (ops/pallas_decode_pair.py) — the
        # big map is then never re-read here.
        if mean_override is not None:
            s = mean_override[:, None, None, :].astype(xs[0].dtype)
        else:
            s = jnp.concatenate(
                [jnp.mean(p, axis=(1, 2), keepdims=True) for p in xs],
                axis=-1)
        s = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        # spatial SE gate: 1x1 conv over the (virtual) concat = column-split sum
        kernel = self.param("sse_kernel", nn.initializers.lecun_normal(),
                            (1, 1, c, 1), jnp.float32)
        bias = self.param("sse_bias", nn.initializers.zeros, (1,), jnp.float32)
        if self.raw_gates:
            # sigmoid in the compute dtype (matches the normal path's
            # numerics), upcast for the kernel's f32 gate math
            return (jax.nn.sigmoid(s).astype(jnp.float32).reshape(
                        s.shape[0], c),
                    kernel[0, 0, :, 0], bias[0])
        # the 1x1 conv expressed as a channel reduce so XLA fuses it with the
        # pooled-mean reduce above into ONE read per part (measured
        # 6.1 -> 2.7 ms at the x_1_3 shape); t kept 3-D until the very end;
        # f32 accumulation (the conv path accumulates f32 on the MXU)
        t = None
        offset = 0
        for i, p in enumerate(xs):
            cp = p.shape[-1]
            w1 = kernel[0, 0, offset:offset + cp, 0].astype(self.dtype)
            tp = (p.astype(self.dtype) * w1).sum(-1, dtype=jnp.float32)
            if i == 0 and self.up_part0:
                tp = upsample2x(tp[..., None])[..., 0]
            t = tp if t is None else t + tp
            offset += cp
        gate_s = jax.nn.sigmoid(t + bias.astype(t.dtype))[..., None]
        if self.return_gates:
            return jax.nn.sigmoid(s), gate_s
        if parts is None:
            return x * (jax.nn.sigmoid(s) + gate_s)
        out = []
        offset = 0
        for p in xs:
            cp = p.shape[-1]
            gate_c = jax.nn.sigmoid(s[..., offset:offset + cp])
            out.append(p * (gate_c + gate_s))
            offset += cp
        return out

    def _packed_call(self, xp):
        """scse on an s2d-packed map with the logical parameters — exactly
        d2s ∘ scse ∘ s2d (eval layout rewrite for the decoder tail)."""
        from ...ops import packed as PK

        n, h, w, cf = xp.shape
        c = cf // self.packed
        m = PK.packed_spatial_mean(xp, self.packed).astype(xp.dtype)
        s = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(m)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        kernel = self.param("sse_kernel", nn.initializers.lecun_normal(),
                            (1, 1, c, 1), jnp.float32)
        bias = self.param("sse_bias", nn.initializers.zeros, (1,), jnp.float32)
        t = PK.packed_spatial_gate(xp.astype(self.dtype),
                                   kernel.astype(self.dtype), bias,
                                   self.packed)
        gate_s = jax.nn.sigmoid(t)                        # (n,h,w,packed)
        gate_c = jax.nn.sigmoid(s)                        # (n,1,1,c)
        y = (xp.reshape(n, h, w, self.packed, c)
             * (gate_c[:, :, :, None, :].astype(xp.dtype)
                + gate_s[..., None].astype(xp.dtype)))
        if self.unpack_h2:
            assert self.packed == 2
            return y.transpose(0, 1, 3, 2, 4).reshape(n, 2 * h, w, c)
        return y.reshape(n, h, w, cf)


class Attention(nn.Module):
    """smp-style attention dispatcher: None → identity, 'scse' → SCSE."""

    attention_type: Optional[str] = None
    packed: int = 1
    unpack_h2: bool = False
    return_gates: bool = False
    raw_gates: bool = False
    up_part0: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mean_override=None):
        if self.attention_type is None:
            if self.raw_gates:
                return (None, None, None)
            return (None, None) if self.return_gates else x
        if self.attention_type == "scse":
            return SCSEAttention(packed=self.packed,
                                 unpack_h2=self.unpack_h2,
                                 return_gates=self.return_gates,
                                 raw_gates=self.raw_gates,
                                 up_part0=self.up_part0, dtype=self.dtype)(
                                     x, mean_override=mean_override)
        raise ValueError(f"Unknown attention type {self.attention_type}")


class CBAMChannel(nn.Module):
    """CBAM channel attention (reference attention_block.py Channel_Spatial_Attention)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mlp = nn.Sequential([
            nn.Dense(max(c // self.reduction, 1), dtype=self.dtype, param_dtype=jnp.float32),
            nn.relu,
            nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32),
        ])
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        return x * jax.nn.sigmoid(avg + mx)[:, None, None, :]


class CBAMSpatial(nn.Module):
    """CBAM spatial attention."""

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        a = jnp.concatenate([avg, mx], axis=-1)
        a = nn.Conv(1, (self.kernel_size, self.kernel_size), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(a)
        return x * jax.nn.sigmoid(a)


class CBAM(nn.Module):
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = CBAMChannel(self.reduction, dtype=self.dtype)(x)
        return CBAMSpatial(dtype=self.dtype)(x)


class AttentionGate(nn.Module):
    """Additive attention gate (Attention U-Net; reference attention_block.py:8+).

    g: gating signal (decoder), x: skip. Returns gated skip."""

    inter_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        wg = nn.Conv(self.inter_features, (1, 1), use_bias=True,
                     dtype=self.dtype, param_dtype=jnp.float32)(g)
        wx = nn.Conv(self.inter_features, (1, 1), use_bias=True,
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        a = nn.relu(wg + wx)
        a = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)(a)
        a = BatchNorm(dtype=self.dtype)(a, train)
        return x * jax.nn.sigmoid(a)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling with image pooling (reference aspp.py:7-59)."""

    features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [ConvBNReLU(self.features, 1, drop_block_prob=0.0, dtype=self.dtype)(x, train)]
        for rate in self.rates:
            y = nn.Conv(self.features, (3, 3), padding="SAME",
                        kernel_dilation=(rate, rate), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            y = BatchNorm(dtype=self.dtype)(y, train)
            outs.append(nn.relu(y))
        # image-level pooling
        p = jnp.mean(x, axis=(1, 2), keepdims=True)
        p = ConvBNReLU(self.features, 1, drop_block_prob=0.0, dtype=self.dtype)(p, train)
        p = jnp.broadcast_to(p, (x.shape[0], x.shape[1], x.shape[2], self.features))
        outs.append(p)
        y = jnp.concatenate(outs, axis=-1)
        return ConvBNReLU(self.features, 1, drop_block_prob=0.0, dtype=self.dtype)(y, train)


class DepthwiseSeparableConv2d(nn.Module):
    """Depthwise + pointwise conv (reference dsconv.py:6-24)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.Conv(c, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides), padding="SAME",
                    feature_group_count=c, dtype=self.dtype,
                    param_dtype=jnp.float32, name="depthwise")(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="pointwise")(y)


class DoubleConv(nn.Module):
    """(conv-BN-ReLU) ×2 — classic U-Net primitive (reference common.py:1-77)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, 3, drop_block_prob=0.0, dtype=self.dtype)(x, train)
        return ConvBNReLU(self.features, 3, drop_block_prob=0.0, dtype=self.dtype)(x, train)


class SegmentationHead(nn.Module):
    """kxk conv (+ optional upsampling) to class logits (unetplusplusstar.py:163-168).

    ``packed_in``: s2d pack factor (4 or 16) of the incoming final decoder
    map (eval layout rewrite); the packed conv output is unpacked back to
    logical. 0 = plain input."""

    classes: int = 1
    kernel_size: int = 3
    upsampling: int = 1
    packed_in: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.classes, kernel_size=self.kernel_size,
                   use_bias=True, dtype=self.dtype,
                   mode="packed_in" if self.packed_in else "normal",
                   packed_factor=self.packed_in or 4,
                   name="conv")(x)
        if self.packed_in:
            from ...ops.packed import depth_to_space
            for _ in range(int(self.packed_in).bit_length() // 2):
                x = depth_to_space(x)
        if self.upsampling > 1:
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, h * self.upsampling, w * self.upsampling, c), "bilinear")
        return x.astype(jnp.float32)


class ClassificationHead(nn.Module):
    """Global-pool → dropout → linear (unetplusplusstar.py:170-183)."""

    classes: int = 1
    pooling: str = "avg"
    dropout: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = jnp.mean(x, axis=(1, 2)) if self.pooling == "avg" else jnp.max(x, axis=(1, 2))
        s = nn.Dropout(self.dropout, deterministic=not train)(s)
        s = nn.Dense(self.classes, dtype=self.dtype, param_dtype=jnp.float32)(s)
        return s.astype(jnp.float32)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _up2_matrix(h: int):
    """(2h, h) banded bilinear ×2 interpolation matrix (half-pixel centers,
    edge clamp): out[2i] = 0.25·x[i-1] + 0.75·x[i]; out[2i+1] = 0.75·x[i] +
    0.25·x[i+1] — verified equal to jax.image.resize 'bilinear'."""
    import numpy as np
    U = np.zeros((2 * h, h), np.float32)
    for i in range(2 * h):
        if i % 2 == 0:
            U[i, max(i // 2 - 1, 0)] += 0.25
            U[i, i // 2] += 0.75
        else:
            U[i, i // 2] += 0.75
            U[i, min(i // 2 + 1, h - 1)] += 0.25
    return U


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear ×2 upsampling, NHWC (F.interpolate(scale_factor=2, 'bilinear')).

    On TPU this runs as ONE depthwise transposed conv (lhs_dilation=2,
    separable [1,3,3,1]/4 kernel) over an edge-replicated 1-pixel pad — the
    pad reproduces resize's half-pixel edge clamp exactly, and the single
    pass is bandwidth-optimal: 1.4 ms vs 5.0 ms for the previous two banded
    einsums and 14-56 ms for ``jax.image.resize``'s gather at the flagship's
    decoder shapes. On other backends the plain resize is used."""
    n, h, w, c = x.shape
    if jax.default_backend() != "tpu":
        return jax.image.resize(x, (n, 2 * h, 2 * w, c), "bilinear")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    k = (k1[:, None] * k1[None, :]).reshape(4, 4, 1, 1)
    k = jnp.broadcast_to(k, (4, 4, 1, c))
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return y[:, 2:2 + 2 * h, 2:2 + 2 * w]


def upsample2x_w(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear ×2 along W only, NHWC → (N, H, 2W, C).

    The W-direction half of ``upsample2x`` (same half-pixel centers and edge
    clamp).  Used by the ``pallas_tail="pair_up"`` decode-node kernel, which
    streams part 0 in this half-height form and performs the H-direction
    interpolation in-kernel (2-term row FMAs), halving the materialized
    intermediate's HBM traffic (ops/pallas_decode_pair.py)."""
    n, h, w, c = x.shape
    if jax.default_backend() != "tpu":
        return jax.image.resize(x, (n, h, 2 * w, c), "bilinear")
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    k = jnp.broadcast_to(k1.reshape(1, 4, 1, 1), (1, 4, 1, c))
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), ((0, 0), (2, 2)),
        lhs_dilation=(1, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return y[:, :, 2:2 + 2 * w]


def maxpool2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def avgpool2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))
