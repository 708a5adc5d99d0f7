"""Axial & cross-axial attention — the proposed model's attention kernels.

Behavioral re-design of reference ``src/main/archs/axial_attention_v2.py`` for TPU:
sequence layout is (batch, length, channels) (lane-major, MXU-friendly) instead of
torch's (batch, channels, length); the unusual BatchNorm *inside* the attention
logits (reference l.181-196 — joint normalization of qr/kr/dots replacing 1/sqrt(d)
scaling) is kept, computed in fp32.

Relative position encodings follow Axial-DeepLab (arXiv:2003.07853): one learned
table of shape (2·dkq+dv, 2·dim−1), gathered with the static index map
(i − j + dim − 1) and shared across heads (reference l.5-46).

Execution paths:
* train — jnp reference implementation with fp32 batch statistics (the three
  norms update running stats exactly like BatchNorm1d/2d).
* eval — all norms fold into per-channel affines; on TPU the whole attention
  (projection matmul → qr/kr/dots → folded norm → softmax → out/kv → merge)
  runs as ONE fused Pallas kernel (``ops.axial_attention``), jnp elsewhere.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import axial_attention as AK
from .layers import BatchNorm

Dtype = Any
_F32 = jnp.float32


class RelativePosEnc2D(nn.Module):
    """Learned relative positional embeddings for q, k, v (reference l.5-46).

    Returns (r_q, r_k, r_v) of shapes (dkq, dim, dim), (dkq, dim, dim),
    (dv, dim, dim) gathered from a (2·dkq+dv, 2·dim−1) table.
    """

    dim: int
    dim_v: int = 16
    dim_kq: int = 8

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        qkv_chan = 2 * self.dim_kq + self.dim_v
        table = self.param(
            "relative",
            nn.initializers.normal(stddev=1.0),
            (qkv_chan, 2 * self.dim - 1),
            jnp.float32,
        )
        # static gather index: entry [i, j] = i - j + dim - 1
        idx = np.arange(self.dim)[:, None] - np.arange(self.dim)[None, :] + self.dim - 1
        emb = table[:, idx.reshape(-1)].reshape(qkv_chan, self.dim, self.dim)
        r_q = emb[: self.dim_kq]
        r_k = emb[self.dim_kq: 2 * self.dim_kq]
        r_v = emb[2 * self.dim_kq:]
        return r_q, r_k, r_v


class _Norm:
    """Inline BatchNorm1d-style norm owned by the attention module, so eval can
    fold it into a per-channel affine for the fused kernel."""

    def __init__(self, module: nn.Module, name: str, channels: int,
                 momentum: float = 0.9, epsilon: float = 1e-5):
        self.scale = module.param(f"{name}_scale", nn.initializers.ones,
                                  (channels,), _F32)
        self.bias = module.param(f"{name}_bias", nn.initializers.zeros,
                                 (channels,), _F32)
        self.mean = module.variable("batch_stats", f"{name}_mean",
                                    lambda: jnp.zeros((channels,), _F32))
        self.var = module.variable("batch_stats", f"{name}_var",
                                   lambda: jnp.ones((channels,), _F32))
        self.momentum = momentum
        self.epsilon = epsilon
        self.initializing = module.is_initializing()

    def train_apply(self, x):
        """BN with batch statistics over all-but-last axes; updates stats.

        Normalization uses the biased batch variance but the running stat is
        updated with the UNBIASED one (n/(n−1)) — torch BatchNorm semantics,
        pinned by tests/test_axial_torch_oracle.py."""
        xf = x.astype(_F32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
        if not self.initializing:
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            self.mean.value = self.momentum * self.mean.value + (1 - self.momentum) * mean
            self.var.value = self.momentum * self.var.value + (1 - self.momentum) * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * self.scale + self.bias
        return y.astype(x.dtype)

    def folded(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(scale, bias) such that y = x*scale + bias equals eval-mode BN."""
        s = self.scale * jax.lax.rsqrt(self.var.value + self.epsilon)
        b = self.bias - self.mean.value * s
        return s, b

    def eval_apply(self, x):
        s, b = self.folded()
        return (x * s.astype(x.dtype) + b.astype(x.dtype))


def _attention_core_train(q, k, v, r_q, r_k, r_v, logit_norm: _Norm, dtype):
    """Shared axial-attention math, training path (reference l.167-213).

    q, k: (b, L, dkq, H); v: (b, L, dv, H); r_*: (d*, L, L).
    Returns (out, kv), each (b, H, dv, L).
    """
    qr = jnp.einsum("bdih,idj->bhdj", q, r_q.astype(dtype))
    kr = jnp.einsum("bdih,idj->bhdj", k, r_k.astype(dtype))
    dots = jnp.einsum("bdih,bjih->bhdj", q, k)
    # joint BN over the three stacked maps; channel order (h, n) matches the
    # reference's rearrange 'n b h d j -> b (h n) d j'
    stacked = jnp.stack([qr, kr, dots], axis=-1)  # (b, H, d, j, 3)
    b, h, d, j, _ = stacked.shape
    flat = stacked.transpose(0, 2, 3, 1, 4).reshape(b, d, j, h * 3)
    flat = logit_norm.train_apply(flat)
    logits = flat.reshape(b, d, j, h, 3).sum(axis=-1).transpose(0, 3, 1, 2)
    attn = jax.nn.softmax(logits.astype(_F32), axis=-1).astype(dtype)
    out = jnp.einsum("bhdj,bjih->bhid", attn, v)
    kv = jnp.einsum("bhdj,idj->bhid", attn, r_v.astype(dtype))
    return out, kv


def _merge_outputs_train(out, kv, out_norm: _Norm):
    """BN over the stacked (kv, out) then element-wise sum (reference
    l.205-213). out/kv: (b, H, dv, L) -> (b, L, H*dv); BN channel order (n,h,i)
    matches 'n b h i d -> b (n h i) d'."""
    b, h, dv, L = out.shape
    stacked = jnp.stack([kv, out], axis=1)  # (b, 2, H, dv, L)
    flat = stacked.transpose(0, 4, 1, 2, 3).reshape(b, L, 2 * h * dv)
    flat = out_norm.train_apply(flat)
    return flat.reshape(b, L, 2, h * dv).sum(axis=2)


def _axial_eval(x_q, x_v, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v,
                logit_aff, out_aff, heads, dkq, dv, dtype):
    """Folded eval path shared by self- and cross-attention; dispatches to the
    fused Pallas kernel on TPU, folded jnp elsewhere.

    x_q: (b, L, C_q) source of q,k; x_v: (b, L, C_v) source of v (== x_q and
    w_v merged into w_kq for self-attention).
    """
    return AK.axial_attention(
        x_q, x_v, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v, logit_aff, out_aff,
        heads=heads, dkq=dkq, dv=dv, dtype=dtype)


class AxialAttention(nn.Module):
    """Single-axis self-attention with relative position terms (reference
    l.138-213). Input/output: (b, L, C) with L == ``dim``, C == ``in_channels``."""

    dim: int
    in_channels: int = 128
    heads: int = 8
    dim_head_kq: int = 8
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None  # None = auto (TPU only)

    @nn.compact
    def __call__(self, x, train: bool = False):
        H = self.heads
        dkq = self.dim_head_kq
        dv = self.in_channels // H
        qkv_ch = 2 * dkq + dv
        w = self.param("to_qkv", nn.initializers.lecun_normal(),
                       (self.in_channels, H * qkv_ch), _F32)
        qkv_norm = _Norm(self, "to_qkv_bn", H * qkv_ch)
        r_q, r_k, r_v = RelativePosEnc2D(self.dim, dv, dkq, name="pos_enc")()
        logit_norm = _Norm(self, "attention_norm", H * 3)
        out_norm = _Norm(self, "out_norm", 2 * self.in_channels)

        if train or self.is_initializing():
            qkv = (x @ w.astype(self.dtype))
            qkv = qkv_norm.train_apply(qkv)
            b, L, _ = qkv.shape
            # torch channel factorization 'b (q h) d': channel = q_idx*H + h_idx
            qkv = qkv.reshape(b, L, qkv_ch, H)
            q, k, v = (qkv[:, :, :dkq], qkv[:, :, dkq:2 * dkq],
                       qkv[:, :, 2 * dkq:])
            out, kv = _attention_core_train(q, k, v, r_q, r_k, r_v,
                                            logit_norm, self.dtype)
            return _merge_outputs_train(out, kv, out_norm)

        # eval: fold all norms, fused path
        return _axial_eval(
            x, x, w, None, qkv_norm.folded(), None, r_q, r_k, r_v,
            logit_norm.folded(), out_norm.folded(), H, dkq, dv, self.dtype)


class CrossAxialAttention(nn.Module):
    """Axial attention where q, k come from the decoder state and v from the
    skip connection (reference l.55-135) — the UNet++ skip gate.

    x_in: (b, L, C_in); skip: (b, L, C_skip). Output: (b, L, C_skip).
    """

    dim: int
    in_channels: int = 128
    in_skip_channels: int = 128
    heads: int = 8
    dim_head_kq: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, skip, train: bool = False):
        H = self.heads
        dkq = self.dim_head_kq
        dv = self.in_skip_channels // H
        w_kq = self.param("to_kq", nn.initializers.lecun_normal(),
                          (self.in_channels, H * 2 * dkq), _F32)
        w_v = self.param("to_v", nn.initializers.lecun_normal(),
                         (self.in_skip_channels, H * dv), _F32)
        kq_norm = _Norm(self, "to_kq_bn", H * 2 * dkq)
        v_norm = _Norm(self, "to_v_bn", H * dv)
        r_q, r_k, r_v = RelativePosEnc2D(self.dim, dv, dkq, name="pos_enc")()
        logit_norm = _Norm(self, "attention_norm", H * 3)
        out_norm = _Norm(self, "out_norm", 2 * self.in_skip_channels)

        if train or self.is_initializing():
            kq = kq_norm.train_apply(x_in @ w_kq.astype(self.dtype))
            v = v_norm.train_apply(skip @ w_v.astype(self.dtype))
            b, L, _ = kq.shape
            kq = kq.reshape(b, L, 2 * dkq, H)
            q, k = kq[:, :, :dkq], kq[:, :, dkq:]
            v = v.reshape(b, L, dv, H)
            out, kv = _attention_core_train(q, k, v, r_q, r_k, r_v,
                                            logit_norm, self.dtype)
            return _merge_outputs_train(out, kv, out_norm)

        return _axial_eval(
            x_in, skip, w_kq, w_v, kq_norm.folded(), v_norm.folded(),
            r_q, r_k, r_v, logit_norm.folded(), out_norm.folded(),
            H, dkq, dv, self.dtype)


class AxialAttentionBlock(nn.Module):
    """Residual height-then-width axial attention block (reference l.223-299,
    Axial-DeepLab Fig. 2). Input (b, H, W, C) with H == W == ``dim``.

    ``down_sample=True`` halves the spatial size (avg-pool on the attention
    branch, stride-2 conv shortcut) — used as the first layer4 block of
    BoTSER50 (unetplusplusstar.py:295-328).
    """

    in_channels: int
    out_channels: int
    down_sample: bool
    dim: int
    heads: int = 8
    d_in: int = 512  # hardcoded in the reference (l.241)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, train: bool = False):
        b, h, w, _ = x_in.shape
        x = nn.Conv(self.d_in, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="in_conv")(x_in)
        x = BatchNorm(dtype=self.dtype, name="in_bn")(x, train)
        x = nn.relu(x)

        # height attention: each column is a sequence of length h
        cols = x.transpose(0, 2, 1, 3).reshape(b * w, h, self.d_in)
        cols = AxialAttention(self.dim, self.d_in, self.heads,
                              dtype=self.dtype, name="height_att")(cols, train)
        # -> rows: each row is a sequence of length w
        rows = (cols.reshape(b, w, h, self.d_in)
                    .transpose(0, 2, 1, 3)
                    .reshape(b * h, w, self.d_in))
        rows = AxialAttention(self.dim, self.d_in, self.heads,
                              dtype=self.dtype, name="width_att")(rows, train)
        x = rows.reshape(b, h, w, self.d_in)

        shortcut = x_in
        if self.down_sample:
            # explicit symmetric pad: torch Conv2d(k=3, s=2, padding=1)
            # samples even-size inputs starting at offset -1; stride-2 "SAME"
            # pads (0,1) and starts at 0 — a different alignment
            # (caught by tests/test_flagship_torch_oracle.py)
            shortcut = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)], use_bias=True,
                               dtype=self.dtype,
                               param_dtype=jnp.float32, name="shortcut_conv")(x_in)
            shortcut = BatchNorm(dtype=self.dtype, name="shortcut_bn")(shortcut, train)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = BatchNorm(dtype=self.dtype, name="att_down_bn")(x, train)

        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="out_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="out_bn")(x, train)
        return nn.relu(x + shortcut)
