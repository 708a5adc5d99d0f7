"""Axial & cross-axial attention — the proposed model's attention kernels.

Behavioral re-design of reference ``src/main/archs/axial_attention_v2.py`` for TPU:
sequence layout is (batch, length, channels) (lane-major, MXU-friendly) instead of
torch's (batch, channels, length); all einsums map onto the MXU; the unusual
BatchNorm *inside* the attention logits (reference l.181-196 — joint normalization
of qr/kr/dots replacing 1/sqrt(d) scaling) is kept, computed in fp32.

Relative position encodings follow Axial-DeepLab (arXiv:2003.07853): one learned
table of shape (2·dkq+dv, 2·dim−1), gathered with the static index map
(i − j + dim − 1) and shared across heads (reference l.5-46).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BatchNorm

Dtype = Any


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


def _attention_core(q, k, v, r_q, r_k, r_v, bn_logits, dtype):
    """Shared axial-attention math (reference l.167-213).

    q, k: (b, L, dkq, H); v: (b, L, dv, H); r_*: (d*, L, L).
    ``bn_logits`` normalizes the stacked (qr, kr, dots) similarity maps.
    Returns (out, kv), each (b, H, dv, L).
    """
    f32 = jnp.float32
    # positional and content logits, each (b, H, L_query=d, L_key=j)
    qr = jnp.einsum("bdih,idj->bhdj", q, r_q.astype(dtype))
    kr = jnp.einsum("bdih,idj->bhdj", k, r_k.astype(dtype))
    dots = jnp.einsum("bdih,bjih->bhdj", q, k)
    # joint BN over the three stacked maps; channel order (h, n) matches the
    # reference's rearrange 'n b h d j -> b (h n) d j'
    stacked = jnp.stack([qr, kr, dots], axis=-1)  # (b, H, d, j, 3)
    b, h, d, j, _ = stacked.shape
    flat = stacked.transpose(0, 2, 3, 1, 4).reshape(b, d, j, h * 3)
    flat = bn_logits(flat)
    logits = flat.reshape(b, d, j, h, 3).sum(axis=-1).transpose(0, 3, 1, 2)
    attn = jax.nn.softmax(logits.astype(f32), axis=-1).astype(dtype)
    out = jnp.einsum("bhdj,bjih->bhid", attn, v)
    kv = jnp.einsum("bhdj,idj->bhid", attn, r_v.astype(dtype))
    return out, kv


def _merge_outputs(out, kv, bn_out):
    """BN over the stacked (kv, out) then element-wise sum (reference l.205-213).

    out/kv: (b, H, dv, L). Returns (b, L, H*dv). Channel order inside the BN is
    (n, h, i), matching 'n b h i d -> b (n h i) d'.
    """
    b, h, dv, L = out.shape
    stacked = jnp.stack([kv, out], axis=1)  # (b, 2, H, dv, L)
    flat = stacked.transpose(0, 4, 1, 2, 3).reshape(b, L, 2 * h * dv)
    flat = bn_out(flat)
    merged = flat.reshape(b, L, 2, h * dv).sum(axis=2)
    return merged


class AxialAttention(nn.Module):
    """Single-axis self-attention with relative position terms (reference l.138-213).

    Input/output: (b, L, C) with L == ``dim``; C == ``in_channels``.
    """

    dim: int
    in_channels: int = 128
    heads: int = 8
    dim_head_kq: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H = self.heads
        dkq = self.dim_head_kq
        dv = self.in_channels // H
        qkv_ch = 2 * dkq + dv
        # 1x1 conv (= Dense over channels) + BN, no bias (reference _conv1d1x1)
        qkv = nn.Dense(H * qkv_ch, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(x)
        qkv = BatchNorm(dtype=self.dtype, name="to_qkv_bn")(qkv, train)
        b, L, _ = qkv.shape
        # torch channel factorization 'b (q h) d': channel = q_idx * H + h_idx
        qkv = qkv.reshape(b, L, qkv_ch, H)
        q = qkv[:, :, :dkq]
        k = qkv[:, :, dkq: 2 * dkq]
        v = qkv[:, :, 2 * dkq:]
        r_q, r_k, r_v = RelativePosEnc2D(self.dim, dv, dkq, name="pos_enc")()
        bn_logits = BatchNorm(dtype=self.dtype, name="attention_norm")
        bn_out = BatchNorm(dtype=self.dtype, name="out_norm")
        out, kv = _attention_core(q, k, v, r_q, r_k, r_v,
                                  lambda t: bn_logits(t, train), self.dtype)
        return _merge_outputs(out, kv, lambda t: bn_out(t, train))


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
        kq = nn.Dense(H * 2 * dkq, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_kq")(x_in)
        kq = BatchNorm(dtype=self.dtype, name="to_kq_bn")(kq, train)
        v = nn.Dense(H * dv, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_v")(skip)
        v = BatchNorm(dtype=self.dtype, name="to_v_bn")(v, train)
        b, L, _ = kq.shape
        kq = kq.reshape(b, L, 2 * dkq, H)
        q = kq[:, :, :dkq]
        k = kq[:, :, dkq:]
        v = v.reshape(b, L, dv, H)
        r_q, r_k, r_v = RelativePosEnc2D(self.dim, dv, dkq, name="pos_enc")()
        bn_logits = BatchNorm(dtype=self.dtype, name="attention_norm")
        bn_out = BatchNorm(dtype=self.dtype, name="out_norm")
        out, kv = _attention_core(q, k, v, r_q, r_k, r_v,
                                  lambda t: bn_logits(t, train), self.dtype)
        return _merge_outputs(out, kv, lambda t: bn_out(t, train))


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
            shortcut = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                               padding="SAME", use_bias=True, dtype=self.dtype,
                               param_dtype=jnp.float32, name="shortcut_conv")(x_in)
            shortcut = BatchNorm(dtype=self.dtype, name="shortcut_bn")(shortcut, train)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = BatchNorm(dtype=self.dtype, name="att_down_bn")(x, train)

        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="out_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="out_bn")(x, train)
        return nn.relu(x + shortcut)
