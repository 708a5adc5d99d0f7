"""Fused axial-attention kernel (Pallas TPU) + folded jnp reference.

The eval-path hot op of the proposed model (reference axial_attention_v2.py):
with all three BatchNorms folded to per-channel affines, one axial attention is

    kq = affine(x_q @ W_kq);  v = affine(x_v @ W_v)
    qr[b,h,d,j]  = Σ_i q·r_q ;  kr = Σ_i k·r_k ;  dots = Σ_i q·k
    logits = s0·qr + s1·kr + s2·dots + Σb   (folded joint-BN, per head)
    attn = softmax_j(logits)
    out = attn·v ; kv = attn·r_v
    y[b,L,(h,i)] = os0·kv + os1·out + Σob   (folded output-BN merge)

The Pallas kernel fuses the whole chain per batch tile: one HBM read of the
inputs, one write of the output, everything else in VMEM (the jnp path
materializes ~10 intermediates). Self-attention reduces to the cross form by
splitting the packed qkv projection (channel layout q_idx·H + h keeps the
q,k columns [0, 2·dkq·H) and v columns [2·dkq·H, ·) contiguous).

Mosaic constraints shaped the kernel (learned by bisection on v5e): no in-kernel
3D transposes, no batched matmuls over a middle dim, per-head scalars in SMEM,
head-major projection columns (permuted outside) so head access is a slice.

Train mode is NOT handled here (batch statistics live in the flax module).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _largest_block(b: int, L: int, cap_rows: int = 1024) -> int:
    """Largest divisor of b whose tile (NB·L rows) stays VMEM-friendly."""
    best = 1
    for d in range(1, b + 1):
        if b % d == 0 and d * L <= cap_rows:
            best = d
    return best


# ---------------------------------------------------------------------------
# folded jnp reference (used on CPU/GPU, train-free eval checks, and as ground
# truth for the kernel tests)
# ---------------------------------------------------------------------------

def _folded_jnp(x_q, x_v, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v,
                logit_aff, out_aff, heads, dkq, dv, dtype):
    H = heads
    kq = (x_q.astype(dtype) @ w_kq.astype(dtype)).astype(_F32)
    kq = kq * kq_aff[0] + kq_aff[1]
    v = (x_v.astype(dtype) @ w_v.astype(dtype)).astype(_F32)
    v = v * v_aff[0] + v_aff[1]
    b, L, _ = kq.shape
    kq = kq.reshape(b, L, 2 * dkq, H).astype(dtype)
    q, k = kq[:, :, :dkq], kq[:, :, dkq:]
    v = v.reshape(b, L, dv, H).astype(dtype)

    qr = jnp.einsum("bdih,idj->bhdj", q, r_q.astype(dtype)).astype(_F32)
    kr = jnp.einsum("bdih,idj->bhdj", k, r_k.astype(dtype)).astype(_F32)
    dots = jnp.einsum("bdih,bjih->bhdj", q, k).astype(_F32)
    ls = logit_aff[0].reshape(H, 3)
    lb = logit_aff[1].reshape(H, 3)
    logits = (qr * ls[None, :, 0, None, None] + kr * ls[None, :, 1, None, None]
              + dots * ls[None, :, 2, None, None]
              + lb.sum(-1)[None, :, None, None])
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhdj,bjih->bhid", attn, v).astype(_F32)
    kv = jnp.einsum("bhdj,idj->bhid", attn, r_v.astype(dtype)).astype(_F32)
    os_ = out_aff[0].reshape(2, H, dv)
    ob = out_aff[1].reshape(2, H, dv)
    merged = (kv * os_[0][None, :, :, None] + out * os_[1][None, :, :, None]
              + (ob[0] + ob[1])[None, :, :, None])
    # (b, H, i, d) -> (b, d, H*i)
    return merged.transpose(0, 3, 1, 2).reshape(b, L, H * dv).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _kernel(l0_ref, l1_ref, l2_ref, lbs_ref,
            xq_ref, xv_ref, wkq_ref, wv_ref, kqs_ref, kqb_ref, vs_ref, vb_ref,
            rq_ref, rk_ref, rvt_ref, os0_ref, os1_ref, obs_ref, out_ref,
            *, heads, dkq, dv, dtype):
    H = heads
    nb, L, cq = xq_ref.shape
    cv = xv_ref.shape[-1]

    # projections on the MXU (rows = NB*L); weights are pre-permuted to
    # head-major columns so per-head access below is a contiguous slice
    kq = jnp.dot(xq_ref[:].reshape(nb * L, cq), wkq_ref[:],
                 preferred_element_type=_F32)
    kq = kq * kqs_ref[:] + kqb_ref[:]  # affines passed 2D: (1, C) broadcast
    v = jnp.dot(xv_ref[:].reshape(nb * L, cv), wv_ref[:],
                preferred_element_type=_F32)
    v = v * vs_ref[:] + vb_ref[:]
    kq = kq.reshape(nb, L, H * 2 * dkq).astype(dtype)
    v = v.reshape(nb, L, H * dv).astype(dtype)

    merged_heads = []
    for h in range(H):
        qh = kq[:, :, h * 2 * dkq: h * 2 * dkq + dkq]        # (nb, L, dkq)
        kh = kq[:, :, h * 2 * dkq + dkq: (h + 1) * 2 * dkq]
        vh = v[:, :, h * dv: (h + 1) * dv]                   # (nb, L, dv)
        # qr/kr: Σ_i q[b,d,i]·r[i,d,j] as dkq fused multiply-adds on (nb,L,L)
        qr = jnp.zeros((nb, L, L), _F32)
        kr = jnp.zeros((nb, L, L), _F32)
        for i in range(dkq):
            qhi = jax.lax.slice_in_dim(qh, i, i + 1, axis=2)  # (nb, L, 1)
            khi = jax.lax.slice_in_dim(kh, i, i + 1, axis=2)
            qr = qr + qhi.astype(_F32) * rq_ref[i][None].astype(_F32)
            kr = kr + khi.astype(_F32) * rk_ref[i][None].astype(_F32)
        # dots: batched q·kᵀ on the MXU (leading batch dim — mosaic-safe)
        dots = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_F32)  # (nb, L_d, L_j)
        logits = (qr * l0_ref[h] + kr * l1_ref[h] + dots * l2_ref[h]
                  + lbs_ref[h])
        attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
        # out[b,d,i] = Σ_j attn[b,d,j] v[b,j,i]
        out = jax.lax.dot_general(
            attn, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32)  # (nb, L, dv)
        # kv[b,d,i] = Σ_j attn[b,d,j] r_v_t[d,j,i]: loop the small d axis and
        # merge at 2D granularity — mosaic rejects 3D broadcasts onto tensors
        # assembled by stack, and middle-dim batched matmuls / 3D transposes
        os0 = os0_ref[h:h + 1, :]   # (1, dv) rows: 2D broadcasts are safe
        os1 = os1_ref[h:h + 1, :]
        obs = obs_ref[h:h + 1, :]
        merged_parts = []
        for d in range(L):
            kv_d = jnp.dot(attn[:, d, :], rvt_ref[d].astype(dtype),
                           preferred_element_type=_F32)        # (nb, dv)
            merged_parts.append(kv_d * os0 + out[:, d, :] * os1 + obs)
        merged = jnp.stack(merged_parts, axis=1)               # (nb, L, dv)
        merged_heads.append(merged)

    y = jnp.concatenate(merged_heads, axis=-1)  # (nb, L, H*dv), head-major
    out_ref[:] = y.astype(out_ref.dtype)


def _pallas_call(x_q, x_v, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v,
                 logit_aff, out_aff, heads, dkq, dv, dtype,
                 interpret=False):
    b, L, cq = x_q.shape
    cv = x_v.shape[-1]
    nb = _largest_block(b, L)
    grid = (b // nb,)
    r_v_t = r_v.transpose(1, 2, 0)  # (d, j, i): transposed outside, free in XLA

    # permute projection columns from interleaved (q_idx·H + h) to head-major
    perm_kq = np.array([q * heads + h for h in range(heads)
                        for q in range(2 * dkq)])
    perm_v = np.array([i * heads + h for h in range(heads) for i in range(dv)])
    w_kq = w_kq[:, perm_kq]
    kq_aff = (kq_aff[0][perm_kq].reshape(1, -1), kq_aff[1][perm_kq].reshape(1, -1))
    w_v = w_v[:, perm_v]
    v_aff = (v_aff[0][perm_v].reshape(1, -1), v_aff[1][perm_v].reshape(1, -1))

    # fold the logit/output affines outside the kernel
    ls = logit_aff[0].reshape(heads, 3)
    lbs = logit_aff[1].reshape(heads, 3).sum(-1)                # (H,)
    os_ = out_aff[0].reshape(2, heads, dv)
    obs = out_aff[1].reshape(2, heads, dv).sum(0)               # (H, dv)

    def vmem(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    kernel = functools.partial(_kernel, heads=heads, dkq=dkq, dv=dv, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem((heads,)), smem((heads,)), smem((heads,)), smem((heads,)),
            pl.BlockSpec((nb, L, cq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, L, cv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vmem(w_kq.shape), vmem(w_v.shape),
            vmem(kq_aff[0].shape), vmem(kq_aff[1].shape),
            vmem(v_aff[0].shape), vmem(v_aff[1].shape),
            vmem(r_q.shape), vmem(r_k.shape), vmem(r_v_t.shape),
            vmem((heads, dv)), vmem((heads, dv)), vmem((heads, dv)),
        ],
        out_specs=pl.BlockSpec((nb, L, heads * dv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, L, heads * dv), dtype),
        interpret=interpret,
    )(ls[:, 0], ls[:, 1], ls[:, 2], lbs,
      x_q.astype(dtype), x_v.astype(dtype), w_kq.astype(dtype),
      w_v.astype(dtype), kq_aff[0], kq_aff[1], v_aff[0], v_aff[1],
      r_q.astype(_F32), r_k.astype(_F32), r_v_t.astype(_F32),
      os_[0], os_[1], obs)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    if os.environ.get("EDS_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def axial_attention(x_q, x_v, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v,
                    logit_aff, out_aff, *, heads: int, dkq: int, dv: int,
                    dtype=jnp.bfloat16, force: Optional[str] = None):
    """Eval-path axial attention with folded norms.

    Self-attention: pass ``w_v=None`` with ``w_kq`` holding the packed qkv
    projection (columns split here). ``force``: 'pallas' | 'jnp' | 'interpret'
    (tests); default auto (pallas on TPU).
    """
    if w_v is None:
        split = 2 * dkq * heads
        s, b = kq_aff
        w_kq, w_v = w_kq[:, :split], w_kq[:, split:]
        kq_aff, v_aff = (s[:split], b[:split]), (s[split:], b[split:])

    mode = force or ("pallas" if _use_pallas() else "jnp")
    if mode == "jnp":
        return _folded_jnp(x_q, x_v, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v,
                           logit_aff, out_aff, heads, dkq, dv, dtype)
    return _pallas_call(x_q, x_v, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v,
                        logit_aff, out_aff, heads, dkq, dv, dtype,
                        interpret=(mode == "interpret"))
