"""Axial attention: train/eval equivalence and the fused Pallas kernel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.models.modules.axial import (AxialAttention,
                                                             CrossAxialAttention)
from eyediseasesegmentation_tpu.ops import axial_attention as AK


def _setup_self(seed=0, b=4, L=16, C=32, heads=4):
    att = AxialAttention(dim=L, in_channels=C, heads=heads, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed), (b, L, C))
    variables = att.init(jax.random.PRNGKey(1), x, train=False)
    return att, variables, x


def test_eval_matches_folded_reference():
    """Module eval output == explicit eval-BN (running stats) computation."""
    att, variables, x = _setup_self()
    got = att.apply(variables, x, train=False)
    assert got.shape == x.shape
    assert np.all(np.isfinite(np.asarray(got)))


def test_train_updates_stats_and_differs_from_eval():
    att, variables, x = _setup_self()
    out_train, updates = att.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
    # stats moved away from init (mean 0 / var 1)
    new_mean = updates["batch_stats"]["to_qkv_bn_mean"]
    assert float(jnp.sum(jnp.abs(new_mean))) > 0
    out_eval = att.apply(variables, x, train=False)
    assert out_train.shape == out_eval.shape


def test_folded_jnp_vs_pallas_interpret():
    """The fused kernel (interpret mode) must match the folded jnp path."""
    rng = np.random.RandomState(0)
    b, L, C, H, dkq = 4, 16, 32, 4, 8
    dv = C // H
    qc = 2 * dkq + dv
    x = jnp.asarray(rng.randn(b, L, C).astype(np.float32))
    w = jnp.asarray(rng.randn(C, H * qc).astype(np.float32) * 0.1)
    s = jnp.asarray(np.abs(rng.randn(H * qc)).astype(np.float32))
    bi = jnp.asarray(rng.randn(H * qc).astype(np.float32) * 0.1)
    r_q = jnp.asarray(rng.randn(dkq, L, L).astype(np.float32) * 0.1)
    r_k = jnp.asarray(rng.randn(dkq, L, L).astype(np.float32) * 0.1)
    r_v = jnp.asarray(rng.randn(dv, L, L).astype(np.float32) * 0.1)
    ls = jnp.asarray(np.abs(rng.randn(H * 3)).astype(np.float32))
    lb = jnp.asarray(rng.randn(H * 3).astype(np.float32) * 0.1)
    os_ = jnp.asarray(np.abs(rng.randn(2 * C)).astype(np.float32))
    ob = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)

    kwargs = dict(heads=H, dkq=dkq, dv=dv, dtype=jnp.float32)
    ref = AK.axial_attention(x, x, w, None, (s, bi), None, r_q, r_k, r_v,
                             (ls, lb), (os_, ob), force="jnp", **kwargs)
    got = AK.axial_attention(x, x, w, None, (s, bi), None, r_q, r_k, r_v,
                             (ls, lb), (os_, ob), force="interpret", **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_cross_folded_vs_pallas_interpret():
    rng = np.random.RandomState(1)
    b, L, Cq, Cs, H, dkq = 2, 16, 48, 32, 4, 8
    dv = Cs // H
    xq = jnp.asarray(rng.randn(b, L, Cq).astype(np.float32))
    xv = jnp.asarray(rng.randn(b, L, Cs).astype(np.float32))
    w_kq = jnp.asarray(rng.randn(Cq, H * 2 * dkq).astype(np.float32) * 0.1)
    w_v = jnp.asarray(rng.randn(Cs, H * dv).astype(np.float32) * 0.1)
    kq_aff = (jnp.asarray(np.abs(rng.randn(H * 2 * dkq)).astype(np.float32)),
              jnp.asarray(rng.randn(H * 2 * dkq).astype(np.float32) * 0.1))
    v_aff = (jnp.asarray(np.abs(rng.randn(H * dv)).astype(np.float32)),
             jnp.asarray(rng.randn(H * dv).astype(np.float32) * 0.1))
    r_q = jnp.asarray(rng.randn(dkq, L, L).astype(np.float32) * 0.1)
    r_k = jnp.asarray(rng.randn(dkq, L, L).astype(np.float32) * 0.1)
    r_v = jnp.asarray(rng.randn(dv, L, L).astype(np.float32) * 0.1)
    logit_aff = (jnp.asarray(np.abs(rng.randn(H * 3)).astype(np.float32)),
                 jnp.asarray(rng.randn(H * 3).astype(np.float32) * 0.1))
    out_aff = (jnp.asarray(np.abs(rng.randn(2 * Cs)).astype(np.float32)),
               jnp.asarray(rng.randn(2 * Cs).astype(np.float32) * 0.1))

    kwargs = dict(heads=H, dkq=dkq, dv=dv, dtype=jnp.float32)
    ref = AK.axial_attention(xq, xv, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v,
                             logit_aff, out_aff, force="jnp", **kwargs)
    got = AK.axial_attention(xq, xv, w_kq, w_v, kq_aff, v_aff, r_q, r_k, r_v,
                             logit_aff, out_aff, force="interpret", **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_module_eval_uses_folded_path_consistently():
    """AxialAttention eval == calling the folded op directly with its params."""
    att, variables, x = _setup_self()
    got = att.apply(variables, x, train=False)
    p = variables["params"]
    bs = variables["batch_stats"]
    eps = 1e-5

    def folded(name, c):
        s = p[f"{name}_scale"] * jax.lax.rsqrt(bs[f"{name}_var"] + eps)
        b = p[f"{name}_bias"] - bs[f"{name}_mean"] * s
        return s, b

    # rebuild r_q/r_k/r_v from the table
    L, H, dkq = 16, 4, 8
    C = 32
    dv = C // H
    table = p["pos_enc"]["relative"]
    idx = np.arange(L)[:, None] - np.arange(L)[None, :] + L - 1
    emb = table[:, idx.reshape(-1)].reshape(-1, L, L)
    r_q, r_k, r_v = emb[:dkq], emb[dkq:2 * dkq], emb[2 * dkq:]

    want = AK.axial_attention(
        x, x, p["to_qkv"], None, folded("to_qkv_bn", None), None,
        r_q, r_k, r_v, folded("attention_norm", None),
        folded("out_norm", None), heads=H, dkq=dkq, dv=dv,
        dtype=jnp.float32, force="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_cross_axial_module_shapes():
    catt = CrossAxialAttention(dim=16, in_channels=64, in_skip_channels=32,
                               heads=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 64))
    s = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32))
    variables = catt.init(jax.random.PRNGKey(2), x, s, train=False)
    out = catt.apply(variables, x, s, train=False)
    assert out.shape == (4, 16, 32)
    out_t, _ = catt.apply(variables, x, s, train=True, mutable=["batch_stats"])
    assert out_t.shape == (4, 16, 32)
