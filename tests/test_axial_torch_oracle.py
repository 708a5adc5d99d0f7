"""Cross-framework oracle for the flagship's attention heart.

Hand-built einops-free torch replicas of the reference's AxialAttention /
CrossAxialAttention (src/main/archs/axial_attention_v2.py:49-213) — the same
pattern as test_torch_import.py's TorchSEBottleneck — with weights copied into
the flax modules. Asserts:

* train-mode outputs match (the joint qr/kr/dots BatchNorm2d, the positional-v
  aggregation, the stacked out/kv BatchNorm1d — SURVEY.md §7 hard part #1),
* the BN running-stat updates match (torch stores the UNBIASED batch var),
* eval-mode (folded-affine) outputs match after a train step.

All fp32 at tiny shapes, tolerance 1e-5.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from eyediseasesegmentation_tpu.models.modules.axial import (  # noqa: E402
    AxialAttention, CrossAxialAttention)

B, DIM, C, HEADS, DKQ = 2, 8, 16, 4, 4  # dv = C // HEADS = 4


def _rel_embeddings(relative: torch.Tensor, dim: int, dkq: int):
    """(key_index - query_index + dim - 1) gather, split into r_q/r_k/r_v
    (reference Relative2DPosEncQKV.forward)."""
    idx = (torch.arange(dim)[:, None] - torch.arange(dim)[None, :]
           + dim - 1).reshape(-1)
    emb = relative[:, idx].reshape(relative.shape[0], dim, dim)
    return emb[:dkq], emb[dkq:2 * dkq], emb[2 * dkq:]


def _attention_tail(q, k, v, r_q, r_k, r_v, attention_norm, out_norm,
                    heads, channels):
    """Shared qr/kr/dots → joint BN → softmax → out/kv → stacked BN → sum."""
    b = q.shape[0]
    qr = torch.einsum("bhid,idj->bhdj", q, r_q)
    kr = torch.einsum("bhid,idj->bhdj", k, r_k)
    dots = torch.einsum("bhid,bhij->bhdj", q, k)
    # 'n b h d j -> b (h n) d j' : channel = h*3 + n
    st = torch.stack([qr, kr, dots], dim=2)            # (b, h, 3, d, j)
    st = attention_norm(st.reshape(b, heads * 3, *st.shape[3:]))
    logits = st.reshape(b, heads, 3, *st.shape[2:]).sum(dim=2)
    attn = torch.softmax(logits, dim=-1)
    out = torch.einsum("bhdj,bhij->bhid", attn, v)
    kv = torch.einsum("bhdj,idj->bhid", attn, r_v)
    # 'n b h i d -> b (n h i) d' : channel = n*(h*i) + h_idx*i + i_idx
    so = torch.stack([kv, out], dim=1)                 # (b, 2, h, i, d)
    so = out_norm(so.reshape(b, 2 * channels, so.shape[-1]))
    return so.reshape(b, 2, channels, so.shape[-1]).sum(dim=1)  # (b, C, L)


class TorchAxial(tnn.Module):
    def __init__(self, dim=DIM, in_channels=C, heads=HEADS, dkq=DKQ):
        super().__init__()
        self.dim, self.heads, self.dkq = dim, heads, dkq
        self.dv = in_channels // heads
        self.qkv_ch = 2 * dkq + self.dv
        self.to_qkv = tnn.Conv1d(in_channels, heads * self.qkv_ch, 1, bias=False)
        self.qkv_bn = tnn.BatchNorm1d(heads * self.qkv_ch)
        self.relative = tnn.Parameter(torch.randn(self.qkv_ch, 2 * dim - 1))
        self.attention_norm = tnn.BatchNorm2d(heads * 3)
        self.out_norm = tnn.BatchNorm1d(2 * in_channels)
        self.channels = in_channels

    def forward(self, x):  # x: (b, C, L)
        b = x.shape[0]
        qkv = self.qkv_bn(self.to_qkv(x))
        # 'b (q h) d -> b h q d' : channel = q*heads + h
        qkv = qkv.reshape(b, self.qkv_ch, self.heads, self.dim).permute(0, 2, 1, 3)
        q, k, v = torch.split(qkv, [self.dkq, self.dkq, self.dv], dim=2)
        r_q, r_k, r_v = _rel_embeddings(self.relative, self.dim, self.dkq)
        return _attention_tail(q, k, v, r_q, r_k, r_v, self.attention_norm,
                               self.out_norm, self.heads, self.channels)


class TorchCrossAxial(tnn.Module):
    def __init__(self, dim=DIM, in_channels=C, in_skip_channels=C,
                 heads=HEADS, dkq=DKQ):
        super().__init__()
        self.dim, self.heads, self.dkq = dim, heads, dkq
        self.dv = in_skip_channels // heads
        self.to_kq = tnn.Conv1d(in_channels, heads * 2 * dkq, 1, bias=False)
        self.kq_bn = tnn.BatchNorm1d(heads * 2 * dkq)
        self.to_v = tnn.Conv1d(in_skip_channels, heads * self.dv, 1, bias=False)
        self.v_bn = tnn.BatchNorm1d(heads * self.dv)
        self.relative = tnn.Parameter(torch.randn(2 * dkq + self.dv, 2 * dim - 1))
        self.attention_norm = tnn.BatchNorm2d(heads * 3)
        self.out_norm = tnn.BatchNorm1d(2 * in_skip_channels)
        self.channels = in_skip_channels

    def forward(self, x_in, skip):  # (b, C_in, L), (b, C_skip, L)
        b = x_in.shape[0]
        kq = self.kq_bn(self.to_kq(x_in))
        kq = kq.reshape(b, 2 * self.dkq, self.heads, self.dim).permute(0, 2, 1, 3)
        q, k = kq[:, :, :self.dkq], kq[:, :, self.dkq:]
        v = self.v_bn(self.to_v(skip))
        v = v.reshape(b, self.dv, self.heads, self.dim).permute(0, 2, 1, 3)
        r_q, r_k, r_v = _rel_embeddings(self.relative, self.dim, self.dkq)
        return _attention_tail(q, k, v, r_q, r_k, r_v, self.attention_norm,
                               self.out_norm, self.heads, self.channels)


def _np(t):
    return t.detach().numpy().astype(np.float32)


def _bn_leaves(bn, prefix):
    params = {f"{prefix}_scale": _np(bn.weight), f"{prefix}_bias": _np(bn.bias)}
    stats = {f"{prefix}_mean": _np(bn.running_mean),
             f"{prefix}_var": _np(bn.running_var)}
    return params, stats


def _axial_variables(t: TorchAxial):
    params = {"to_qkv": _np(t.to_qkv.weight)[:, :, 0].T,
              "pos_enc": {"relative": _np(t.relative)}}
    stats = {}
    for bn, prefix in ((t.qkv_bn, "to_qkv_bn"),
                       (t.attention_norm, "attention_norm"),
                       (t.out_norm, "out_norm")):
        p, s = _bn_leaves(bn, prefix)
        params.update(p); stats.update(s)
    return {"params": params, "batch_stats": stats}


def _cross_variables(t: TorchCrossAxial):
    params = {"to_kq": _np(t.to_kq.weight)[:, :, 0].T,
              "to_v": _np(t.to_v.weight)[:, :, 0].T,
              "pos_enc": {"relative": _np(t.relative)}}
    stats = {}
    for bn, prefix in ((t.kq_bn, "to_kq_bn"), (t.v_bn, "to_v_bn"),
                       (t.attention_norm, "attention_norm"),
                       (t.out_norm, "out_norm")):
        p, s = _bn_leaves(bn, prefix)
        params.update(p); stats.update(s)
    return {"params": params, "batch_stats": stats}


def _assert_stats_match(jax_stats, torch_module, prefixes, atol=1e-5):
    name_map = {"to_qkv_bn": "qkv_bn", "to_kq_bn": "kq_bn", "to_v_bn": "v_bn",
                "attention_norm": "attention_norm", "out_norm": "out_norm"}
    for prefix in prefixes:
        bn = getattr(torch_module, name_map[prefix])
        np.testing.assert_allclose(np.asarray(jax_stats[f"{prefix}_mean"]),
                                   _np(bn.running_mean), atol=atol,
                                   err_msg=f"{prefix} running_mean")
        np.testing.assert_allclose(np.asarray(jax_stats[f"{prefix}_var"]),
                                   _np(bn.running_var), atol=atol,
                                   err_msg=f"{prefix} running_var")


def test_axial_attention_matches_torch():
    torch.manual_seed(0)
    t = TorchAxial()
    x_t = torch.randn(B, C, DIM)

    m = AxialAttention(dim=DIM, in_channels=C, heads=HEADS, dim_head_kq=DKQ,
                       dtype=jnp.float32)
    variables = _axial_variables(t)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 1))  # (b, L, C)

    # --- train mode: outputs AND running-stat updates must match ---
    t.train()
    y_t = _np(t(x_t)).transpose(0, 2, 1)
    y_j, mutated = m.apply(variables, x_j, train=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-5, rtol=1e-5)
    _assert_stats_match(mutated["batch_stats"], t,
                        ("to_qkv_bn", "attention_norm", "out_norm"))

    # --- eval mode with the post-step stats: folded path must match ---
    t.eval()
    y_t = _np(t(x_t)).transpose(0, 2, 1)
    y_j = m.apply({"params": variables["params"],
                   "batch_stats": mutated["batch_stats"]}, x_j, train=False)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-5, rtol=1e-5)


def test_cross_axial_attention_matches_torch():
    torch.manual_seed(1)
    t = TorchCrossAxial()
    x_t = torch.randn(B, C, DIM)
    s_t = torch.randn(B, C, DIM)

    m = CrossAxialAttention(dim=DIM, in_channels=C, in_skip_channels=C,
                            heads=HEADS, dim_head_kq=DKQ, dtype=jnp.float32)
    variables = _cross_variables(t)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 1))
    s_j = jnp.asarray(s_t.numpy().transpose(0, 2, 1))

    t.train()
    y_t = _np(t(x_t, s_t)).transpose(0, 2, 1)
    y_j, mutated = m.apply(variables, x_j, s_j, train=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-5, rtol=1e-5)
    _assert_stats_match(mutated["batch_stats"], t,
                        ("to_kq_bn", "to_v_bn", "attention_norm", "out_norm"))

    t.eval()
    y_t = _np(t(x_t, s_t)).transpose(0, 2, 1)
    y_j = m.apply({"params": variables["params"],
                   "batch_stats": mutated["batch_stats"]}, x_j, s_j,
                  train=False)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-5, rtol=1e-5)


def test_axial_gradients_match_torch():
    """Backward parity: d(sum(out))/d(input) and a couple of weight grads —
    the train path's gradients feed the whole flagship optimization."""
    torch.manual_seed(2)
    t = TorchAxial()
    x_t = torch.randn(B, C, DIM, requires_grad=True)
    m = AxialAttention(dim=DIM, in_channels=C, heads=HEADS, dim_head_kq=DKQ,
                       dtype=jnp.float32)
    variables = _axial_variables(t)
    x_j = jnp.asarray(x_t.detach().numpy().transpose(0, 2, 1))

    t.train()
    t(x_t).sum().backward()

    def loss(params, x):
        y, _ = m.apply({"params": params,
                        "batch_stats": variables["batch_stats"]},
                       x, train=True, mutable=["batch_stats"])
        return jnp.sum(y)

    gp, gx = jax.grad(loss, argnums=(0, 1))(variables["params"], x_j)
    np.testing.assert_allclose(np.asarray(gx).transpose(0, 2, 1),
                               _np(x_t.grad), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp["to_qkv"]),
                               _np(t.to_qkv.weight.grad)[:, :, 0].T,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp["pos_enc"]["relative"]),
                               _np(t.relative.grad), atol=1e-4, rtol=1e-4)
