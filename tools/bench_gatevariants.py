"""Isolate the module-vs-composed 12 ms gap of a fast tail node (x_1_3).

E1 module blk.apply | E2 composed + real gate math | E3 conv1 scales=(gc+gs)
full-rank | E4 conv1 scales=gs-only broadcast | E5 fused up2+gate chain.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import time
from functools import partial

import jax
import jax.numpy as jnp


def make_timer(inner=4, iters=5):
    def time_fn(fn, *args):
        @jax.jit
        def looped(*a):
            def body(i, acc):
                a0 = a[0]
                upd = acc.reshape((1,) * a0.ndim).astype(a0.dtype)
                a0 = jax.lax.dynamic_update_slice(a0, upd, (0,) * a0.ndim)
                y = fn(a0, *a[1:])
                tot = sum(jnp.sum(l).astype(jnp.float32)
                          for l in jax.tree_util.tree_leaves(y))
                return acc + tot * 1e-30
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0))
        float(looped(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(looped(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    base = time_fn(lambda x: x, jnp.zeros((8, 8), jnp.float32))

    def timed(name, fn, *args):
        dt = (time_fn(fn, *args) - base) / inner
        print(f"{name:56s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    return timed


def main():
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    from eyediseasesegmentation_tpu.models.modules.layers import upsample2x
    from eyediseasesegmentation_tpu.ops import packed as PK

    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    V = 8
    def rnd(shape, i=0):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt)

    x = rnd((V, 256, 256, 256))
    skips = [rnd((V, 512, 512, 64), i + 1) for i in range(3)]
    k1 = rnd((3, 3, 448, 64), 9)
    gs = rnd((V, 512, 512, 1), 20)
    gc = rnd((V, 1, 1, 448), 21)

    # E1: the real module
    blk = DecoderBlock(256, 192, 64, base_dim=32, level=3, use_catt=False,
                       attention_type="scse", drop_block_prob=0.1,
                       fast_tail=True, dtype=dt)
    bv = jax.jit(partial(blk.init, train=False))(
        {"params": rng, "dropout": rng}, x, skips)
    timed("E1 module blk.apply", lambda a, v, *s: blk.apply(
        v, a, list(s), train=False), x, bv, *skips)

    # E2: gate computation cost alone (means + 1x1 convs, up_part0 math)
    k_sse = rnd((1, 1, 448, 1), 22)
    def gates(a, *s):
        parts = [a] + list(s)
        means = [jnp.mean(p.astype(jnp.float32), axis=(1, 2)) for p in parts]
        m = jnp.concatenate(means, -1)[:, None, None, :]  # (V,1,1,448)
        cg = jax.nn.sigmoid(m)  # stand-in for the squeeze MLP (tiny)
        t = None
        off = 0
        for i, p in enumerate(parts):
            tp = jax.lax.conv_general_dilated(
                p.astype(dt), k_sse[:, :, off:off + p.shape[-1]], (1, 1),
                "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if i == 0:
                tp = upsample2x(tp)
            t = tp if t is None else t + tp
            off += p.shape[-1]
        return cg, jax.nn.sigmoid(t)
    timed("E2 gate computation (means + sse convs)", gates, x, *skips)

    # E3: gated conv1, full-rank scales (gc slice + gs), module form
    def conv_fullrank(a, *s):
        u = upsample2x(a)
        parts = [u] + list(s)
        scales, off = [], 0
        for p in parts:
            cp = p.shape[-1]
            scales.append(gc[..., off:off + cp] + gs)
            off += cp
        return PK.conv3x3_s2d_out(parts, k1, dtype=dt, scales=scales)
    timed("E3 conv1 scales=(gc+gs) full-rank", conv_fullrank, x, *skips)

    # E4: gated conv1, gs-only broadcast
    def conv_gsonly(a, *s):
        u = upsample2x(a)
        parts = [u] + list(s)
        return PK.conv3x3_s2d_out(parts, k1, dtype=dt,
                                  scales=[gs] * len(parts))
    timed("E4 conv1 scales=gs-only", conv_gsonly, x, *skips)

    # E5: explicit two-step: materialize gated parts in ONE fused pass, then
    # ungated conv (the XLA floor for full-rank gating)
    def conv_twostep(a, *s):
        u = upsample2x(a)
        parts = [u] + list(s)
        gated, off = [], 0
        for p in parts:
            cp = p.shape[-1]
            gated.append(p * (gc[..., off:off + cp] + gs).astype(p.dtype))
            off += cp
        return PK.conv3x3_s2d_out(gated, k1, dtype=dt)
    timed("E5 materialize-gated then conv", conv_twostep, x, *skips)


def extra():
    """E6: both gate reductions expressed as VPU reduces of the same read."""
    import time
    from eyediseasesegmentation_tpu.models.modules.layers import upsample2x
    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    V = 8
    def rnd(shape, i=0):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt)
    x = rnd((V, 256, 256, 256))
    skips = [rnd((V, 512, 512, 64), i + 1) for i in range(3)]
    w = rnd((448,), 22).astype(jnp.float32)

    def gates_reduce(a, *s):
        parts = [a] + list(s)
        ms, ts = [], []
        off = 0
        for i, p in enumerate(parts):
            c = p.shape[-1]
            pf = p.astype(jnp.float32)
            ms.append(pf.mean(axis=(1, 2)))                  # (V,c)
            t = (pf * w[off:off + c]).sum(-1)                # (V,H,W) 3D
            if i == 0:
                t = upsample2x(t[..., None])[..., 0]
            ts.append(t)
            off += c
        m = jnp.concatenate(ms, -1)
        t = sum(ts)
        return jax.nn.sigmoid(m), jax.nn.sigmoid(t)
    timed("E6 gates as twin VPU reduces (3D t)", gates_reduce, x, *skips)


if __name__ == "__main__":
    extra()
