"""Per-stage TPU timing of the BoTSER50 encoder at the flagship shape.

Same anti-hoisting/anti-DCE timer as profile_flagship.py: the carry is
written into args[0] (must be consumed) and the full output reduced.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import time
from functools import partial

import jax
import jax.numpy as jnp


def make_timer(inner=4, iters=6):
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
        print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    return timed


def main():
    from eyediseasesegmentation_tpu.models.encoders import (
        BoTSER50Encoder, ResNetEncoder, Bottleneck)
    from eyediseasesegmentation_tpu.models.modules.axial import AxialAttentionBlock
    from flax import linen as nn

    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    V, S = 8, 1024
    x = jax.random.normal(rng, (V, S, S, 3), jnp.float32)

    enc = BoTSER50Encoder(base_dim=S // 32, dtype=dt, pretrained=True)
    ev = jax.jit(partial(enc.init, train=False))(
        {"params": rng, "dropout": rng}, x)
    timed("full encoder", lambda a, v: enc.apply(v, a, train=False), x, ev)

    # stem: conv7x7 s2 + BN + relu + maxpool
    def stem(a, k):
        y = jax.lax.conv_general_dilated(
            a.astype(dt), k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y * 1.01 + 0.1, 0)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    k7 = jax.random.normal(rng, (7, 7, 3, 64), dt)
    timed("stem conv7 s2 + bn/relu + pool", stem, x, k7)

    # stages at true shapes (inner width, blocks, stride-2 first except s1)
    stages = [("layer1 3xSEb 64/256 @256^2", (V, 256, 256, 64), 64, 3, 1),
              ("layer2 4xSEb 128/512 @128^2", (V, 256, 256, 256), 128, 4, 2),
              ("layer3 6xSEb 256/1024 @64^2", (V, 128, 128, 512), 256, 6, 2)]
    for name, shape, width, nblk, stride in stages:
        xin = jax.random.normal(rng, shape, dt)

        class Stage(nn.Module):
            @nn.compact
            def __call__(self, a, train=False):
                for i in range(nblk):
                    a = Bottleneck(width, strides=stride if i == 0 else 1,
                                   use_se=True, frozen_bn=True, dtype=dt,
                                   name=f"b{i}")(a, train)
                return a
        st = Stage()
        sv = jax.jit(partial(st.init, train=False))({"params": rng}, xin)
        timed(name, lambda a, v, m=st: m.apply(v, a, train=False), xin, sv)

    # axial layer4: first block (down) + shared block x2 @32^2
    xin = jax.random.normal(rng, (V, 64, 64, 1024), dt)
    first = AxialAttentionBlock(in_channels=1024, out_channels=2048,
                                down_sample=True, dim=(S // 32) * 2, heads=8,
                                dtype=dt)
    fv = jax.jit(partial(first.init, train=False))({"params": rng}, xin)
    timed("axial first (1024->2048 down) @64^2",
          lambda a, v: first.apply(v, a, train=False), xin, fv)
    xin2 = jax.random.normal(rng, (V, 32, 32, 2048), dt)
    shared = AxialAttentionBlock(in_channels=2048, out_channels=2048,
                                 down_sample=False, dim=S // 32, heads=8,
                                 dtype=dt)
    shv = jax.jit(partial(shared.init, train=False))({"params": rng}, xin2)
    timed("axial shared block @32^2 (x2 in model)",
          lambda a, v: shared.apply(v, a, train=False), xin2, shv)


if __name__ == "__main__":
    main()
