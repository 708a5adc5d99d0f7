"""TPU microbench: two-conv fused Pallas decode-node kernel
(ops/pallas_decode_pair.py) vs the XLA composition and the round-3
single-conv kernel, at the flagship tail-node shapes — plus the flagship
full-forward comparison (default fast path vs pallas_tail="pair").

The round-3 lesson (PERFORMANCE.md): the single-conv kernel won per stage
but LOST in-graph because the custom call blocked the consumer's pooled
gate-reduce fusion.  The pair kernel moves that reduce INSIDE the kernel
(csum epilogue), so the in-graph comparison is the number that matters.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pair.py
     [--micro-only | --e2e-only]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


def make_timer(inner=6, iters=5):
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


def xla_pair(*args):
    """Plain composition incl. the consumer's mean-reduce (what the default
    path's cross-node fusion actually executes)."""
    parts = args[:-10]
    gate_c, sse_k, sse_b, k1, s1, b1, k2, s2, b2, _ = args[-10:]
    x = jnp.concatenate(parts, axis=-1)
    xf = x.astype(jnp.float32)
    t = jnp.einsum("bhwc,c->bhw", xf, sse_k)
    gate = gate_c[:, None, None, :] + jax.nn.sigmoid(t + sse_b)[..., None]
    xg = (xf * gate).astype(x.dtype)

    def conv_aff(z, k, s, bvec):
        y = jax.lax.conv_general_dilated(
            z, k.astype(z.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y * s + bvec
        return jnp.maximum(y, 0.0).astype(z.dtype)

    y1 = conv_aff(xg, k1, s1, b1)
    y2 = conv_aff(y1, k2, s2, b2)
    return y2, jnp.sum(y2.astype(jnp.float32), axis=(1, 2))


def run_node(timed, name, parts_ch, cout, V=8, R=512):
    from eyediseasesegmentation_tpu.ops.pallas_decode_pair import (
        scse_conv3x3_pair)
    from eyediseasesegmentation_tpu.ops.pallas_scse_conv import (
        scse_conv3x3_bn_relu)
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    C = sum(parts_ch)
    parts = [jax.random.normal(jax.random.fold_in(rng, i), (V, R, R, c), dt)
             for i, c in enumerate(parts_ch)]
    gate_c = jax.nn.sigmoid(
        jax.random.normal(jax.random.fold_in(rng, 90), (V, C), jnp.float32))
    sse_k = jax.random.normal(jax.random.fold_in(rng, 91), (C,),
                              jnp.float32) * 0.2
    sse_b = jnp.float32(0.1)
    k1 = jax.random.normal(jax.random.fold_in(rng, 92), (3, 3, C, cout),
                           jnp.float32) * 0.05
    k2 = jax.random.normal(jax.random.fold_in(rng, 93), (3, 3, cout, cout),
                           jnp.float32) * 0.05
    s1 = jnp.ones((cout,), jnp.float32)
    b1 = jnp.zeros((cout,), jnp.float32)
    s2 = jnp.ones((cout,), jnp.float32)
    b2 = jnp.zeros((cout,), jnp.float32)

    flops = V * R * R * cout * (C + cout) * 18
    print(f"-- {name}: SumC={C} cout={cout} @{R}²x{V} two-conv "
          f"logical {flops / 123e12 * 1e3:.1f} ms @123TF/s")
    args = (*parts, gate_c, sse_k, sse_b, k1, s1, b1, k2, s2, b2,
            jnp.float32(0))
    timed(f"{name} XLA gate+conv1+conv2+csum", xla_pair, *args)

    def v1_then_xla(*a):
        parts_, (gc, sk, sb, k1_, s1_, b1_, k2_, s2_, b2_, _) = \
            a[:-10], a[-10:]
        y1 = scse_conv3x3_bn_relu(list(parts_), gc, sk, sb, k1_, s1_, b1_,
                                  relu=True, tile_rows=4)
        y2 = jax.lax.conv_general_dilated(
            y1, k2_.astype(y1.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y2 = jnp.maximum(y2 * s2_ + b2_, 0.0).astype(y1.dtype)
        return y2, jnp.sum(y2.astype(jnp.float32), axis=(1, 2))
    timed(f"{name} v1 pallas + XLA conv2 + csum", v1_then_xla, *args)

    for th in (4, 8):
        try:
            fn = partial(
                lambda *a, th: scse_conv3x3_pair(
                    list(a[:len(parts_ch)]), *a[len(parts_ch):-1],
                    relu=True, tile_rows=th), th=th)
            timed(f"{name} pallas PAIR th={th}", fn, *args)
        except Exception as e:  # noqa: BLE001
            print(f"{name} pallas pair th={th} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
    # pair_up: part 0 streamed W-upsampled at half height, H-bilinear
    # in-kernel (exactness pinned on CPU; this is the timing probe)
    parts_h = [jax.random.normal(jax.random.fold_in(rng, 50),
                                 (V, R // 2, R, parts_ch[0]), dt)] + parts[1:]
    args_h = (*parts_h, gate_c, sse_k, sse_b, k1, s1, b1, k2, s2, b2,
              jnp.float32(0))
    for th in (4, 8):
        try:
            fn = partial(
                lambda *a, th: scse_conv3x3_pair(
                    list(a[:len(parts_ch)]), *a[len(parts_ch):-1],
                    relu=True, tile_rows=th, up_part0=True), th=th)
            timed(f"{name} pallas PAIR_UP th={th}", fn, *args_h)
        except Exception as e:  # noqa: BLE001
            print(f"{name} pallas pair_up th={th} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}")
    # exactness spot check (small slice)
    try:
        small = [p[:1, :64] for p in parts]
        a, ca = scse_conv3x3_pair(small, gate_c[:1], sse_k, sse_b,
                                  k1, s1, b1, k2, s2, b2, tile_rows=4)
        b, cb = xla_pair(*small, gate_c[:1], sse_k, sse_b, k1, s1, b1,
                         k2, s2, b2, jnp.float32(0))
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        cerr = float(jnp.max(jnp.abs(ca - cb)))
        print(f"{name} max|pair-xla| (bf16) = {err:.4f}, csum {cerr:.3f}")
    except Exception as e:  # noqa: BLE001
        print(f"{name} exactness check FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")


def run_e2e(timed, scale=1024, batch=3):
    """Full flagship forward (the bench.py inner op) per pallas_tail mode."""
    from eyediseasesegmentation_tpu import models as zoo
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch * 8, scale, scale, 3), jnp.bfloat16)
    variables = None
    ref_y = None
    for mode in (False, True, "pair", "pair_up"):
        model = zoo.get_model(
            "unetplusplusstar",
            {"encoder_name": "BoTSER50_Axial_Imagenet_3",
             "decoder_attention_type": "scse",
             "base_dim": scale // 32, "classes": 1,
             "pallas_tail": mode},
            training=False, dtype=jnp.bfloat16)
        if variables is None:
            variables = jax.jit(partial(model.init, train=False))(
                {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                x[:1].astype(jnp.float32))
        try:
            timed(f"flagship fwd {batch * 8}x{scale}² pallas_tail={mode!r}",
                  lambda a, v: model.apply(v, a, train=False), x, variables)
            y = jax.jit(partial(model.apply, train=False))(variables, x[:8])
            y = jnp.asarray(y, jnp.float32)
            if ref_y is None:
                ref_y = y
            else:
                print(f"   max|{mode!r} - default| = "
                      f"{float(jnp.max(jnp.abs(y - ref_y))):.4f}")
        except Exception as e:  # noqa: BLE001
            print(f"e2e pallas_tail={mode!r} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


def main():
    print("backend:", jax.default_backend(), jax.devices())
    timed = make_timer()
    if "--e2e-only" not in sys.argv:
        run_node(timed, "x_1_3", [256, 64, 64, 64], 64)
        run_node(timed, "x_0_3", [64, 64, 64, 64, 64], 32)
        run_node(timed, "x_2_3", [256, 64, 64], 64)
    if "--micro-only" not in sys.argv:
        run_e2e(timed)


if __name__ == "__main__":
    main()
