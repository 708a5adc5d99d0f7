"""TPU microbench: fused Pallas scse_conv3x3_bn_relu vs the XLA composition
at the flagship tail-node shapes (x_1_3 / x_0_3 @512², 8 views).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_scse_conv.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import functools
import time

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


def xla_ref(*args):
    parts, (gate_c, sse_k, sse_b, k3, scale, bias) = args[:-6], args[-6:]
    x = jnp.concatenate(parts, axis=-1)
    xf = x.astype(jnp.float32)
    t = jnp.einsum("bhwc,c->bhw", xf, sse_k)
    gate = gate_c[:, None, None, :] + jax.nn.sigmoid(t + sse_b)[..., None]
    xg = (xf * gate).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xg, k3.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * scale + bias
    return jnp.maximum(y, 0.0).astype(x.dtype)


def run_node(timed, name, parts_ch, cout, V=8, R=512):
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
    k3 = jax.random.normal(jax.random.fold_in(rng, 92), (3, 3, C, cout),
                           jnp.float32) * 0.05
    scale = jnp.ones((cout,), jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    flops = V * R * R * C * cout * 18
    print(f"-- {name}: SumC={C} cout={cout} @{R}²x{V} "
          f"logical {flops / 123e12 * 1e3:.1f} ms @123TF/s")
    timed(f"{name} XLA gate+conv+bn+relu", xla_ref,
          *parts, gate_c, sse_k, sse_b, k3, scale, bias)
    for th in (4,):
        try:
            fn = functools.partial(
                lambda *a, th: scse_conv3x3_bn_relu(
                    list(a[:len(parts_ch)]), *a[len(parts_ch):],
                    relu=True, tile_rows=th), th=th)
            timed(f"{name} pallas fused th={th}", fn,
                  *parts, gate_c, sse_k, sse_b, k3, scale, bias)
        except Exception as e:  # noqa: BLE001
            print(f"{name} pallas th={th} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
    # exactness spot check (small slice)
    try:
        small = [p[:1, :64] for p in parts]
        a = scse_conv3x3_bn_relu(small, gate_c[:1], sse_k, sse_b, k3,
                                 scale, bias, relu=True, tile_rows=4)
        b = xla_ref(*small, gate_c[:1], sse_k, sse_b, k3, scale, bias)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        print(f"{name} max|pallas-xla| (bf16) = {err:.4f}")
    except Exception as e:  # noqa: BLE001
        print(f"{name} exactness check FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")


def main():
    print("backend:", jax.default_backend(), jax.devices())
    timed = make_timer()
    run_node(timed, "x_1_3", [256, 64, 64, 64], 64)
    run_node(timed, "x_0_3", [64, 64, 64, 64, 64], 32)
    run_node(timed, "x_2_3", [256, 64, 64], 64)


if __name__ == "__main__":
    main()
