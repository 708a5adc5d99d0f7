"""Stage-by-stage timing of a fast tail node (x_1_3 shape) on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
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


def main():
    from eyediseasesegmentation_tpu.models.modules.layers import upsample2x
    from eyediseasesegmentation_tpu.ops import packed as PK

    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    V = 8

    def rnd(shape, i=0):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt)

    # x_1_3: x (8,256,256,256), skips 3x(8,512,512,64), out 64
    x = rnd((V, 256, 256, 256))
    skips = [rnd((V, 512, 512, 64), i + 1) for i in range(3)]
    k1 = rnd((3, 3, 448, 64), 9)
    k2 = rnd((3, 3, 64, 64), 10)

    timed("upsample2x 256ch 256->512", upsample2x, x)
    u = upsample2x(x)

    # scse-like gating of 4 parts (channel+spatial gates precomputed cheap)
    gs = rnd((V, 512, 512, 1), 20)
    def gate_parts(u_, *sk):
        return [p * (0.5 + gs) for p in (u_, *sk)]
    timed("gate 4 parts @512 (u 256ch + 3x64ch)", gate_parts, u, *skips)

    parts = [u] + skips
    timed("conv1 s2d_out 4 parts (448->4x64)",
          lambda a, *s: PK.conv3x3_s2d_out([a, *s], k1, dtype=dt), u, *skips)
    timed("conv1 s2d_out skipcat 1 part (192->4x64)",
          lambda a: PK.conv3x3_s2d_out([a], k1[:, :, :192, :64], dtype=dt),
          jnp.concatenate(skips, -1))
    timed("conv1 s2d_out up part only (256->4x64)",
          lambda a: PK.conv3x3_s2d_out([a], k1[:, :, :256], dtype=dt), u)
    timed("gated fused: gate+conv1 s2d_out",
          lambda a, *s: PK.conv3x3_s2d_out(
              [p * (0.5 + gs) for p in (a, *s)], k1, dtype=dt), u, *skips)

    yp = rnd((V, 256, 256, 256), 30)
    timed("conv2 packed_in 256->256", lambda a: jax.lax.conv_general_dilated(
        a, jnp.zeros((3, 3, 256, 256), dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), yp)
    timed("scse packed (mean+gates+mul)", lambda a: PK.mul_per_phase(
        a, jax.nn.sigmoid(PK.packed_spatial_gate(
            a, jnp.ones((1, 1, 64, 1), jnp.float32),
            jnp.zeros((1,), jnp.float32)))), yp)
    timed("d2s out", PK.depth_to_space, yp)

    # combined fast node end-to-end (outside the model)
    def full(a, *s):
        u_ = upsample2x(a)
        parts = [p * (0.5 + gs) for p in (u_, *s)]
        y = PK.conv3x3_s2d_out(parts, k1, dtype=dt)
        y = jnp.maximum(y * 1.01 + 0.1, 0)
        y = jax.lax.conv_general_dilated(
            y, jnp.zeros((3, 3, 256, 256), dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y * 1.01 + 0.1, 0)
        y = PK.mul_per_phase(y, jax.nn.sigmoid(PK.packed_spatial_gate(
            y, jnp.ones((1, 1, 64, 1), jnp.float32),
            jnp.zeros((1,), jnp.float32))))
        return PK.depth_to_space(y)
    timed("FULL fast x_1_3 pipeline", full, x, *skips)


if __name__ == "__main__":
    main()
