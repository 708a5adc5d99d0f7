"""Stage-by-stage timing of the x_0_3 and x_0_4 fast paths on TPU.

x_0_3: x 64@256^2 + 4x 64@512^2 skips -> 32 (measured 26.7 ms vs ~7 floor)
x_0_4: 32@512^2 -> 16@1024^2 phase_up  (measured 11.2 ms vs ~2 floor)
"""
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

    # ---------------- x_0_3 ----------------
    x = rnd((V, 256, 256, 64))
    skips = [rnd((V, 512, 512, 64), i + 1) for i in range(4)]
    k1 = rnd((3, 3, 320, 32), 9)
    gs = rnd((V, 512, 512, 1), 20)

    timed("x03 up2 64ch 256->512", upsample2x, x)
    u = upsample2x(x)
    timed("x03 conv1 s2d 5 parts (320->4x32)",
          lambda a, *s: PK.conv3x3_s2d_out([a, *s], k1, dtype=dt), u, *skips)
    timed("x03 conv1 s2d 1 cat part (320->4x32)",
          lambda a: PK.conv3x3_s2d_out([a], k1, dtype=dt),
          jnp.concatenate([u] + skips, -1))
    timed("x03 conv1 gated 5 parts",
          lambda a, *s: PK.conv3x3_s2d_out(
              [a, *s], k1, dtype=dt, scales=[gs] * 5), u, *skips)
    # gate compute: means + sse convs over 5 parts
    k_sse = rnd((1, 1, 320, 1), 22)
    def gates(a, *s):
        parts = [a] + list(s)
        m = jnp.concatenate(
            [jnp.mean(p.astype(jnp.float32), axis=(1, 2)) for p in parts],
            -1)[:, None, None, :]
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
        return jax.nn.sigmoid(m), jax.nn.sigmoid(t)
    timed("x03 gate compute (5 parts, x pre-up)", gates, x, *skips)
    yp = rnd((V, 256, 256, 128), 30)
    k2p = rnd((3, 3, 128, 128), 31)
    timed("x03 conv2 packed 128->128", lambda a: jax.lax.conv_general_dilated(
        a, k2p, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), yp)

    # ---------------- x_0_4 ----------------
    x4 = rnd((V, 512, 512, 32), 40)
    k14 = rnd((3, 3, 32, 16), 41)
    timed("x04 phase_upconv (32->4x16, with strips)",
          lambda a: PK.phase_upconv_s2d(a, k14, dtype=dt), x4)
    kph = PK.make_phase_up_kernel(k14).astype(dt)
    timed("x04 interior phase conv only",
          lambda a: jax.lax.conv_general_dilated(
              a, kph, (1, 1), "SAME",
              dimension_numbers=("NHWC", "HWIO", "NHWC")), x4)
    y4 = rnd((V, 512, 512, 64), 42)
    k24 = rnd((3, 3, 64, 64), 43)
    timed("x04 conv2 packed 64->64 @512^2",
          lambda a: jax.lax.conv_general_dilated(
              a, k24, (1, 1), "SAME",
              dimension_numbers=("NHWC", "HWIO", "NHWC")), y4)
    from eyediseasesegmentation_tpu.ops.fastconv import pack_kernel_3x3
    k24d = pack_kernel_3x3(rnd((3, 3, 16, 16), 44)).astype(dt)
    y4d = PK.space_to_depth(y4)  # (V,256,256,256) double-packed
    k24dd = pack_kernel_3x3(k24d.astype(jnp.float32)).astype(dt)
    timed("x04 conv2 double-packed 256->256 @256^2",
          lambda a: jax.lax.conv_general_dilated(
              a, k24dd, (1, 1), "SAME",
              dimension_numbers=("NHWC", "HWIO", "NHWC")), y4d)


if __name__ == "__main__":
    main()
