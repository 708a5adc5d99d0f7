"""Stem variants: plain 7x7/2 conv vs s2d rewrite, with/without the packing
relayout, on TPU at the flagship shape."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import time

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
    from eyediseasesegmentation_tpu.ops import packed as PK

    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    V = 8
    x = jax.random.normal(rng, (V, 1024, 1024, 3), dt)
    k7 = jax.random.normal(rng, (7, 7, 3, 64), jnp.float32)

    timed("plain conv7x7/2 3->64", lambda a: jax.lax.conv_general_dilated(
        a, k7.astype(dt), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
    timed("stem7_s2d (incl. s2d relayout)",
          lambda a: PK.stem7_s2d(a, k7, dtype=dt), x)
    xp = PK.space_to_depth(x)
    timed("s2d relayout alone", PK.space_to_depth, x)

    # pre-packed input (what a packed data pipeline would feed)
    from eyediseasesegmentation_tpu.ops.packed import stem7_s2d as _s
    def stem_prepacked(ap):
        # body of stem7_s2d minus the relayout
        cin, cout = 3, 64
        k4 = jnp.zeros((4, 4, 12, 64), jnp.float32)
        for a_ in (0, 1):
            for b in (0, 1):
                g = (a_ * 2 + b) * cin
                for di in range(-2, 2):
                    t = 2 * di + a_ + 3
                    if not 0 <= t <= 6:
                        continue
                    for dj in range(-2, 2):
                        u = 2 * dj + b + 3
                        if not 0 <= u <= 6:
                            continue
                        k4 = k4.at[di + 2, dj + 2, g:g + cin].set(k7[t, u])
        return jax.lax.conv_general_dilated(
            ap, k4.astype(dt), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    timed("packed 4x4 conv alone (pre-packed input)", stem_prepacked, xp)

    # f32 input variant (the real pipeline feeds f32 normalized images)
    xf = x.astype(jnp.float32)
    timed("plain conv7x7/2 on f32 input", lambda a: jax.lax.conv_general_dilated(
        a.astype(dt), k7.astype(dt), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xf)
    timed("stem7_s2d on f32 input",
          lambda a: PK.stem7_s2d(a, k7, dtype=dt), xf)


if __name__ == "__main__":
    main()
