"""upsample2x variants at the x_1_3 shape: two banded einsums (current) vs
one depthwise transposed conv (lhs_dilation=2, kernel [1,3,3,1]/4)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import time

import jax
import jax.numpy as jnp
import numpy as np


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


def up2_tconv(x):
    """Bilinear x2 via one depthwise transposed conv; edges fixed by
    edge-replicating 1 pixel before the dilated conv."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    k = (k1[:, None] * k1[None, :]).reshape(4, 4, 1, 1)
    k = jnp.broadcast_to(k, (4, 4, 1, c))
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return y[:, 2:2 + 2 * h, 2:2 + 2 * w]


def main():
    from eyediseasesegmentation_tpu.models.modules.layers import upsample2x

    # numerical check at small size (f32, CPU-independent)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 6, 5), jnp.float32)
    ref = jax.image.resize(x, (2, 16, 12, 5), "bilinear")
    got = up2_tconv(x)
    print("tconv max err vs resize:",
          float(jnp.abs(got - ref).max()), flush=True)

    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    big = jax.random.normal(rng, (8, 256, 256, 256), jnp.bfloat16)
    timed("upsample2x (two einsums, current)", upsample2x, big)
    timed("up2 depthwise tconv", up2_tconv, big)


if __name__ == "__main__":
    main()
