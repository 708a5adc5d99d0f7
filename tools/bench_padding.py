"""Measure lane-padding waste: full-reduction read cost of maps with
64 / 128 / 256 channels and equal logical bytes."""
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
    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    shapes = [
        ("read-sum (8,512,512,64)  [268MB logical]", (8, 512, 512, 64)),
        ("read-sum (8,512,512,128) [537MB logical]", (8, 512, 512, 128)),
        ("read-sum (8,256,256,256) [134MB logical]", (8, 256, 256, 256)),
        ("read-sum (8,512,512,32)  [134MB logical]", (8, 512, 512, 32)),
        ("read-sum (8,1024,1024,16)[268MB logical]", (8, 1024, 1024, 16)),
    ]
    for name, shp in shapes:
        x = jax.random.normal(rng, shp, dt)
        timed(name, lambda a: jnp.sum(a.astype(jnp.float32)), x)
    # elementwise copy cost (r+w)
    for name, shp in shapes[:2]:
        x = jax.random.normal(rng, shp, dt)
        timed(name.replace("read-sum", "mul2-copy"), lambda a: a * 2.0, x)


if __name__ == "__main__":
    main()
