"""Time the TTA pre/post stages (everything outside the model forward) on TPU.

full-res (2848x4288) -> resize+pad+normalize -> d4 views | inverse views +
mean + crop + resize-back. These cost bench-critical ms outside the 8-view
forward.
"""
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
        print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    return timed


def main():
    from eyediseasesegmentation_tpu.data.transforms import get_transform
    from eyediseasesegmentation_tpu import models as zoo
    from eyediseasesegmentation_tpu.ops import image as I

    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    H, W, S = 2848, 4288, 1024
    raw = jax.random.uniform(rng, (1, H, W, 3), jnp.float32) * 255

    prep_fn, _, _ = zoo.get_preprocessing_fn("IDRiD", False)
    tr = get_transform("normal")(image_size=S, preprocessing_fn=prep_fn)

    timed("resize+pad+normalize (test transform)",
          lambda r: jax.vmap(tr.test)(r), raw)
    img = jax.vmap(tr.test)(raw)
    timed("d4 views (1->8)", I.d4_views, img)
    probs8 = jax.random.uniform(rng, (8, 1, S, S), jnp.float32)
    def post(p):
        p = I.d4_inverse(p[..., None])[..., 0]
        p = jnp.mean(p, axis=0)
        ch, cw = I.longest_max_size_shape(H, W, S)
        p = jax.vmap(lambda q: I.center_crop(q, (ch, cw)))(p)
        return jax.vmap(lambda q: I.resize(q, (H, W)))(p)
    timed("inverse+mean+crop+resize-back", post, probs8)

    # resize-back alone (the 680x1024 -> 2848x4288 upscale)
    small = jax.random.uniform(rng, (1, 680, 1024), jnp.float32)
    timed("resize-back alone 680x1024->full",
          lambda p: jax.vmap(lambda q: I.resize(q, (H, W)))(p), small)
    # initial downscale alone
    timed("downscale alone full->680x1024",
          lambda r: jax.vmap(lambda q: I.longest_max_size_pad(q, S))(r), raw)

    # ---- wire formats (round-4 uint8 wire): H2D and D2H, fp32 vs uint8 ----
    import numpy as np

    def time_h2d(arr, iters=4):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            x = jax.device_put(arr)
            float(jnp.sum(x[:1, :2, :2]))  # force materialization on device
            ts.append(time.perf_counter() - t0)
            del x
        return min(ts)

    host32 = (np.random.RandomState(0).rand(3, H, W, 3) * 255
              ).astype(np.float32)
    mb32 = host32.nbytes / 2**20
    t32 = time_h2d(host32)
    t8 = time_h2d(host32.astype(np.uint8))
    print(f"{'H2D raw batch3 fp32 (%dMB)' % mb32:52s} {t32 * 1e3:8.2f} ms")
    print(f"{'H2D raw batch3 uint8 (%dMB)' % (mb32 / 4):52s} {t8 * 1e3:8.2f} ms")

    probs_dev = jax.device_put(
        np.random.RandomState(1).rand(3, H, W).astype(np.float32))
    mask_dev = jax.jit(lambda p: (p > 0.5).astype(jnp.uint8))(probs_dev)
    float(jnp.sum(mask_dev[:1, :2, :2]))
    for name, dev in (("D2H probs batch3 fp32 (98MB)", probs_dev),
                      ("D2H masks batch3 uint8 (24MB)", mask_dev)):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(dev)
            ts.append(time.perf_counter() - t0)
        print(f"{name:52s} {min(ts) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
