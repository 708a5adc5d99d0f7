"""Microbench candidate primitives for the packed decoder tail (real TPU).

Compares, at the flagship's exact tail shapes (V=8 views):
  A. baseline 3x3 SAME conv (cout 64/32) vs stride-2 4x4 conv to packed output
  B. packed 3x3 conv (s2d in/out) for conv2 64->64 @512^2
  C. upsample2x + 3x3 conv vs fused phase conv (3,3,cin,4cout) at input res
  D. elementwise scSE-style gating unpacked @512^2x64 vs packed @256^2x256
  E. 16ch @1024^2 conv vs pack-4 conv @256^2x256
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation

import time
from functools import partial

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
        print(f"{name:54s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    return timed


def conv(x, k, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    timed = make_timer()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    V = 8

    def rnd(shape, i=0):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt)

    # ---- A: conv1 shapes at 512^2 ----
    for cin, cout in [(320, 64), (384, 64), (448, 64), (320, 32)]:
        x = rnd((V, 512, 512, cin))
        k3 = rnd((3, 3, cin, cout), 1)
        k4 = rnd((4, 4, cin, 4 * cout), 2)
        tf = 2 * 9 * cin * cout * 512 * 512 * V / 1e12
        t = timed(f"A 3x3 SAME {cin}->{cout} @512  ({tf:.2f} TF)",
                  lambda a, k: conv(a, k), x, k3)
        timed(f"A stride2 4x4 {cin}->4x{cout} @512->256 ({tf*16/9:.2f} TF)",
              lambda a, k: conv(a, k, stride=2), x, k4)

    # ---- B: conv2 64->64 @512 packed vs not ----
    x = rnd((V, 512, 512, 64))
    k3 = rnd((3, 3, 64, 64), 3)
    timed("B 3x3 SAME 64->64 @512 (0.15 TF)", lambda a, k: conv(a, k), x, k3)
    xp = rnd((V, 256, 256, 256))
    kp = rnd((3, 3, 256, 256), 4)
    timed("B packed 3x3 256->256 @256 (0.62 TF)",
          lambda a, k: conv(a, k), xp, kp)
    k23 = rnd((2, 3, 256, 128), 5)
    timed("B 2x split (2,3)x256->128 @256 x2 (0.41 TF)",
          lambda a, k: (conv(a, k), conv(a, k)), xp, k23)

    # ---- C: upsample+conv vs phase conv ----
    from eyediseasesegmentation_tpu.models.modules.layers import upsample2x
    x = rnd((V, 256, 256, 256))
    k3 = rnd((3, 3, 256, 64), 6)
    kph = rnd((3, 3, 256, 256), 7)
    timed("C up2x + 3x3 256->64 @512 (0.62 TF)",
          lambda a, k: conv(upsample2x(a), k), x, k3)
    timed("C phase 3x3 256->4x64 @256 (0.62 TF)",
          lambda a, k: conv(a, k), x, kph)

    # ---- D: elementwise gating ----
    xs = rnd((V, 512, 512, 64))
    g = rnd((V, 512, 512, 1), 8)
    timed("D gate (c+s)*x unpacked 64ch @512",
          lambda a, s: a * (0.5 + s), xs, g)
    xsp = rnd((V, 256, 256, 256))
    gp = rnd((V, 256, 256, 4), 9)
    timed("D gate packed 256ch @256 (phase bcast)",
          lambda a, s: a * (0.5 + jnp.repeat(s, 64, axis=-1)), xsp, gp)

    # ---- E: the 1024^2 level ----
    x = rnd((V, 1024, 1024, 32))
    k3 = rnd((3, 3, 32, 16), 10)
    timed("E 3x3 32->16 @1024 (0.08 TF)", lambda a, k: conv(a, k), x, k3)
    xp4 = rnd((V, 256, 256, 512))
    kp4 = rnd((3, 3, 512, 256), 11)
    timed("E pack4 3x3 512->256 @256 (0.62 TF)",
          lambda a, k: conv(a, k), xp4, kp4)
    xh = rnd((V, 1024, 1024, 16))
    kh = rnd((3, 3, 16, 1), 12)
    timed("E seghead 3x3 16->1 @1024", lambda a, k: conv(a, k), xh, kh)
    xhp = rnd((V, 256, 256, 256))
    khp = rnd((3, 3, 256, 16), 13)
    timed("E seghead pack4 256->16 @256", lambda a, k: conv(a, k), xhp, khp)

    # ---- s2d/d2s rearrangement cost @512^2 x64 ----
    from eyediseasesegmentation_tpu.ops.fastconv import space_to_depth, depth_to_space
    xs = rnd((V, 512, 512, 64))
    timed("R s2d (512,64)->(256,256)", space_to_depth, xs)
    xp = rnd((V, 256, 256, 256))
    timed("R d2s (256,256)->(512,64)", depth_to_space, xp)


if __name__ == "__main__":
    main()
