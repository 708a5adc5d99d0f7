"""Probe: per-axis half-packing vs full s2d packing for the decoder tail.

The round-2 packed rewrites pay 16/9x (conv1 as stride-2 4x4) and 4x
(packed_in conv2) logical FLOPs to reach 256-lane operands. The MXU only
needs 128 lanes — packing along ONE spatial axis gives 2*cout=128 lanes for
the cout=64 tail at lower inflation:

  conv1 (unpacked in, packed out):
    full s2d  : stride (2,2), kernel 4x4      -> 16/9x, 4*cout lanes
    H-pack    : stride (2,1), kernel 4x3      -> 4/3x,  2*cout lanes
    W-pack    : stride (1,2), kernel 3x4      -> 4/3x,  2*cout lanes
    plain     : stride (1,1), kernel 3x3      -> 1x,    cout lanes
  conv2 (packed in+out):
    full s2d  : kernel 3x3 over 4C            -> 4x
    H-pack    : kernel 3x3 over 2C            -> 2x
    plain     : kernel 3x3 over C             -> 1x

Run on the real TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_wpack.py
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
        print(f"{name:58s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    return timed


def conv(x, k, strides, padding):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_hpack_kernel(k3):
    """(3,3,cin,cout) -> (4,3,cin,2*cout): stride-(2,1) conv emitting rows
    packed by 2 (channel a*cout+co == logical row 2I+a), pad rows (1,2)."""
    cin, cout = k3.shape[2], k3.shape[3]
    k4 = jnp.zeros((4, 3, cin, 2 * cout), k3.dtype)
    for a in (0, 1):
        k4 = k4.at[a:a + 3, :, :, a * cout:(a + 1) * cout].set(k3)
    return k4


def make_wpack_kernel(k3):
    cin, cout = k3.shape[2], k3.shape[3]
    k4 = jnp.zeros((3, 4, cin, 2 * cout), k3.dtype)
    for b in (0, 1):
        k4 = k4.at[:, b:b + 3, :, b * cout:(b + 1) * cout].set(k3)
    return k4


def make_hpacked_in_kernel(k3):
    """conv2 on H-packed data: (3,3,cin,cout) -> (3,3,2cin,2cout).
    in channel p*cin+c == logical row 2I+p; out phase a taps logical rows
    2I+a+dy-1 -> packed row I+(a+dy-1)//2, phase (a+dy-1)&1."""
    cin, cout = k3.shape[2], k3.shape[3]
    kp = jnp.zeros((3, 3, 2 * cin, 2 * cout), k3.dtype)
    for a in (0, 1):
        for dy in range(3):
            o = a + dy - 1
            pr, ph = (o >> 1) + 1, o & 1  # packed row tap (0..2), input phase
            kp = kp.at[pr, :, ph * cin:(ph + 1) * cin,
                       a * cout:(a + 1) * cout].add(k3[dy])
    return kp


def main():
    rng = jax.random.PRNGKey(0)
    timed = make_timer()
    dt = jnp.bfloat16
    V = 8

    print("== conv1 layouts (unpacked input -> packed output) ==")
    for name, cin, cout, res in [("x_3_3 c1", 320, 64, 512),
                                 ("x_1_3 c1", 448, 64, 512),
                                 ("x_0_3 c1", 320, 32, 512)]:
        x = jax.random.normal(rng, (V, res, res, cin), dt)
        k3 = jax.random.normal(rng, (3, 3, cin, cout), dt)
        from eyediseasesegmentation_tpu.ops.packed import make_stride2_kernel
        k_s2d = make_stride2_kernel(k3)
        k_h = make_hpack_kernel(k3)
        k_w = make_wpack_kernel(k3)
        timed(f"{name} {cin}->{cout}@{res} full-s2d (16/9, {4*cout}ch)",
              lambda a, k: conv(a, k, (2, 2), ((1, 2), (1, 2))), x, k_s2d)
        timed(f"{name} {cin}->{cout}@{res} H-pack (4/3, {2*cout}ch)",
              lambda a, k: conv(a, k, (2, 1), ((1, 2), (1, 1))), x, k_h)
        timed(f"{name} {cin}->{cout}@{res} W-pack (4/3, {2*cout}ch)",
              lambda a, k: conv(a, k, (1, 2), ((1, 1), (1, 2))), x, k_w)
        timed(f"{name} {cin}->{cout}@{res} plain (1x, {cout}ch)",
              lambda a, k: conv(a, k, (1, 1), "SAME"), x, k3)

    print("== conv2 layouts (packed input -> packed output) ==")
    for name, c, res in [("tail c2", 64, 512), ("x_0_3 c2", 32, 512),
                         ("x_0_4 c2", 16, 1024)]:
        k3 = jax.random.normal(rng, (3, 3, c, c), dt)
        # full s2d: input (res/2, res/2, 4c)
        from eyediseasesegmentation_tpu.ops.fastconv import pack_kernel_3x3
        x4 = jax.random.normal(rng, (V, res // 2, res // 2, 4 * c), dt)
        kp4 = pack_kernel_3x3(k3)
        timed(f"{name} {c}@{res} full-s2d conv2 (4x, {4*c}ch)",
              lambda a, k: conv(a, k, (1, 1), "SAME"), x4, kp4)
        # H-pack: input (res/2, res, 2c)
        xh = jax.random.normal(rng, (V, res // 2, res, 2 * c), dt)
        kph = make_hpacked_in_kernel(k3)
        timed(f"{name} {c}@{res} H-pack conv2 (2x, {2*c}ch)",
              lambda a, k: conv(a, k, (1, 1), "SAME"), xh, kph)
        # plain
        xp = jax.random.normal(rng, (V, res, res, c), dt)
        timed(f"{name} {c}@{res} plain conv2 (1x, {c}ch)",
              lambda a, k: conv(a, k, (1, 1), "SAME"), xp, k3)

    print("== head: 16->1 @1024 from various layouts ==")
    kh3 = jax.random.normal(rng, (3, 3, 16, 1), dt)
    # current: packed-16 conv (256ch in, 16ch out) + double d2s
    from eyediseasesegmentation_tpu.ops.fastconv import pack_kernel_3x3
    from eyediseasesegmentation_tpu.ops.packed import depth_to_space
    kp16 = pack_kernel_3x3(pack_kernel_3x3(kh3))
    x16 = jax.random.normal(rng, (V, 256, 256, 256), dt)

    def head_cur(a, k):
        y = conv(a, k, (1, 1), "SAME")
        return depth_to_space(depth_to_space(y))
    timed("head packed-16 conv + 2x d2s (current)", head_cur, x16, kp16)

    def head_nod2s(a, k):
        return conv(a, k, (1, 1), "SAME")
    timed("head packed-16 conv only (no d2s)", head_nod2s, x16, kp16)
    # H-pack-2 input at (512, 1024, 32)
    xh2 = jax.random.normal(rng, (V, 512, 1024, 32), dt)
    khp = make_hpacked_in_kernel(kh3)

    def head_h(a, k):
        y = conv(a, k, (1, 1), "SAME")  # (512,1024,2)
        n, h, w, c = y.shape
        return y.reshape(n, h, w, 2, 1).transpose(0, 1, 3, 2, 4).reshape(n, 2 * h, w, 1)
    timed("head H-pack-2 conv + unpack", head_h, xh2, khp)
    xp = jax.random.normal(rng, (V, 1024, 1024, 16), dt)
    timed("head plain 16->1@1024", head_nod2s, xp, kh3)

    print("== d2s / s2d raw cost at tail shapes ==")
    timed("d2s (8,256,256,256)->(8,512,512,64)",
          lambda a: depth_to_space(a), x16)
    y64 = jax.random.normal(rng, (V, 512, 512, 64), dt)
    from eyediseasesegmentation_tpu.ops.packed import space_to_depth
    timed("s2d (8,512,512,64)->(8,256,256,256)",
          lambda a: space_to_depth(a), y64)
    timed("H-unpack (8,256,512,128)->(8,512,512,64)",
          lambda a: a.reshape(a.shape[0], a.shape[1], a.shape[2], 2, 64)
          .transpose(0, 1, 3, 2, 4)
          .reshape(a.shape[0], 2 * a.shape[1], a.shape[2], 64),
          jax.random.normal(rng, (V, 256, 512, 128), dt))


if __name__ == "__main__":
    main()
