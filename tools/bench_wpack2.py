"""Probe round 2: layouts for the cout<64 tail (x_0_3, x_0_4, head).

x_0_3 conv1 (320->32@512): full-s2d measured 9.45 ms vs a 3.1 ms logical
floor — try H-pack factor 4 (kernel 6x3, 2x FLOPs, 128 lanes).
x_0_4 chain: measure the real f16 double-packed ops in isolation.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_wpack2.py
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
        print(f"{name:58s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    return timed


def conv(x, k, strides, padding):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_h4_kernel(k3):
    """(3,3,cin,cout) -> (6,3,cin,4*cout): stride-(4,1), pad rows (1,4)."""
    cin, cout = k3.shape[2], k3.shape[3]
    k6 = jnp.zeros((6, 3, cin, 4 * cout), k3.dtype)
    for a in range(4):
        k6 = k6.at[a:a + 3, :, :, a * cout:(a + 1) * cout].set(k3)
    return k6


def main():
    rng = jax.random.PRNGKey(0)
    timed = make_timer()
    dt = jnp.bfloat16
    V = 8

    print("== x_0_3 conv1: 320->32 @512 ==")
    x = jax.random.normal(rng, (V, 512, 512, 320), dt)
    k3 = jax.random.normal(rng, (3, 3, 320, 32), dt)
    from eyediseasesegmentation_tpu.ops.packed import make_stride2_kernel
    timed("full-s2d (16/9, 128ch) [round-1 ref 9.45]",
          lambda a, k: conv(a, k, (2, 2), ((1, 2), (1, 2))),
          x, make_stride2_kernel(k3))
    timed("H4-pack (2x, 128ch)",
          lambda a, k: conv(a, k, (4, 1), ((1, 4), (1, 1))),
          x, make_h4_kernel(k3))

    print("== x_0_3 conv2: 32 @512 packed f4 layouts ==")
    k32 = jax.random.normal(rng, (3, 3, 32, 32), dt)
    from eyediseasesegmentation_tpu.ops.fastconv import pack_kernel_3x3
    x4 = jax.random.normal(rng, (V, 256, 256, 128), dt)
    timed("s2d-f4 conv2 (4x, 128ch) [ref 1.32]",
          lambda a, k: conv(a, k, (1, 1), "SAME"), x4, pack_kernel_3x3(k32))

    print("== x_0_4 real ops (f16 chain @1024 logical) ==")
    from eyediseasesegmentation_tpu.ops import packed as PK
    k_up = jax.random.normal(rng, (3, 3, 32, 16), dt)
    xp4 = jax.random.normal(rng, (V, 256, 256, 128), dt)  # x_0_3 out, f4
    timed("phase_upconv_s2d_packed 32->16 (f4 in, f16 out)",
          lambda a, k: PK.phase_upconv_s2d_packed(a, k, dtype=dt), xp4, k_up)
    k16 = jax.random.normal(rng, (3, 3, 16, 16), dt)
    x16 = jax.random.normal(rng, (V, 256, 256, 256), dt)
    timed("conv2 f16 (16x, 256ch)",
          lambda a, k: conv(a, k, (1, 1), "SAME"),
          x16, pack_kernel_3x3(pack_kernel_3x3(k16)))
    # alternative: f8 = H4W2: convert f16 (H4W4) -> H4W2 via W-interleave
    def to_h4w2(a):
        n, h, w, c = a.shape  # c = 16*cout_l; layout (A2,B2,a2,b2,cl)? the
        # f16 layout is outer(A,B) then inner(a,b): ((A*2+B)*4+(a*2+b))*cl
        cl = c // 16
        a = a.reshape(n, h, w, 2, 2, 2, 2, cl)           # A,B,a,b
        a = a.transpose(0, 1, 4, 6, 2, 3, 5, 7)          # n,h,B,b,w,A,a,cl
        return a.reshape(n, h, 4 * w // 4, 4, w // w, 1, 4 * cl)  # placeholder
    # (conversion layout probe only — raw transpose cost)
    timed("f16 -> H4W2 repack transpose cost (upper bound)",
          lambda a: a.reshape(a.shape[0], 256, 256, 2, 2, 2, 2, 1)
          .transpose(0, 1, 4, 2, 3, 5, 6, 7)
          .reshape(a.shape[0], 512, 256, 8),
          jax.random.normal(rng, (V, 256, 256, 16), dt))
    k8 = jnp.zeros((3, 3, 128, 128), dt)  # H4W2 packed conv2 kernel (8x)
    x8 = jax.random.normal(rng, (V, 256, 512, 128), dt)
    timed("conv2 H4W2-f8 (8x, 128ch) kernel-only cost",
          lambda a, k: conv(a, k, (1, 1), "SAME"), x8, k8)

    print("== head on f16 (current) ==")
    kh = jax.random.normal(rng, (3, 3, 16, 1), dt)
    timed("head f16 conv (ref 2.85)",
          lambda a, k: conv(a, k, (1, 1), "SAME"),
          x16, pack_kernel_3x3(pack_kernel_3x3(kh)))


if __name__ == "__main__":
    main()
