"""Time the flagship decoder as ONE graph on synthetic encoder features,
fast vs slow, to find composition overheads the per-node profile misses."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import time
from functools import partial

import jax
import jax.numpy as jnp


def timer(fn, *args, inner=4, iters=4):
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
    return (min(ts) - 0.03) / inner


def main():
    from eyediseasesegmentation_tpu.models.decoders import UnetPlusPlusDecoder

    V, S = 8, 1024
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    chans = [3, 64, 256, 512, 1024, 2048]
    feats = [jax.random.normal(jax.random.fold_in(rng, i),
                               (V, S // (2 ** i), S // (2 ** i), c), dt)
             for i, c in enumerate(chans)]

    for fast in (True, False):
        dec = UnetPlusPlusDecoder(
            encoder_channels=chans, base_dim=S // 32,
            attention_type="scse", star=True, fast_inference=fast,
            packed_final=True, dtype=dt)
        variables = jax.jit(partial(dec.init, train=False))(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, feats)
        # NOTE: the carry is written into args[0], which must be an input the
        # decoder CONSUMES (it drops features[0], the raw image) or XLA
        # hoists the whole decoder out of the timing loop
        t = timer(lambda c0, x0, *a: dec.apply(
            a[-1], [x0, c0] + list(a[:-1]), train=False),
            feats[1], feats[0], *feats[2:], variables)
        print(f"decoder fast={fast}: {t * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
