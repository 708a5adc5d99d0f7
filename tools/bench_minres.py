"""Sweep `fast_min_res` on the flagship fused 8-view forward (real TPU).

`fast_min_res` sets the resolution threshold above which cout<128 decoder
nodes switch to the packed (H2/s2d) layouts (models/decoders.py:295).  The
default 512 was chosen analytically in round 2; this probes whether pulling
the 256-resolution nodes (x_2_2/x_2_3 class) into the packed path wins or
loses at the production shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_minres.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import time
from functools import partial

import jax
import jax.numpy as jnp


def main():
    from eyediseasesegmentation_tpu import models as zoo

    S, V = 1024, 8
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (V, S, S, 3), jnp.float32)

    for minres in (512, 256, 384, 768):
        model = zoo.get_model(
            "unetplusplusstar",
            {"encoder_name": "BoTSER50_Axial_Imagenet_3",
             "decoder_attention_type": "scse",
             "base_dim": S // 32, "classes": 1,
             "fast_inference": True, "fast_min_res": minres},
            training=False, dtype=jnp.bfloat16)
        variables = jax.jit(partial(model.init, train=False))(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x)

        @jax.jit
        def looped(im, v):
            def body(i, acc):
                im2 = jax.lax.dynamic_update_slice(
                    im, acc.reshape(1, 1, 1, 1).astype(im.dtype), (0, 0, 0, 0))
                y = model.apply(v, im2, train=False)
                return acc + jnp.sum(y).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, 4, body, jnp.float32(0))

        float(looped(x, variables))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(looped(x, variables))
            ts.append(time.perf_counter() - t0)
        print(f"fast_min_res={minres}: {(min(ts) - 0.03) / 4 * 1e3:.1f} "
              "ms/forward", flush=True)


if __name__ == "__main__":
    main()
