"""Compare true device time of the full TTA predict graph (in-jit loop)
against bench.py-style per-call dispatch timing, to isolate host/transport
overhead in the throughput harness."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from functools import partial

    from eyediseasesegmentation_tpu import models as zoo
    from eyediseasesegmentation_tpu.infer.tta import TTAPredictor

    scale_size, (H, W) = 1024, (2848, 4288)
    model = zoo.get_model(
        "unetplusplusstar",
        {"encoder_name": "BoTSER50_Axial_Imagenet_3",
         "decoder_attention_type": "scse",
         "base_dim": scale_size // 32, "classes": 1},
        training=False, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, scale_size, scale_size, 3), jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, init_x)
    pred = TTAPredictor(model, variables,
                        {"dataset_name": "IDRiD", "gray": False,
                         "scale_size": scale_size},
                        tta="d4", ori_hw=(H, W))

    raw = jax.device_put(jnp.asarray(
        np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32) * 255))

    # (a) true device time: in-jit fori loop with full data dependency
    @jax.jit
    def looped(r):
        def body(i, acc):
            r2 = jax.lax.dynamic_update_slice(
                r, acc.reshape(1, 1, 1, 1).astype(r.dtype), (0, 0, 0, 0))
            p = pred._predict(r2)
            return acc + jnp.sum(p).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, 4, body, jnp.float32(0))
    float(looped(raw))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(looped(raw))
        ts.append(time.perf_counter() - t0)
    print(f"in-jit predict loop: {(min(ts) - 0.03) / 4 * 1e3:.1f} ms/img",
          flush=True)

    # (b) bench.py-style: dispatch N, then sync each
    for _ in range(2):
        float(jnp.sum(pred._predict_jit(raw)))
    t0 = time.perf_counter()
    outs = [pred._predict_jit(raw) for _ in range(8)]
    for o in outs:
        float(jnp.sum(o))
    dt = time.perf_counter() - t0
    print(f"bench-style dispatch: {dt / 8 * 1e3:.1f} ms/img", flush=True)

    # (c) dispatch all, single fused sync
    t0 = time.perf_counter()
    outs = [pred._predict_jit(raw) for _ in range(8)]
    s = float(sum(jnp.sum(o) for o in outs))
    dt = time.perf_counter() - t0
    print(f"dispatch + fused sync: {dt / 8 * 1e3:.1f} ms/img", flush=True)


if __name__ == "__main__":
    main()
