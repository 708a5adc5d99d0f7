"""Training-step throughput of the flagship on the real TPU.

Times the full compiled train step (on-device augmentation, bf16
forward/backward, compound loss, MADGRAD/AdamW update) at the production
shape — the reference trained UnetPlusPlusStar at 1024^2, batch 2, on GPUs.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="gradient rematerialization (halves activation HBM)")
    ap.add_argument("--fast", action="store_true",
                    help="grad-safe packed fast tail (fast_train)")
    args = ap.parse_args()

    from eyediseasesegmentation_tpu.train.trainer import Trainer

    size, bs = args.size, args.batch
    cfg = {
        "dataset_name": "IDRiD",
        "lesion_type": "EX",
        "augmentation": "advanced",
        "scale_size": size,
        "batch_size": bs,
        "learning_rate": 1e-3,
        "weight_decay": 1e-5,
        "is_fp16": True,
        "model_name": "unetplusplusstar",
        "model_params": {
            "encoder_name": "BoTSER50_Axial_Imagenet_3",
            "decoder_attention_type": "scse",
            "base_dim": size // 32,
            "classes": 1,
            **({"fast_inference": True, "fast_train": True}
               if args.fast else {}),
        },
        "criterion": {"bce": 0.8, "log_dice": 0.2},
        "pos_weights": [500.0],
        "optimizer": "adamw",
        "mesh_shape": {"data": 1},
        "remat": args.remat,
    }
    trainer = Trainer(cfg, seed=1999)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               sample_shape=(bs, size, size, 3))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(bs, size, size, 3) * 255, jnp.float32)
    masks = jnp.asarray((rng.rand(bs, size, size) < 0.1), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    # warmup/compile
    state, metrics = trainer._train_step(state, images, masks,
                                         jax.random.PRNGKey(1), lr)
    print("first loss:", float(metrics["loss"]), flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = trainer._train_step(state, images, masks,
                                             jax.random.fold_in(
                                                 jax.random.PRNGKey(2), i), lr)
    last = float(metrics["loss"])  # forces completion of the chain
    dt = time.perf_counter() - t0
    print(f"train step @{size}^2 bs{bs}: {dt / args.steps * 1e3:.1f} ms/step, "
          f"{bs * args.steps / dt:.2f} img/s  (last loss {last:.4f})",
          flush=True)


if __name__ == "__main__":
    main()
