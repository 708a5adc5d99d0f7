"""Stage-wise timing of the flagship train step on TPU (VERDICT #7).

Stages: on-device augmentation | forward+loss | forward+backward |
optimizer update | full compiled step. Run:
PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train.py

Each stage runs in its OWN subprocess (``--stage`` selects one): the first
all-in-one-process run OOM'd HBM at the grads stage because every earlier
stage's executable and buffers were still resident.  ``--fast`` decomposes
the fast_train (packed-tail) variant.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation
import argparse
import subprocess
import time

import jax
import jax.numpy as jnp
import numpy as np

STAGES = ("aug", "fwd", "grads", "opt", "full")


def make_timer(inner=4, iters=4):
    def time_fn(fn, *args):
        @jax.jit
        def looped(*a):
            def body(i, acc):
                a0 = a[0]
                upd = acc.reshape((1,) * a0.ndim).astype(a0.dtype)
                a0 = jax.lax.dynamic_update_slice(a0, upd, (0,) * a0.ndim)
                y = fn(a0, *a[1:])
                tot = sum(jnp.sum(l).astype(jnp.float32)
                          for l in jax.tree_util.tree_leaves(y)
                          if jnp.issubdtype(l.dtype, jnp.floating))
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
        print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    return timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--aug", default="advanced")
    ap.add_argument("--fast", action="store_true",
                    help="decompose the fast_train packed-tail variant")
    ap.add_argument("--stage", choices=STAGES, default=None,
                    help="run ONE stage (default: spawn a subprocess per "
                         "stage — HBM stays clean between stages)")
    args = ap.parse_args()

    if args.stage is None:
        for st in STAGES:
            cmd = [_sys.executable, _os.path.abspath(__file__),
                   "--size", str(args.size), "--batch", str(args.batch),
                   "--aug", args.aug, "--stage", st]
            if args.fast:
                cmd.append("--fast")
            rc = subprocess.call(cmd)
            if rc != 0:
                print(f"stage {st} failed rc={rc}", flush=True)
        return

    from eyediseasesegmentation_tpu.train.trainer import Trainer

    size, bs = args.size, args.batch
    cfg = {
        "dataset_name": "IDRiD", "lesion_type": "EX",
        "augmentation": args.aug, "scale_size": size, "batch_size": bs,
        "learning_rate": 1e-3, "weight_decay": 1e-5, "is_fp16": True,
        "model_name": "unetplusplusstar",
        "model_params": {"encoder_name": "BoTSER50_Axial_Imagenet_3",
                         "decoder_attention_type": "scse",
                         "base_dim": size // 32, "classes": 1,
                         **({"fast_inference": True, "fast_train": True}
                            if args.fast else {})},
        "criterion": {"bce": 0.8, "log_dice": 0.2},
        "pos_weights": [500.0], "optimizer": "adamw",
        "mesh_shape": {"data": 1},
    }
    trainer = Trainer(cfg, seed=1999)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               sample_shape=(bs, size, size, 3))
    rng_np = np.random.RandomState(0)
    images = jnp.asarray(rng_np.rand(bs, size, size, 3) * 255, jnp.float32)
    masks = jnp.asarray((rng_np.rand(bs, size, size) < 0.1), jnp.float32)
    key = jax.random.PRNGKey(7)
    lr = jnp.asarray(1e-3, jnp.float32)

    timed = make_timer()
    tag = " [fast]" if args.fast else ""
    tr = trainer.transform
    model, params, bstats = trainer.model, state.params, state.batch_stats

    def fwd_loss(im, m, p):
        out, _ = model.apply({"params": p, "batch_stats": bstats}, im,
                             rngs={"dropout": key}, mutable=["batch_stats"],
                             train=True)
        final = out[0] if isinstance(out, tuple) else out
        m4 = m[..., None]
        total, _ = trainer.loss_fn(final.astype(jnp.float32), m4)
        return total

    if args.stage == "aug":
        timed("augmentation (batch_train)" + tag,
              lambda im, m, k: tr.batch_train(k, im, m), images, masks, key)
    elif args.stage == "fwd":
        timed("forward + loss (train mode)" + tag,
              fwd_loss, images, masks, params)
    elif args.stage == "grads":
        timed("forward + backward (grads)" + tag,
              lambda im, m, p: jax.grad(lambda q: fwd_loss(im, m, q))(p),
              images, masks, params)
    elif args.stage == "opt":
        def opt_only(g, p, o):
            o.hyperparams["learning_rate"] = lr
            upd, o2 = trainer.tx.update(g, o, p)
            import optax
            return optax.apply_updates(p, upd)

        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        timed("optimizer update alone" + tag,
              opt_only, grads, params, state.opt_state)
    elif args.stage == "full":
        timed("FULL train step" + tag,
              lambda im, m, k: trainer._train_step(
                  state, im, m, k, lr)[1]["loss"],
              images, masks, key)


if __name__ == "__main__":
    main()
