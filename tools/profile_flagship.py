"""Decompose the flagship's fused 8-view forward into per-stage TPU timings.

Methodology (PERFORMANCE.md): the axon transport's per-sync RTT is ~29 ms and
``block_until_ready`` is unreliable, so every measurement is an in-jit
``fori_loop`` whose body writes the carry into the input (defeats hoisting)
and reduces the full output into the carry (defeats DCE/slicing). The empty
loop is measured and subtracted.

Usage: python tools/profile_flagship.py [--size 1024] [--inner 4] [--iters 6]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct invocation

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_timer(inner: int, iters: int):
    def time_fn(name, fn, *args):
        """fn(*args) -> array (or pytree); returns best seconds per call.
        All args pass through jit as parameters (closure constants would be
        embedded in the HLO and overflow the remote-compile request)."""
        @jax.jit
        def looped(*a):
            def body(i, acc):
                a0 = a[0]
                upd = acc.reshape((1,) * a0.ndim).astype(a0.dtype)
                a0 = jax.lax.dynamic_update_slice(a0, upd, (0,) * a0.ndim)
                y = fn(a0, *a[1:])
                total = sum(jnp.sum(leaf).astype(jnp.float32)
                            for leaf in jax.tree_util.tree_leaves(y))
                return acc + total * 1e-30
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

        float(looped(*args))  # compile + warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(looped(*args))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        return dt

    # empty-loop / sync overhead
    zero = jnp.zeros((8, 8), jnp.float32)
    base = time_fn("base", lambda x: x, zero)

    def timed(name, fn, *args):
        dt = (time_fn(name, fn, *args) - base) / inner
        print(f"{name:42s} {dt * 1e3:9.2f} ms")
        return dt

    return timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--fast", action="store_true",
                    help="profile tail nodes with the packed fast path")
    ap.add_argument("--nodes", type=str, default="",
                    help="comma-separated node filter")
    args = ap.parse_args()

    from eyediseasesegmentation_tpu import models as zoo
    from eyediseasesegmentation_tpu.models.decoders import DecoderBlock
    from eyediseasesegmentation_tpu.models.modules.layers import upsample2x

    S = args.size
    V = args.views
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    timed = make_timer(args.inner, args.iters)

    model = zoo.get_model(
        "unetplusplusstar",
        {"encoder_name": "BoTSER50_Axial_Imagenet_3",
         "decoder_attention_type": "scse",
         "base_dim": S // 32, "classes": 1},
        training=False, dtype=dt)
    x = jax.random.normal(rng, (V, S, S, 3), jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x)

    total = timed("full fused forward", lambda im, v: model.apply(
        v, im, train=False), x, variables)

    # encoder alone
    from eyediseasesegmentation_tpu.models.encoders import get_encoder
    encoder, _ = get_encoder("BoTSER50_Axial_Imagenet_3",
                             base_dim=S // 32, dtype=dt)
    enc_vars = {"params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"]}
    enc_t = timed("encoder", lambda im, v: encoder.apply(
        v, im.astype(dt), train=False), x, enc_vars)

    # ------- per-node decoder blocks at their true shapes -------
    # BoTSER50 @1024²: feats head-first = 2048@32², 1024@64², 512@128²,
    # 256@256², 64@512² (see models/encoders.py)
    base_dim = S // 32
    s32, s64, s128, s256, s512 = S // 32, S // 16, S // 8, S // 4, S // 2
    nodes = [
        # name, in(ch,res), skip parts (ch,res), out, level, use_catt
        ("x_0_0", (2048, s32), [(1024, s64)], 256, 0, True),
        ("x_1_1", (1024, s64), [(512, s128)], 512, 1, True),
        ("x_2_2", (512, s128), [(256, s256)], 256, 2, False),
        ("x_3_3", (256, s256), [(64, s512)], 64, 3, False),
        ("x_0_1", (256, s64), [(512, s128), (512, s128)], 128, 1, True),
        ("x_1_2", (512, s128), [(256, s256), (256, s256)], 256, 2, False),
        ("x_2_3", (256, s256), [(64, s512), (64, s512)], 64, 3, False),
        ("x_0_2", (128, s128), [(256, s256)] * 3, 64, 2, False),
        ("x_1_3", (256, s256), [(64, s512)] * 3, 64, 3, False),
        ("x_0_3", (64, s256), [(64, s512)] * 4, 32, 3, False),
        ("x_0_4", (32, s512), [], 16, 4, False),
    ]
    block_sum = 0.0
    sel = set(args.nodes.split(",")) if args.nodes else None
    for name, (cin, rin), skips, cout, level, catt in nodes:
        if sel and name not in sel:
            continue
        skip_ch = sum(c for c, _ in skips)
        fast = args.fast and not catt and cout < 128 and rin >= 256 // 2
        blk = DecoderBlock(cin, skip_ch, cout, base_dim=base_dim, level=level,
                           use_catt=catt, attention_type="scse",
                           drop_block_prob=0.1, fast_tail=fast, dtype=dt)
        xin = jax.random.normal(rng, (V, rin, rin, cin), dt)
        skip = [jax.random.normal(jax.random.fold_in(rng, i),
                                  (V, r, r, c), dt)
                for i, (c, r) in enumerate(skips)] or None
        bv = jax.jit(partial(blk.init, train=False))(
            {"params": rng, "dropout": rng}, xin, skip)
        if skip is None:
            t = timed(f"{name} ({cin}@{rin}->{cout})",
                      lambda a, v, b=blk: b.apply(v, a, None, train=False),
                      xin, bv)
        else:
            t = timed(f"{name} ({cin}+{skip_ch}@{rin * 2}->{cout})",
                      lambda a, v, *s, b=blk: b.apply(v, a, list(s),
                                                      train=False),
                      xin, bv, *skip)
        block_sum += t

    # segmentation head 16->1 @S
    from eyediseasesegmentation_tpu.models.modules.layers import SegmentationHead
    head = SegmentationHead(classes=1, dtype=dt)
    hx = jax.random.normal(rng, (V, S, S, 16), dt)
    hv = jax.jit(head.init)(rng, hx)
    block_sum += timed("seg head 16->1", lambda a, v: head.apply(v, a), hx, hv)

    print(f"{'decoder blocks sum':42s} {block_sum * 1e3:9.2f} ms")
    print(f"{'encoder + blocks':42s} {(enc_t + block_sum) * 1e3:9.2f} ms"
          f"   (full = {total * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
