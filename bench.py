"""Benchmark: full-resolution IDRiD inference throughput with x8 (D4) TTA.

The BASELINE.json headline metric: images/sec/chip at IDRiD full resolution
(2848×4288) through the flagship UnetPlusPlusStar with the complete TTA
pipeline on device — resize+pad to 1024², normalize, 8 dihedral views as ONE
batched bf16 forward, inverse views + mean, un-pad crop, resize back to full
resolution. Baseline target: >= 5 images/sec/chip (TPU v5e).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Tunnel resilience: the axon TPU tunnel occasionally drops for minutes at a
time ("Unable to initialize backend 'axon'", or a hang inside backend init).
A transient outage must not erase the round's number, so the measurement runs
in a timed child subprocess and the parent retries with backoff for up to
~45 minutes before giving up.  Run with ``--_child`` to execute the
measurement directly (what the parent spawns).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Retry schedule for the parent wrapper: per-attempt wall clock cap and the
# sleeps between attempts.  Total worst-case budget ~= 5*900 + sum(sleeps)
# ~= 92 min; typical healthy run completes attempt 1 in ~6 min.
ATTEMPT_TIMEOUT_S = 1500  # cache-cold remote compiles of 32-view programs
                          # were observed to overrun the previous 900 s cap
BACKOFF_S = (60, 120, 240, 300)


def run_measurement():
    import jax
    import jax.numpy as jnp

    from eyediseasesegmentation_tpu import models as zoo
    from eyediseasesegmentation_tpu.infer.tta import TTAPredictor

    scale_size = 1024
    ori_h, ori_w = 2848, 4288  # IDRiD native resolution
    batch = 3  # 24 fused views: the measured throughput optimum (4.87 vs
    # 4.76 img/s at batch 2 or 4) — amortizes per-dispatch transport overhead
    # while still fitting HBM with the packed tail
    # 16 iters: the measurement window's one forced-sync RTT (~29 ms) plus
    # dispatch overheads are ~0.8% of the original 6-iter window; a longer
    # window shrinks that share — steadier steady-state number, +7 s wall
    # (measured: 4.9479 @12 iters/minres512; 5.0173 @12 iters/minres256)
    warmup, iters = 2, 16

    # experiment knobs (A/B sweeps from tools/tpu_queue.sh; defaults above
    # are what the driver measures)
    batch = int(os.environ.get("EDS_BENCH_BATCH", batch))
    model_params = {
        "encoder_name": "BoTSER50_Axial_Imagenet_3",
        "decoder_attention_type": "scse",
        "base_dim": scale_size // 32,
        "classes": 1,
        # measured eval optimum (tools/bench_minres.py on-chip sweep:
        # 256→190.8, 512→192.9, 384→193.1, 768→229.4 ms/8-view forward):
        # pulling the 256-res tail nodes into the packed layouts wins ~1.1%.
        # Exactness unaffected — fast_min_res only selects which nodes use
        # the packed (H2/s2d) rewrites (pinned by tests/test_packed_tail.py)
        "fast_min_res": 256,
    }
    if os.environ.get("EDS_BENCH_PALLAS_TAIL"):
        model_params["pallas_tail"] = os.environ["EDS_BENCH_PALLAS_TAIL"]
    if os.environ.get("EDS_BENCH_MINRES"):
        model_params["fast_min_res"] = int(os.environ["EDS_BENCH_MINRES"])

    model = zoo.get_model(
        "unetplusplusstar",
        model_params,
        training=False,
        dtype=jnp.bfloat16,
    )
    from functools import partial

    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((batch, scale_size, scale_size, 3), jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, init_x)

    cfg = {"dataset_name": "IDRiD", "gray": False, "scale_size": scale_size}
    predictor = TTAPredictor(model, variables, cfg, tta="d4",
                             ori_hw=(ori_h, ori_w))

    # stage inputs on device (production pipelines overlap host->device copies
    # with compute; benched separately they cost ~0.13s/147MB here)
    rng_np = np.random.RandomState(0)
    device_batches = [
        jax.device_put(jnp.asarray(
            rng_np.rand(batch, ori_h, ori_w, 3).astype(np.float32) * 255))
        for _ in range(2)
    ]

    for _ in range(warmup):
        probs = predictor._predict_jit(device_batches[0])
        float(jnp.sum(probs))  # forced sync (block_until_ready is unreliable
                               # over the remote-device transport)

    t0 = time.perf_counter()
    outs = [predictor._predict_jit(device_batches[i % len(device_batches)])
            for i in range(iters)]
    # force ALL outputs through one scalar fetch: the per-output float() sync
    # pattern costs a full ~29 ms transport RTT per image (float blocks the
    # host before the next sum can even dispatch); summing device-side and
    # fetching once keeps the device pipeline full (same data dependency)
    float(sum(jnp.sum(o) for o in outs))
    dt = time.perf_counter() - t0

    images_per_sec = batch * iters / dt
    baseline = 5.0  # BASELINE.json north-star: >=5 img/s/chip full-res x8-TTA
    print(json.dumps({
        "metric": "idrid_fullres_x8tta_images_per_sec",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / baseline, 4),
    }))


def _attempt():
    """One measurement attempt in a timed child process.

    Returns the JSON result line (str) on success, else None.  The child is
    a separate interpreter so a backend-init hang or a cached backend failure
    inside jax can't poison later attempts, and the timeout bounds the
    startup-hang failure mode (the axon sitecustomize can block interpreter
    startup while the tunnel is down).
    """
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_child"],
            capture_output=True, text=True, timeout=ATTEMPT_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        )
    except subprocess.TimeoutExpired:
        print(f"bench attempt timed out after {ATTEMPT_TIMEOUT_S}s "
              "(tunnel hang?)", file=sys.stderr)
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return line
    err = (proc.stderr or "").strip()
    tail = err.splitlines()[-8:]
    print(f"bench attempt failed rc={proc.returncode}:", file=sys.stderr)
    for ln in tail:
        print("  " + ln, file=sys.stderr)
    # deterministic failures (OOM, trace/type errors) won't heal with time —
    # only tunnel flakes deserve the retry budget
    for marker in ("RESOURCE_EXHAUSTED", "Ran out of memory",
                   "ValueError", "TypeError", "Allocation type: global"):
        if marker in err:
            print(f"bench: deterministic failure ({marker}); not retrying",
                  file=sys.stderr)
            return False
    return None


def main():
    if "--_child" in sys.argv:
        return run_measurement()

    for i, backoff in enumerate(BACKOFF_S + (None,)):
        result = _attempt()
        if result is False:  # deterministic failure — retries won't help
            break
        if result is not None:
            print(result)
            return 0
        if backoff is None:
            break
        print(f"retrying in {backoff}s (attempt {i + 2}/{len(BACKOFF_S) + 1}) "
              "— transient axon-tunnel outages usually recover in minutes",
              file=sys.stderr)
        time.sleep(backoff)
    print("bench: all attempts failed (tunnel down for the full retry "
          "budget)", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
