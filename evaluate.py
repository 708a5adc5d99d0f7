"""Standalone checkpoint evaluation (reference ``src/main/dice.py``).

Recomputes dice/iou/precision/recall + average precision per test image for a
trained run directory, with optional D4 TTA and whole-image or tiled modes —
a cross-check of the pipeline's own numbers (dice.py:33-151).

Usage:
    python evaluate.py --logdir models/IDRiD/EX/run1 [--tta d4] [--tiled]
        [--threshold 0.5] [--config overrides.json]
"""

import argparse
import json
import logging

import numpy as np
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.config import TestConfig
from eyediseasesegmentation_tpu.data import TestSegmentation, get_datapath
from eyediseasesegmentation_tpu.data.datasets import batch_iterator
from eyediseasesegmentation_tpu.infer.tta import (TTAPredictor,
                                                  load_model_for_inference)
from eyediseasesegmentation_tpu.ops import metrics as M
from eyediseasesegmentation_tpu.utils import log_pretty_table

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", required=True)
    parser.add_argument("--tta", default="d4")
    parser.add_argument("--best", default="true")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--tiled", action="store_true",
                        help="sliding-window evaluation instead of the "
                             "whole-image resize path (reference dice.py:33-151)")
    parser.add_argument("--config", default=None)
    args = parser.parse_args()

    overrides = {}
    if args.config:
        with open(args.config) as f:
            overrides = json.load(f)
    cfg = TestConfig.from_dict({**TestConfig().get_all_attributes(),
                                **overrides}).get_all_attributes()

    model, variables, run_cfg = load_model_for_inference(
        args.logdir, best=args.best.lower() == "true")
    cfg = {**run_cfg, **cfg}
    from pathlib import Path
    img_paths, mask_paths = get_datapath(Path(cfg["test_img_path"]),
                                         Path(cfg["test_mask_path"]),
                                         cfg.get("lesion_type", "EX"))
    ds = TestSegmentation(
        img_paths, mask_paths, gray=cfg.get("gray", False),
        # whole-image mode scores against the reference's GT geometry
        # (dice.py rides the same compose + crop/resize-back as tta.py)
        metric_roundtrip_scale=(None if args.tiled
                                else int(cfg.get("scale_size", 1024))))
    first = ds[0]
    predictor = TTAPredictor(model, variables, cfg, tta=args.tta,
                             ori_hw=(first["ori_h"], first["ori_w"]),
                             resize=not args.tiled)

    rows = []
    stats_fn = jax.jit(M.per_image_stats)
    ap_fn = jax.jit(M.average_precision)

    def iter_predictions():
        if not args.tiled:
            for batch in batch_iterator(ds, args.batch_size, shuffle=False):
                probs = predictor.predict(batch["image"])
                for i in range(batch["n_valid"]):
                    yield (batch["filename"][i], probs[i],
                           jnp.asarray(batch["mask"][i]))
            return
        # tiled mode (reference dice.py:33-151): sliding-window prediction at
        # the run's scale_size with the same fused TTA views per tile
        from functools import partial
        from eyediseasesegmentation_tpu.models import get_preprocessing_fn
        from eyediseasesegmentation_tpu.ops.tiling import tiled_predict
        from eyediseasesegmentation_tpu.utils import make_grid

        scale_size = int(cfg.get("scale_size", 1024))
        prep_fn, _, _ = get_preprocessing_fn(cfg.get("dataset_name", "IDRiD"),
                                             cfg.get("gray", False))
        window = min(2 * scale_size, first["ori_h"], first["ori_w"])
        grid = jnp.asarray(make_grid((first["ori_h"], first["ori_w"]),
                                     window=window, min_overlap=32))
        tile_fn = lambda t: predictor._tta_probs(prep_fn(t)[None])[0]
        predict = jax.jit(partial(tiled_predict, tile_fn, window=window,
                                  scale_size=scale_size))
        for i in range(len(ds)):
            s = ds[i]
            if (s["ori_h"], s["ori_w"]) != (first["ori_h"], first["ori_w"]):
                raise ValueError(
                    f"{s['filename']} is {(s['ori_h'], s['ori_w'])} but the "
                    f"tile grid was built for the first image's "
                    f"{(first['ori_h'], first['ori_w'])}")
            yield (s["filename"],
                   predict(jnp.asarray(s["image"]), grid=grid),
                   jnp.asarray(s["mask"]))

    for name, p, g in iter_predictions():
        s = stats_fn((p > args.threshold).astype(jnp.float32), g)
        ap = float(ap_fn(p, g)) if float(jnp.sum(g)) > 0 else float("nan")
        rows.append([name,
                     round(float(s["dice"]), 4), round(float(s["iou"]), 4),
                     round(float(s["ppv"]), 4), round(float(s["sn"]), 4),
                     round(ap, 4) if np.isfinite(ap) else "n/a"])
    means = [np.mean([r[i] for r in rows if isinstance(r[i], float)])
             for i in range(1, 5)]
    rows.append(["Avg:"] + [round(float(m), 4) for m in means] + [""])
    log_pretty_table(["image", "dice", "iou", "precision", "recall", "AP"], rows)


if __name__ == "__main__":
    main()
