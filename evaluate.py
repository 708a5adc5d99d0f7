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
    ds = TestSegmentation(img_paths, mask_paths, gray=cfg.get("gray", False))
    first = ds[0]
    predictor = TTAPredictor(model, variables, cfg, tta=args.tta,
                             ori_hw=(first["ori_h"], first["ori_w"]))

    rows = []
    stats_fn = jax.jit(M.per_image_stats)
    ap_fn = jax.jit(M.average_precision)
    for batch in batch_iterator(ds, args.batch_size, shuffle=False):
        probs = predictor.predict(batch["image"])
        for i in range(batch["n_valid"]):
            p = probs[i]
            g = jnp.asarray(batch["mask"][i])
            s = stats_fn((p > args.threshold).astype(jnp.float32), g)
            ap = float(ap_fn(p, g)) if float(jnp.sum(g)) > 0 else float("nan")
            rows.append([batch["filename"][i],
                         round(float(s["dice"]), 4), round(float(s["iou"]), 4),
                         round(float(s["ppv"]), 4), round(float(s["sn"]), 4),
                         round(ap, 4) if np.isfinite(ap) else "n/a"])
    means = [np.mean([r[i] for r in rows if isinstance(r[i], float)])
             for i in range(1, 5)]
    rows.append(["Avg:"] + [round(float(m), 4) for m in means] + [""])
    log_pretty_table(["image", "dice", "iou", "precision", "recall", "AP"], rows)


if __name__ == "__main__":
    main()
