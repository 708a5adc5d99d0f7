"""Multi-checkpoint ensemble inference.

Parity with reference ``ensemble.py:39-121``: each run directory contributes a
model re-hydrated from its config.json + best checkpoint, wrapped in D4 TTA;
per batch the sigmoid predictions are averaged across models, then the usual
AUC-PR / threshold / mask-export pipeline runs once on the ensemble probs.

TPU design: the M models run inside one jit as a python loop over pytrees
(XLA parallelizes independent subgraphs); the mean is an on-device reduction —
the psum-mean analogue of the reference's host-side averaging (SURVEY.md §3.5).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data import TestSegmentation, get_datapath
from ..data.datasets import batch_iterator
from ..ops import metrics as M
from ..utils import save_output
from .tta import TTAPredictor, load_model_for_inference

logger = logging.getLogger("eyediseasesegmentation_tpu")


def get_best_models(logdirs: Sequence, tta: str = "d4",
                    ori_hw=None) -> List[TTAPredictor]:
    """Load every run's best checkpoint as a TTA predictor (ensemble.py:39-62)."""
    predictors = []
    for logdir in logdirs:
        model, variables, cfg = load_model_for_inference(logdir, best=True)
        predictors.append(TTAPredictor(model, variables, cfg, tta=tta,
                                       ori_hw=ori_hw))
    return predictors


def predict(config: Dict[str, Any], logdirs: Sequence, out_dir,
            tta: str = "d4", batch_size: int = 2) -> Dict[str, Any]:
    """Ensemble-mean prediction + AUC + threshold + mask export
    (ensemble.py:64-121)."""
    img_paths, mask_paths = get_datapath(Path(config["test_img_path"]),
                                         Path(config["test_mask_path"]),
                                         config.get("lesion_type", "EX"))
    ds = TestSegmentation(img_paths, mask_paths, gray=config.get("gray", False))
    first = ds[0]
    predictors = get_best_models(logdirs, tta=tta,
                                 ori_hw=(first["ori_h"], first["ori_w"]))

    n_th = len(M.THRESH_LIST)
    tp = np.zeros(n_th); apc = np.zeros(n_th); pp = np.zeros(n_th)
    ap_sum, ap_count = 0.0, 0
    probs_list, names = [], []
    for batch in batch_iterator(ds, batch_size, shuffle=False):
        imgs = jnp.asarray(batch["image"], jnp.float32)
        mean_probs = sum(p.predict(imgs) for p in predictors) / len(predictors)
        for i in range(batch["n_valid"]):
            p = mean_probs[i]
            g = jnp.asarray(batch["mask"][i])
            probs_list.append(np.asarray(p)); names.append(batch["filename"][i])
            if float(jnp.sum(g)) > 0:
                ap_sum += float(M.average_precision(p, g))
                ap_count += 1
            t, a, q, _ = M.threshold_sweep(p, g)
            tp += np.asarray(t); apc += np.asarray(a); pp += np.asarray(q)

    mean_auc = ap_sum / max(ap_count, 1)
    from ..analysis.aucpr import pr_curve_report
    out_dir = Path(out_dir)
    thresholds = pr_curve_report(tp, apc, pp, "ensemble", figure_dir=out_dir / "figures")
    optim = thresholds["optimal_threshold_2"]
    mask_dir = out_dir / "masks"
    mask_dir.mkdir(parents=True, exist_ok=True)
    for p, name in zip(probs_list, names):
        save_output((p > optim).astype(np.uint8), mask_dir / (Path(name).stem + ".jpg"))
    logger.info("ensemble MEAN-AUC %.5f", mean_auc)
    return {"mean_auc": mean_auc, "thresholds": thresholds, "out_dir": str(mask_dir)}
