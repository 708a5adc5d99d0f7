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
from .tta import (TTAPredictor, export_masks_on_device,
                  load_model_for_inference)

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


def make_sharded_ensemble(predictors: Sequence[TTAPredictor], mesh):
    """Build a jitted ``fn(imgs) -> mean probs`` that evaluates the M
    ensemble members across the mesh's ``data`` axis and psum-means their
    TTA probabilities — the device-axis ensemble named by SURVEY §3.5 (the
    reference averaged on host, ensemble.py:84-99).

    Requires all members to share one architecture (identical variable
    trees — the usual ensemble-of-seeds/folds case). Member count is padded
    to the axis size by zero-weight repeats of member 0.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]
    m = len(predictors)
    assert m <= n_dev, f"{m} members > {n_dev} devices"
    ref = predictors[0]
    # every member runs through predictor 0's model object + preprocessing
    # config — reject config-heterogeneous ensembles up front instead of
    # silently mispredicting members 1..M
    keys = ("model_name", "model_params", "scale_size", "gray",
            "use_ben_transform", "dataset_name")
    ref_cfg = {k: ref.config.get(k) for k in keys}
    for i, p in enumerate(predictors[1:], 1):
        got = {k: p.config.get(k) for k in keys}
        if got != ref_cfg or p.tta != ref.tta:
            raise ValueError(
                f"sharded ensemble member {i} differs from member 0 in "
                f"model/preprocessing config: {got} vs {ref_cfg} "
                f"(tta {p.tta!r} vs {ref.tta!r}); the device-axis ensemble "
                "requires identical architectures and preprocessing — use "
                "the unsharded path for heterogeneous ensembles.")
    member_vars = [p.variables for p in predictors]
    member_vars += [member_vars[0]] * (n_dev - m)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *member_vars)
    weights = jnp.asarray([1.0] * m + [0.0] * (n_dev - m), jnp.float32)

    def worker(vars_m, w, imgs):
        my_vars = jax.tree_util.tree_map(lambda v: v[0], vars_m)
        probs = ref._predict(imgs, variables=my_vars)
        total = jax.lax.psum(w[0] * probs, DATA_AXIS)
        count = jax.lax.psum(w[0], DATA_AXIS)
        return total / count

    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(DATA_AXIS), stacked),
                  P(DATA_AXIS), P(None, None, None, None)),
        out_specs=P(None, None, None),
        check_vma=False,  # psum-combined output is replicated
    )
    jitted = jax.jit(sharded)
    return lambda imgs: jitted(stacked, weights, imgs)


def predict(config: Dict[str, Any], logdirs: Sequence, out_dir,
            tta: str = "d4", batch_size: int = 2, mesh=None) -> Dict[str, Any]:
    """Ensemble-mean prediction + AUC + threshold + mask export
    (ensemble.py:64-121)."""
    img_paths, mask_paths = get_datapath(Path(config["test_img_path"]),
                                         Path(config["test_mask_path"]),
                                         config.get("lesion_type", "EX"))
    ds = TestSegmentation(img_paths, mask_paths, gray=config.get("gray", False))
    first = ds[0]
    predictors = get_best_models(logdirs, tta=tta,
                                 ori_hw=(first["ori_h"], first["ori_w"]))
    mean_fn = None
    if mesh is not None:
        # members spread over chips, one psum-mean (SURVEY §3.5)
        mean_fn = make_sharded_ensemble(predictors, mesh)

    # Pipelined like infer.tta.test_tta: prefetch the decode, one jitted
    # metrics dispatch per batch, host fetches one batch behind the device.
    from collections import deque

    from ..data.datasets import prefetch

    eval_fn = jax.jit(M.batch_image_metrics)
    totals: Dict[str, Any] = {}
    probs_list = []

    def _materialize(entry):
        probs_dev, stats_dev, fnames = entry
        for k, v in stats_dev.items():
            totals[k] = totals.get(k, 0) + np.asarray(v)
        probs_list.append((probs_dev, fnames))  # device-resident until export

    pending: deque = deque()
    for batch in prefetch(batch_iterator(ds, batch_size, shuffle=False,
                                         workers=min(4, batch_size))):
        imgs = jnp.asarray(batch["image"])  # uint8 wire; predictors cast in-jit
        if mean_fn is not None:
            mean_probs = mean_fn(imgs)
        else:
            mean_probs = sum(p.predict(imgs)
                             for p in predictors) / len(predictors)
        stats = eval_fn(mean_probs, batch["mask"].astype(np.uint8),
                        batch["n_valid"])
        pending.append((mean_probs, stats,
                        list(batch["filename"][:batch["n_valid"]])))
        if len(pending) > 1:
            _materialize(pending.popleft())
    while pending:
        _materialize(pending.popleft())

    tp, apc, pp = totals["tp"], totals["ap"], totals["pp"]
    mean_auc = float(totals["ap_sum"]) / max(float(totals["ap_count"]), 1)
    from ..analysis.aucpr import pr_curve_report
    out_dir = Path(out_dir)
    thresholds = pr_curve_report(tp, apc, pp, "ensemble", figure_dir=out_dir / "figures")
    optim = thresholds["optimal_threshold_2"]
    mask_dir = out_dir / "masks"
    mask_dir.mkdir(parents=True, exist_ok=True)
    export_masks_on_device(
        ((p, [Path(n).stem + ".jpg" for n in fnames])
         for p, fnames in probs_list),
        optim, mask_dir)
    logger.info("ensemble MEAN-AUC %.5f", mean_auc)
    return {"mean_auc": mean_auc, "thresholds": thresholds, "out_dir": str(mask_dir)}
