"""Test-time-augmentation inference — single-pass, batched on a device axis.

TPU re-design of reference ``src/main/tta.py``: the ttach wrapper ran 8 D4
forwards per batch and the re-iterable generator re-executed them 3× (once for
AUC, once for the threshold sweep, once for mask export — 24 forwards/image,
tta.py:108-148). Here the V augmented views are stacked on a leading axis and
run as ONE batched forward inside jit; predictions are computed once and reused
for AUC, the vectorized threshold sweep, and mask export (SURVEY.md §6).

TTA aliases (reference tta.py:92-99): d4 / multiscale(1,2,4) / flip / hflip /
five_crop / ten_crop / none.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from collections import deque
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import models as zoo
from ..data import TestSegmentation, get_datapath, get_transform
from ..data.datasets import batch_iterator, prefetch
from ..ops import image as I
from ..ops import metrics as M
from ..train.checkpoint import load_checkpoint
from ..utils import make_grid as _make_grid, save_output

logger = logging.getLogger("eyediseasesegmentation_tpu")


# ---------------------------------------------------------------------------
# TTA view families: build (V, B, H, W, C) stacks and their inverses
# ---------------------------------------------------------------------------

def _flip_views(img):  # ttach HFlip x VFlip compose: 4 combinations
    return jnp.stack([img, I.hflip(img), I.vflip(img), I.vflip(I.hflip(img))], 0)


def _flip_inverse(views):
    return jnp.stack([views[0], I.hflip(views[1]), I.vflip(views[2]),
                      I.hflip(I.vflip(views[3]))], 0)


def _hflip_views(img):
    return jnp.stack([img, I.hflip(img)], 0)


def _hflip_inverse(views):
    return jnp.stack([views[0], I.hflip(views[1])], 0)


TTA_FAMILIES: Dict[str, Tuple[Callable, Callable, int]] = {
    "d4": (I.d4_views, I.d4_inverse, 8),
    "flip": (_flip_views, _flip_inverse, 4),
    "hflip": (_hflip_views, _hflip_inverse, 2),
    "none": (lambda x: x[None], lambda v: v, 1),
}

MULTISCALE_SCALES = (1, 2, 4)


# ---------------------------------------------------------------------------
# Model (re)construction from a run directory
# ---------------------------------------------------------------------------

def load_model_for_inference(logdir, best: bool = True, dtype=jnp.bfloat16):
    """Rebuild the model from <logdir>/config.json with inference demotions and
    load best/last checkpoint params (reference tta.py:62-87).

    ``inference_dtype`` in config.json overrides the bf16 default compute
    dtype (e.g. "float32" for strict cross-framework metric parity — the
    torch reference computes fp32 under its disabled-AMP eval path)."""
    logdir = Path(logdir)
    with open(logdir / "config.json") as f:
        config = json.load(f)
    if config.get("inference_dtype"):
        dtype = jnp.dtype(config["inference_dtype"])
    model = zoo.get_model(config["model_name"], dict(config.get("model_params") or {}),
                          training=False, dtype=dtype)
    ckpt_name = "best.ckpt" if best else "last.ckpt"
    ckpt = load_checkpoint(logdir / "checkpoints" / ckpt_name)
    state = ckpt["model_state_dict"]
    return model, {"params": state["params"],
                   "batch_stats": state.get("batch_stats", {})}, config


# ---------------------------------------------------------------------------
# The predictor
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TTAPredictor:
    """Jit-compiled whole-image TTA predictor.

    ``predict(raw_images)`` maps (B, H0, W0, 3) raw host images to
    (B, H0, W0) probabilities at original resolution: resize+normalize → V
    views as one batched forward → inverse views → mean → center-crop the pad →
    resize back (the reference predict_generator, tta.py:108-121)."""

    model: Any
    variables: Dict[str, Any]
    config: Dict[str, Any]
    tta: str = "d4"
    ori_hw: Optional[Tuple[int, int]] = None
    resize: bool = True  # False: vessel mode — images pre-padded, no resize
                         # (reference tta_vessel.py:76)
    mesh: Optional[Any] = None  # jax Mesh: shard the fused view batch over
                                # 'data' (d4's 8 views map onto 8 chips; the
                                # mean is a psum XLA inserts)
    # largest monolithic forward resolution for the multiscale alias; scales
    # whose upsampled size exceeds it run tiled (HBM cap: scale 4 at
    # scale_size 1024 would be a 4096² forward)
    multiscale_max_res: int = 2048

    def __post_init__(self):
        cfg = self.config
        self.scale_size = int(cfg.get("scale_size", 1024))
        prep_fn, _, _ = zoo.get_preprocessing_fn(cfg.get("dataset_name", "IDRiD"),
                                                 cfg.get("gray", False))
        transform_cls = get_transform("normal")
        self.transform = transform_cls(image_size=self.scale_size,
                                       preprocessing_fn=prep_fn)
        if self.mesh is not None:
            from ..parallel import replicate
            self.variables = replicate(self.variables, self.mesh)
        self._uint8_wire = True  # disabled on first non-integral input
        self._predict_jit = jax.jit(self._predict)

    def _forward(self, images, variables=None):
        """One forward -> fp32 LOGITS (B, H, W). The sigmoid is applied AFTER
        the TTA merge: ttach's SegmentationTTAWrapper(merge_mode='mean')
        merges raw model outputs and the reference sigmoids the merged map
        (tta.py:92-99,113) — sigmoid(mean(logits)), not mean(sigmoid)."""
        out = self.model.apply(
            self.variables if variables is None else variables,
            images, train=False)
        if isinstance(out, tuple):
            out = out[0]
        return out.astype(jnp.float32)[..., 0]

    def _scaled_logits_tiled(self, imgs, s, variables=None):
        """Scale-s (>1) multiscale leg without materializing the (B, sS, sS)
        activations: the virtually-upsampled image is processed as s² S-sized
        tiles inside one ``lax.scan`` (each tile sliced straight from the
        ORIGINAL image via ``scale_and_translate`` — bit-exact equal to
        resize-then-slice), logits pasted into a 1-channel canvas and
        downscaled back. The monolithic path OOMs at scale_size 1024, scale 4
        (a 4096² forward); per-tile forwards == the whole-image forward only
        up to the model's receptive-field truncation at tile seams — the same
        deviation tiled inference (tta_patches) already carries."""
        n, h, w, c = imgs.shape
        offs = jnp.array([(i * h, j * w) for i in range(s) for j in range(s)],
                         jnp.float32)
        canvas = jnp.zeros((n, s * h, s * w), jnp.float32)

        def body(canvas, off):
            tile = jax.image.scale_and_translate(
                imgs, (n, h, w, c), (1, 2),
                jnp.array([s, s], jnp.float32), -off, method="linear")
            p = self._forward(tile, variables)
            return jax.lax.dynamic_update_slice(
                canvas, p, (0, off[0].astype(jnp.int32),
                            off[1].astype(jnp.int32))), None

        canvas, _ = jax.lax.scan(body, canvas, offs)
        return jax.image.resize(canvas, (n, h, w), "bilinear",
                                antialias=False)

    def _tta_probs(self, imgs, variables=None):
        """imgs (B, S, S, C) normalized -> TTA-merged probs (B, S, S):
        sigmoid of the mean of the inverse-view LOGITS (ttach merge_mode=
        'mean' merges raw outputs; the reference sigmoids once after,
        tta.py:113).

        ``variables``: optional explicit pytree overriding ``self.variables``
        (pure-function form — the device-axis ensemble maps over members)."""
        if self.tta == "multiscale":
            acc = 0.0
            for s in MULTISCALE_SCALES:
                n, h, w, c = imgs.shape
                if s == 1:
                    p = self._forward(imgs, variables)
                elif s * max(h, w) > self.multiscale_max_res:
                    p = self._scaled_logits_tiled(imgs, s, variables)
                else:
                    up = jax.image.resize(imgs, (n, h * s, w * s, c),
                                          "bilinear", antialias=False)
                    p = self._forward(up, variables)
                    p = jax.image.resize(p, (n, h, w), "bilinear",
                                         antialias=False)
                acc = acc + p
            return jax.nn.sigmoid(acc / len(MULTISCALE_SCALES))
        if self.tta in ("five_crop", "ten_crop"):
            return jax.nn.sigmoid(self._crop_tta(imgs, variables))
        make_views, inverse, V = TTA_FAMILIES[self.tta]
        # Cast to the model's compute dtype BEFORE building the views: the
        # flip/rot90 family is pure permutation, so cast∘permute ≡
        # permute∘cast and the model's first conv casts its input anyway —
        # the (V·B, S, S, C) stack (402 MB fp32 at d4/1024²/b3) materializes
        # at half the bytes with identical numerics.
        cdt = getattr(self.model, "dtype", None)
        if cdt is not None and imgs.dtype != cdt:
            imgs = imgs.astype(cdt)
        views = make_views(imgs)  # (V, B, S, S, C)
        v, b, h, w, c = views.shape
        flat = views.reshape(v * b, h, w, c)
        if self.mesh is not None:
            # multi-chip TTA: the fused view batch shards over 'data'
            from jax.sharding import NamedSharding, PartitionSpec as P
            flat = jax.lax.with_sharding_constraint(
                flat, NamedSharding(self.mesh, P("data", None, None, None)))
        logits = self._forward(flat, variables)
        logits = inverse(logits.reshape(v, b, h, w)[..., None])[..., 0]
        return jax.nn.sigmoid(jnp.mean(logits, axis=0))

    def _crop_tta(self, imgs, variables=None):
        """five_crop: 4 corners + center at S/2, LOGITS pasted back and
        count-normalized (sigmoid applied by the caller after the merge);
        ten_crop adds the hflip set."""
        n, s = imgs.shape[0], imgs.shape[1]
        cs = s // 2
        corners = [(0, 0), (0, s - cs), (s - cs, 0), (s - cs, s - cs),
                   ((s - cs) // 2, (s - cs) // 2)]
        batches = [imgs] if self.tta == "five_crop" else [imgs, I.hflip(imgs)]
        acc = jnp.zeros((n, s, s), jnp.float32)
        cnt = jnp.zeros((s, s), jnp.float32)
        for bi, im in enumerate(batches):
            for (y, x) in corners:
                crop = jax.lax.dynamic_slice(
                    im, (0, y, x, 0), (n, cs, cs, im.shape[-1]))
                p = self._forward(crop, variables)
                if bi == 1:
                    p = p[:, :, ::-1]
                    x = s - cs - x
                acc = jax.lax.dynamic_update_slice(
                    acc, jax.lax.dynamic_slice(acc, (0, y, x), (n, cs, cs)) + p,
                    (0, y, x))
                cnt = jax.lax.dynamic_update_slice(
                    cnt, jax.lax.dynamic_slice(cnt, (y, x), (cs, cs)) + 1.0, (y, x))
        return acc / jnp.maximum(cnt, 1.0)[None]

    def _predict(self, raw_images, variables=None):
        raw_images = raw_images.astype(jnp.float32)  # uint8 wire, see predict()
        if not self.resize:
            prep = self.transform.preprocessing_fn or (lambda x: x)
            probs = self._tta_probs(jax.vmap(prep)(raw_images), variables)
            return probs
        imgs = jax.vmap(self.transform.test)(raw_images)
        probs = self._tta_probs(imgs, variables)
        ori_h, ori_w = self.ori_hw or (raw_images.shape[1], raw_images.shape[2])
        crop_h, crop_w = I.longest_max_size_shape(ori_h, ori_w, self.scale_size)
        probs = jax.vmap(lambda p: I.center_crop(p, (crop_h, crop_w)))(probs)
        probs = jax.vmap(lambda p: I.resize(p, (ori_h, ori_w)))(probs)
        return probs

    def predict(self, raw_images) -> jnp.ndarray:
        # Host→device wire: decoded pixels (incl. ben-transformed — integral
        # uint8-derived values) ship as uint8 and promote to fp32 in-jit —
        # the raw full-res batch is the pipeline's biggest transfer (146 MB
        # fp32 vs 37 MB uint8 for 3 IDRiD images).  Non-integral inputs
        # (``gray``'s host luma floats) keep the fp32 wire; the exact
        # round-trip check makes the choice safe for any custom input.
        if isinstance(raw_images, np.ndarray) and self._uint8_wire:
            if raw_images.dtype != np.uint8:
                u8 = raw_images.astype(np.uint8)
                if (u8 == raw_images).all():
                    raw_images = u8
                else:
                    self._uint8_wire = False
        raw_images = (raw_images if isinstance(raw_images, jnp.ndarray)
                      else jnp.asarray(raw_images))
        if self.resize and self.ori_hw is not None:
            got = tuple(raw_images.shape[1:3])
            if got != tuple(self.ori_hw):
                raise ValueError(
                    f"TTAPredictor.ori_hw is pinned to {tuple(self.ori_hw)} "
                    f"(the first test image) but this batch is {got}. Mixed-"
                    "size test directories are not supported by the whole-"
                    "image path (the reference shares this quirk, "
                    "lesion_dataset.py:102-107); run images of one size per "
                    "pass or use tiled inference.")
        return self._predict_jit(raw_images)


# ---------------------------------------------------------------------------
# Whole-image inference pipeline (reference test_tta, tta.py:56-148)
# ---------------------------------------------------------------------------

def _str2bool(v) -> bool:
    return str(v).lower() in ("true", "1", "yes")


def export_masks_on_device(prob_batches, optim, out_path, prob_path=None):
    """Binarize (and optionally quantize) predictions ON DEVICE, fetch uint8.

    ``prob_batches``: iterable of (device_probs (B, H, W) or (H, W) fp32,
    [output file names]).  The reference exported by thresholding fp32 probs
    on the host (tta.py:138-148); fetching full-res fp32 dominates the whole
    pipeline on the remote-TPU transport (27 IDRiD images = 1.3 GB), so the
    compare/quantize runs on device and only uint8 crosses the wire (4× less,
    overlapped one batch behind the device).  Outputs are identical: the
    ``p > t`` compare happens in fp32 either way, and XLA's float→uint8
    convert truncates toward zero exactly like ``np.ndarray.astype``.

    Trade-off made explicit: the caller keeps predictions device-resident
    until the threshold sweep picks ``optim`` — n_images × H × W × 4 bytes of
    HBM (IDRiD's 27-image test dir ≈ 1.3 GB).  For test sets that exceed HBM,
    fall back to per-batch host fetch (the pre-round-4 behavior).
    """
    mask_fn = jax.jit(lambda p, t: (p > t).astype(jnp.uint8))
    prob_fn = jax.jit(lambda p: (p * 255.0).astype(jnp.uint8))
    t = jnp.float32(optim)
    pending: deque = deque()

    def _save(entry):
        m8, p8, fnames = entry
        m = np.asarray(m8)
        q = None if p8 is None else np.asarray(p8)
        for i, name in enumerate(fnames):
            if q is not None:
                save_output(q[i], Path(prob_path) / name)
            save_output(m[i], Path(out_path) / name)

    for probs, fnames in prob_batches:
        if probs.ndim == 2:
            probs = probs[None]
        pending.append((mask_fn(probs, t),
                        prob_fn(probs) if prob_path is not None else None,
                        fnames))
        if len(pending) > 1:
            _save(pending.popleft())
    while pending:
        _save(pending.popleft())


def test_tta(logdir, config: Dict[str, Any], args: Dict[str, Any],
             batch_size: int = 2, metric: str = "pr",
             resize: bool = True) -> Dict[str, Any]:
    """Single-pass TTA inference + AUC + threshold search + mask export.

    ``metric='pr'`` is the lesion path (mean per-image AP + PR sweep,
    tta.py:123-137); ``metric='roc'`` with ``resize=False`` is the vessel path
    (AUC-ROC, no whole-image resize — tta_vessel.py:76,112-121).
    Returns {'mean_auc', 'thresholds', 'out_dir'} and writes masks to
    outputs/<ds>/tta/<lesion>/<exp>/ (+ prob_image/ when createprob)."""
    logdir = Path(logdir)
    model, variables, run_cfg = load_model_for_inference(
        logdir, best=_str2bool(args.get("best", "true")))
    cfg = {**run_cfg, **config}

    img_paths, mask_paths = get_datapath(Path(cfg["test_img_path"]),
                                         Path(cfg["test_mask_path"]),
                                         cfg.get("lesion_type", "EX"))
    ds = TestSegmentation(
        img_paths, mask_paths, gray=cfg.get("gray", False),
        ben_transform=cfg.get("use_ben_transform", False),
        # lesion whole-image eval scores against the reference's GT geometry
        # (nearest-down + linear-up roundtrip, see reference_gt_roundtrip);
        # the vessel path (resize=False) uses masks as-is (tta_vessel.py:76)
        metric_roundtrip_scale=(int(cfg.get("scale_size", 1024))
                                if resize else None))
    first = ds[0]
    predictor = TTAPredictor(model, variables, cfg,
                             tta=args.get("tta", "d4"),
                             ori_hw=(first["ori_h"], first["ori_w"]),
                             resize=resize)

    # ---- one prediction pass; metrics fan out from the same probs ----
    # Fully pipelined (the reference loop synced the host per image,
    # tta.py:108-137): background-thread decode (prefetch), ONE jitted
    # metrics dispatch per batch (per-image AP + 19-threshold sweep fused in
    # batch_image_metrics), and host materialization deferred one batch
    # behind — decode, TTA forward, metric reduction and D2H transfer of the
    # previous batch's probabilities all overlap on the device timeline.
    # Predictions stay DEVICE-RESIDENT until the sweep picks the optimal
    # threshold, then binarize/quantize on device and fetch uint8 only
    # (export_masks_on_device) — n_images × H × W × 4 bytes of HBM while the
    # pass runs (IDRiD's 27-image test dir ≈ 1.3 GB).
    prob_batches: List[Tuple[Any, List[str]]] = []
    totals: Dict[str, Any] = {}
    eval_fn = jax.jit(partial(M.batch_image_metrics,
                              score="ap" if metric == "pr" else "roc"))

    def _materialize(entry):
        probs_dev, stats_dev, fnames = entry
        for k, v in stats_dev.items():
            totals[k] = totals.get(k, 0) + np.asarray(v)
        prob_batches.append((probs_dev, fnames))

    import time as _time

    t_start = _time.perf_counter()
    pending: deque = deque()
    for batch in prefetch(batch_iterator(ds, batch_size, shuffle=False,
                                         workers=min(4, batch_size))):
        probs = predictor.predict(batch["image"])
        # GT ships uint8 ({0,1} exact, 4× less H2D); n_valid expands in-jit
        stats = eval_fn(probs, batch["mask"].astype(np.uint8),
                        batch["n_valid"])
        # filename is padded to batch_size like every stacked key — keep the
        # real entries only
        pending.append((probs, stats,
                        list(batch["filename"][:batch["n_valid"]])))
        if len(pending) > 1:
            _materialize(pending.popleft())
    while pending:
        _materialize(pending.popleft())
    elapsed = _time.perf_counter() - t_start
    n_images = sum(len(f) for _, f in prob_batches)

    tp, ap_counts, pp = totals["tp"], totals["ap"], totals["pp"]
    tn, total_px = totals["tn"], totals["px"]
    mean_auc = float(totals["ap_sum"]) / max(float(totals["ap_count"]), 1)
    logger.info("MEAN-AUC %.5f | %d images in %.1fs incl. decode+metrics "
                "(%.2f img/s, first batch carries the compile)",
                mean_auc, n_images, elapsed, n_images / max(elapsed, 1e-9))

    from ..analysis.aucpr import pr_curve_report, roc_curve_report
    out_root = Path(cfg.get("out_dir", "outputs")) / cfg["dataset_name"]
    figure_dir = out_root / "figures" / cfg["lesion_type"]
    if metric == "pr":
        thresholds = pr_curve_report(tp, ap_counts, pp, logdir.name,
                                     figure_dir=figure_dir)
    else:
        thresholds = roc_curve_report(tp, ap_counts, tn, total_px, logdir.name,
                                      figure_dir=figure_dir, pp=pp)
    optim = thresholds["optimal_threshold_2"]  # F-max (tta.py:137)
    logger.info("optimal thresholds: %s", thresholds)

    out_path = out_root / "tta" / cfg["lesion_type"] / logdir.name
    out_path.mkdir(parents=True, exist_ok=True)
    prob_path = None
    if _str2bool(args.get("createprob", "false")):
        prob_path = (out_root / "tta" / cfg["lesion_type"] / "prob_image"
                     / logdir.name)
        prob_path.mkdir(parents=True, exist_ok=True)
    export_masks_on_device(
        ((p, [Path(n).stem + ".jpg" for n in fnames])
         for p, fnames in prob_batches),
        optim, out_path, prob_path)

    return {"mean_auc": mean_auc, "thresholds": thresholds,
            "out_dir": str(out_path)}


test_tta.__test__ = False  # keep pytest from collecting the API function


# ---------------------------------------------------------------------------
# Tiled (sliding-window) inference (reference tta_patches, tta.py:150-244)
# ---------------------------------------------------------------------------

def tta_patches(logdir, config: Dict[str, Any], args: Dict[str, Any],
                mesh=None, metric: str = "pr") -> Dict[str, Any]:
    """Sliding-window inference as an on-device lax.scan (no host round-trips),
    then the same AUC/threshold/export pipeline.

    ``metric='pr'`` is the lesion path (reference tta.py:216-236);
    ``metric='roc'`` is the vessel tiled path, which reports the AUC-ROC
    curve family instead (reference tta_vessel.py:206-218).

    ``mesh``: optional jax Mesh — the tile grid shards over its ``data`` axis
    (each chip scans its share of tiles, canvases combined with a
    priority-max/psum collective that reproduces the sequential overwrite
    rule exactly; ops/tiling.tiled_predict_sharded)."""
    from ..ops.tiling import tiled_predict, tiled_predict_sharded

    logdir = Path(logdir)
    model, variables, run_cfg = load_model_for_inference(
        logdir, best=_str2bool(args.get("best", "true")))
    cfg = {**run_cfg, **config}
    scale_size = int(cfg.get("scale_size", 1024))
    window = 2 * scale_size  # make_grid(window=scale_size*2, overlap=32), tta.py:197

    img_paths, mask_paths = get_datapath(Path(cfg["test_img_path"]),
                                         Path(cfg["test_mask_path"]),
                                         cfg.get("lesion_type", "EX"))
    ds = TestSegmentation(img_paths, mask_paths, gray=cfg.get("gray", False))
    prep_fn, _, _ = zoo.get_preprocessing_fn(cfg.get("dataset_name", "IDRiD"),
                                             cfg.get("gray", False))

    # Each tile runs through the SAME fused TTA view batch as whole-image mode
    # — the reference wraps the tiled model in the ttach wrapper too
    # (tta.py:173-180); a bare forward would silently ignore --tta.
    tta_engine = TTAPredictor(model, variables, cfg,
                              tta=args.get("tta", "d4"), resize=False)

    def tile_fn(tile):
        x = prep_fn(tile)[None]
        return tta_engine._tta_probs(x)[0]

    first = ds[0]
    h0, w0 = first["ori_h"], first["ori_w"]
    window = min(window, h0, w0)
    grid = _make_grid((h0, w0), window=window, min_overlap=32)
    if mesh is not None:
        predict = jax.jit(partial(tiled_predict_sharded, tile_fn,
                                  window=window, scale_size=scale_size,
                                  mesh=mesh))
    else:
        predict = jax.jit(partial(tiled_predict, tile_fn, window=window,
                                  scale_size=scale_size))

    # Pipelined like test_tta: prefetch hides the per-image decode, the
    # jitted batch_image_metrics collapses per-image AP + sweep into one
    # dispatch, and host fetches run one image behind the device.
    eval_fn = jax.jit(partial(M.batch_image_metrics,
                              score="ap" if metric == "pr" else "roc"))
    totals: Dict[str, Any] = {}
    probs_list, names = [], []

    def _materialize(entry):
        probs_dev, stats_dev, fname = entry
        for k, v in stats_dev.items():
            totals[k] = totals.get(k, 0) + np.asarray(v)
        probs_list.append(probs_dev); names.append(fname)  # device-resident

    pending: deque = deque()
    for s in prefetch(map(ds.__getitem__, range(len(ds)))):
        if (s["ori_h"], s["ori_w"]) != (h0, w0):
            raise ValueError(
                f"tiled inference grid was built for {(h0, w0)} (the first "
                f"test image) but {s['filename']} is "
                f"{(s['ori_h'], s['ori_w'])}; mixed-size test directories "
                "are not supported in one pass.")
        probs = predict(jnp.asarray(s["image"]),  # uint8 wire; cast in-jit
                        grid=jnp.asarray(grid))
        stats = eval_fn(probs[None], s["mask"][None].astype(np.uint8))
        pending.append((probs, stats, s["filename"]))
        if len(pending) > 1:
            _materialize(pending.popleft())
    while pending:
        _materialize(pending.popleft())

    tp, apc, pp = totals["tp"], totals["ap"], totals["pp"]
    tn, total_px = totals["tn"], totals["px"]
    mean_auc = float(totals["ap_sum"]) / max(float(totals["ap_count"]), 1)
    from ..analysis.aucpr import pr_curve_report, roc_curve_report
    out_root = Path(cfg.get("out_dir", "outputs")) / cfg["dataset_name"]
    figure_dir = out_root / "figures" / cfg["lesion_type"]
    if metric == "pr":
        thresholds = pr_curve_report(tp, apc, pp, logdir.name,
                                     figure_dir=figure_dir)
    else:
        thresholds = roc_curve_report(tp, apc, tn, total_px, logdir.name,
                                      figure_dir=figure_dir, pp=pp)
    optim = thresholds["optimal_threshold_2"]
    out_path = out_root / "tta" / cfg["lesion_type"] / logdir.name
    out_path.mkdir(parents=True, exist_ok=True)
    # IDRiD name remap _<LESION>.tif → .jpg (tta.py:191,234)
    export_masks_on_device(
        ((p, [Path(n).stem.replace(f"_{cfg['lesion_type']}", "") + ".jpg"])
         for p, n in zip(probs_list, names)),
        optim, out_path)
    return {"mean_auc": mean_auc, "thresholds": thresholds,
            "out_dir": str(out_path)}
