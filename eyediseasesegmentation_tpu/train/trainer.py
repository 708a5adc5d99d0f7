"""Training engine.

The TPU-native replacement for the reference's Catalyst stack (train.py:160-509):
one jit-compiled train step over a device mesh does augmentation (vmapped PRNG
policies), bf16 forward/backward, compound weighted loss, deep supervision with
an on-device mask pyramid, and the optimizer update; the host loop does what
hosts are good at — scheduling (ReduceLROnPlateau etc.), early stopping
(patience 20 on val dice, train.py:329-330), checkpointing (best/last/best_full)
and logging.

Parallelism: batch sharded over the mesh's ``data`` axis, params replicated;
XLA inserts the gradient all-reduce from the sharding annotations (SURVEY.md
§2.11, §5.8). No DataParallel, no gloo — the same step scales from 1 chip to a
pod without code changes.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from collections import deque
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from .. import models as zoo
from ..config import BaseConfig
from ..data import (OneLesionSegmentation, batch_iterator, get_datapath,
                    get_transform)
from ..data.datasets import prefetch
from ..data.datasets import train_val_split
from ..ops import losses as L
from ..ops import metrics as M
from ..optim import get_optimizer, get_scheduler
from ..parallel import make_mesh, batch_sharding, replicated_sharding
from ..utils import make_logdir, set_global_seed
from .checkpoint import restore_into, save_checkpoint
from .param_groups import lr_scale_fn_for, wd_mask_for

logger = logging.getLogger("eyediseasesegmentation_tpu")


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _adaptive_avg_pool(mask: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Mask pyramid for deep supervision (reference get_pyramid,
    train.py:428-445): average pooling to each head's spatial size."""
    h, w = mask.shape[1], mask.shape[2]
    rh, rw = h // out_hw[0], w // out_hw[1]
    m = mask if mask.ndim == 4 else mask[..., None]
    from flax import linen as nn
    return nn.avg_pool(m, (rh, rw), strides=(rh, rw))


def _model_outputs(out):
    """Normalize model output to (final, ds_list or None, clf or None)."""
    if not isinstance(out, tuple):
        return out, None, None
    if len(out) == 2 and isinstance(out[1], list):
        return out[0], out[1], None
    if len(out) == 3:
        return out[0], out[1], out[2]
    return out[0], None, out[1]


def _infer_encoder_arch(cfg: Dict[str, Any]) -> str:
    """Map the config's encoder_name to a torch pretrained architecture
    (BoTSER50_* configs wrap an se_resnet50 backbone, unetplusplusstar.py:282)."""
    name = str((cfg.get("model_params") or {}).get("encoder_name", ""))
    low = name.lower()
    if "botser50" in low or "seresnet50" in low:
        return "se_resnet50"
    if "seresnext101" in low or low == "unet_seresnext101":
        return "se_resnext101"
    if "swin" in low:
        return "swin_small" if "small" in low else "swin_tiny"
    if "seresnext50" in low:
        return "se_resnext50"
    return "se_resnet50"


@dataclasses.dataclass
class Trainer:
    """Compiled-step trainer for one experiment config (see BaseConfig)."""

    configs: Dict[str, Any]
    logdir: Optional[Path] = None
    seed: int = 1999

    def __post_init__(self):
        cfg = self.configs
        self.dtype = jnp.bfloat16 if cfg.get("is_fp16", True) else jnp.float32
        # remat ("remat"/"is_remat" config key): prefer the model's own
        # per-block segments (flagship); models without a remat field fall
        # back to whole-model jax.checkpoint in _build_steps
        self.remat = bool(cfg.get("remat", cfg.get("is_remat", False)))
        self._model_remat = False
        params = dict(cfg.get("model_params") or {})
        if self.remat:
            try:
                self.model = zoo.get_model(cfg["model_name"],
                                           {**params, "remat": True},
                                           training=True, dtype=self.dtype)
                self._model_remat = True
            except TypeError:
                pass
        if not self._model_remat:
            self.model = zoo.get_model(cfg["model_name"], params,
                                       training=True, dtype=self.dtype)
        self.deep_supervision = bool(cfg.get("deep_supervision", False)) or bool(
            (cfg.get("model_params") or {}).get("deep_supervision", False))
        self.scale_size = int(cfg.get("scale_size", 1024))
        # thread-pooled per-batch decode (the torch DataLoader workers role)
        self.num_workers = int(cfg.get("num_workers", 4))
        prep_fn, _, _ = zoo.get_preprocessing_fn(cfg.get("dataset_name", "IDRiD"),
                                                 cfg.get("gray", False))
        transform_cls = get_transform(cfg.get("augmentation", "advanced"))
        self.transform = transform_cls(image_size=self.scale_size,
                                       preprocessing_fn=prep_fn)
        self.criterion = dict(cfg.get("criterion") or {"bce": 1.0})
        self.loss_fn = L.compound_loss(self.criterion,
                                       pos_weights=cfg.get("pos_weights") or [1.0])
        self.ds_loss_fn = (L.get_loss(cfg.get("criterion_ds") or "bce",
                                      pos_weights=cfg.get("pos_weights") or [1.0])
                           if self.deep_supervision else None)
        self.ds_weight = float(cfg.get("ds_weight", 1.0))
        self.clf_weight = float(cfg.get("clf_weight", 1.0))
        mesh_shape = cfg.get("mesh_shape")
        if not mesh_shape:
            # default: as much data parallelism as the batch size divides into
            import math
            data = math.gcd(int(cfg.get("batch_size", 2)), jax.device_count())
            mesh_shape = {"data": max(data, 1)}
        self.mesh = make_mesh(mesh_shape)
        self.metric_name = cfg.get("metric", "dice")
        self.metric_mode = cfg.get("mode", "max")
        # finetune semantics (reference train.py:230-240): ``finetune`` freezes
        # every encoder weight (requires_grad=False analogue: the optimizer
        # update for the "encoder" scope is zeroed, so params AND their
        # adam/momentum statistics never move); a pretrained encoder
        # (``encoder_weights``) additionally freezes the encoder's BN running
        # statistics (the reference's m.eval() loop).  The flagship goes
        # further: its ``pretrained`` encoders normalize with the frozen
        # running stats during training too (encoders.py frozen_bn).
        self.finetune = bool(cfg.get("finetune", False))
        self.freeze_bn_scopes = tuple(
            cfg.get("freeze_bn_scopes",
                    ("encoder",) if (self.finetune or cfg.get("encoder_weights"))
                    else ()))
        self.frozen_param_scopes = ("encoder",) if self.finetune else ()
        # Host→device wire format: decoded pixels (and ben-transformed ones —
        # cv2.addWeighted on uint8 stays integral) ship as uint8 and promote
        # to fp32 on device (4× less H2D per step, exact).  ``gray`` collapses
        # to non-integral host floats, so it keeps the fp32 wire.
        self._uint8_wire = not bool(cfg.get("gray", False))
        self._build_steps()

    def _wire(self, a: np.ndarray) -> np.ndarray:
        if not self._uint8_wire:
            return a
        if a.dtype == np.uint8:
            return a
        u8 = a.astype(np.uint8)
        if (u8 == a).all():  # exact round-trip: integral 0-255 values only
            return u8
        # a custom dataset fed non-integral pixels — permanently fall back to
        # the fp32 wire (one-time, so the jitted step keeps a single dtype)
        self._uint8_wire = False
        return a

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------
    def _build_steps(self):
        model = self.model
        transform = self.transform
        loss_fn = self.loss_fn
        ds_loss_fn = self.ds_loss_fn
        ds_weight = self.ds_weight
        deep_supervision = self.deep_supervision

        def compute_loss(out, m4):
            """Compound loss from model outputs (shared by train and eval so
            eval never re-runs the forward pass)."""
            final, ds, clf = _model_outputs(out)
            total, parts = loss_fn(final.astype(jnp.float32), m4)
            if deep_supervision and ds is not None:
                for d in ds:
                    pyr = _adaptive_avg_pool(m4, (d.shape[1], d.shape[2]))
                    total = total + ds_weight * ds_loss_fn(d.astype(jnp.float32), pyr)
            if clf is not None:
                # per-patch classification target = mask non-empty — the
                # clf-head training variant (reference lesion_dataset_tmp.py:
                # 85-91 + train_tmp.py)
                label = (jnp.sum(m4, axis=(1, 2, 3)) > 0).astype(jnp.float32)
                clf_loss = L.soft_bce_with_logits(clf.reshape(-1), label)
                parts = {**parts, "clf": clf_loss}
                total = total + self.clf_weight * clf_loss
            return total, parts, final

        # whole-model remat fallback for models without their own per-block
        # remat field (numerically identical either way)
        remat = self.remat and not self._model_remat

        def _apply_train(params, batch_stats, images, rng):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               images, rngs={"dropout": rng},
                               mutable=["batch_stats"], train=True)

        if remat:
            _apply_train = jax.checkpoint(
                _apply_train, policy=jax.checkpoint_policies.nothing_saveable)

        def loss_and_metrics(params, batch_stats, images, masks, rng, train):
            if train:
                out, updates = _apply_train(params, batch_stats, images, rng)
            else:
                out = model.apply({"params": params, "batch_stats": batch_stats},
                                  images, train=False)
                updates = {"batch_stats": batch_stats}
            m4 = masks[..., None] if masks.ndim == 3 else masks
            total, parts, final = compute_loss(out, m4)
            probs = jax.nn.sigmoid(final.astype(jnp.float32))
            return total, (updates["batch_stats"], parts, probs, m4)

        frozen_param_scopes = self.frozen_param_scopes
        freeze_bn_scopes = self.freeze_bn_scopes

        def _with_replaced(tree, key, val):
            # preserve the container type: dict vs FrozenDict changes the
            # pytree treedef, and optax.apply_updates tree_maps params+updates
            if isinstance(tree, FrozenDict):
                return tree.copy({key: val})
            out = dict(tree)
            out[key] = val
            return out

        def _zero_scopes(tree, scopes):
            for s in scopes:
                if s in tree:
                    tree = _with_replaced(
                        tree, s, jax.tree_util.tree_map(jnp.zeros_like, tree[s]))
            return tree

        def _restore_scopes(new, old, scopes):
            for s in scopes:
                if s in old and s in new:
                    new = _with_replaced(new, s, old[s])
            return new

        data_size = int(self.mesh.shape.get("data", 1))

        def sharded_aug(aug_key, images, masks):
            """Augment with REAL stochastic branches under data parallelism:
            ``transform.batch_train`` unrolls per-sample ``lax.cond`` gates
            (only the taken op executes — the vmap/select form paid every
            policy member every step), but indexing a batch-sharded global
            array per sample would wreck the dp layout. ``shard_map`` gives
            each device its LOCAL slice: conds stay real branches, devices
            augment their own samples in parallel, no collectives (aug is
            per-sample)."""
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            keys = jax.random.split(aug_key, images.shape[0])

            def local_aug(keys, im, m):
                b = im.shape[0]
                outs = [transform.train(keys[i], im[i], m[i])
                        for i in range(b)]
                return (jnp.stack([o[0] for o in outs]),
                        jnp.stack([o[1] for o in outs]))

            spec = P("data")
            return shard_map(
                local_aug, self.mesh,
                in_specs=(spec, spec, spec), out_specs=(spec, spec))(
                    keys, images, masks)

        def train_step(state: TrainState, images, masks, rng, lr):
            # batches may arrive uint8 (4× less H2D traffic; exact — decoded
            # pixels and binarized masks are integral): promote on device
            images = images.astype(jnp.float32)
            masks = masks.astype(jnp.float32)
            aug_key, drop_key = jax.random.split(jax.random.fold_in(rng, state.step))
            if data_size > 1:
                images, masks = sharded_aug(aug_key, images, masks)
            else:
                images, masks = transform.batch_train(aug_key, images, masks)
            grad_fn = jax.value_and_grad(
                lambda p: loss_and_metrics(p, state.batch_stats, images, masks,
                                           drop_key, True),
                has_aux=True)
            (loss, (new_bs, parts, probs, m4)), grads = grad_fn(state.params)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = self.tx.update(grads, opt_state, state.params)
            if frozen_param_scopes:
                updates = _zero_scopes(updates, frozen_param_scopes)
            if freeze_bn_scopes:
                new_bs = _restore_scopes(new_bs, state.batch_stats,
                                         freeze_bn_scopes)
            new_params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss,
                       "dice": M.dice_coeff(probs, m4),
                       "iou": M.iou_coeff(probs, m4)}
            metrics.update({f"loss_{k}": v for k, v in parts.items()})
            return TrainState(new_params, new_bs, new_opt, state.step + 1), metrics

        def eval_step(state: TrainState, images, masks, n_valid):
            from ..ops import image as I
            images = images.astype(jnp.float32)  # uint8 wire, see train_step
            masks = masks.astype(jnp.float32)
            raw = images
            images = jax.vmap(transform.test)(images)
            m = masks[..., None] if masks.ndim == 3 else masks
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            out = model.apply(variables, images, train=False)
            # GT through the same longest-max-size + pad geometry as the image
            # (val metric at scale_size, as the reference's val loader does)
            tm = jax.vmap(lambda mm: I.longest_max_size_pad(
                mm, transform.image_size, method="nearest"))(m)
            # one forward: the same logits feed val loss AND metrics
            val_loss, _, final = compute_loss(out, tm)
            probs = jax.nn.sigmoid(final.astype(jnp.float32))
            valid = (jnp.arange(images.shape[0]) < n_valid).astype(jnp.float32)
            vmask = valid[:, None, None, None]
            pred = (probs > 0.5).astype(jnp.float32) * vmask
            true = (tm > 0.5).astype(jnp.float32) * vmask
            inter = jnp.sum(pred * true)
            # per-threshold PR counts for the val AUC-PR metric — the role of
            # the reference's distributed AucPRMetricCallback (util/
            # aucpr_cb.py:15-65): here the batch is already sharded and XLA
            # inserts the cross-device reduction
            tp, ap, pp, _ = M.threshold_sweep(
                probs, tm, valid_mask=jnp.broadcast_to(vmask, probs.shape))
            # raw image at eval geometry, for the best/worst-batch overlays
            # (stays on device unless the host fetches it)
            vis = jax.vmap(lambda im: I.longest_max_size_pad(
                im, transform.image_size, method="linear"))(raw)
            return {"inter": inter, "pred": jnp.sum(pred), "true": jnp.sum(true),
                    "tp": tp, "ap": ap, "pp": pp, "loss": val_loss,
                    "vis_img": vis, "probs": probs[..., 0], "gt": tm[..., 0]}

        rep = replicated_sharding(self.mesh)
        img_shard = batch_sharding(self.mesh, ndim=4)
        mask_shard = batch_sharding(self.mesh, ndim=3)
        self._train_step = jax.jit(
            train_step,
            in_shardings=(rep, img_shard, mask_shard, rep, rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            eval_step,
            in_shardings=(rep, img_shard, mask_shard, rep),
        )

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_shape=None) -> TrainState:
        cfg = self.configs
        shape = sample_shape or (1, self.scale_size, self.scale_size, 3)
        dummy = jnp.zeros(shape, jnp.float32)
        # jit the init: eager init dispatches op-by-op (catastrophic over a
        # remote-device tunnel); compiled init is one program
        init_fn = jax.jit(partial(self.model.init, train=False))
        variables = init_fn(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, dummy)
        if cfg.get("encoder_weights"):
            # pretrained-encoder bootstrap (reference unetplusplusstar.py:
            # 282-284 se_resnet50 → BoTSER50; hubmap_kaggle.py:124
            # se_resnext101; checkpoint.py:213-246 Swin) — torch .pth import
            # with non-strict key-diff reporting
            from ..utils.torch_import import import_torch_checkpoint
            arch = cfg.get("encoder_arch") or _infer_encoder_arch(cfg)
            variables, report = import_torch_checkpoint(
                cfg["encoder_weights"], variables, arch=arch)
            logger.info("pretrained encoder '%s': %d tensors loaded, "
                        "%d missing, %d mismatched", arch,
                        len(report["loaded"]), len(report["missing_in_jax"]),
                        len(report["shape_mismatch"]))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        model_name = cfg["model_name"]
        self.tx = get_optimizer(
            cfg.get("optimizer", "adamw"),
            learning_rate=float(cfg.get("learning_rate", 1e-3)),
            weight_decay=float(cfg.get("weight_decay", 1e-5)),
            lr_scale_fn=lr_scale_fn_for(model_name),
            wd_mask=wd_mask_for(model_name),
        )
        opt_state = self.tx.init(params)
        state = TrainState(params, batch_stats, opt_state, jnp.zeros([], jnp.int32))
        return jax.device_put(state, replicated_sharding(self.mesh))

    def num_parameters(self, state: TrainState) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(state.params))

    # ------------------------------------------------------------------
    def fit(self, train_ds, valid_ds, num_epochs: Optional[int] = None,
            resume_path: Optional[str] = None) -> Dict[str, Any]:
        cfg = self.configs
        num_epochs = num_epochs or int(cfg.get("num_epochs", 100))
        batch_size = int(cfg.get("batch_size", 2))
        patience = int(cfg.get("early_stopping_patience", 20))
        logdir = Path(self.logdir) if self.logdir else Path("models/_scratch")
        (logdir / "checkpoints").mkdir(parents=True, exist_ok=True)

        root_key = set_global_seed(self.seed)
        state = self.init_state(root_key,
                                sample_shape=(batch_size, self.scale_size,
                                              self.scale_size, 3))
        start_epoch = 0
        if resume_path:
            payload = restore_into({"state": state, "epoch": 0}, resume_path)
            state, start_epoch = payload["state"], int(payload["epoch"]) + 1
            logger.info("resumed from %s at epoch %d", resume_path, start_epoch)

        n_train_batches = max(1, len(train_ds) // batch_size)
        scheduler = get_scheduler(cfg.get("scheduler", "reduce"),
                                  float(cfg.get("learning_rate", 1e-3)),
                                  num_epochs, n_train_batches,
                                  mode=self.metric_mode)
        lr = float(cfg.get("learning_rate", 1e-3))

        best_metric = -np.inf if self.metric_mode == "max" else np.inf
        bad_epochs = 0
        history = []
        global_step = 0
        metrics_file = logdir / "metrics.jsonl"
        from ..utils.tb import TensorBoardWriter, row_to_scalars
        tb = TensorBoardWriter(logdir, enabled=bool(cfg.get("tensorboard", True)))

        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            # ---- train ----
            train_metrics = []
            for batch in prefetch(batch_iterator(
                    train_ds, batch_size, shuffle=True, drop_last=True,
                    seed=self.seed + epoch, workers=self.num_workers)):
                if scheduler is not None and scheduler.batch_update:
                    lr = scheduler.batch_lr(global_step)
                state, m = self._train_step(
                    state, jnp.asarray(self._wire(batch["image"])),
                    jnp.asarray(self._wire(batch["mask"])),
                    jax.random.fold_in(root_key, 1000 + epoch),
                    jnp.asarray(lr, jnp.float32))
                train_metrics.append(m)
                global_step += 1
            train_agg = {k: float(np.mean([np.asarray(m[k]) for m in train_metrics]))
                         for k in train_metrics[0]} if train_metrics else {}

            # ---- validate ----
            # Epoch val dice/iou are PER-BATCH MEANS — the reference's Catalyst
            # DiceCallback/IoUCallback semantics (train.py:300-309), which
            # drive checkpoint selection and early stopping; the global-counts
            # variants are logged alongside as val_dice_global/val_iou_global.
            eps = 1e-7
            inter = pred = true = 0.0
            tp = np.zeros(len(M.THRESH_LIST)); ap = np.zeros_like(tp)
            pp = np.zeros_like(tp)
            vlosses, batch_dices, batch_ious = [], [], []
            visualize = bool(cfg.get("visualize_batches", True))
            best_b = worst_b = None  # ShowPolarBatchesCallback role

            # Host consumption runs one batch behind the device so the next
            # eval step dispatches before this one's scalars are fetched; the
            # best/worst-batch candidates hold DEVICE references — only the
            # two winners are materialized, at epoch end.
            def _consume_eval(entry):
                nonlocal inter, pred, true, best_b, worst_b, tp, ap, pp
                r, nv = entry
                bi, bp, bt = float(r["inter"]), float(r["pred"]), float(r["true"])
                inter += bi; pred += bp
                true += bt; vlosses.append(float(r["loss"]))
                tp += np.asarray(r["tp"]); ap += np.asarray(r["ap"])
                pp += np.asarray(r["pp"])
                bd = (2 * bi + eps) / (bp + bt + eps)
                batch_dices.append(bd)
                batch_ious.append((bi + eps) / (bp + bt - bi + eps))
                if visualize:
                    if best_b is None or bd > best_b[0]:
                        best_b = (bd, r["vis_img"], r["gt"], r["probs"], nv)
                    if worst_b is None or bd < worst_b[0]:
                        worst_b = (bd, r["vis_img"], r["gt"], r["probs"], nv)

            pending_eval: deque = deque()
            for batch in prefetch(batch_iterator(valid_ds, batch_size,
                                                 workers=self.num_workers,
                                                 shuffle=False)):
                r = self._eval_step(state,
                                    jnp.asarray(self._wire(batch["image"])),
                                    jnp.asarray(self._wire(batch["mask"])),
                                    jnp.asarray(batch["n_valid"]))
                pending_eval.append((r, int(batch["n_valid"])))
                if len(pending_eval) > 1:
                    _consume_eval(pending_eval.popleft())
            while pending_eval:
                _consume_eval(pending_eval.popleft())
            val_dice = float(np.mean(batch_dices)) if batch_dices else 0.0
            val_iou = float(np.mean(batch_ious)) if batch_ious else 0.0
            sn = (tp + eps) / (ap + eps)
            ppv = (tp + eps) / (pp + eps)
            val_aucpr = float(np.trapezoid(ppv[::-1], sn[::-1]))
            val_metrics = {"dice": val_dice, "iou": val_iou,
                           "dice_global": (2 * inter + eps) / (pred + true + eps),
                           "iou_global": (inter + eps) / (pred + true - inter + eps),
                           "aucpr": val_aucpr,
                           "loss": float(np.mean(vlosses)) if vlosses else 0.0}

            # best/worst val-batch overlays (the reference's
            # ShowPolarBatchesCallback, train.py:323-327)
            if visualize and best_b is not None:
                from ..analysis.visualize import overlay_mask_image
                vis_dir = logdir / "visuals"
                vis_dir.mkdir(parents=True, exist_ok=True)
                from PIL import Image as _Image
                for tag, (d, im_d, gt_d, pr_d, nv) in (("best", best_b),
                                                       ("worst", worst_b)):
                    im = np.asarray(im_d[:nv]); gt = np.asarray(gt_d[:nv])
                    pr = np.asarray(pr_d[:nv])
                    panels = [overlay_mask_image(im[i], gt[i] > 0.5, pr[i] > 0.5)
                              for i in range(im.shape[0])]
                    strip = np.concatenate(panels, axis=1) if panels else None
                    if strip is not None:
                        _Image.fromarray(strip).save(
                            vis_dir / f"epoch{epoch:03d}_{tag}_dice{d:.3f}.png")

            # ---- schedule / select / stop ----
            metric_val = val_metrics.get(self.metric_name, val_dice)
            if scheduler is not None and not scheduler.batch_update:
                lr = scheduler.epoch_lr(epoch, metric_val)
            better = (metric_val > best_metric if self.metric_mode == "max"
                      else metric_val < best_metric)
            if better:
                best_metric = metric_val
                bad_epochs = 0
                save_checkpoint(logdir / "checkpoints" / "best.ckpt",
                                {"model_state_dict": {
                                    "params": state.params,
                                    "batch_stats": state.batch_stats},
                                 "metric": float(metric_val), "epoch": epoch})
            else:
                bad_epochs += 1
            save_checkpoint(logdir / "checkpoints" / "last.ckpt",
                            {"model_state_dict": {
                                "params": state.params,
                                "batch_stats": state.batch_stats},
                             "metric": float(metric_val), "epoch": epoch})
            save_checkpoint(logdir / "checkpoints" / "best_full.ckpt",
                            {"state": state, "epoch": epoch})

            row = {"epoch": epoch, "lr": lr, "time": time.time() - t0,
                   **{f"train_{k}": v for k, v in train_agg.items()},
                   **{f"val_{k}": v for k, v in val_metrics.items()}}
            history.append(row)
            with open(metrics_file, "a") as f:
                f.write(json.dumps(row) + "\n")
            tb.add_scalars(epoch, row_to_scalars(row))
            logger.info("epoch %d | loss %.4f | val_dice %.4f | lr %.2e | %.1fs",
                        epoch, train_agg.get("loss", float("nan")), val_dice, lr,
                        row["time"])

            if bad_epochs >= patience:
                logger.info("early stopping at epoch %d (patience %d)", epoch, patience)
                break

        tb.close()
        return {"history": history, "best_metric": float(best_metric),
                "state": state, "logdir": logdir}


def train_model(exp_name: str, configs: Dict[str, Any], seed: int = 1999,
                models_root: str = "models") -> Path:
    """The reference entry point (train.py:160): build data from the config's
    paths, train, and write checkpoints + config.json under
    ``models/<dataset>/<lesion>/<exp_name>/``."""
    cfg = dict(configs)
    logdir = make_logdir(models_root, cfg.get("dataset_name", "IDRiD"),
                         cfg.get("lesion_type", "EX"), exp_name)
    with open(logdir / "config.json", "w") as f:
        json.dump(cfg, f, indent=2, default=str)

    if cfg.get("data_type", "all") == "tile":
        # tile-mode training: consume the img_mask.csv patch lists written by
        # data.patches.build_dataframe (reference train.py:77-110 reads
        # data/processed/<ds>/{train,val}/<lesion>/img_mask.csv)
        from ..data.patches import read_img_mask_csv
        root = Path(cfg.get("processed_root", "data/processed"))
        base = root / cfg.get("dataset_name", "IDRiD")
        lesion = cfg.get("lesion_type", "EX")
        train_csv = Path(cfg.get("tile_train_csv")
                         or base / "train" / lesion / "img_mask.csv")
        val_csv = Path(cfg.get("tile_val_csv")
                       or base / "val" / lesion / "img_mask.csv")
        tr_i, tr_m = read_img_mask_csv(train_csv)
        va_i, va_m = read_img_mask_csv(val_csv)
    else:
        imgs, masks = get_datapath(Path(cfg["train_img_path"]),
                                   Path(cfg["train_mask_path"]),
                                   cfg.get("lesion_type", "EX"))
        (tr_i, tr_m), (va_i, va_m) = train_val_split(
            imgs, masks, val_size=float(cfg.get("val_size", 0.2)), seed=seed)
    train_ds = OneLesionSegmentation(tr_i, tr_m, gray=cfg.get("gray", False),
                                     ben_transform=cfg.get("use_ben_transform", False))
    valid_ds = OneLesionSegmentation(va_i, va_m, gray=cfg.get("gray", False),
                                     ben_transform=cfg.get("use_ben_transform", False))
    logger.info("train %d | valid %d images", len(train_ds), len(valid_ds))

    trainer = Trainer(cfg, logdir=logdir, seed=seed)
    result = trainer.fit(train_ds, valid_ds,
                         resume_path=cfg.get("resume_path"))
    logger.info("best %s: %.4f", cfg.get("metric", "dice"), result["best_metric"])
    return logdir
