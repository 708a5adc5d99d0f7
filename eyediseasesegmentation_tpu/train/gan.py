"""Adversarial fine-tuning (reference ``src/main/train_gan.py``).

A patch discriminator (DNet, reference l.48-91) scores (image ⊗ mask) patches;
per batch the discriminator trains on real = image·mask vs fake =
image·sigmoid(G(x)) patch grids (``image_to_patch``, l.153-157) with
D-loss = mean(1−D(real)) + mean(D(fake)) and the generator adds
mean(1−D(fake))·gan_weight (=0.01) to its segmentation loss (l.199-217).
Evaluation every ``eval_every`` epochs by tiled average precision
(eval_model, l.93-129); the best-AP checkpoint stores
{epoch, step, g/d params, g/d optimizer} (l.224-251).

TPU design: one jitted step computes both D and G gradients (two
value_and_grads over the shared forward), batch sharded over the mesh.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from .. import models as zoo
from ..data.datasets import batch_iterator
from ..ops import losses as L
from ..ops import metrics as M
from ..optim import get_optimizer
from ..parallel import batch_sharding, make_mesh, replicated_sharding
from .checkpoint import save_checkpoint

logger = logging.getLogger("eyediseasesegmentation_tpu")


class DNet(nn.Module):
    """Patch discriminator: strided conv stack → scalar score per patch
    (reference train_gan.py:48-91)."""

    base: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for i, mult in enumerate((1, 2, 4, 8)):
            y = nn.Conv(self.base * mult, (4, 4), strides=(2, 2),
                        padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(y)
            y = nn.leaky_relu(y, 0.2)
        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(y)
        return jax.nn.sigmoid(y.astype(jnp.float32))


def image_to_patch(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B·g², patch, patch, C) grid slicing (l.153-157)."""
    n, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x[:, : gh * patch, : gw * patch]
    x = x.reshape(n, gh, patch, gw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n * gh * gw, patch, patch, c)


@dataclasses.dataclass
class GanTrainer:
    """G/D adversarial trainer. ``configs`` follows GanConfig (config_gan.py)."""

    configs: Dict[str, Any]
    logdir: Path = Path("models/_gan")
    seed: int = 1999

    def __post_init__(self):
        cfg = self.configs
        self.image_size = int(cfg.get("image_size", 512))
        self.patch_size = int(cfg.get("patch_size", 128))
        self.d_weight = float(cfg.get("d_weight", 0.01))
        self.generator = zoo.get_model(
            cfg.get("generator", "SegFormerStar"),
            dict(cfg.get("generator_params") or {"encoder_name": "mit_b0"}),
            training=True, dtype=jnp.float32)
        self.discriminator = DNet()
        self.seg_loss = L.get_loss(cfg.get("seg_loss", "bce"))
        mesh_shape = cfg.get("mesh_shape")
        if not mesh_shape:
            import math
            data = math.gcd(int(cfg.get("batch_size", 2)), jax.device_count())
            mesh_shape = {"data": max(data, 1)}
        self.mesh = make_mesh(mesh_shape)
        self._build_step()

    def _build_step(self):
        G, D = self.generator, self.discriminator
        patch = self.patch_size
        d_weight = self.d_weight
        seg_loss = self.seg_loss

        def step(g_params, g_bs, d_params, g_opt, d_opt, images, masks, rng):
            m4 = masks[..., None] if masks.ndim == 3 else masks

            # --- discriminator update (l.199-208); G in eval mode, no grads ---
            def d_loss_fn(dp):
                out = G.apply({"params": g_params, "batch_stats": g_bs},
                              images, train=False)
                logits = out[0] if isinstance(out, tuple) else out
                fake_mask = jax.nn.sigmoid(logits)
                real = image_to_patch(images * m4, patch)
                fake = image_to_patch(images * jax.lax.stop_gradient(fake_mask),
                                      patch)
                d_real = D.apply({"params": dp}, real)
                d_fake = D.apply({"params": dp}, fake)
                return jnp.mean(1.0 - d_real) + jnp.mean(d_fake)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            d_updates, d_opt = self.d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)

            # --- generator update: seg + adversarial term (l.211-217) ---
            def g_loss_fn(gp):
                out, upd = G.apply({"params": gp, "batch_stats": g_bs},
                                   images, train=True, rngs={"dropout": rng},
                                   mutable=["batch_stats"])
                logits = out[0] if isinstance(out, tuple) else out
                fake_mask = jax.nn.sigmoid(logits)
                fake = image_to_patch(images * fake_mask, patch)
                d_fake = D.apply({"params": d_params}, fake)
                seg = seg_loss(logits.astype(jnp.float32), m4)
                adv = jnp.mean(1.0 - d_fake) * d_weight
                return seg + adv, (seg, adv, upd.get("batch_stats", g_bs))

            (g_loss, (seg, adv, new_bs)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params)
            g_updates, g_opt = self.g_tx.update(g_grads, g_opt, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            return (g_params, new_bs, d_params, g_opt, d_opt,
                    {"d_loss": d_loss, "g_loss": g_loss, "seg": seg, "adv": adv})

        # batch sharded over the mesh's data axis, G/D params replicated —
        # GSPMD inserts both models' gradient all-reduces (house style,
        # train/trainer.py); patch grids reshape the batch dim only, so the
        # per-device patch grid stays local to its shard
        rep = replicated_sharding(self.mesh)
        img_shard = batch_sharding(self.mesh, ndim=4)
        mask_shard = batch_sharding(self.mesh, ndim=3)
        self._step = jax.jit(
            step, donate_argnums=(0, 1, 2, 3, 4),
            in_shardings=(rep, rep, rep, rep, rep, img_shard, mask_shard, rep))

        def fwd(g_params, g_bs, images):
            out = G.apply({"params": g_params, "batch_stats": g_bs},
                          images, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]

        self._fwd = jax.jit(fwd, in_shardings=(rep, rep, img_shard))

    def init(self, rng):
        cfg = self.configs
        dummy = jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32)
        g_vars = jax.jit(partial(self.generator.init, train=False))(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, dummy)
        d_vars = jax.jit(self.discriminator.init)(
            jax.random.fold_in(rng, 2),
            jnp.zeros((1, self.patch_size, self.patch_size, 3), jnp.float32))
        self.g_tx = get_optimizer("adam",
                                  float(cfg.get("g_learning_rate", 1e-4)))
        self.d_tx = get_optimizer("adam",
                                  float(cfg.get("d_learning_rate", 1e-4)))
        from flax.core import FrozenDict
        state = (g_vars["params"], g_vars.get("batch_stats", FrozenDict()),
                 d_vars["params"],
                 self.g_tx.init(g_vars["params"]),
                 self.d_tx.init(d_vars["params"]))
        return jax.device_put(state, replicated_sharding(self.mesh))

    def evaluate_ap(self, g_params, g_bs, dataset, batch_size: int = 2) -> float:
        """Mean average precision over a dataset (eval_model, l.93-129).

        One jitted AP dispatch per batch (vmapped over images, empty-GT
        excluded on device) with the host fetch deferred one batch behind —
        no per-image host syncs (each costs a full RTT on the remote TPU)."""

        @jax.jit
        def _batch_ap(probs, masks, n_valid):
            masks = masks.astype(jnp.float32)  # uint8 wire
            per = jax.vmap(M.average_precision)(probs, masks)
            has = ((jnp.sum(masks, axis=(1, 2)) > 0)
                   & (jnp.arange(probs.shape[0]) < n_valid))
            return (jnp.sum(jnp.where(has, per, 0.0)),
                    jnp.sum(has.astype(jnp.float32)))

        ap_sum, count = 0.0, 0.0
        pending = []
        for batch in batch_iterator(dataset, batch_size, shuffle=False):
            imgs = jnp.asarray(batch["image"], jnp.float32)
            probs = self._fwd(g_params, g_bs, imgs)
            pending.append(_batch_ap(probs, batch["mask"].astype(np.uint8),
                                     batch["n_valid"]))
            if len(pending) > 1:
                s, c = pending.pop(0)
                ap_sum += float(s); count += float(c)
        for s, c in pending:
            ap_sum += float(s); count += float(c)
        return ap_sum / max(count, 1)

    def fit(self, train_ds, valid_ds, num_epochs: Optional[int] = None,
            batch_size: int = 2) -> Dict[str, Any]:
        cfg = self.configs
        num_epochs = num_epochs or int(cfg.get("num_epochs", 200))
        eval_every = int(cfg.get("eval_every", 40))
        logdir = Path(self.logdir)
        logdir.mkdir(parents=True, exist_ok=True)
        rng = jax.random.PRNGKey(self.seed)
        g_params, g_bs, d_params, g_opt, d_opt = self.init(rng)
        best_ap, step_count = -1.0, 0
        history = []
        for epoch in range(num_epochs):
            t0 = time.time()
            metrics = []
            for batch in batch_iterator(train_ds, batch_size, shuffle=True,
                                        drop_last=True, seed=self.seed + epoch):
                g_params, g_bs, d_params, g_opt, d_opt, m = self._step(
                    g_params, g_bs, d_params, g_opt, d_opt,
                    jnp.asarray(batch["image"], jnp.float32),
                    jnp.asarray(batch["mask"], jnp.float32),
                    jax.random.fold_in(rng, 100 + step_count))
                metrics.append({k: float(v) for k, v in m.items()})
                step_count += 1
            agg = {k: float(np.mean([m[k] for m in metrics]))
                   for k in metrics[0]} if metrics else {}
            row = {"epoch": epoch, **agg, "time": time.time() - t0}
            if (epoch + 1) % eval_every == 0 or epoch == num_epochs - 1:
                ap = self.evaluate_ap(g_params, g_bs, valid_ds, batch_size)
                row["val_ap"] = ap
                if ap > best_ap:
                    best_ap = ap
                    save_checkpoint(logdir / "best_gan.ckpt",
                                    {"epoch": epoch, "step": step_count,
                                     "g_state_dict": g_params,
                                     "g_batch_stats": g_bs,
                                     "d_state_dict": d_params})
            history.append(row)
            with open(logdir / "gan_metrics.jsonl", "a") as f:
                f.write(json.dumps(row) + "\n")
            logger.info("gan epoch %d | d %.4f | g %.4f", epoch,
                        agg.get("d_loss", float("nan")),
                        agg.get("g_loss", float("nan")))
        return {"best_ap": best_ap, "g_params": g_params,
                "g_batch_stats": g_bs, "d_params": d_params,
                "history": history}
