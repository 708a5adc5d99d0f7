"""TensorBoard event writer behind the metrics.jsonl stream.

The reference gets TensorBoard curves for free from Catalyst's logdir writers
(reference README.md:9, train.py:364-365 adds a WandbLogger on top). Here the
trainer's canonical metric stream is ``metrics.jsonl``; this module mirrors it
into TF event files so ``tensorboard --logdir models/...`` shows loss/dice/lr
curves. Zero-egress: events are local files (the W&B role is covered by
metrics.jsonl + these events; no network logger is wired).

Implementation: ``torch.utils.tensorboard.SummaryWriter`` (torch is a baked-in
host-side dependency), imported lazily so training never pays the torch import
unless TB logging is enabled. Falls back to a no-op if unavailable.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

logger = logging.getLogger("eyediseasesegmentation_tpu")


class TensorBoardWriter:
    """Scalar writer: ``add_scalars(step, {"train/loss": 0.3, ...})``.

    Safe to construct always — if the tensorboard backend cannot be imported,
    it degrades to a no-op with one warning.
    """

    def __init__(self, logdir, enabled: bool = True):
        self._writer = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=str(Path(logdir)))
        except Exception as e:  # torch/tensorboard missing or broken
            logger.warning("TensorBoard writer disabled: %s", e)

    def add_scalars(self, step: int, scalars: Dict[str, float]):
        if self._writer is None:
            return
        for tag, value in scalars.items():
            try:
                self._writer.add_scalar(tag, float(value), global_step=step)
            except (TypeError, ValueError):
                pass  # non-numeric rows (e.g. strings) are jsonl-only

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None


def row_to_scalars(row: Dict) -> Dict[str, float]:
    """Map a metrics.jsonl row to TB tags: train_*/val_* prefixes become
    groups, epoch/time/lr stay top-level."""
    out = {}
    for k, v in row.items():
        if not isinstance(v, (int, float)):
            continue
        if k.startswith("train_"):
            out["train/" + k[6:]] = v
        elif k.startswith("val_"):
            out["val/" + k[4:]] = v
        elif k != "epoch":
            out[k] = v
    return out
