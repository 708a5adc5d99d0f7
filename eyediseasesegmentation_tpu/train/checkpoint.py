"""Checkpoint I/O.

Same contract as the reference (``checkpoints/{best,last}.pth`` with a
``model_state_dict`` key, consumed by tta.py:86-87 / ensemble.py:40,56, plus
``best_full`` with optimizer state for resume — SURVEY.md §5.4), stored as
msgpack-serialized pytrees (flax.serialization) instead of torch pickles.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Union

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: Union[str, Path], tree: Any) -> None:
    """Serialize a pytree (dict of params/batch_stats/opt_state/...) to disk."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(tree)))
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(payload)
    tmp.replace(path)


def load_checkpoint(path: Union[str, Path]) -> dict:
    """Load the raw state dict (nested dicts of numpy arrays)."""
    return serialization.msgpack_restore(Path(path).read_bytes())


def restore_into(target: Any, path: Union[str, Path]) -> Any:
    """Load a checkpoint into a structurally-matching target pytree
    (non-strict key-diff reporting is left to callers; structures must match)."""
    state_dict = load_checkpoint(path)
    return serialization.from_state_dict(target, state_dict)
