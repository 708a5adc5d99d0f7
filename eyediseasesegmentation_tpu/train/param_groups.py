"""Differential learning-rate / weight-decay groups.

Parity with reference ``get_paramgroup`` (unetplusplusstar.py:496-517) +
``get_lr_parameters`` (model_util.py:47-72): pretrained encoder stages get
lr × 0.1; relative-position-encoding tables get lr × 1.0 with weight decay 0.
Realized TPU-style as (a) a per-path update-scale function fed to the optimizer
and (b) a weight-decay mask for decoupled-wd optimizers.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax


def lr_scale_fn_for(model_name: str) -> Optional[Callable[[str], Tuple[float, float]]]:
    """Return path -> (lr_mult, wd_mult), or None when no groups apply."""
    if model_name != "unetplusplusstar":
        return None

    def scale(path: str) -> Tuple[float, float]:
        if "pos_enc" in path:
            return 1.0, 0.0
        if "encoder" in path and "layer4" not in path:
            # seresnet stem + layers 1-3 (the pretrained part): lr x 0.1
            return 0.1, 1.0
        return 1.0, 1.0

    return scale


def wd_mask_for(model_name: str):
    """optax weight-decay mask: False where wd must be 0 (pos-enc tables)."""
    scale = lr_scale_fn_for(model_name)
    if scale is None:
        return None

    def mask(params):
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        leaves = [scale(jax.tree_util.keystr(path))[1] > 0 for path, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return mask
