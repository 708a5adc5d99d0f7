"""Model introspection: parameter counts, layer tables, FLOP estimates.

Parity with reference ``archs/model_util.py``: ``get_num_parameters``
(train.py:243,262-265), the Keras-style per-layer ``summary``
(model_util.py:102-214 — realized via flax's tabulate), plus an XLA-derived
FLOP/bytes estimate the torch version could not provide.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_num_parameters(params) -> Tuple[int, int]:
    """(trainable, total) parameter counts of a params pytree."""
    total = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    return total, total


def summarize(model, input_shape=(1, 64, 64, 3), train: bool = False) -> str:
    """Per-layer table (flax tabulate) — the Keras-style summary."""
    from flax import linen as nn

    tab = nn.tabulate(model, {"params": jax.random.PRNGKey(0),
                              "dropout": jax.random.PRNGKey(1)},
                      compute_flops=False, compute_vjp_flops=False)
    return tab(jnp.zeros(input_shape, jnp.float32), train=train)


def cost_estimate(fn, *args) -> Dict[str, float]:
    """XLA cost analysis of a jitted callable: flops + bytes accessed."""
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {"flops": float(analysis.get("flops", 0.0)),
            "bytes_accessed": float(analysis.get("bytes accessed", 0.0))}
