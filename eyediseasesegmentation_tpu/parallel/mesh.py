"""Device mesh and sharding helpers — the framework's single communication layer.

Replaces the reference's vestigial distributed stack (``nn.DataParallel`` at
``tta.py:101-105``; gloo process launcher at ``util/base_utils.py:143-189``) with jax
collectives over ICI/DCN: a ``Mesh`` with a ``data`` axis (room for a ``model`` axis),
batch sharded over ``data``, params replicated, gradient psum inserted by XLA from the
sharding annotations. Multi-slice scale-out over DCN needs no code change.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return jax.device_count()


def make_mesh(shape: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a mesh. Default: all devices on the ``data`` axis.

    ``shape`` e.g. ``{"data": 4, "model": 2}``. Values multiply to <= #devices;
    a value of -1 means "all remaining devices".
    """
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {DATA_AXIS: len(devices)}
    axes = list(shape.keys())
    sizes = list(shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // max(known, 1)
    n = int(np.prod(sizes))
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(axes))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with the batch axis over ``data``."""
    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, ndim=np.ndim(x)))
    return jax.tree_util.tree_map(_put, batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_batch_multiple(batch, multiple: int):
    """Pad the leading axis of every leaf up to a multiple (for even sharding).

    Returns (padded_batch, n_real_rows). TPU needs static, evenly divisible
    batch shards; metrics mask out the padded rows.
    """
    import numpy as _np

    leaves = jax.tree_util.tree_leaves(batch)
    n = leaves[0].shape[0]
    pad = (-n) % multiple

    def _pad(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return _np.pad(x, widths)

    return jax.tree_util.tree_map(_pad, batch), n
