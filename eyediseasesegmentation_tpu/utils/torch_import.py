"""PyTorch → JAX pretrained-weight importer.

Covers the reference's pretrained bootstrap (SURVEY.md §5.4 / §7 hard parts):
``models/pretrained_models/se_resnet50-ce0d4300.pth`` loaded into BoTSER50's
layers 0-3 (unetplusplusstar.py:282-284) and the mmcv-style checkpoint reader
(util/checkpoint.py: 'module.' prefix strip, 'state_dict'/'model_state_dict'
keys, non-strict load with key-diff report, l.18-78, 213-214).

Layout rules:
* conv weights OIHW → HWIO
* linear weights (out, in) → (in, out)
* SENet's 1×1-conv SE gates → Dense kernels (squeeze + transpose)
* BN: weight/bias → params scale/bias; running_mean/var → batch_stats

Numerically faithful: encoder 3×3 convs use torch-style explicit (1,1) padding
so stride-2 blocks match torch exactly (XLA SAME pads asymmetrically).
Known edge deviation: senet's stem maxpool is ceil_mode pad-0 vs our pad-1 —
border rows may differ by one pooling window.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger("eyediseasesegmentation_tpu")


def to_numpy(t) -> np.ndarray:
    """torch tensor (or array) → numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(t) -> np.ndarray:
    """OIHW → HWIO."""
    return to_numpy(t).transpose(2, 3, 1, 0)


def dense_kernel(t) -> np.ndarray:
    """(out, in) → (in, out); also squeezes 1×1-conv SE gates (out,in,1,1)."""
    a = to_numpy(t)
    if a.ndim == 4:
        a = a[:, :, 0, 0]
    return a.transpose(1, 0)


def load_torch_checkpoint(path) -> Dict[str, Any]:
    """torch.load a checkpoint, unwrap state-dict containers, strip 'module.'
    (reference checkpoint.py:107-137, 213-214)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {re.sub(r"^module\.", "", k): v for k, v in ckpt.items()}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray, report: Dict):
    node = tree
    for p in path[:-1]:
        if p not in node:
            report["missing_in_jax"].append("/".join(path))
            return
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        report["missing_in_jax"].append("/".join(path))
        return
    if tuple(node[leaf].shape) != tuple(value.shape):
        report["shape_mismatch"].append(
            ("/".join(path), tuple(node[leaf].shape), tuple(value.shape)))
        return
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    report["loaded"].append("/".join(path))


def import_se_resnet50(state_dict: Dict[str, Any], params: Dict, batch_stats: Dict,
                       prefix: Tuple[str, ...] = ("seresnet",),
                       num_stages: int = 3) -> Dict[str, Any]:
    """Map a pytorch_toolbelt/senet ``se_resnet50`` state_dict onto the
    BoTSER50 backbone tree (in place on mutable dict copies).

    senet names: layer0.conv1/bn1; layerN.M.{conv1..3,bn1..3},
    se_module.fc1/fc2, downsample.{0,1}.
    Returns a key-diff report (the reference's non-strict load,
    checkpoint.py:18-78).
    """
    report = {"loaded": [], "missing_in_jax": [], "shape_mismatch": [],
              "unused_torch": []}
    used = set()

    def take(name):
        used.add(name)
        return state_dict[name]

    def bn(torch_prefix, jax_prefix):
        _set(params, jax_prefix + ("scale",), to_numpy(take(f"{torch_prefix}.weight")), report)
        _set(params, jax_prefix + ("bias",), to_numpy(take(f"{torch_prefix}.bias")), report)
        _set(batch_stats, jax_prefix + ("mean",), to_numpy(take(f"{torch_prefix}.running_mean")), report)
        _set(batch_stats, jax_prefix + ("var",), to_numpy(take(f"{torch_prefix}.running_var")), report)

    # stem
    _set(params, prefix + ("stem_conv", "kernel"),
         conv_kernel(take("layer0.conv1.weight")), report)
    bn("layer0.bn1", prefix + ("stem_bn",))

    # residual stages
    stage_sizes = {1: 3, 2: 4, 3: 6, 4: 3}
    for stage in range(1, num_stages + 1):
        for blk in range(stage_sizes[stage]):
            tp = f"layer{stage}.{blk}"
            jp = prefix + (f"layer{stage}_block{blk}",)
            for ci in (1, 2, 3):
                if f"{tp}.conv{ci}.weight" not in state_dict:
                    continue
                _set(params, jp + (f"conv{ci}", "kernel"),
                     conv_kernel(take(f"{tp}.conv{ci}.weight")), report)
                bn(f"{tp}.bn{ci}", jp + (f"bn{ci}",))
            # SE gates: fc1/fc2 1x1 convs (or linears) → Dense_0 / Dense_1
            for fc, dense in (("fc1", "Dense_0"), ("fc2", "Dense_1")):
                wname = f"{tp}.se_module.{fc}.weight"
                if wname in state_dict:
                    _set(params, jp + ("se", dense, "kernel"),
                         dense_kernel(take(wname)), report)
                    bname = f"{tp}.se_module.{fc}.bias"
                    if bname in state_dict:
                        _set(params, jp + ("se", dense, "bias"),
                             to_numpy(take(bname)), report)
            if f"{tp}.downsample.0.weight" in state_dict:
                _set(params, jp + ("down_conv", "kernel"),
                     conv_kernel(take(f"{tp}.downsample.0.weight")), report)
                bn(f"{tp}.downsample.1", jp + ("down_bn",))

    report["unused_torch"] = [k for k in state_dict if k not in used]
    logger.info("torch import: %d loaded, %d missing, %d mismatched, %d unused",
                len(report["loaded"]), len(report["missing_in_jax"]),
                len(report["shape_mismatch"]), len(report["unused_torch"]))
    return report


def load_pretrained_encoder(variables: Dict[str, Any], checkpoint_path,
                            arch: str = "se_resnet50",
                            encoder_key: str = "encoder") -> Tuple[Dict, Dict]:
    """Load torch pretrained weights into a model's encoder subtree.

    Returns (new_variables, report). Unknown architectures raise.
    """
    import jax

    state_dict = load_torch_checkpoint(checkpoint_path)
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    batch_stats = jax.tree_util.tree_map(np.asarray,
                                         dict(variables.get("batch_stats", {})))
    # unfreeze nested dicts
    import copy

    def to_mutable(d):
        if isinstance(d, dict) or hasattr(d, "items"):
            return {k: to_mutable(v) for k, v in d.items()}
        return d

    params = to_mutable(params)
    batch_stats = to_mutable(batch_stats)

    if arch == "se_resnet50":
        report = import_se_resnet50(state_dict, params[encoder_key],
                                    batch_stats[encoder_key])
    else:
        raise KeyError(f"no importer for arch '{arch}'")
    new_vars = {**variables, "params": params, "batch_stats": batch_stats}
    return new_vars, report
