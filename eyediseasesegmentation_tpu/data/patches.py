"""Offline patch extraction for tile-based training.

Behavioral port of reference ``src/data/build_patches.py:18-89``: cover each
image with 256² windows (32px min overlap, ``make_grid``), save every patch
(mask binarized at >50), then randomly delete excess background-only patches so
positives and negatives are balanced; ``build_dataframe`` writes the
``img_mask.csv`` the tile training path consumes (train.py:77-89).

No rasterio: decode once with PIL and slice numpy windows (the images here are
a few MPx; windowed IO buys nothing).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from ..utils import make_grid


def build_patches(images: Sequence[Path], mask_paths: Sequence[Path],
                  out_imgs: Path, out_mask: Path, window: int = 256,
                  min_overlap: int = 32, seed: int = 1999) -> dict:
    """Write balanced positive/negative patches; returns counts."""
    out_imgs = Path(out_imgs)
    out_mask = Path(out_mask)
    out_imgs.mkdir(parents=True, exist_ok=True)
    out_mask.mkdir(parents=True, exist_ok=True)

    pos, neg = 0, 0
    neg_names: List[str] = []
    for img_path, mask_path in zip(images, mask_paths):
        img = np.asarray(Image.open(img_path).convert("RGB"))
        mask = np.asarray(Image.open(mask_path).convert("L"))
        mask = (mask > 50).astype(np.uint8)
        for j, (x1, x2, y1, y2) in enumerate(make_grid(img.shape[:2], window,
                                                       min_overlap)):
            name = Path(img_path).name[:-4] + f"_patch_{j}.jpg"
            Image.fromarray(img[x1:x2, y1:y2]).save(out_imgs / name,
                                                    quality=100, subsampling=0)
            Image.fromarray(mask[x1:x2, y1:y2] * 255).save(out_mask / name,
                                                           quality=100,
                                                           subsampling=0)
            if mask[x1:x2, y1:y2].sum() > 0:
                pos += 1
            else:
                neg += 1
                neg_names.append(name)

    removed = 0
    if neg > pos:  # rebalance: drop random negatives (build_patches.py:63-83)
        rng = np.random.RandomState(seed)
        rm = rng.choice(len(neg_names), neg - pos, replace=False)
        for idx in rm:
            (out_imgs / neg_names[idx]).unlink(missing_ok=True)
            (out_mask / neg_names[idx]).unlink(missing_ok=True)
            removed += 1
    return {"pos": pos, "neg": neg, "removed": removed}


def read_img_mask_csv(csv_path: Path, root: Optional[Path] = None):
    """Read an ``img_mask.csv`` patch list back into (image_paths, mask_paths).

    The consumer of ``build_dataframe``'s output for tile-mode training
    (reference train.py:77-89 reads the csv, shuffles, and rebases paths).
    ``root``, if given, rebases relative paths (the reference strips the first
    two path parts because of its cwd layout; here rebasing is explicit).
    """
    import pandas as pd

    df = pd.read_csv(csv_path)
    def _p(s):
        p = Path(s)
        return (Path(root) / p) if (root is not None and not p.is_absolute()) else p
    return [_p(s) for s in df["img"]], [_p(s) for s in df["mask"]]


def build_dataframe(img_dir: Path, mask_dir: Path,
                    out_csv: Optional[Path] = None) -> Path:
    """Write the img/mask pairing csv (build_patches.py:85-89)."""
    import pandas as pd

    img_dir = Path(img_dir)
    mask_dir = Path(mask_dir)
    imgs = sorted(img_dir / f for f in os.listdir(img_dir))
    masks = sorted(mask_dir / f for f in os.listdir(mask_dir))
    df = pd.DataFrame({"img": imgs, "mask": masks})
    out_csv = out_csv or (img_dir.parent / "img_mask.csv")
    df.to_csv(out_csv, index=False, header=True)
    return out_csv
