"""Logging: stdlib file+stdout config, optional wandb, image helpers.

TPU twin of the reference's logging stack (reference: utils/logging.py:10-270
— stdlib logging + wandb scalars/images/masks).  wandb is optional and
gated: absent or disabled, everything degrades to no-ops.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Any, Dict, Optional

import numpy as np


def configure_logging(log_file: Optional[str] = None, level=logging.INFO) -> None:
    """File + stdout logging (reference utils/logging.py:10-22)."""
    handlers = [logging.StreamHandler(sys.stdout)]
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )


def maybe_wandb_init(enabled: bool, **kwargs):
    """Returns an initialized wandb module or None (gated dependency)."""
    if not enabled:
        return None
    try:
        import wandb

        wandb.init(project="gazenerf_tpu", **kwargs)
        return wandb
    except ImportError:
        logging.getLogger(__name__).warning(
            "wandb requested but not installed; continuing without it"
        )
        return None


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] float [0,1] (or already-uint8, e.g. a ``device_decode``
    loader batch) -> uint8."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return (img * 255.0).clip(0, 255).astype(np.uint8)


def log_images(wandb, tag: str, images: Dict[str, Any], step: Optional[int] = None):
    """wandb image logging twin (reference utils/logging.py:41-98)."""
    if wandb is None:
        return
    wandb.log(
        {f"{tag}/{k}": wandb.Image(to_uint8(v)) for k, v in images.items()},
        step=step,
    )


def side_by_side(*imgs: np.ndarray) -> np.ndarray:
    """Concatenate images horizontally for visual QA (reference
    utils/model_utils.py:67-165 ``draw_res_img`` analogue)."""
    arrs = [to_uint8(i) if i.dtype != np.uint8 else np.asarray(i) for i in imgs]
    h = max(a.shape[0] for a in arrs)
    padded = [
        np.pad(a, ((0, h - a.shape[0]), (0, 0), (0, 0)), constant_values=255)
        for a in arrs
    ]
    return np.concatenate(padded, axis=1)
