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


def log_number(wandb, value, description: str) -> None:
    """Scalar log twin (reference utils/logging.py:24-25 ``log_one_number``)."""
    if wandb is None:
        return
    wandb.log({description: float(value)})


# our loss-dict key -> the reference's wandb scalar name
# (reference utils/logging.py:201-230 ``log_losses``), with the gating flag
# ("" = always logged).  The reference's use_angular_loss branch reads a
# ``loss_dict["eye_region_loss"]`` key its own loss never produces (a latent
# KeyError in the reference); the eye-region signal here is ``eyes_loss``.
_LOSS_KEY_TABLE = (
    ("total_loss", "Total Loss Batch", ""),
    ("vgg_face_loss", "VGG Face Loss Batch", "use_vgg_loss"),
    ("vgg", "VGG Loss Batch", "use_vgg_loss"),
    ("gen_patch_gan_loss", "Generator Patch GAN Loss Batch",
     "use_patch_gan_loss"),
    ("disc_patch_gan_loss", "Discriminator Patch GAN Loss Batch",
     "use_patch_gan_loss"),
    ("angular", "Angular Loss Batch", "use_angular_loss"),
    ("eyes_loss", "Eye Region Loss Batch", "use_angular_loss"),
    ("head_loss", "Head Loss Batch", ""),
    ("iden_code", "Iden Code Loss Batch", ""),
    ("expr_code", "Expr Code Loss Batch", ""),
    ("appea_code", "Appea Code Loss Batch", ""),
    ("bg_code", "BG Code Loss Batch", ""),
    ("bg_loss", "BG Loss Batch", ""),
    ("face_loss", "Face Loss Batch", ""),
    ("eyes_loss", "Eyes Loss Batch", ""),
    ("nonhead_loss", "Non Head Loss Batch", ""),
    ("delta_eular", "Delta Eular Loss Batch", ""),
    ("delta_tvec", "Delta Tvec Loss Batch", ""),
)


def log_losses(wandb, loss_dict, loss_cfg, epoch: int = 0,
               prefix: str = "TRAIN ") -> None:
    """Per-loss scalar dict with the reference's exact wandb key names and
    flag gating (reference utils/logging.py:201-230, driven every 300
    batches from trainer/gazenerf_trainer.py:584-591).

    ``loss_dict`` values may be device scalars — the ONE host sync per call
    happens here, in a single ``wandb.log``.
    """
    if wandb is None:
        return
    out = {}
    for key, name, flag in _LOSS_KEY_TABLE:
        if key not in loss_dict:
            continue
        if flag and not getattr(loss_cfg, flag, False):
            continue
        if name == "Head Loss Batch" and epoch <= -1:
            continue  # reference gates head_loss on epoch > -1
        out[prefix + name] = float(loss_dict[key])
    wandb.log(out)


def log_all_images(wandb, gt_batch, coarse_dict,
                   description: str = "Prediction") -> None:
    """The reference's 5-panel visual-QA strip — gt | merge | face | eyes |
    bg, horizontally concatenated, first batch row (reference
    utils/logging.py:41-78 ``log_all_images``)."""
    if wandb is None:
        return
    gt = to_uint8(np.asarray(gt_batch[0]))
    panels = [gt]
    for key in ("merge_img", "merge_img_face", "merge_img_eyes", "bg_img"):
        img = np.asarray(coarse_dict[key])
        img = img[0] if img.ndim == 4 else img
        if img.shape[:2] != gt.shape[:2]:  # bg_img renders once, any batch
            continue
        panels.append(to_uint8(img))
    wandb.log({description: wandb.Image(np.concatenate(panels, axis=1))})


def log_mask_overlay(wandb, image, mask, description: str,
                     class_labels: Optional[Dict[int, str]] = None) -> None:
    """wandb segmentation-mask overlay (reference utils/logging.py:27-38
    ``log_mask``, and the per-subject QA loop ``log_one_h5_subject``
    :233-270)."""
    if wandb is None:
        return
    class_labels = class_labels or {0: "background", 255: "foreground"}
    base = wandb.Image(to_uint8(np.asarray(image)), caption="Image")
    overlay = wandb.Image(
        base,
        masks={
            "predictions": {
                "mask_data": np.asarray(mask),
                "class_labels": class_labels,
            }
        },
    )
    wandb.log({description: overlay})


def log_subject_eval_results(wandb, subject_metrics: Dict[str, float],
                             prefix: str = "Subject ") -> None:
    """Per-subject eval-epoch scalar panel (reference utils/logging.py:
    134-147 ``log_one_subject_evaluation_results``); takes the protocol
    result dict (eval/protocols.py) directly."""
    if wandb is None:
        return
    names = {
        "gaze_angular_deg": "Angular Error",
        "head_angular_deg": "Angular Head Error",
        "ssim": "SSIM",
        "psnr": "PSNR",
        "lpips": "LPIPS",
        "l1": "L1 Distance",
        "fid": "FID",
        "identity_similarity": "Similarity",
    }
    wandb.log({
        prefix + label: float(subject_metrics[key])
        for key, label in names.items()
        if key in subject_metrics
    })


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
