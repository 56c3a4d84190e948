"""NL-3DMM fitting loss — exact mirror of the reference objective.

TPU (jnp) port of the reference ``losses/nl3dmm_loss.py:6-121``:

* masked photometric MSE over head pixels (``photo_loss``, ref :10-13),
* weighted 68-landmark squared error where the nose bridge (28:31) and the
  mouth-interior tail (-8:) weigh 20x before normalization (ref :19-24,40-49),
* skin-color constancy over the ``skinmask.npy`` vertex set — vertex colors
  (0..255 scale, as emitted by the SH shading stage) are pulled toward their
  masked per-channel mean (ref :26-38),
* SH "gamma" regularizer after reshape to ``(9, 3)``, penalizing per-band
  deviation from the RGB mean (ref :51-58),
* code regularizer ``2.5 * mean(c^2)`` per code group, and the total
  weighting ``10*img + lm_w*lm + 0.01*gamma + 0.001*code + 0.1*skin``
  (ref :72-110).

Everything is jit-able with static shapes: the photometric mask enters as a
multiplicative weight (same value and gradient structure as the reference's
``pred[mask]`` gather-mean, provided the denominator counts masked elements).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def make_lm_weights() -> np.ndarray:
    """Normalized 68-landmark weights (reference nl3dmm_loss.py:19-24)."""
    w = np.ones(68, np.float32)
    w[28:31] = 20.0
    w[-8:] = 20.0
    return w / w.sum()


def photo_loss(
    pred_img: jnp.ndarray, gt_img: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked MSE — mean over the masked elements only (ref :10-13).

    ``mask``: broadcastable boolean/float weight over ``pred_img``.
    """
    m = jnp.broadcast_to(mask.astype(pred_img.dtype), pred_img.shape)
    diff = (pred_img - gt_img) ** 2 * m
    return jnp.sum(diff) / jnp.maximum(jnp.sum(m), 1.0)


def lm2d_loss(
    pred_lms: jnp.ndarray, gt_lms: jnp.ndarray, lm_weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted landmark L2 (ref :40-49): ``sum(w * |p-g|^2) / (B*68)``."""
    err = jnp.sum((pred_lms - gt_lms) ** 2, axis=-1)  # [B, 68]
    loss = err * lm_weight[None]
    return jnp.sum(loss) / (pred_lms.shape[0] * pred_lms.shape[1])


def gamma_loss(gamma: jnp.ndarray) -> jnp.ndarray:
    """SH-coefficient regularizer (ref :51-58): per-band RGB constancy.

    ``gamma``: [B, 27] laid out SH-major (9 bands x 3 channels, matching the
    renderer's ``view(-1, 9, 3)``).
    """
    g = gamma.reshape(-1, 9, 3)
    g_mean = jnp.mean(g, axis=2, keepdims=True)
    return jnp.mean((g - g_mean) ** 2)


def skin_loss(vert_colors: jnp.ndarray, skinmask: jnp.ndarray) -> jnp.ndarray:
    """Skin-color constancy (ref :26-38).

    ``vert_colors``: [B, V, 3] in the 0..255 scale the SH stage emits (the
    reference divides by 255 internally); ``skinmask``: [V] 0/1 floats.
    """
    sm = skinmask.reshape(1, -1, 1).astype(vert_colors.dtype)
    valid = jnp.sum(sm)
    B = vert_colors.shape[0]
    colors = vert_colors / 255.0
    color_mean = jnp.sum(colors * sm, axis=1, keepdims=True) / valid
    return jnp.sum(((colors - color_mean) ** 2) * sm) / (B * valid)


def regu_code_loss(
    iden_codes: jnp.ndarray, expr_codes: jnp.ndarray, text_codes: jnp.ndarray
) -> jnp.ndarray:
    """Code regularizer (ref :72-79): ``2.5 * mean(c^2)`` per group."""
    return (
        jnp.mean(iden_codes**2) * 2.5
        + jnp.mean(expr_codes**2) * 2.5
        + jnp.mean(text_codes**2) * 2.5
    )


def regu_cam_offset_loss(
    delta_euler: jnp.ndarray, delta_tvec: jnp.ndarray
) -> jnp.ndarray:
    """Camera-offset regularizer (ref :60-66)."""
    return jnp.mean(delta_euler**2) + jnp.mean(delta_tvec**2)


class NL3DMMLoss:
    """Stateful wrapper bundling the skinmask + lm weights (ref :6-121)."""

    def __init__(self, skinmask: Optional[np.ndarray] = None):
        self.lm_weight = jnp.asarray(make_lm_weights())
        self.skinmask = None if skinmask is None else jnp.asarray(
            np.asarray(skinmask, np.float32).reshape(-1)
        )

    def calc_total_loss(
        self,
        batch_vcs: jnp.ndarray,
        cur_illus: jnp.ndarray,
        rendered_imgs: jnp.ndarray,
        gt_imgs: jnp.ndarray,
        mask_c3d: jnp.ndarray,
        proj_lm2ds: jnp.ndarray,
        gt_lm2ds: jnp.ndarray,
        iden_codes: jnp.ndarray,
        text_codes: jnp.ndarray,
        expr_codes: jnp.ndarray,
        lm_w: float,
    ) -> Dict[str, jnp.ndarray]:
        """Total fitting loss (ref :81-121); weights fixed at :104-110."""
        img_loss = photo_loss(rendered_imgs, gt_imgs, mask_c3d)
        lm_loss = lm2d_loss(proj_lm2ds, gt_lm2ds, self.lm_weight)
        illu_loss = gamma_loss(cur_illus)
        code_loss = regu_code_loss(iden_codes, expr_codes, text_codes)
        if self.skinmask is not None:
            sk_loss = skin_loss(batch_vcs, self.skinmask)
        else:
            sk_loss = jnp.zeros(())
        total = (
            img_loss * 10.0
            + lm_loss * lm_w
            + illu_loss * 0.01
            + code_loss * 0.001
            + sk_loss * 0.1
        )
        return {
            "img": img_loss,
            "lm": lm_loss,
            "illu_mean_loss": illu_loss,
            "code_regu": code_loss,
            "skin": sk_loss,
            "total_loss": total,
        }
