"""GazeNeRF training loss stack — functional, static-shape, jit-safe.

TPU re-design of the reference ``GazeNeRFLoss``
(reference: losses/gazenerf_loss.py:190-470).  The reference gathers masked
pixels with boolean indexing (``res_img[mask]``) — a dynamic-shape op that
cannot live under ``jit``; here every masked mean is a static-shape
``sum(x * mask) / sum(mask)`` with identical value and gradient structure.

All images are NHWC in [0, 1]; masks are ``[B, H, W, 1]`` floats.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from gazenerf_tpu.config import LossConfig
from gazenerf_tpu.ops.image import resize_bilinear
from gazenerf_tpu.ops.rotation import angular_error_deg, pitchyaw_to_vector


def masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``err`` over pixels where ``mask`` is 1 (3-channel broadcast).

    Equals torch's ``loss(x[mask3], y[mask3])`` reduction='mean'
    (reference losses/gazenerf_loss.py:333-344) including its gradient.
    """
    mask3 = jnp.broadcast_to(mask, err.shape)
    denom = jnp.maximum(jnp.sum(mask3), 1.0)
    return jnp.sum(err * mask3) / denom


def region_masks(
    head_mask: jnp.ndarray,
    left_eye_mask: jnp.ndarray,
    right_eye_mask: jnp.ndarray,
    full_eye_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Region decomposition (reference losses/gazenerf_loss.py:427-431).

    Inputs are float masks in [0, 1]; outputs are {0,1} floats ``[B,H,W,1]``.
    ``full_eye_mask`` defaults to zeros (the reference dataset hardcodes
    ``eye_mask = 0`` — datasets/eth_xgaze.py:356).
    """
    if full_eye_mask is None:
        full_eye_mask = jnp.zeros_like(head_mask)
    head = (head_mask >= 0.5) & (full_eye_mask < 0.5)
    face = (head_mask >= 0.5) & (left_eye_mask < 0.5) & (right_eye_mask < 0.5)
    eyes = (left_eye_mask >= 0.5) | (right_eye_mask >= 0.5)
    nonhead = head_mask < 0.5
    f = lambda m: m.astype(jnp.float32)  # noqa: E731
    return {"head": f(head), "face": f(face), "eyes": f(eyes), "nonhead": f(nonhead)}


def gan_bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Mean BCE-with-logits against a constant label.

    NOTE: the reference's labels are inverted (real=0, fake=1 for the
    discriminator; generator drives fake toward 0) — reference
    losses/gazenerf_loss.py:22-37.  We preserve that convention.
    """
    t = jnp.full_like(logits, target)
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def discriminator_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        gan_bce_with_logits(fake_logits, 1.0) + gan_bce_with_logits(real_logits, 0.0)
    )


def generator_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return gan_bce_with_logits(fake_logits, 0.0)


def vgg_perceptual_distance(
    vgg_capture_fn: Callable, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Sum of L1 distances between the 4 captured VGG16 feature blocks.

    ``vgg_capture_fn(x)`` -> list of feature maps; inputs are ImageNet-
    normalized, 224-resized by the caller (reference :66-102).
    """
    fa, fb = vgg_capture_fn(a), vgg_capture_fn(b)
    return sum(
        jnp.mean(jnp.abs(x - y), dtype=jnp.float32) for x, y in zip(fa, fb)
    )


def gaze_angular_distance(
    gaze_fn: Callable, pred_img: jnp.ndarray, gt_img: jnp.ndarray
) -> jnp.ndarray:
    """Mean angular error (deg) between estimated gaze on pred vs gt images.

    The gt-side estimate is stop-gradiented (reference :185 detaches the
    target gaze).  Inputs are normalized+resized by the caller.
    """
    import jax

    gaze_pred, _ = gaze_fn(pred_img)
    gaze_gt, _ = gaze_fn(gt_img)
    gaze_gt = jax.lax.stop_gradient(gaze_gt)
    return jnp.mean(
        angular_error_deg(pitchyaw_to_vector(gaze_gt), pitchyaw_to_vector(gaze_pred))
    )


def compute_losses(
    cfg: LossConfig,
    pred: Dict,
    gt_rgb: jnp.ndarray,
    head_mask: jnp.ndarray,
    left_eye_mask: jnp.ndarray,
    right_eye_mask: jnp.ndarray,
    *,
    bg_value: float = 1.0,
    eye_loss_importance: Optional[float] = None,
    vgg_capture_fn: Optional[Callable] = None,
    gaze_fn: Optional[Callable] = None,
    disc_fn: Optional[Callable] = None,
    opt_code_dict: Optional[Dict] = None,
    delta_cam: Optional[Dict] = None,
    step: jnp.ndarray | int = 0,
) -> Dict[str, jnp.ndarray]:
    """Full data + regularizer loss dict; ``total_loss`` is the training target.

    Mirrors reference ``calc_data_loss``/``calc_total_loss``
    (losses/gazenerf_loss.py:294-470):

    * per-region L1-or-MSE on head / face / eyes / nonhead + bg constancy
    * VGG perceptual on face-masked, eye-masked, and full images
    * angular gaze loss (scaled ``eye_loss_importance / 60000``)
    * generator PatchGAN loss with 200k-step linear warm-up capped at 0.1
    * camera-offset + code regularizers with the reference's fixed weights.
    """
    eye_imp = (
        cfg.eye_loss_importance if eye_loss_importance is None else eye_loss_importance
    )
    cd = pred["coarse_dict"] if "coarse_dict" in pred else pred
    res_img = cd["merge_img"]
    res_face = cd["merge_img_face"]
    res_eyes = cd["merge_img_eyes"]
    bg_img = cd["bg_img"]

    masks = region_masks(head_mask, left_eye_mask, right_eye_mask)

    def pix_err(a, b):
        d = a - b
        return jnp.abs(d) if cfg.use_l1_loss else d * d

    losses: Dict[str, jnp.ndarray] = {}
    losses["bg_loss"] = jnp.mean((bg_img - bg_value) ** 2)
    losses["head_loss"] = masked_mean(pix_err(res_img, gt_rgb), masks["head"])
    losses["face_loss"] = masked_mean(pix_err(res_face, gt_rgb), masks["face"])
    losses["eyes_loss"] = masked_mean(pix_err(res_eyes, gt_rgb), masks["eyes"])
    # non-head region of the merged image must match the background colour
    losses["nonhead_loss"] = masked_mean((res_img - bg_value) ** 2, masks["nonhead"])

    if cfg.use_vgg_loss and vgg_capture_fn is not None:
        from gazenerf_tpu.models.vgg import normalize_imagenet

        def prep(img):
            return resize_bilinear(normalize_imagenet(img), (224, 224))

        face3 = jnp.broadcast_to(masks["face"], gt_rgb.shape)
        eyes3 = jnp.broadcast_to(masks["eyes"], gt_rgb.shape)
        nonhead3 = jnp.broadcast_to(masks["nonhead"], gt_rgb.shape)
        gt_face = jnp.where(face3 > 0, gt_rgb, bg_value)
        gt_eyes = jnp.where(eyes3 > 0, gt_rgb, bg_value)
        gt_head = jnp.where(nonhead3 > 0, bg_value, gt_rgb)

        if cfg.vgg_batched:
            # two 3B-row VGG16 applies instead of 6 B-row forwards: convs
            # are per-sample, and the per-pair feature-L1 means below act on
            # row slices of the batched features — numerically identical to
            # the sequential path (reference runs 3 separate
            # VGGPerceptualLoss calls = 6 forwards,
            # losses/gazenerf_loss.py:364-382).  The pred and gt rows go in
            # SEPARATE stacks with the gt stack stop-gradiented: the gt
            # images carry no grad path anyway, but batching them together
            # with the pred rows would force the conv/maxpool backward over
            # all 6B rows (profiled: 12-row select-and-scatter, PERF_NOTES
            # r5) — split stacks let XLA DCE the entire gt-side backward
            import jax

            B = gt_rgb.shape[0]
            pred_stack = jnp.concatenate(
                [prep(x) for x in (res_face, res_eyes, res_img)], axis=0
            )
            gt_stack = jax.lax.stop_gradient(
                jnp.concatenate(
                    [prep(x) for x in (gt_face, gt_eyes, gt_head)], axis=0
                )
            )
            fp = vgg_capture_fn(pred_stack)
            fg = vgg_capture_fn(gt_stack)

            def dist(i):
                a = i * B
                return sum(
                    jnp.mean(
                        jnp.abs(p[a : a + B] - g[a : a + B]),
                        dtype=jnp.float32,
                    )
                    for p, g in zip(fp, fg)
                )

            losses["vgg_face_loss"] = dist(0)
            losses["vgg_eyes_loss"] = dist(1)
            losses["vgg"] = dist(2) * cfg.vgg_importance
        else:
            losses["vgg_face_loss"] = vgg_perceptual_distance(
                vgg_capture_fn, prep(res_face), prep(gt_face)
            )
            losses["vgg_eyes_loss"] = vgg_perceptual_distance(
                vgg_capture_fn, prep(res_eyes), prep(gt_eyes)
            )
            losses["vgg"] = (
                vgg_perceptual_distance(
                    vgg_capture_fn, prep(res_img), prep(gt_head)
                )
                * cfg.vgg_importance
            )

    if cfg.use_angular_loss and gaze_fn is not None:
        from gazenerf_tpu.models.vgg import normalize_imagenet

        nonhead3 = jnp.broadcast_to(masks["nonhead"], gt_rgb.shape)
        gt_head = jnp.where(nonhead3 > 0, bg_value, gt_rgb)
        pre = lambda im: resize_bilinear(normalize_imagenet(im), (224, 224))  # noqa: E731
        losses["angular"] = (
            gaze_angular_distance(gaze_fn, pre(res_img), pre(gt_head))
            * cfg.angular_scale
            * eye_imp
        )

    if cfg.use_patch_gan_loss and disc_fn is not None:
        warm = jnp.clip(
            jnp.asarray(step, jnp.float32) / cfg.gan_warmup_steps,
            0.0,
            cfg.gan_warmup_cap,
        )
        fake_logits = disc_fn(resize_bilinear(res_img, (224, 224)))
        losses["gen_patch_gan_loss"] = generator_loss(fake_logits) * warm

    total = sum(losses.values())

    if delta_cam is not None:
        losses["delta_eular"] = jnp.mean(delta_cam["delta_eulur"] ** 2)
        losses["delta_tvec"] = jnp.mean(delta_cam["delta_tvec"] ** 2)
        total = total + cfg.w_cam_delta * (
            losses["delta_eular"] + losses["delta_tvec"]
        )

    if opt_code_dict is not None:
        losses["iden_code"] = jnp.mean(opt_code_dict["iden"] ** 2)
        losses["expr_code"] = jnp.mean(opt_code_dict["expr"] ** 2)
        losses["appea_code"] = jnp.mean(opt_code_dict["appea"] ** 2)
        bg_code = opt_code_dict.get("bg")
        losses["bg_code"] = (
            jnp.mean(bg_code**2) if bg_code is not None else jnp.asarray(0.0)
        )
        total = total + (
            cfg.w_iden_code * losses["iden_code"]
            + cfg.w_expr_code * losses["expr_code"]
            + cfg.w_appea_code * losses["appea_code"]
            + cfg.w_bg_code * losses["bg_code"]
        )

    losses["total_loss"] = total
    return losses
