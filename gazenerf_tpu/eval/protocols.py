"""Evaluation protocols — the de-facto integration tests of the framework.

TPU re-designs of the reference's four quantitative protocols
(reference: utils/metrics_utils.py:137-889):

* :func:`evaluate_input_target_images` — per (input, target) pair: few-shot
  fit the latent offsets on the input image, re-render with the target's
  camera + gaze, and score gaze/head angular error, SSIM, PSNR, LPIPS-style,
  L1, identity similarity; FID across the collected sets (:137-402).
* :func:`evaluate_personal_calibration` — fit on N images of a subject,
  synthesize the remaining frames for estimator fine-tuning (:407-591).
* :func:`evaluate_consistency` — shift the fitted gaze pitch by +5..20
  degrees and measure the estimator's response (:594-766).
* :func:`evaluate_gaze_transfer` — recover a gaze code by optimization on
  subject A, render it on subject B (:768-889).

Each protocol re-personalizes from the SAME base checkpoint per pair (the
reference builds a fresh trainer per image, :221); here that is just reusing
the immutable base ``TrainState``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.config import Config
from gazenerf_tpu.eval import metrics as M
from gazenerf_tpu.models.gaze_nerf import GazeNeRF
from gazenerf_tpu.train.fitting import (
    make_fit_single_image,
    make_optimize_gaze,
    make_predict_single_image,
)
from gazenerf_tpu.train.state import TrainState
from gazenerf_tpu.train.trainer import FrozenNets


def _single(batch: Dict[str, np.ndarray], i: int = 0) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v[i : i + 1]) for k, v in batch.items()}


def split_target_batch(batch: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """A target-mode loader batch (``target_*`` keys) -> {"input", "target"}."""
    inp = {k: v for k, v in batch.items() if not k.startswith("target_")}
    tgt = {
        k[len("target_"):]: v for k, v in batch.items() if k.startswith("target_")
    }
    return {"input": inp, "target": tgt}


def make_eval_normalizer(img_dim: int = 224) -> Callable:
    """Eval-time estimator-input normalization (the reference warps both GT
    and prediction through this before the frozen estimator — reference
    utils/gaze_estimation_utils.py:55-143, called from
    utils/metrics_utils.py:265-283,299-313).

    solvePnP head pose from the 6-point landmark subset, then the
    focal-960 / distance-600 virtual-camera warp to ``img_dim``.
    Returns ``normalizer(img01 [H,W,3], landmarks68 [68,2], cam_matrix,
    cam_distortion) -> [img_dim, img_dim, 3] float in [0,1]``.
    """
    from gazenerf_tpu.data.face_model import FACE_MODEL_3D
    from gazenerf_tpu.preprocess.normalize import (
        estimate_head_pose,
        normalize_face,
    )

    # face-model rows [20,23,26,29,15,19] pair with 68-landmark indices
    # [36,39,42,45,31,35] (reference gaze_estimation_utils.py:61-66)
    fm = FACE_MODEL_3D[[20, 23, 26, 29, 15, 19], :]

    def normalizer(img01, landmarks68, cam_matrix, cam_distortion):
        u8 = (np.clip(np.asarray(img01), 0.0, 1.0) * 255).astype(np.uint8)
        lm = np.asarray(landmarks68, np.float64)[[36, 39, 42, 45, 31, 35], :]
        rvec, tvec = estimate_head_pose(
            lm, fm, np.asarray(cam_matrix, np.float64),
            np.asarray(cam_distortion, np.float64), iterations=1,
        )
        warped, _, _ = normalize_face(
            u8, fm, rvec, tvec, np.asarray(cam_matrix, np.float64),
            img_dim=img_dim, focal_norm=960.0, distance_norm=600.0,
        )
        return warped.astype(np.float32) / 255.0

    return normalizer


@dataclasses.dataclass
class EvalContext:
    """Bundles the jitted fit/predict/optimize closures around a base state."""

    cfg: Config
    model: GazeNeRF
    base_state: TrainState
    fit: Callable
    predict: Callable
    optimize_gaze: Callable
    estimator_fn: Optional[Callable] = None  # img -> (gaze, head) pitchyaw
    feats_fn: Optional[Callable] = None  # img -> list of feature maps
    embed_fn: Optional[Callable] = None  # img -> identity embedding
    # full FaceX-Zoo identity pipeline (detect -> align -> crop -> embed,
    # gazenerf_tpu.models.face_recognition.IdentitySimilarityPipeline);
    # preferred over embed_fn when set (reference
    # face_recognition/evaluation_similarity.py:16-86)
    identity_pipeline: Optional[Callable] = None
    # exact-backend hooks (reference piq LPIPS / piq FID-InceptionV3)
    lpips_fn: Optional[Callable] = None  # (a, b) -> [B] distances
    fid_feats_fn: Optional[Callable] = None  # imgs -> [B, 2048] pool3 feats
    # estimator-input normalization (make_eval_normalizer) + per-camera
    # calibration lookup: cam_index -> (camera_matrix, distortion)
    normalizer: Optional[Callable] = None
    cam_lookup: Optional[Callable] = None

    @classmethod
    def build(
        cls,
        cfg: Config,
        model: GazeNeRF,
        base_state: TrainState,
        frozen: FrozenNets,
        expr_fix: np.ndarray,
        fit_steps: int = 50,
        estimator_fn=None,
        embed_fn=None,
        identity_pipeline=None,
        lpips_fn=None,
        fid_feats_fn=None,
        normalizer=None,
        cam_lookup=None,
    ) -> "EvalContext":
        return cls(
            cfg=cfg,
            model=model,
            base_state=base_state,
            fit=make_fit_single_image(cfg, model, frozen, expr_fix, fit_steps),
            predict=make_predict_single_image(cfg, model, expr_fix),
            optimize_gaze=make_optimize_gaze(cfg, model, frozen, expr_fix),
            estimator_fn=estimator_fn,
            feats_fn=frozen.vgg_capture_fn(),
            embed_fn=embed_fn,
            identity_pipeline=identity_pipeline,
            lpips_fn=lpips_fn,
            fid_feats_fn=fid_feats_fn,
            normalizer=normalizer,
            cam_lookup=cam_lookup,
        )


def _resize224_u8(img01: jnp.ndarray) -> np.ndarray:
    """[1,H,W,3] float01 -> [224,224,3] uint8 RGB (reference ``trans_resize``
    + uint8 cast, utils/metrics_utils.py:327-335)."""
    from gazenerf_tpu.ops.image import resize_bilinear

    r = resize_bilinear(img01, (224, 224))[0]
    return (np.clip(np.asarray(r), 0.0, 1.0) * 255).astype(np.uint8)


def _pair_metrics(ctx: EvalContext, pred_img, target_img, tgt) -> Dict[str, float]:
    """Reference-faithful per-pair metrics (utils/metrics_utils.py:255-384).

    ``target_img`` must already be nonhead-whitened; both images are full-res
    [1,H,W,3] in [0,1].
    """
    out = {
        "ssim": float(M.ssim(pred_img, target_img)[0]),
        "psnr": float(M.psnr(pred_img, target_img)[0]),
        "l1": float(M.l1(pred_img, target_img)[0]),
    }
    if ctx.lpips_fn is not None:
        out["lpips"] = float(ctx.lpips_fn(target_img, pred_img)[0])
    elif ctx.feats_fn is not None:
        out["lpips"] = float(M.lpips_like(ctx.feats_fn, pred_img, target_img)[0])

    if ctx.estimator_fn is not None:
        from gazenerf_tpu.models.vgg import normalize_imagenet
        from gazenerf_tpu.ops.image import resize_bilinear
        from gazenerf_tpu.ops.rotation import (
            angular_error_deg,
            pitchyaw_to_vector,
        )

        if ctx.normalizer is not None:
            # the reference warps BOTH images through the target's camera +
            # landmarks before the estimator (metrics_utils.py:265-283,299-313);
            # with no calibration files, degrade to the h5-stored intrinsics
            # and zero distortion
            if ctx.cam_lookup is not None:
                cam_K, cam_d = ctx.cam_lookup(
                    int(np.asarray(tgt["cam_index"]).reshape(-1)[0])
                )
            else:
                cam_K = np.asarray(tgt["inmat"])[0]
                cam_d = np.zeros((5, 1))
            lm68 = np.asarray(tgt["landmarks"])[0]
            gt_in = ctx.normalizer(np.asarray(target_img[0]), lm68, cam_K, cam_d)
            pr_in = ctx.normalizer(np.asarray(pred_img[0]), lm68, cam_K, cam_d)
            gt_in = jnp.asarray(gt_in)[None]
            pr_in = jnp.asarray(pr_in)[None]
        else:
            gt_in = resize_bilinear(target_img, (224, 224))
            pr_in = resize_bilinear(pred_img, (224, 224))
        g_gt, h_gt = ctx.estimator_fn(normalize_imagenet(gt_in))
        g_pr, h_pr = ctx.estimator_fn(normalize_imagenet(pr_in))
        out["gaze_angular_deg"] = float(
            jnp.mean(angular_error_deg(
                pitchyaw_to_vector(g_gt), pitchyaw_to_vector(g_pr)
            ))
        )
        out["head_angular_deg"] = float(
            jnp.mean(angular_error_deg(
                pitchyaw_to_vector(h_gt), pitchyaw_to_vector(h_pr)
            ))
        )

    if ctx.identity_pipeline is not None:
        # reference: 224-resized uint8 RGB pairs through the FaceX-Zoo
        # pipeline; any failure scores -0.1 (metrics_utils.py:327-340)
        try:
            out["identity_similarity"] = float(
                ctx.identity_pipeline(
                    _resize224_u8(target_img), _resize224_u8(pred_img)
                )
            )
        except Exception:
            out["identity_similarity"] = -0.1
    elif ctx.embed_fn is not None:
        out["identity_similarity"] = float(
            M.identity_similarity(ctx.embed_fn, pred_img, target_img)[0]
        )
    return out


def evaluate_input_target_images(
    ctx: EvalContext,
    pairs: List[Dict[str, Dict[str, np.ndarray]]],
) -> Dict[str, float]:
    """``pairs``: list of {"input": batch, "target": batch} single-sample dicts
    (build them from a target-mode loader with :func:`split_target_batch`).

    Reference pipeline per pair (utils/metrics_utils.py:137-402): few-shot
    fit on the input image; re-render with the target's camera + gaze;
    nonhead-whiten the GT; nan_to_num(pred, nan=1.0); quality metrics at
    full res; gaze/head angular through the normalization + frozen
    estimator; identity via the FaceX-Zoo pipeline at 224; FID between the
    collected whitened-GT and prediction sets.
    """
    per_pair = []
    gt_images, pred_images = [], []
    pred_feats, tgt_feats = [], []
    for pair in pairs:
        inp = _single(pair["input"])
        tgt = _single(pair["target"])
        # personalize on the input image from the SAME base checkpoint
        fitted, _ = ctx.fit(ctx.base_state, inp)
        # re-render with the target's camera + gaze
        pred = ctx.predict(fitted, tgt)
        pred = jnp.nan_to_num(pred, nan=1.0)  # reference guard :295
        # nonhead region of the GT forced to white (reference :257-263)
        hm = tgt["head_mask"][..., None]
        gt = jnp.where(
            jnp.broadcast_to(hm < 0.5, tgt["image"].shape), 1.0, tgt["image"]
        )
        m = _pair_metrics(ctx, pred, gt, tgt)
        per_pair.append(m)
        if ctx.fid_feats_fn is not None:
            gt_images.append(np.asarray(gt[0]))
            pred_images.append(np.asarray(pred[0]))
        elif ctx.feats_fn is not None:
            pf = ctx.feats_fn(pred)[-1]
            tf = ctx.feats_fn(gt)[-1]
            pred_feats.append(np.asarray(pf).reshape(pf.shape[0], -1).mean(0))
            tgt_feats.append(np.asarray(tf).reshape(tf.shape[0], -1).mean(0))

    result = {
        k: float(np.mean([m[k] for m in per_pair])) for k in per_pair[0]
    }
    if len(gt_images) >= 2:
        result["fid"] = M.fid(ctx.fid_feats_fn, gt_images, pred_images)
    elif len(pred_feats) >= 2:
        result["fid"] = M.frechet_distance(
            np.stack(pred_feats), np.stack(tgt_feats)
        )
    result["num_pairs"] = len(per_pair)
    return result


def evaluate_personal_calibration(
    ctx: EvalContext,
    calibration_batches: List[Dict[str, np.ndarray]],
    synthesis_batches: List[Dict[str, np.ndarray]],
    gaze_grid: Optional[List[List[float]]] = None,
) -> Dict[str, object]:
    """Fit on the calibration images, synthesize redirected views of the rest
    (reference :407-591 writes them to an h5 for estimator fine-tuning; we
    return the rendered set and let the caller persist it)."""
    state = ctx.base_state
    for b in calibration_batches:
        state, _ = ctx.fit(state, _single(b))
    if gaze_grid is None:
        gaze_grid = [[p / 10.0, y / 10.0] for p in range(-2, 3) for y in range(-2, 3)]
    rendered = []
    for b in synthesis_batches:
        sb = _single(b)
        for gz in gaze_grid:
            img = ctx.predict(state, sb, jnp.asarray(gz, jnp.float32))
            rendered.append(
                {"image": np.asarray(img[0]), "gaze": np.asarray(gz, np.float32)}
            )
    return {"rendered": rendered, "state": state}


def evaluate_consistency(
    ctx: EvalContext,
    batches: List[Dict[str, np.ndarray]],
    pitch_shifts_deg=(5.0, 10.0, 15.0, 20.0),
) -> Dict[str, float]:
    """Shift fitted gaze pitch by +5..20 deg; the estimator's measured shift
    should track the commanded shift (reference :594-766)."""
    results = {f"shift_{int(s)}deg_response": [] for s in pitch_shifts_deg}
    for b in batches:
        sb = _single(b)
        fitted, _ = ctx.fit(ctx.base_state, sb)
        base_gaze = np.asarray(sb["pitchyaw"][0])
        base_img = ctx.predict(fitted, sb)
        for s in pitch_shifts_deg:
            gz = base_gaze + np.array([np.deg2rad(s), 0.0], np.float32)
            img = ctx.predict(fitted, sb, jnp.asarray(gz))
            if ctx.estimator_fn is not None:
                g0, _ = ctx.estimator_fn(base_img)
                g1, _ = ctx.estimator_fn(img)
                measured = float(np.rad2deg(np.asarray(g1 - g0)[0, 0]))
            else:
                measured = float(np.abs(np.asarray(img - base_img)).mean())
            results[f"shift_{int(s)}deg_response"].append(measured)
    return {k: float(np.mean(v)) for k, v in results.items()}


def evaluate_gaze_transfer(
    ctx: EvalContext,
    source_batch: Dict[str, np.ndarray],
    target_batch: Dict[str, np.ndarray],
) -> Dict[str, object]:
    """Optimize the gaze code on subject A, render it on subject B
    (reference :768-889)."""
    src = _single(source_batch)
    tgt = _single(target_batch)
    fitted_src, _ = ctx.fit(ctx.base_state, src)
    gaze, loss, steps = ctx.optimize_gaze(
        fitted_src, src, jnp.zeros(2, jnp.float32)
    )
    fitted_tgt, _ = ctx.fit(ctx.base_state, tgt)
    transferred = ctx.predict(fitted_tgt, tgt, gaze)
    return {
        "gaze": np.asarray(gaze),
        "opt_loss": float(loss),
        "opt_steps": int(steps),
        "transferred_image": np.asarray(transferred[0]),
    }
