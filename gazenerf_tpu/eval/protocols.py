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
        )


def _pair_metrics(ctx: EvalContext, pred_img, target_img) -> Dict[str, float]:
    out = {
        "ssim": float(M.ssim(pred_img, target_img)[0]),
        "psnr": float(M.psnr(pred_img, target_img)[0]),
        "l1": float(M.l1(pred_img, target_img)[0]),
    }
    if ctx.feats_fn is not None:
        out["lpips"] = float(M.lpips_like(ctx.feats_fn, pred_img, target_img)[0])
    if ctx.estimator_fn is not None:
        g, h = M.gaze_and_head_error(ctx.estimator_fn, pred_img, target_img)
        out["gaze_angular_deg"] = float(g[0])
        out["head_angular_deg"] = float(h[0])
    if ctx.identity_pipeline is not None:
        def to_bgr_u8(img):
            a = np.clip(np.asarray(img)[0], 0.0, 1.0)
            return (a[..., ::-1] * 255).astype(np.uint8)

        out["identity_similarity"] = float(
            ctx.identity_pipeline(to_bgr_u8(pred_img), to_bgr_u8(target_img))
        )
    elif ctx.embed_fn is not None:
        out["identity_similarity"] = float(
            M.identity_similarity(ctx.embed_fn, pred_img, target_img)[0]
        )
    return out


def evaluate_input_target_images(
    ctx: EvalContext,
    pairs: List[Dict[str, Dict[str, np.ndarray]]],
) -> Dict[str, float]:
    """``pairs``: list of {"input": batch, "target": batch} single-sample dicts.

    Returns mean metrics over all pairs + FID between predicted and target
    sets (reference utils/metrics_utils.py:137-402).
    """
    per_pair = []
    pred_feats, tgt_feats = [], []
    for pair in pairs:
        inp = _single(pair["input"])
        tgt = _single(pair["target"])
        # personalize on the input image from the SAME base checkpoint
        fitted, _ = ctx.fit(ctx.base_state, inp)
        # re-render with the target's camera + gaze
        pred = ctx.predict(fitted, tgt)
        pred = jnp.nan_to_num(pred)  # reference guard :295
        m = _pair_metrics(ctx, pred, tgt["image"])
        per_pair.append(m)
        if ctx.feats_fn is not None:
            pf = ctx.feats_fn(pred)[-1]
            tf = ctx.feats_fn(tgt["image"])[-1]
            pred_feats.append(np.asarray(pf).reshape(pf.shape[0], -1).mean(0))
            tgt_feats.append(np.asarray(tf).reshape(tf.shape[0], -1).mean(0))

    result = {
        k: float(np.mean([m[k] for m in per_pair])) for k in per_pair[0]
    }
    if len(pred_feats) >= 2:
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
