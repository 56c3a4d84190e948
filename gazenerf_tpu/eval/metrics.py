"""Image-quality and gaze metrics, pure jnp.

TPU ports of the reference's metric suite (reference: utils/metrics_utils.py
via ``piq`` — SSIM/PSNR/LPIPS/FID — plus custom angular + identity metrics,
:315-398).  Everything here is jit-able:

* PSNR, L1, MSE — closed-form.
* SSIM — the standard Gaussian-window formulation (kernel 11, sigma 1.5,
  k1=0.01, k2=0.03), matching piq/skimage defaults.
* LPIPS-style perceptual distance — normalized VGG16 feature-space distance
  (weights pluggable; with transplanted torchvision+LPIPS weights this
  matches the published metric; with any fixed features it is a consistent
  relative metric).
* FID — exact Frechet distance between Gaussian fits of feature sets (the
  feature extractor is pluggable, like piq's ``compute_feats``).
* angular gaze/head error via a pluggable estimator.
* identity similarity — cosine similarity of pluggable face embeddings
  (reference face_recognition/evaluation_similarity.py:16-86).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b), axis=(-3, -2, -1))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over ``[B, H, W, C]`` images (Gaussian window, valid pad)."""
    k = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    C = a.shape[-1]
    kern = jnp.broadcast_to(k[..., None, None], (kernel_size, kernel_size, 1, C))

    def filt(x):
        # precision MUST be highest: TPU's default bf16-3pass conv makes the
        # windowed moments cancel catastrophically on near-flat regions
        # (filt(a*a) - mu^2 noise ~1e-2 >> c2=9e-4), flipping denominator
        # signs — measured SSIM 6.3 on in-range whitened eval images
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = filt(a * a) - mu_a2
    sig_b = filt(b * b) - mu_b2
    sig_ab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sig_a + sig_b + c2)
    )
    return jnp.mean(s, axis=(-3, -2, -1))


def lpips_like(
    feats_fn: Callable, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Perceptual distance: mean squared difference of unit-normalized
    feature maps across capture layers (the LPIPS formulation with uniform
    layer weights)."""
    fa, fb = feats_fn(a), feats_fn(b)
    total = 0.0
    for x, y in zip(fa, fb):
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)
        total = total + jnp.mean(jnp.sum((xn - yn) ** 2, axis=-1), axis=(-2, -1))
    return total


# LPIPS capture points in VGG16: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_CAPTURE = (1, 3, 6, 9, 12)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


def make_lpips_fn(vgg_variables, lin_weights=None, dtype=jnp.float32):
    """Build the exact LPIPS metric (the reference's ``piq.LPIPS()``,
    utils/metrics_utils.py:370).

    Formulation (Zhang et al., the "lin" variant piq ships weights for):
    VGG16 features at the five ReLU capture points, channel-unit-normalized,
    squared difference, a learned non-negative per-channel linear head,
    spatial average, summed over layers.  ``lin_weights`` is a list of five
    ``[C]`` arrays (see :func:`lpips_lin_from_torch`); with ``None`` every
    channel weighs 1.0 — a consistent relative metric, not the published one.
    """
    from gazenerf_tpu.models.vgg import VGG16Features, normalize_imagenet

    vgg = VGG16Features(capture=LPIPS_CAPTURE, dtype=dtype)
    if lin_weights is None:
        lin_weights = [np.ones((c,), np.float32) for c in LPIPS_CHANNELS]
    lin_weights = [jnp.asarray(w).reshape(-1) for w in lin_weights]

    @jax.jit
    def lpips(a, b):
        fa, _ = vgg.apply(vgg_variables, normalize_imagenet(a.astype(dtype)))
        fb, _ = vgg.apply(vgg_variables, normalize_imagenet(b.astype(dtype)))
        total = 0.0
        for x, y, w in zip(fa, fb, lin_weights):
            xn = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
            yn = y * jax.lax.rsqrt(jnp.sum(y * y, axis=-1, keepdims=True) + 1e-10)
            d2 = (xn - yn) ** 2
            total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(-2, -1))
        return total.astype(jnp.float32)

    return lpips


def lpips_lin_from_torch(sd) -> list:
    """Official LPIPS "lin" head state dict -> list of five ``[C]`` arrays.

    Accepts the original repo's ``lin{i}.model.1.weight`` ([1,C,1,1]) keys,
    piq's list-of-tensors weight file, or any dict whose values are the five
    heads in layer order.
    """
    if isinstance(sd, (list, tuple)):
        return [np.asarray(w).reshape(-1) for w in sd]
    keys = sorted(k for k in sd if k.endswith("weight"))
    return [np.asarray(sd[k]).reshape(-1) for k in keys]


def fid(
    feats_fn: Callable,
    images_a,
    images_b,
    batch_size: int = 8,
) -> float:
    """FID between two image sets via pluggable feature extractor.

    With ``feats_fn`` from ``models.inception.make_fid_features_fn`` on
    transplanted weights this is the reference's ``calculate_FID``
    (utils/metrics_utils.py:101-105: piq ``FID().compute_feats`` ==
    InceptionV3 pool3 features + exact Frechet distance).
    """

    def run(images):
        out = []
        for i in range(0, len(images), batch_size):
            chunk = jnp.stack([jnp.asarray(im) for im in images[i : i + batch_size]])
            out.append(np.asarray(feats_fn(chunk)))
        return np.concatenate(out, 0)

    return frechet_distance(run(images_a), run(images_b))


def frechet_distance(
    feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6
) -> float:
    """FID between two feature sets ``[N, D]`` (exact, via scipy sqrtm)."""
    import scipy.linalg

    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False)
    s2 = np.cov(feats_b, rowvar=False)
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(s1 @ s2)
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((s1 + offset) @ (s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def identity_similarity(
    embed_fn: Callable, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Cosine similarity of face embeddings (reference
    face_recognition/evaluation_similarity.py:70-86 uses the dot product of
    L2-normalized MobileFaceNet embeddings)."""
    ea, eb = embed_fn(a), embed_fn(b)
    ea = ea / jnp.maximum(jnp.linalg.norm(ea, axis=-1, keepdims=True), 1e-8)
    eb = eb / jnp.maximum(jnp.linalg.norm(eb, axis=-1, keepdims=True), 1e-8)
    return jnp.sum(ea * eb, axis=-1)


def gaze_and_head_error(
    estimator_fn: Callable,
    pred_img: jnp.ndarray,
    gt_img: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Angular gaze + head-pose error (deg) from a frozen estimator.

    ``estimator_fn(img) -> (gaze_pitchyaw, head_pitchyaw)`` (the reference
    uses a frozen ResNet50 — evaluate_metrics.py:131-136)."""
    from gazenerf_tpu.ops.rotation import angular_error_deg, pitchyaw_to_vector

    g_pred, h_pred = estimator_fn(pred_img)
    g_gt, h_gt = estimator_fn(gt_img)
    gaze_err = angular_error_deg(
        pitchyaw_to_vector(g_gt), pitchyaw_to_vector(g_pred)
    )
    head_err = angular_error_deg(
        pitchyaw_to_vector(h_gt), pitchyaw_to_vector(h_pred)
    )
    return gaze_err, head_err
