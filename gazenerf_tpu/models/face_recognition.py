"""Face-recognition stack for identity-similarity evaluation, NHWC flax.

TPU port of the reference's FaceX-Zoo pipeline
(reference: face_recognition/evaluation_similarity.py:16-86 — RetinaFace
detect -> PFLD align -> MobileFaceNet embed -> dot product of normalized
embeddings; net defs face_recognition/models/network_def/mobilefacenet_def.py).

The embedding backbone here is the MobileFaceNet architecture (depthwise-
separable bottlenecks + global depthwise conv + 512-d linear embedding).
Detection/alignment are unnecessary for our evaluation inputs: the
framework's rendered faces are already normalized crops (the reference also
feeds aligned 112x112 crops), so :func:`make_identity_embed_fn` resizes to
112 and embeds directly.  Transplanted weights give parity with the
reference metric; random weights still give a consistent relative metric.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.ops.image import resize_bilinear


class DWBottleneck(nn.Module):
    """MobileFaceNet bottleneck: pw-expand -> dw 3x3 -> pw-project (+res)."""

    out_ch: int
    expand: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )
        mid = self.expand
        y = nn.Conv(mid, (1, 1), use_bias=False)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(
            mid, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=mid, use_bias=False,
        )(y)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False)(y)
        y = bn()(y)
        if self.stride == 1 and x.shape[-1] == self.out_ch:
            y = y + x
        return y


class MobileFaceNet(nn.Module):
    """512-d face embedding from 112x112 aligned crops."""

    embedding_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False)(x)
        x = nn.relu(bn()(x))
        x = nn.Conv(64, (3, 3), padding=1, feature_group_count=64, use_bias=False)(x)
        x = nn.relu(bn()(x))
        # (expand, out, stride, repeats) — MobileFaceNet schedule
        for expand, out, stride, n in [
            (128, 64, 2, 5),
            (256, 128, 2, 1),
            (256, 128, 1, 6),
            (512, 128, 2, 1),
            (256, 128, 1, 2),
        ]:
            for i in range(n):
                x = DWBottleneck(out, expand, stride if i == 0 else 1)(x, train)
        x = nn.Conv(512, (1, 1), use_bias=False)(x)
        x = nn.relu(bn()(x))
        # global depthwise conv: 7x7 valid
        x = nn.Conv(
            512, (x.shape[1], x.shape[2]), padding="VALID",
            feature_group_count=512, use_bias=False,
        )(x)
        x = bn()(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.embedding_dim, use_bias=False)(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_scale=True, use_bias=True,
        )(x)


def make_identity_embed_fn(variables=None, rng: Optional[jax.Array] = None) -> Callable:
    """Returns ``img [B,H,W,3] in [0,1] -> embedding [B, 512]`` (jitted).

    Plug into :func:`gazenerf_tpu.eval.metrics.identity_similarity` /
    ``EvalContext.embed_fn``.
    """
    net = MobileFaceNet()
    if variables is None:
        rng = jax.random.PRNGKey(0) if rng is None else rng
        variables = net.init(rng, jnp.zeros((1, 112, 112, 3)))

    @jax.jit
    def embed(img):
        x = resize_bilinear(img, (112, 112))
        x = (x - 0.5) / 0.5  # [-1, 1] (FaceX-Zoo preprocessing)
        return net.apply(variables, x)

    return embed


# ---------------------------------------------------------------------------
# Full FaceX-Zoo pipeline: detect -> align -> arcface-crop -> embed
# (reference face_recognition/evaluation_similarity.py:16-86)

# 106-landmark ids of the 5 arcface alignment points (reference
# face_recognition/utils/lms_trans.py lms5_2_lms106, 1-based -> 0-based)
LMS5_FROM_106 = (104, 105, 54, 84, 90)

# arcface 112x112 reference points (reference
# face_recognition/core/image_cropper/arcface_cropper/FaceRecImageCropper.py)
ARCFACE_SRC = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    np.float32,
)


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform src -> dst, ``[2, 3]``.

    NumPy implementation of the Umeyama (1991) estimate the reference gets
    from ``skimage.transform.SimilarityTransform`` (FaceRecImageCropper.py).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n, d = src.shape
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / n
    U, S, Vt = np.linalg.svd(cov)
    sgn = np.ones(d)
    if np.linalg.det(cov) < 0:
        sgn[-1] = -1
    R = U @ np.diag(sgn) @ Vt
    var_s = (sc**2).sum() / n
    scale = (S * sgn).sum() / max(var_s, 1e-12)
    t = mu_d - scale * R @ mu_s
    M = np.zeros((2, 3))
    M[:, :2] = scale * R
    M[:, 2] = t
    return M.astype(np.float32)


def arcface_crop(img: np.ndarray, lms106: np.ndarray, out_size: int = 112):
    """Warp to the arcface 112x112 template from 106 landmarks
    (reference FaceRecImageCropper.crop_image_by_mat)."""
    import cv2

    lm5 = np.asarray(lms106, np.float32).reshape(-1, 2)[list(LMS5_FROM_106)]
    M = umeyama_similarity(lm5, ARCFACE_SRC)
    return cv2.warpAffine(img, M, (out_size, out_size), borderValue=0.0)


class IdentitySimilarityPipeline:
    """RetinaFace detect -> PFLD align -> arcface crop -> MobileFaceNet embed
    -> dot product (reference evaluation_similarity.py:16-86).

    Any stage without transplanted weights degrades gracefully: detection
    falls back to the full frame, alignment to a direct 112x112 resize —
    appropriate for this framework's rendered, pre-normalized crops (the
    path the eval protocols use by default).
    """

    def __init__(self, embed_variables=None, detector=None, aligner=None):
        self.embed_fn = make_identity_embed_fn(embed_variables)
        self.detector = detector
        self.aligner = aligner

    def _prep(self, img: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 BGR -> [1, 112, 112, 3] float RGB in [0, 1]."""
        import cv2

        crop = None
        if self.detector is not None and self.detector.available:
            dets = self.detector(img)
            if len(dets) and self.aligner is not None and self.aligner.available:
                lms = self.aligner(img, dets[0])
                crop = arcface_crop(img, lms)
        if crop is None:
            crop = cv2.resize(img, (112, 112))
        rgb = crop[..., ::-1].astype(np.float32) / 255.0
        return rgb[None]

    def __call__(self, img_a: np.ndarray, img_b: np.ndarray) -> float:
        ea = np.array(self.embed_fn(jnp.asarray(self._prep(img_a))))[0]
        eb = np.array(self.embed_fn(jnp.asarray(self._prep(img_b))))[0]
        ea = ea / max(np.linalg.norm(ea), 1e-8)
        eb = eb / max(np.linalg.norm(eb), 1e-8)
        return float(ea @ eb)
