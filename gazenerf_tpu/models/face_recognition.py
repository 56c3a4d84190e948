"""Face-recognition stack for identity-similarity evaluation, NHWC flax.

TPU port of the reference's FaceX-Zoo pipeline
(reference: face_recognition/evaluation_similarity.py:16-86 — RetinaFace
detect -> PFLD align -> MobileFaceNet embed -> dot product of normalized
embeddings; net defs face_recognition/models/network_def/mobilefacenet_def.py).

The embedding backbone is an EXACT flax mirror of the reference
``MobileFaceNet`` (mobilefacenet_def.py:64-93: PReLU conv blocks, depthwise
bottlenecks with expand groups, global 7x7 depthwise, 512-d linear + BN1d +
l2-norm) so FaceX-Zoo checkpoints transplant via
:func:`mobilefacenet_from_torch`.  Detection/alignment are optional for our
evaluation inputs: the framework's rendered faces are already normalized
crops, so :func:`make_identity_embed_fn` resizes to 112 and embeds directly;
random weights still give a consistent relative metric.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.ops.image import resize_bilinear


def _prelu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


class ConvBlock(nn.Module):
    """conv + BN + per-channel PReLU (reference mobilefacenet_def.py:15-25)."""

    out: int
    kernel: tuple = (1, 1)
    stride: tuple = (1, 1)
    padding: tuple = (0, 0)
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out, self.kernel, self.stride,
            padding=tuple((p, p) for p in self.padding),
            feature_group_count=self.groups, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        slope = self.param("prelu", nn.initializers.constant(0.25), (self.out,))
        return _prelu(x, slope)


class LinearBlock(nn.Module):
    """conv + BN, no activation (reference mobilefacenet_def.py:26-34)."""

    out: int
    kernel: tuple = (1, 1)
    stride: tuple = (1, 1)
    padding: tuple = (0, 0)
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out, self.kernel, self.stride,
            padding=tuple((p, p) for p in self.padding),
            feature_group_count=self.groups, use_bias=False, name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)


class DepthWise(nn.Module):
    """pw-expand -> dw -> pw-project (reference mobilefacenet_def.py:35-53)."""

    out: int
    groups: int
    stride: tuple = (2, 2)
    residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBlock(self.groups, name="conv")(x, train)
        y = ConvBlock(
            self.groups, kernel=(3, 3), stride=self.stride, padding=(1, 1),
            groups=self.groups, name="conv_dw",
        )(y, train)
        y = LinearBlock(self.out, name="project")(y, train)
        return x + y if self.residual else y


class MobileFaceNet(nn.Module):
    """512-d face embedding from 112x112 aligned crops — exact mirror of the
    reference net (mobilefacenet_def.py:64-93), including the final l2-norm.
    """

    embedding_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(64, (3, 3), (2, 2), (1, 1), name="conv1")(x, train)
        x = ConvBlock(64, (3, 3), (1, 1), (1, 1), groups=64, name="conv2_dw")(x, train)
        x = DepthWise(64, groups=128, name="conv_23")(x, train)
        for i in range(4):
            x = DepthWise(64, groups=128, stride=(1, 1), residual=True,
                          name=f"conv_3_{i}")(x, train)
        x = DepthWise(128, groups=256, name="conv_34")(x, train)
        for i in range(6):
            x = DepthWise(128, groups=256, stride=(1, 1), residual=True,
                          name=f"conv_4_{i}")(x, train)
        x = DepthWise(128, groups=512, name="conv_45")(x, train)
        for i in range(2):
            x = DepthWise(128, groups=256, stride=(1, 1), residual=True,
                          name=f"conv_5_{i}")(x, train)
        x = ConvBlock(512, name="conv_6_sep")(x, train)
        x = LinearBlock(
            512, kernel=(x.shape[1], x.shape[2]), groups=512, name="conv_6_dw"
        )(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.embedding_dim, use_bias=False, name="linear")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_scale=True, use_bias=True, name="bn",
        )(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def mobilefacenet_from_torch(sd) -> dict:
    """Reference ``MobileFaceNet(512, 7, 7).state_dict()`` -> flax variables."""
    params: dict = {}
    stats: dict = {}

    def conv_k(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    def conv_block(dst, t):
        p = {
            "conv": {"kernel": conv_k(sd[f"{t}.conv.weight"])},
            "bn": {
                "scale": np.asarray(sd[f"{t}.bn.weight"]),
                "bias": np.asarray(sd[f"{t}.bn.bias"]),
            },
            "prelu": np.asarray(sd[f"{t}.prelu.weight"]),
        }
        s = {"bn": {
            "mean": np.asarray(sd[f"{t}.bn.running_mean"]),
            "var": np.asarray(sd[f"{t}.bn.running_var"]),
        }}
        params[dst] = p
        stats[dst] = s

    def linear_block(dst, t):
        params[dst] = {
            "conv": {"kernel": conv_k(sd[f"{t}.conv.weight"])},
            "bn": {
                "scale": np.asarray(sd[f"{t}.bn.weight"]),
                "bias": np.asarray(sd[f"{t}.bn.bias"]),
            },
        }
        stats[dst] = {"bn": {
            "mean": np.asarray(sd[f"{t}.bn.running_mean"]),
            "var": np.asarray(sd[f"{t}.bn.running_var"]),
        }}

    def depth_wise(dst, t):
        sub_p: dict = {}
        sub_s: dict = {}
        hold_p, hold_s = dict(params), dict(stats)
        params.clear(); stats.clear()
        conv_block("conv", f"{t}.conv")
        conv_block("conv_dw", f"{t}.conv_dw")
        linear_block("project", f"{t}.project")
        sub_p.update(params); sub_s.update(stats)
        params.clear(); params.update(hold_p)
        stats.clear(); stats.update(hold_s)
        params[dst] = sub_p
        stats[dst] = sub_s

    conv_block("conv1", "conv1")
    conv_block("conv2_dw", "conv2_dw")
    depth_wise("conv_23", "conv_23")
    for i in range(4):
        depth_wise(f"conv_3_{i}", f"conv_3.model.{i}")
    depth_wise("conv_34", "conv_34")
    for i in range(6):
        depth_wise(f"conv_4_{i}", f"conv_4.model.{i}")
    depth_wise("conv_45", "conv_45")
    for i in range(2):
        depth_wise(f"conv_5_{i}", f"conv_5.model.{i}")
    conv_block("conv_6_sep", "conv_6_sep")
    linear_block("conv_6_dw", "conv_6_dw")
    params["linear"] = {"kernel": np.asarray(sd["linear.weight"]).T}
    params["bn"] = {
        "scale": np.asarray(sd["bn.weight"]),
        "bias": np.asarray(sd["bn.bias"]),
    }
    stats["bn"] = {
        "mean": np.asarray(sd["bn.running_mean"]),
        "var": np.asarray(sd["bn.running_var"]),
    }
    return {"params": params, "batch_stats": stats}


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
        """[H, W, 3] uint8 BGR -> [1, 112, 112, 3] float BGR in [0, 1].

        The reference feeds the cv2 (BGR) crop directly to MobileFaceNet
        with (x - 127.5) / 128 scaling (FaceRecModelHandler.py:69,
        model_meta mean=127.5 std=128) — channel order preserved here so
        transplanted embeddings match.
        """
        import cv2

        crop = None
        if self.detector is not None and self.detector.available:
            dets = self.detector(img)
            if len(dets) and self.aligner is not None and self.aligner.available:
                lms = self.aligner(img, dets[0])
                crop = arcface_crop(img, lms)
        if crop is None:
            crop = cv2.resize(img, (112, 112))
        return crop.astype(np.float32)[None] / 255.0

    def __call__(self, img_a: np.ndarray, img_b: np.ndarray) -> float:
        ea = np.array(self.embed_fn(jnp.asarray(self._prep(img_a))))[0]
        eb = np.array(self.embed_fn(jnp.asarray(self._prep(img_b))))[0]
        ea = ea / max(np.linalg.norm(ea), 1e-8)
        eb = eb / max(np.linalg.norm(eb), 1e-8)
        return float(ea @ eb)
