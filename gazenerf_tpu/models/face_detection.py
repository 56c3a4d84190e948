"""RetinaFace face detector (flax, NHWC) + anchor decode + NMS.

TPU-framework port of the reference's FaceX-Zoo detection stage
(reference: face_recognition/models/network_def/retinaface_def.py:16-242,
handler face_recognition/core/model_handler/face_detection/
FaceDetModelHandler.py:22-198): a MobileNetV1(x0.25) backbone feeding a
3-level FPN, SSH context modules, and 1x1 class/bbox/landmark heads over
anchor grids.  Anchor generation (PriorBox), box decoding and NMS follow the
handler exactly; they run in NumPy on host (tiny work, data-dependent
shapes — not jit material).

Inference-only (BatchNorm running stats); weights via
:func:`retinaface_params_from_torch`.  The anchor/row ordering of the NHWC
heads matches the torch ``permute(0,2,3,1).view(B,-1,C)`` layout natively.
"""

from __future__ import annotations

import math
from itertools import product
from typing import Dict, List, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# detector config (reference face_recognition/models/face_detection/
# face_detection_1.0/model_meta.json); in/out channels below follow the
# MobileNetV1 network_def (stages emit 64/128/256 = 32*(2,4,8))
DET_CFG = {
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "confidence_threshold": 0.7,
    "nms_threshold": 0.2,
}


class ConvBN(nn.Module):
    """conv + BN + optional leaky ReLU (reference retinaface_def.py:16-34)."""

    out: int
    kernel: int = 3
    stride: int = 1
    leaky: float = 0.0
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.out, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=((p, p), (p, p)), use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn")(x)
        if self.relu:
            x = nn.leaky_relu(x, negative_slope=self.leaky)
        return x


class ConvDW(nn.Module):
    """depthwise 3x3 + pointwise 1x1, both BN+leaky(0.1)
    (reference retinaface_def.py:36-45)."""

    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        x = nn.Conv(
            cin, (3, 3), (self.stride, self.stride), padding=((1, 1), (1, 1)),
            feature_group_count=cin, use_bias=False, name="dw",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Conv(self.out, (1, 1), use_bias=False, name="pw")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn2")(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class MobileNetV1(nn.Module):
    """x0.25 MobileNetV1 backbone; returns the three stage features
    (reference retinaface_def.py:107-141)."""

    @nn.compact
    def __call__(self, x):
        x = ConvBN(8, 3, 2, leaky=0.1, name="stage1_0")(x)
        x = ConvDW(16, 1, name="stage1_1")(x)
        x = ConvDW(32, 2, name="stage1_2")(x)
        x = ConvDW(32, 1, name="stage1_3")(x)
        x = ConvDW(64, 2, name="stage1_4")(x)
        s1 = ConvDW(64, 1, name="stage1_5")(x)
        x = ConvDW(128, 2, name="stage2_0")(s1)
        for i in range(1, 6):
            x = ConvDW(128, 1, name=f"stage2_{i}")(x)
        s2 = x
        x = ConvDW(256, 2, name="stage3_0")(s2)
        s3 = ConvDW(256, 1, name="stage3_1")(x)
        return s1, s2, s3


class SSH(nn.Module):
    """SSH context module (reference retinaface_def.py:48-75)."""

    out: int

    @nn.compact
    def __call__(self, x):
        leaky = 0.1 if self.out <= 64 else 0.0
        c3 = ConvBN(self.out // 2, 3, 1, relu=False, name="conv3X3")(x)
        c5_1 = ConvBN(self.out // 4, 3, 1, leaky=leaky, name="conv5X5_1")(x)
        c5 = ConvBN(self.out // 4, 3, 1, relu=False, name="conv5X5_2")(c5_1)
        c7_2 = ConvBN(self.out // 4, 3, 1, leaky=leaky, name="conv7X7_2")(c5_1)
        c7 = ConvBN(self.out // 4, 3, 1, relu=False, name="conv7x7_3")(c7_2)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    """3-level FPN with nearest-neighbour top-down merge
    (reference retinaface_def.py:76-105)."""

    out: int

    @nn.compact
    def __call__(self, feats):
        leaky = 0.1 if self.out <= 64 else 0.0
        o1 = ConvBN(self.out, 1, 1, leaky=leaky, name="output1")(feats[0])
        o2 = ConvBN(self.out, 1, 1, leaky=leaky, name="output2")(feats[1])
        o3 = ConvBN(self.out, 1, 1, leaky=leaky, name="output3")(feats[2])

        def up_nearest(x, hw):
            B, h, w, C = x.shape
            ry = np.minimum((np.arange(hw[0]) * h // hw[0]), h - 1)
            rx = np.minimum((np.arange(hw[1]) * w // hw[1]), w - 1)
            return x[:, ry][:, :, rx]

        o2 = o2 + up_nearest(o3, o2.shape[1:3])
        o2 = ConvBN(self.out, 3, 1, leaky=leaky, name="merge2")(o2)
        o1 = o1 + up_nearest(o2, o1.shape[1:3])
        o1 = ConvBN(self.out, 3, 1, leaky=leaky, name="merge1")(o1)
        return [o1, o2, o3]


class RetinaFace(nn.Module):
    """Backbone + FPN + SSH + anchor heads (reference retinaface_def.py:178-242).

    Returns ``(bbox [B,N,4], scores [B,N,2] softmaxed, ldm [B,N,10])``.
    """

    out_channel: int = 64
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x):
        feats = MobileNetV1(name="body")(x)
        fpn = FPN(self.out_channel, name="fpn")(feats)
        f1 = SSH(self.out_channel, name="ssh1")(fpn[0])
        f2 = SSH(self.out_channel, name="ssh2")(fpn[1])
        f3 = SSH(self.out_channel, name="ssh3")(fpn[2])

        def head(feat, i, ch, name):
            B = feat.shape[0]
            out = nn.Conv(self.num_anchors * ch, (1, 1), name=f"{name}_{i}")(feat)
            return out.reshape(B, -1, ch)

        feats3 = [f1, f2, f3]
        bbox = jnp.concatenate(
            [head(f, i, 4, "BboxHead") for i, f in enumerate(feats3)], axis=1
        )
        cls = jnp.concatenate(
            [head(f, i, 2, "ClassHead") for i, f in enumerate(feats3)], axis=1
        )
        ldm = jnp.concatenate(
            [head(f, i, 10, "LandmarkHead") for i, f in enumerate(feats3)], axis=1
        )
        return bbox, jax.nn.softmax(cls, axis=-1), ldm


def prior_boxes(
    image_size: Tuple[int, int],
    min_sizes: Sequence[Sequence[int]] = DET_CFG["min_sizes"],
    steps: Sequence[int] = DET_CFG["steps"],
) -> np.ndarray:
    """Anchor centers/sizes in normalized coords, handler order
    (reference FaceDetModelHandler.py:161-198)."""
    anchors: List[float] = []
    fmaps = [
        (math.ceil(image_size[0] / s), math.ceil(image_size[1] / s)) for s in steps
    ]
    for k, f in enumerate(fmaps):
        for i, j in product(range(f[0]), range(f[1])):
            for ms in min_sizes[k]:
                s_kx = ms / image_size[1]
                s_ky = ms / image_size[0]
                cx = (j + 0.5) * steps[k] / image_size[1]
                cy = (i + 0.5) * steps[k] / image_size[0]
                anchors += [cx, cy, s_kx, s_ky]
    return np.asarray(anchors, np.float32).reshape(-1, 4)


def decode_boxes(
    loc: np.ndarray, priors: np.ndarray, variances=DET_CFG["variance"]
) -> np.ndarray:
    """Undo the SSD offset encoding (reference FaceDetModelHandler.py:108-128)."""
    xy = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * variances[1])
    x1y1 = xy - wh / 2
    return np.concatenate([x1y1, x1y1 + wh], axis=1)


def nms(dets: np.ndarray, thresh: float) -> List[int]:
    """Greedy IoU NMS (reference FaceDetModelHandler.py:131-158)."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep: List[int] = []
    while order.size > 0:
        i = int(order[0])
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


class RetinaFaceDetector:
    """End-to-end detector: preprocess -> net -> decode -> NMS.

    ``img``: [H, W, 3] uint8/float BGR (cv2 convention, like the reference
    handler).  Returns ``[N, 5]`` (x1, y1, x2, y2, score).
    """

    def __init__(self, variables=None, cfg: Dict = DET_CFG):
        self.net = RetinaFace()
        self.variables = variables
        self.cfg = cfg
        if variables is not None:
            self._apply = jax.jit(lambda img: self.net.apply(self.variables, img))

    @property
    def available(self) -> bool:
        return self.variables is not None

    def __call__(self, img: np.ndarray) -> np.ndarray:
        assert self.available, "RetinaFaceDetector needs transplanted weights"
        h, w = img.shape[:2]
        x = np.float32(img) - (104.0, 117.0, 123.0)  # BGR means (handler :72)
        loc, conf, _ = self._apply(jnp.asarray(x)[None])
        loc = np.asarray(loc)[0]
        scores = np.asarray(conf)[0][:, 1]
        priors = prior_boxes((h, w), self.cfg["min_sizes"], self.cfg["steps"])
        boxes = decode_boxes(loc, priors, self.cfg["variance"])
        boxes = boxes * np.array([w, h, w, h], np.float32)
        inds = scores > self.cfg["confidence_threshold"]
        boxes, scores = boxes[inds], scores[inds]
        order = scores.argsort()[::-1]
        dets = np.hstack([boxes[order], scores[order, None]]).astype(np.float32)
        return dets[nms(dets, self.cfg["nms_threshold"])]


# ---------------------------------------------------------------------------
# torch weight transplant


def _conv_k(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _bn(sd, pfx):
    return (
        {"scale": np.asarray(sd[f"{pfx}.weight"]), "bias": np.asarray(sd[f"{pfx}.bias"])},
        {
            "mean": np.asarray(sd[f"{pfx}.running_mean"]),
            "var": np.asarray(sd[f"{pfx}.running_var"]),
        },
    )


def retinaface_params_from_torch(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``RetinaFace().state_dict()`` -> flax {params, batch_stats}."""
    params: Dict = {}
    stats: Dict = {}

    def conv_bn(dst, t_conv, t_bn):
        p, s = _bn(sd, t_bn)
        params_sub = {
            "conv": {"kernel": _conv_k(sd[f"{t_conv}.weight"])},
            "bn": p,
        }
        stats_sub = {"bn": s}
        params[dst] = params_sub
        stats[dst] = stats_sub

    def conv_dw(dst, t):
        p1, s1 = _bn(sd, f"{t}.1")
        p2, s2 = _bn(sd, f"{t}.4")
        params[dst] = {
            "dw": {"kernel": _conv_k(sd[f"{t}.0.weight"])},
            "bn1": p1,
            "pw": {"kernel": _conv_k(sd[f"{t}.3.weight"])},
            "bn2": p2,
        }
        stats[dst] = {"bn1": s1, "bn2": s2}

    body_p: Dict = {}
    body_s: Dict = {}

    def sub(dst_root, pdict, sdict):
        pdict[dst_root] = params.pop(dst_root)
        sdict[dst_root] = stats.pop(dst_root)

    conv_bn("stage1_0", "body.stage1.0.0", "body.stage1.0.1")
    for i in range(1, 6):
        conv_dw(f"stage1_{i}", f"body.stage1.{i}")
    for i in range(6):
        conv_dw(f"stage2_{i}", f"body.stage2.{i}")
    for i in range(2):
        conv_dw(f"stage3_{i}", f"body.stage3.{i}")
    for name in list(params):
        sub(name, body_p, body_s)

    fpn_p: Dict = {}
    fpn_s: Dict = {}
    for name in ("output1", "output2", "output3", "merge1", "merge2"):
        conv_bn(name, f"fpn.{name}.0", f"fpn.{name}.1")
        sub(name, fpn_p, fpn_s)
    for sshname in ("ssh1", "ssh2", "ssh3"):
        ssh_p: Dict = {}
        ssh_s: Dict = {}
        for name in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2", "conv7x7_3"):
            conv_bn(name, f"{sshname}.{name}.0", f"{sshname}.{name}.1")
            sub(name, ssh_p, ssh_s)
        params[sshname] = ssh_p
        stats[sshname] = ssh_s

    params["body"] = body_p
    stats["body"] = body_s
    params["fpn"] = fpn_p
    stats["fpn"] = fpn_s

    for head in ("ClassHead", "BboxHead", "LandmarkHead"):
        for i in range(3):
            params[f"{head}_{i}"] = {
                "kernel": _conv_k(sd[f"{head}.{i}.conv1x1.weight"]),
                "bias": np.asarray(sd[f"{head}.{i}.conv1x1.bias"]),
            }
    return {"params": params, "batch_stats": stats}
