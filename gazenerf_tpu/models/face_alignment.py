"""PFLD 106-point face-landmark net (flax, NHWC) + box-crop handler.

TPU-framework port of the reference's FaceX-Zoo alignment stage
(reference: face_recognition/models/network_def/mobilev3_pfld.py:110-178,
handler face_recognition/core/model_handler/face_alignment/
FaceAlignModelHandler.py:27-110): a MobileNetV3-style backbone (mobile
bottlenecks with squeeze-excite and h-swish) with a 3-scale feature concat
and a 212-d landmark regression head.  The training-only ``AuxiliaryNet``
(pose head, mobilev3_pfld.py:181-195) is intentionally not ported —
inference parity does not need it.

Inference-only (BatchNorm running stats); weights via
:func:`pfld_params_from_torch`.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def hswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class SEModule(nn.Module):
    """Squeeze-excite with h-sigmoid gate (reference mobilev3_pfld.py:43-59)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(c // self.reduction, use_bias=False, name="fc0")(y))
        y = hsigmoid(nn.Dense(c, use_bias=False, name="fc1")(y))
        return x * y[:, None, None, :]


class MobileBottleneck(nn.Module):
    """pw-expand -> dw -> (SE) -> pw-project, residual when shapes match
    (reference mobilev3_pfld.py:70-108).  Note the SE sits BEFORE the second
    activation, matching the torch Sequential order."""

    out: int
    kernel: int
    stride: int
    exp: int
    se: bool = False
    nl: str = "RE"

    @nn.compact
    def __call__(self, x):
        act = nn.relu if self.nl == "RE" else hswish
        cin = x.shape[-1]
        p = (self.kernel - 1) // 2
        y = nn.Conv(self.exp, (1, 1), use_bias=False, name="pw")(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(y)
        y = act(y)
        y = nn.Conv(
            self.exp, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=((p, p), (p, p)), feature_group_count=self.exp,
            use_bias=False, name="dw",
        )(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn2")(y)
        if self.se:
            y = SEModule(name="se")(y)
        y = act(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="pwl")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn3")(y)
        if self.stride == 1 and cin == self.out:
            y = x + y
        return y


class PFLD(nn.Module):
    """106-landmark regressor, input 112x112
    (reference mobilev3_pfld.py:110-178)."""

    n_landmarks: int = 106

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv_bn1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(x)
        x = hswish(x)
        x = MobileBottleneck(16, 3, 1, 16, False, "RE", name="conv_bn2")(x)
        x = MobileBottleneck(24, 3, 2, 64, False, "RE", name="conv3_1")(x)
        x = MobileBottleneck(24, 3, 1, 72, False, "RE", name="block3_2")(x)
        x = MobileBottleneck(40, 5, 2, 72, True, "RE", name="block3_3")(x)
        x = MobileBottleneck(40, 5, 1, 120, True, "RE", name="block3_4")(x)
        out1 = MobileBottleneck(40, 5, 1, 120, True, "RE", name="block3_5")(x)
        x = MobileBottleneck(80, 3, 2, 240, False, "RE", name="conv4_1")(out1)
        x = MobileBottleneck(80, 3, 1, 200, False, "HS", name="conv5_1")(x)
        x = MobileBottleneck(112, 3, 1, 480, True, "HS", name="block5_2")(x)
        x = MobileBottleneck(112, 3, 1, 672, True, "HS", name="block5_3")(x)
        x = MobileBottleneck(160, 3, 1, 672, True, "HS", name="block5_4")(x)
        x = MobileBottleneck(16, 3, 1, 320, False, "HS", name="conv6_1")(x)

        x1 = jnp.mean(x, axis=(1, 2))  # AvgPool2d(14) on [14,14]
        x7 = nn.Conv(32, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                     name="conv7")(x)
        x2 = jnp.mean(x7, axis=(1, 2))  # AvgPool2d(7) on [7,7]
        x8 = nn.Conv(128, (7, 7), padding="VALID", name="conv8")(x7)
        x3 = x8.reshape(x8.shape[0], -1)
        multi = jnp.concatenate([x1, x2, x3], axis=-1)
        return nn.Dense(self.n_landmarks * 2, name="fc")(multi)


class PFLDAligner:
    """Box-crop + PFLD inference, reproducing the reference handler
    (FaceAlignModelHandler.py:34-110): square crop of 1.2x the detection
    box around its center (zero-padded at borders), resize to 112,
    landmarks mapped back to original-image coordinates."""

    img_size: int = 112

    def __init__(self, variables=None):
        self.net = PFLD()
        self.variables = variables
        if variables is not None:
            self._apply = jax.jit(lambda img: self.net.apply(self.variables, img))

    @property
    def available(self) -> bool:
        return self.variables is not None

    def __call__(self, image: np.ndarray, det: np.ndarray) -> np.ndarray:
        """``image`` [H, W, 3] uint8 BGR; ``det`` (x1, y1, x2, y2, ...).

        Returns ``[106, 2]`` landmarks in original-image coordinates.
        """
        import cv2

        assert self.available, "PFLDAligner needs transplanted weights"
        xy = np.array([det[0], det[1]])
        zz = np.array([det[2], det[3]])
        wh = zz - xy + 1
        center = (xy + wh / 2).astype(np.int32)
        boxsize = int(np.max(wh) * 1.2)
        xy = center - boxsize // 2
        x1, y1 = xy
        x2, y2 = xy + boxsize
        h, w = image.shape[:2]
        dx, dy = max(0, -x1), max(0, -y1)
        x1, y1 = max(0, x1), max(0, y1)
        edx, edy = max(0, x2 - w), max(0, y2 - h)
        x2, y2 = min(w, x2), min(h, y2)
        crop = image[y1:y2, x1:x2]
        if dx > 0 or dy > 0 or edx > 0 or edy > 0:
            crop = cv2.copyMakeBorder(crop, dy, edy, dx, edx,
                                      cv2.BORDER_CONSTANT, 0)
        crop = cv2.resize(crop, (self.img_size, self.img_size))
        inp = jnp.asarray(crop.astype(np.float32) / 255.0)[None]
        lm = np.asarray(self._apply(inp)).reshape(-1, 2)
        return lm * boxsize + xy


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


def pfld_params_from_torch(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``PFLDInference().state_dict()`` -> flax {params, batch_stats}."""
    params: Dict = {}
    stats: Dict = {}

    params["conv_bn1"] = {"kernel": _conv_k(sd["conv_bn1.0.weight"])}
    params["bn1"], s = _bn(sd, "conv_bn1.1")
    stats["bn1"] = s

    blocks = [
        "conv_bn2", "conv3_1", "block3_2", "block3_3", "block3_4", "block3_5",
        "conv4_1", "conv5_1", "block5_2", "block5_3", "block5_4", "conv6_1",
    ]
    se_blocks = {"block3_3", "block3_4", "block3_5", "block5_2", "block5_3",
                 "block5_4"}
    for b in blocks:
        p1, s1 = _bn(sd, f"{b}.conv.1")
        p2, s2 = _bn(sd, f"{b}.conv.4")
        p3, s3 = _bn(sd, f"{b}.conv.8")
        bp = {
            "pw": {"kernel": _conv_k(sd[f"{b}.conv.0.weight"])},
            "bn1": p1,
            "dw": {"kernel": _conv_k(sd[f"{b}.conv.3.weight"])},
            "bn2": p2,
            "pwl": {"kernel": _conv_k(sd[f"{b}.conv.7.weight"])},
            "bn3": p3,
        }
        bs = {"bn1": s1, "bn2": s2, "bn3": s3}
        if b in se_blocks:
            bp["se"] = {
                "fc0": {"kernel": np.asarray(sd[f"{b}.conv.5.fc.0.weight"]).T},
                "fc1": {"kernel": np.asarray(sd[f"{b}.conv.5.fc.2.weight"]).T},
            }
        params[b] = bp
        stats[b] = bs

    for name in ("conv7", "conv8"):
        params[name] = {
            "kernel": _conv_k(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }
    params["fc"] = {
        "kernel": np.asarray(sd["fc.weight"]).T,
        "bias": np.asarray(sd["fc.bias"]),
    }
    return {"params": params, "batch_stats": stats}
