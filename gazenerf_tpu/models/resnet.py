"""ResNet-50 backbone + gaze head, NHWC flax — the frozen eval estimator.

TPU port of the reference's evaluation gaze estimator
(reference: gaze_estimation/xgaze_baseline_resnet.py:6-22 — torchvision
resnet50 trunk + ``Linear(2048, 4)`` producing (gaze, head) pitch-yaw pairs;
loaded frozen in evaluate_metrics.py:131-136).  Weight transplant from a
torchvision-format state dict is provided; random init otherwise.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

RESNET50_STAGES = [(64, 3), (128, 4), (256, 6), (512, 3)]


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        residual = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(
            self.width, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.width * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if self.project:
            residual = nn.Conv(
                self.width * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(bn(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si, (width, blocks) in enumerate(RESNET50_STAGES):
            for bi in range(blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = Bottleneck(
                    width, stride=stride, project=(bi == 0),
                    dtype=self.dtype, name=f"layer{si + 1}_{bi}",
                )(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 2048]


class GazeResNet(nn.Module):
    """ResNet50 trunk + fc(2048 -> 4): returns (gaze [B,2], head [B,2])."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feat = ResNet50(dtype=self.dtype, name="gaze_network")(x, train=train)
        out = nn.Dense(4, dtype=self.dtype, name="gaze_fc")(feat)
        return out[:, :2], out[:, 2:]


def _conv_t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _bn_t(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def gaze_resnet_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference gaze_network state dict -> {"params", "batch_stats"}.

    torch names: ``gaze_network.conv1.weight``, ``gaze_network.layerL.B.*``,
    ``gaze_fc.0.{weight,bias}``.
    """
    p: Dict = {"gaze_network": {}}
    s: Dict = {"gaze_network": {}}
    net_p, net_s = p["gaze_network"], s["gaze_network"]
    net_p["conv1"] = {"kernel": _conv_t(sd["gaze_network.conv1.weight"])}
    net_p["bn1"], net_s["bn1"] = _bn_t(sd, "gaze_network.bn1")
    for si, (_, blocks) in enumerate(RESNET50_STAGES):
        for bi in range(blocks):
            t = f"gaze_network.layer{si + 1}.{bi}"
            name = f"layer{si + 1}_{bi}"
            bp: Dict = {}
            bs: Dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv_t(sd[f"{t}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn_t(sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv_t(sd[f"{t}.downsample.0.weight"])
                }
                bp["downsample_bn"], bs["downsample_bn"] = _bn_t(
                    sd, f"{t}.downsample.1"
                )
            net_p[name] = bp
            net_s[name] = bs
    p["gaze_fc"] = {
        "kernel": np.ascontiguousarray(np.asarray(sd["gaze_fc.0.weight"]).T),
        "bias": np.asarray(sd["gaze_fc.0.bias"]),
    }
    return {"params": p, "batch_stats": s}
