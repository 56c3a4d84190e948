"""VGG16 feature extractor + heads, NHWC flax — frozen perceptual nets.

TPU ports of the reference's frozen torchvision-based nets:

* ``VGG16Features`` — the torchvision ``vgg16().features`` stack
  (reference losses/gazenerf_loss.py:49-52 uses slices [:4], [4:9], [9:16],
  [16:23] for the perceptual loss).
* ``GazeVGG`` — the ETH-XGaze VGG16 baseline gaze estimator: features +
  mean-pool + FC(512,64)+FC(64,64)+FC(64,4), LeakyReLU(0.2), tanh * pi/2
  (reference gaze_estimation/xgaze_baseline_vgg.py:6-45).
* transplant loaders for torchvision-format state dicts (the weights
  themselves ship separately; random init otherwise — the loss path is
  architecture-identical either way).

All convs are 3x3 pad-1 NHWC; channels-last maps pooling/conv straight onto
the TPU conv units.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 features layout: conv indices and channel widths
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG16_WIDTHS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
# maxpool comes immediately before convs at these list positions
VGG16_POOL_BEFORE = {2, 4, 7, 10}
# perceptual-loss capture points: outputs of ReLU after convs 1,3,6,9
# (== torchvision feature indices 3, 8, 15, 22)
PERCEPTUAL_CAPTURE = (1, 3, 6, 9)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """The 13-conv VGG16 feature stack; returns captured intermediates.

    ``capture``: list positions (into the conv list) whose post-ReLU output
    to return.  The final output (after the last pool) is always returned.
    """

    capture: Sequence[int] = PERCEPTUAL_CAPTURE
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        caps = []
        for i, width in enumerate(VGG16_WIDTHS):
            if i in VGG16_POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(
                width, (3, 3), padding=1, dtype=self.dtype, name=f"conv_{i}"
            )(x)
            x = nn.relu(x)
            if i in self.capture:
                caps.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # final pool (idx 30)
        return caps, x


class GazeVGG(nn.Module):
    """ETH-XGaze VGG16 gaze estimator head (frozen, used in the angular loss).

    Returns ``(gaze [B,2], head [B,2])`` pitch-yaw pairs.
    Reference: gaze_estimation/xgaze_baseline_vgg.py:23-45.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        _, h = VGG16Features(capture=(), dtype=self.dtype, name="features")(x)
        h = jnp.mean(h, axis=(1, 2))  # global average pool over H, W
        h = nn.leaky_relu(nn.Dense(64, name="FC1")(h), negative_slope=0.2)
        h = nn.leaky_relu(nn.Dense(64, name="FC2")(h), negative_slope=0.2)
        h = jnp.tanh(nn.Dense(4, name="FC3")(h)) * (np.pi * 0.5)
        return h[:, :2], h[:, 2:]


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """``[B,H,W,3]`` in [0,1] -> ImageNet-normalized (reference :59-64,79-80)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def vgg_features_from_torch(sd: Mapping[str, np.ndarray], prefix: str = "") -> Dict:
    """torchvision ``features.N.weight`` ([out,in,3,3]) -> flax ``conv_i``."""
    out: Dict = {}
    for i, tidx in enumerate(VGG16_CONV_IDX):
        w = np.asarray(sd[f"{prefix}features.{tidx}.weight"])
        out[f"conv_{i}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{prefix}features.{tidx}.bias"]),
        }
    return out


def gaze_vgg_from_torch(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference gaze_network state dict -> GazeVGG params.

    torch keys: ``vgg16.N.weight`` (the net keeps only ``.features`` so conv
    keys lose the ``features.`` prefix), ``FC1..3.{weight,bias}``.
    """
    conv_sd = {f"features.{k.split('.', 1)[1]}": v for k, v in sd.items() if k.startswith("vgg16.")}
    params: Dict = {"features": vgg_features_from_torch(conv_sd)}
    for fc in ("FC1", "FC2", "FC3"):
        params[fc] = {
            "kernel": np.ascontiguousarray(np.asarray(sd[f"{fc}.weight"]).T),
            "bias": np.asarray(sd[f"{fc}.bias"]),
        }
    return params
