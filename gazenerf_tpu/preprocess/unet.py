"""U-Net eye-segmentation fallback net (flax, NHWC).

TPU-framework port of the reference's second-tier eye segmenter
(reference: pre_processing/unet.py:6-77, blocks pre_processing/unet_utils.py:
184-228): a classic 4-level U-Net with ``feature_scale=4`` (filters
16/32/64/128/256), double 3x3 conv + BatchNorm + ReLU blocks, 2x2-stride
transposed-conv upsampling with skip concatenation, and a 19-class 1x1 head.
The reference invokes it when BiSeNet finds no eye pixels
(gen_all_masks.py:117-143); here it is tier 2 of the same fallback chain
(see :mod:`gazenerf_tpu.preprocess.masks`).

Inference-only (BatchNorm uses running stats); weights come from
:func:`unet_params_from_torch`.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class UNetConv2(nn.Module):
    """conv3x3+BN+ReLU twice (reference unet_utils.py:184-210)."""

    out_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in (1, 2):
            x = nn.Conv(self.out_size, (3, 3), padding="SAME", name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        return x


class UNetUp(nn.Module):
    """2x2-stride transposed conv + skip concat + double conv
    (reference unet_utils.py:213-228; deconv variant)."""

    out_size: int

    @nn.compact
    def __call__(self, skip: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        up = nn.ConvTranspose(
            self.out_size, (2, 2), strides=(2, 2), padding="VALID", name="up"
        )(x)
        # the reference pads the skip to the upsampled size; with even inputs
        # (512) the offset is always 0 — asserted rather than replicated
        assert up.shape[1:3] == skip.shape[1:3], (up.shape, skip.shape)
        return UNetConv2(self.out_size, name="conv")(
            jnp.concatenate([skip, up], axis=-1)
        )


class UNet(nn.Module):
    """Reference ``unet`` (pre_processing/unet.py:6-77), NHWC.

    ``feature_scale=4`` -> filters [16, 32, 64, 128, 256].
    """

    n_classes: int = 19
    feature_scale: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = [int(c / self.feature_scale) for c in (64, 128, 256, 512, 1024)]

        c1 = UNetConv2(f[0], name="conv1")(x)
        p1 = nn.max_pool(c1, (2, 2), strides=(2, 2))
        c2 = UNetConv2(f[1], name="conv2")(p1)
        p2 = nn.max_pool(c2, (2, 2), strides=(2, 2))
        c3 = UNetConv2(f[2], name="conv3")(p2)
        p3 = nn.max_pool(c3, (2, 2), strides=(2, 2))
        c4 = UNetConv2(f[3], name="conv4")(p3)
        p4 = nn.max_pool(c4, (2, 2), strides=(2, 2))

        center = UNetConv2(f[4], name="center")(p4)

        u4 = UNetUp(f[3], name="up_concat4")(c4, center)
        u3 = UNetUp(f[2], name="up_concat3")(c3, u4)
        u2 = UNetUp(f[1], name="up_concat2")(c2, u3)
        u1 = UNetUp(f[0], name="up_concat1")(c1, u2)

        return nn.Conv(self.n_classes, (1, 1), name="final")(u1)


def _conv_k(w: np.ndarray) -> np.ndarray:
    # torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_k(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose
    # [kh, kw, in, out]; lax.conv_transpose correlates with the kernel
    # mirrored relative to torch's, so flip the spatial dims
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def unet_params_from_torch(
    sd: Mapping[str, np.ndarray],
) -> Tuple[Dict, Dict]:
    """Map the reference ``unet().state_dict()`` -> flax (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}

    def conv_block(dst: Dict, dst_stats: Dict, src_prefix: str):
        # torch Sequential: .0 = Conv2d, .1 = BatchNorm2d
        for i in (1, 2):
            t = f"{src_prefix}.conv{i}"
            dst[f"conv{i}"] = {
                "kernel": _conv_k(np.asarray(sd[f"{t}.0.weight"])),
                "bias": np.asarray(sd[f"{t}.0.bias"]),
            }
            dst[f"bn{i}"] = {
                "scale": np.asarray(sd[f"{t}.1.weight"]),
                "bias": np.asarray(sd[f"{t}.1.bias"]),
            }
            dst_stats[f"bn{i}"] = {
                "mean": np.asarray(sd[f"{t}.1.running_mean"]),
                "var": np.asarray(sd[f"{t}.1.running_var"]),
            }

    for name in ("conv1", "conv2", "conv3", "conv4", "center"):
        params[name], stats[name] = {}, {}
        conv_block(params[name], stats[name], name)

    for name in ("up_concat4", "up_concat3", "up_concat2", "up_concat1"):
        up = {
            "kernel": _deconv_k(np.asarray(sd[f"{name}.up.weight"])),
            "bias": np.asarray(sd[f"{name}.up.bias"]),
        }
        conv: Dict = {}
        conv_stats: Dict = {}
        conv_block(conv, conv_stats, f"{name}.conv")
        params[name] = {"up": up, "conv": conv}
        stats[name] = {"conv": conv_stats}

    params["final"] = {
        "kernel": _conv_k(np.asarray(sd["final.weight"])),
        "bias": np.asarray(sd["final.bias"]),
    }
    return params, stats
