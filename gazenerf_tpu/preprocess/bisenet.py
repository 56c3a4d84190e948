"""BiSeNet face-parsing network, NHWC flax.

TPU port of the reference's vendored BiSeNet (reference:
pre_processing/bisenet.py:1-286, ResNet18 backbone pre_processing/resnet.py:56)
used for head-mask generation.  Structure: a ResNet18 context path with
attention-refinement modules on the 1/16 and 1/32 features + global context,
fused with the 1/8 spatial features by a feature-fusion module, then a
19-class conv head upsampled to input resolution.

Interpolation semantics match the reference exactly: the context-path
upsamples are nearest-neighbour (bisenet.py:112,116,121), the final logits
upsample is bilinear ``align_corners=True`` (bisenet.py:247).  Weight
transplant from the reference checkpoint via :func:`bisenet_from_torch`
(torch-parity tested in tests/test_preprocess.py).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.ops.image import resize_bilinear_align_corners, resize_nearest


class ConvBNReLU(nn.Module):
    """conv(no bias) + BN + relu (reference bisenet.py:7-31)."""

    ch: int
    ks: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.ch, (self.ks, self.ks), strides=(self.stride, self.stride),
            padding=self.ks // 2, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    """ResNet18 basic block (reference pre_processing/resnet.py:19-46)."""

    ch: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=name,
            )

        residual = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                           padding=1, use_bias=False, name="conv1")(x)
        residual = nn.relu(bn("bn1")(residual))
        residual = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False,
                           name="conv2")(residual)
        residual = bn("bn2")(residual)
        shortcut = x
        if self.project:
            shortcut = nn.Conv(self.ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            shortcut = bn("downsample_bn")(shortcut)
        return nn.relu(shortcut + residual)


class ResNet18Trunk(nn.Module):
    """Returns (feat8, feat16, feat32) at 1/8, 1/16, 1/32 resolution
    (reference pre_processing/resnet.py:56-78)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            x = BasicBlock(64, name=f"layer1_{i}")(x, train)
        x8 = x
        for i in range(2):
            x8 = BasicBlock(128, stride=2 if i == 0 else 1, project=i == 0,
                            name=f"layer2_{i}")(x8, train)
        x16 = x8
        for i in range(2):
            x16 = BasicBlock(256, stride=2 if i == 0 else 1, project=i == 0,
                             name=f"layer3_{i}")(x16, train)
        x32 = x16
        for i in range(2):
            x32 = BasicBlock(512, stride=2 if i == 0 else 1, project=i == 0,
                             name=f"layer4_{i}")(x32, train)
        return x8, x16, x32


class AttentionRefinement(nn.Module):
    """Reference bisenet.py:65-88."""

    ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvBNReLU(self.ch, name="conv")(x, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.ch, (1, 1), use_bias=False, name="conv_atten")(atten)
        atten = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn_atten")(atten)
        return feat * nn.sigmoid(atten)


class FeatureFusion(nn.Module):
    """Reference bisenet.py:182-215."""

    ch: int

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        x = jnp.concatenate([a, b], axis=-1)
        feat = ConvBNReLU(self.ch, ks=1, name="convblk")(x, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.relu(
            nn.Conv(self.ch // 4, (1, 1), use_bias=False, name="conv1")(atten)
        )
        atten = nn.sigmoid(
            nn.Conv(self.ch, (1, 1), use_bias=False, name="conv2")(atten)
        )
        return feat + feat * atten


class BiSeNetOutput(nn.Module):
    """ConvBNReLU + bias-free 1x1 classifier (reference bisenet.py:33-43)."""

    mid: int
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.mid, name="conv")(x, train)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       name="conv_out")(x)


class BiSeNet(nn.Module):
    """Main head only (the reference's aux heads feed its training loss,
    which never runs here — inference uses ``out[0]``,
    pre_processing/gen_all_masks.py)."""

    n_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        feat8, feat16, feat32 = ResNet18Trunk(name="resnet")(x, train)

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, name="conv_avg")(avg, train)
        avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (128,))

        f32 = AttentionRefinement(128, name="arm32")(feat32, train) + avg_up
        f32_up = resize_nearest(f32, feat16.shape[1:3])
        f32_up = ConvBNReLU(128, name="conv_head32")(f32_up, train)

        f16 = AttentionRefinement(128, name="arm16")(feat16, train) + f32_up
        f16_up = resize_nearest(f16, feat8.shape[1:3])
        f16_up = ConvBNReLU(128, name="conv_head16")(f16_up, train)

        fused = FeatureFusion(256, name="ffm")(feat8, f16_up, train)
        out = BiSeNetOutput(256, self.n_classes, name="head")(fused, train)
        return resize_bilinear_align_corners(out, (H, W))


def bisenet_from_torch(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference BiSeNet checkpoint -> flax variables.

    torch key layout (reference bisenet.py / resnet.py):
    ``cp.resnet.layer{L}.{i}.conv{1,2}.weight``, ``...downsample.{0,1}.*``,
    ``cp.{arm16,arm32}.{conv.{conv,bn},conv_atten,bn_atten}.*``,
    ``cp.conv_head{16,32}.*``, ``cp.conv_avg.*``,
    ``ffm.{convblk.{conv,bn},conv1,conv2}.*``,
    ``conv_out.{conv.{conv,bn},conv_out}.*`` (aux heads conv_out16/32 are
    dropped — the flax net has only the main head).
    """
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf, val):
        d = tree
        for k in path:
            d = d.setdefault(k, {})
        d[leaf] = np.asarray(val)

    def map_module(tkey: str):
        """torch module path -> flax module path (list of names)."""
        parts = tkey.split(".")
        if parts[0] == "cp":
            parts = parts[1:]
            if parts[0] == "resnet":
                # resnet.layerL.i.*  ->  resnet.layerL_i.*
                if parts[1].startswith("layer"):
                    merged = f"{parts[1]}_{parts[2]}"
                    rest = parts[3:]
                    if rest[0] == "downsample":
                        rest = ["downsample_conv" if rest[1] == "0"
                                else "downsample_bn"] + rest[2:]
                    return ["resnet", merged] + rest[:-1]
                return ["resnet"] + parts[1:-1]
            return parts[:-1]
        if parts[0] == "ffm":
            return parts[:-1]
        if parts[0] == "conv_out":
            return ["head"] + parts[1:-1]
        return None  # conv_out16 / conv_out32 aux heads

    for key, val in sd.items():
        path = map_module(key)
        if path is None:
            continue
        field = key.split(".")[-1]
        if field == "num_batches_tracked":
            continue
        # trunk bare convs/bns keep their torch names; ConvBNReLU members are
        # already named conv/bn inside flax modules
        is_bn = (
            field in ("running_mean", "running_var")
            or path[-1].startswith("bn")
            or path[-1] in ("downsample_bn", "bn_atten")
            or (len(path) >= 1 and path[-1] == "bn")
        )
        if field == "weight" and not is_bn:
            put(params, path, "kernel",
                np.ascontiguousarray(np.asarray(val).transpose(2, 3, 1, 0)))
        elif field == "weight":
            put(params, path, "scale", val)
        elif field == "bias":
            put(params, path, "bias", val)
        elif field == "running_mean":
            put(stats, path, "mean", val)
        elif field == "running_var":
            put(stats, path, "var", val)
    return {"params": params, "batch_stats": stats}
