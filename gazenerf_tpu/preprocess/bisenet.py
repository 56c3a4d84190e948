"""BiSeNet face-parsing network, NHWC flax.

TPU port of the reference's vendored BiSeNet (reference:
pre_processing/bisenet.py:1-286, ResNet18 backbone pre_processing/resnet.py:56)
used for head-mask generation.  Structure: a ResNet18 context path with
attention-refinement modules on the 1/16 and 1/32 features + global context,
fused with the 1/8 spatial features by a feature-fusion module, then a
19-class conv head upsampled to input resolution.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from gazenerf_tpu.ops.image import resize_bilinear


class ConvBNReLU(nn.Module):
    ch: int
    ks: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.ch, (self.ks, self.ks), strides=(self.stride, self.stride),
            padding=self.ks // 2, use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    ch: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )
        residual = x
        y = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False)(y)
        y = bn()(y)
        if self.project:
            residual = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = bn()(residual)
        return nn.relu(y + residual)


class ResNet18Trunk(nn.Module):
    """Returns (feat8, feat16, feat32) at 1/8, 1/16, 1/32 resolution."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            x = BasicBlock(64)(x, train)
        x8 = x
        for i in range(2):
            x8 = BasicBlock(128, stride=2 if i == 0 else 1, project=i == 0)(x8, train)
        x16 = x8
        for i in range(2):
            x16 = BasicBlock(256, stride=2 if i == 0 else 1, project=i == 0)(x16, train)
        x32 = x16
        for i in range(2):
            x32 = BasicBlock(512, stride=2 if i == 0 else 1, project=i == 0)(x32, train)
        return x8, x16, x32


class AttentionRefinement(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvBNReLU(self.ch)(x, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.ch, (1, 1), use_bias=False)(atten)
        atten = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(atten)
        return feat * nn.sigmoid(atten)


class FeatureFusion(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        x = jnp.concatenate([a, b], axis=-1)
        feat = ConvBNReLU(self.ch, ks=1)(x, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.relu(nn.Conv(self.ch // 4, (1, 1), use_bias=False)(atten))
        atten = nn.sigmoid(nn.Conv(self.ch, (1, 1), use_bias=False)(atten))
        return feat + feat * atten


class BiSeNet(nn.Module):
    n_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        feat8, feat16, feat32 = ResNet18Trunk(name="resnet")(x, train)

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, name="conv_avg")(avg, train)
        avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (128,))

        f32 = AttentionRefinement(128, name="arm32")(feat32, train) + avg_up
        f32_up = resize_bilinear(f32, feat16.shape[1:3])
        f32_up = ConvBNReLU(128, name="conv_head32")(f32_up, train)

        f16 = AttentionRefinement(128, name="arm16")(feat16, train) + f32_up
        f16_up = resize_bilinear(f16, feat8.shape[1:3])
        f16_up = ConvBNReLU(128, name="conv_head16")(f16_up, train)

        fused = FeatureFusion(256, name="ffm")(feat8, f16_up, train)
        out = ConvBNReLU(256, name="conv_out")(fused, train)
        out = nn.Conv(self.n_classes, (1, 1), name="classifier")(out)
        return resize_bilinear(out, (H, W))
