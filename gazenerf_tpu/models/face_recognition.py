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
