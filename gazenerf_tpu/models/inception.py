"""InceptionV3 (FID variant), NHWC flax — the exact FID feature backbone.

The reference computes FID with ``piq.FID().compute_feats`` (reference:
utils/metrics_utils.py:101-105), whose feature extractor is the pytorch-fid
InceptionV3 ported from the original TF-slim weights.  This is a faithful
NHWC re-implementation of that exact variant, including its two quirks vs
stock torchvision inception_v3:

* every in-block average pool excludes the zero padding from its divisor
  (``count_include_pad=False`` — pytorch-fid ``FIDInceptionA/C/E_1``),
* the last block's pool branch (``Mixed_7c``) uses a MAX pool, matching the
  TF checkpoint (pytorch-fid ``FIDInceptionE_2``).

``fid_features`` reproduces the pytorch-fid input pipeline: resize to
299x299 bilinear (half-pixel centers == torch ``align_corners=False``),
scale [0,1] -> [-1,1], and global-average the final 2048-channel map
("pool3" features).  Weight transplant from a pytorch-fid/torchvision state
dict via :func:`inception_from_torch`.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    """conv(no bias) + BatchNorm(eps 1e-3) + relu."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.padding
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=((p[0], p[0]), (p[1], p[1])), use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


def _avg_pool3(x):
    """3x3 stride-1 average pool, padding excluded from the divisor."""
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
        count_include_pad=False,
    )


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(
            self.pool_features, (1, 1), dtype=d, name="branch_pool"
        )(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=d, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # Mixed_7b: "avg" (exclude pad); Mixed_7c: "max"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            pooled = nn.max_pool(
                x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
            )
        else:
            pooled = _avg_pool3(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Trunk through Mixed_7c; output is the [B, H', W', 2048] feature map."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=d, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=d, name="Mixed_7c")(x)
        return x


def make_fid_features_fn(variables, dtype=jnp.float32, resize: bool = True):
    """Returns jitted ``imgs [B,H,W,3] in [0,1] -> pool3 features [B, 2048]``.

    Pipeline per pytorch-fid (piq's backend): bilinear resize to 299
    (half-pixel centers), scale to [-1,1], trunk, global average pool.
    """
    net = InceptionV3FID(dtype=dtype)

    @jax.jit
    def feats(imgs):
        x = imgs.astype(dtype)
        if resize:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[-1]), method="bilinear"
            )
        x = x * 2.0 - 1.0
        fm = net.apply(variables, x)
        return jnp.mean(fm, axis=(1, 2)).astype(jnp.float32)

    return feats


def inception_from_torch(sd: Mapping[str, np.ndarray]) -> Dict:
    """pytorch-fid / torchvision inception state dict -> flax variables.

    torch keys look like ``Mixed_5b.branch5x5_1.conv.weight`` ([O,I,kH,kW])
    and ``...bn.{weight,bias,running_mean,running_var}``; the fc / AuxLogits
    heads are ignored (FID uses pool3 only).
    """
    params: Dict = {}
    stats: Dict = {}

    def nested(root, path):
        d = root
        for k in path:
            d = d.setdefault(k, {})
        return d

    for key, val in sd.items():
        if key.endswith(".conv.weight"):
            path = key.split(".")[:-1]  # [...,'conv']
            nested(params, path)["kernel"] = np.ascontiguousarray(
                np.asarray(val).transpose(2, 3, 1, 0)
            )
        elif ".bn." in key:
            *mod, field = key.split(".")
            if field in ("weight", "bias"):
                nested(params, mod)[
                    "scale" if field == "weight" else "bias"
                ] = np.asarray(val)
            elif field in ("running_mean", "running_var"):
                nested(stats, mod)[
                    "mean" if field == "running_mean" else "var"
                ] = np.asarray(val)
    return {"params": params, "batch_stats": stats}
