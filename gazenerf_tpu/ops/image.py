"""2D image ops for the neural renderer, NHWC channels-last.

TPU-native replacements for the reference's kornia / torch.nn.functional image
ops (reference: models/pixel_shuffle_upsample.py:7-16, models/neural_renderer.py:65-67,
losses/gazenerf_loss.py:19,81-87):

* 3x3 binomial blur with reflect padding  (kornia ``filter2d`` semantics)
* pixel-shuffle x2 with torch channel ordering (for weight transplant parity)
* bilinear resize with half-pixel centers  (torch ``align_corners=False``)

All are pure jnp/lax and fuse under XLA; the blur is a depthwise conv which
XLA maps onto the VPU/MXU directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def blur3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 binomial ([1,2,1] outer [1,2,1] / 16) blur, reflect pad.

    Matches kornia ``filter2d(..., normalized=True)`` with its default
    ``border_type="reflect"`` (reference models/pixel_shuffle_upsample.py:13-16).

    Args:
      x: ``[B, H, W, C]``.
    """
    f = np.array([1.0, 2.0, 1.0])
    k = np.outer(f, f)
    k = (k / k.sum()).astype(np.float32)  # [3, 3]
    C = x.shape[-1]
    kernel = jnp.asarray(k, dtype=x.dtype).reshape(3, 3, 1, 1)
    kernel = jnp.broadcast_to(kernel, (3, 3, 1, C))  # HWIO, depthwise

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def pixel_shuffle2(x: jnp.ndarray) -> jnp.ndarray:
    """Pixel shuffle with upscale factor 2, NHWC, torch channel ordering.

    torch semantics (reference models/pixel_shuffle_upsample.py:39):
    ``out[b, c, 2h+i, 2w+j] = in[b, 4c + 2i + j, h, w]`` — so in channels-last
    the input channel index factorizes as ``(c, i, j)`` row-major.

    Args:
      x: ``[B, H, W, 4*C]`` -> ``[B, 2H, 2W, C]``.
    """
    B, H, W, C4 = x.shape
    assert C4 % 4 == 0
    C = C4 // 4
    x = x.reshape(B, H, W, C, 2, 2)
    # -> [B, H, i, W, j, C]
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, 2 * H, 2 * W, C)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (torch ``align_corners=False``).

    Used for the x2 rgb upsample in the neural renderer
    (reference models/neural_renderer.py:65-67) and the 224x224 resize in the
    perceptual losses (reference losses/gazenerf_loss.py:81-87).

    Args:
      x: ``[B, H, W, C]``; ``out_hw``: ``(H', W')``.
    """
    B, H, W, C = x.shape
    return jax.image.resize(
        x, (B, out_hw[0], out_hw[1], C), method="bilinear", antialias=False
    )


def upsample2x_blur(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample followed by the binomial blur.

    Reference ``rgb_upsample`` (models/neural_renderer.py:65-67).
    """
    B, H, W, C = x.shape
    return blur3x3(resize_bilinear(x, (2 * H, 2 * W)))
