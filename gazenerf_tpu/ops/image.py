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


def pixel_shuffle2_blur(x: jnp.ndarray) -> jnp.ndarray:
    """Fused ``blur3x3(pixel_shuffle2(x))`` via phase arithmetic.

    Both ops are linear; instead of materializing the shuffled image (whose
    6D-transpose lowering is catastrophically slow in some Mosaic contexts)
    or a grouped transposed conv (64x padding blow-up on TPU), compute the
    four output phase images directly as shifted FMAs of the four input
    phase groups, then interleave with layout-friendly stack+reshape
    (channels stay on lanes throughout).

    Exactly equals ``blur3x3(pixel_shuffle2(x))`` including the reflect
    boundary.

    Args:
      x: ``[B, H, W, 4*C]`` with torch shuffle channel order
         (input channel ``4c + 2i + j`` -> output phase ``(i, j)`` of
         channel ``c``) -> ``[B, 2H, 2W, C]``.
    """
    B, H, W, C4 = x.shape
    assert C4 % 4 == 0
    C = C4 // 4

    # phase groups g[k] = channels k::4  (torch order c*4+k) -- one
    # channel-gather each; XLA lowers to a relayout copy
    g = [x[..., k::4] for k in range(4)]
    return _phase_shuffle_blur(g, B, H, W, C)


def pixel_shuffle2_blur_gm(x: jnp.ndarray) -> jnp.ndarray:
    """Like :func:`pixel_shuffle2_blur` but for group-major channel order
    (channel ``k*C + c`` = phase k of channel c): the phase groups are
    CONTIGUOUS slices, avoiding the four strided lane-gathers.  Producers
    permute their conv weights statically to emit this order (see
    models.neural_renderer)."""
    B, H, W, C4 = x.shape
    assert C4 % 4 == 0
    C = C4 // 4
    g = [x[..., k * C : (k + 1) * C] for k in range(4)]
    return _phase_shuffle_blur(g, B, H, W, C)


def _phase_shuffle_blur(g, B, H, W, C):
    f = np.array([1.0, 2.0, 1.0]) / 4.0
    kb = np.outer(f, f)  # 3x3 binomial / 16

    # edge-replicate ONE block on each side: in shuffled space this
    # reproduces the blur's reflect boundary (shuffled row -1 == row 1 ==
    # phase-1 row of block 0, which edge replication provides)
    gp = [jnp.pad(gi, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge") for gi in g]

    def shifted(k, dh, dw):
        # block-shifted view of phase k: offset (dh, dw) in {-1, 0, 1}
        return jax.lax.dynamic_slice(
            gp[k], (0, 1 + dh, 1 + dw, 0), (B, H, W, C)
        )

    # out[2h+i, 2w+j, c] = sum_{a,b in 0..2} kb[a,b] * sh[2h+i+a-1, 2w+j+b-1]
    # where sh[m, n] = g[(m%2)*2 + n%2][m//2, n//2].
    phases = []
    for i in range(2):
        row_phase = []
        for j in range(2):
            acc = 0.0
            for a in range(3):
                for b in range(3):
                    m, n = i + a - 1, j + b - 1  # shuffled-space offsets
                    k = (m % 2) * 2 + (n % 2)
                    dh, dw = m // 2, n // 2  # floor division (handles -1)
                    acc = acc + kb[a, b] * shifted(k, dh, dw)
            row_phase.append(acc)
        phases.append(row_phase)

    # interleave columns then rows with stack+reshape (C stays minor)
    row0 = jnp.stack([phases[0][0], phases[0][1]], axis=3).reshape(B, H, 2 * W, C)
    row1 = jnp.stack([phases[1][0], phases[1][1]], axis=3).reshape(B, H, 2 * W, C)
    out = jnp.stack([row0, row1], axis=2).reshape(B, 2 * H, 2 * W, C)
    return out


def upsample2x_blur(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample followed by the binomial blur.

    Reference ``rgb_upsample`` (models/neural_renderer.py:65-67).
    """
    B, H, W, C = x.shape
    return blur3x3(resize_bilinear(x, (2 * H, 2 * W)))


def resize_nearest(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Nearest-neighbour resize (torch ``F.interpolate(mode="nearest")``
    semantics: index = floor(out_i * in/out))."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    hi = (jnp.arange(oh) * (H / oh)).astype(jnp.int32)
    wi = (jnp.arange(ow) * (W / ow)).astype(jnp.int32)
    return x[:, hi][:, :, wi]


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics:
    src = out_i * (in-1)/(out-1) (corner pixels map exactly)."""
    B, H, W, C = x.shape
    oh, ow = out_hw

    def axis_coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,))
        return jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))

    ys = axis_coords(H, oh)
    xs = axis_coords(W, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# channel-first rgb ops: [B, 3, H, W] keeps W on the TPU lane dimension, so
# 3-channel tensors are not padded 3 -> 128 lanes the way NHWC C=3 is


def _up2_axis_cf(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x bilinear upsample (half-pixel centers, edge clamp) along one
    axis: out[2i] = 0.25 prev + 0.75 cur; out[2i+1] = 0.75 cur + 0.25 next —
    equals ``jax.image.resize(..., "bilinear")`` for an exact 2x factor."""
    n = x.shape[axis]

    def shift(off):
        idx = np.clip(np.arange(n) + off, 0, n - 1)
        return jnp.take(x, jnp.asarray(idx), axis=axis)

    a = 0.25 * shift(-1) + 0.75 * x
    b = 0.75 * x + 0.25 * shift(1)
    out = jnp.stack([a, b], axis=axis + 1)
    new_shape = x.shape[:axis] + (2 * n,) + x.shape[axis + 1 :]
    return out.reshape(new_shape)


def blur3x3_cf(x: jnp.ndarray) -> jnp.ndarray:
    """blur3x3 twin for ``[B, C, H, W]`` (reflect pad, shifted FMAs)."""
    f = np.array([1.0, 2.0, 1.0]) / 4.0
    kb = np.outer(f, f)
    B, C, H, W = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    acc = None
    for a in range(3):
        for b in range(3):
            t = kb[a, b] * jax.lax.slice(
                xp, (0, 0, a, b), (B, C, a + H, b + W)
            )
            acc = t if acc is None else acc + t
    return acc


def upsample2x_blur_cf(x: jnp.ndarray) -> jnp.ndarray:
    """``upsample2x_blur`` twin for channel-first ``[B, C, H, W]``."""
    x = _up2_axis_cf(x, 2)
    x = _up2_axis_cf(x, 3)
    return blur3x3_cf(x)
