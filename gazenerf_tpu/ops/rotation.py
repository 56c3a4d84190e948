"""Gaze-conditioned rotations and Euler-angle utilities.

TPU-native re-design of the reference's per-sample Python-loop rotation
(reference: utils/model_utils.py:11-46, applied at models/gaze_nerf.py:181-197)
as single batched einsums — no host loops, fully fusable by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaze_rotation_matrices(gaze: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """``[B, 3, 3]`` rotation ``Ry(yaw) @ Rx(pitch)`` from ``[B, 2]`` gaze.

    ``gaze[:, 0]`` is pitch (rotation about x), ``gaze[:, 1]`` is yaw
    (rotation about y); reference utils/model_utils.py:11-29 builds
    ``matrices_2 @ matrices_1`` with the same conventions.
    """
    pitch = gaze[:, 0]
    yaw = gaze[:, 1]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(cp)
    ones = jnp.ones_like(cp)

    rx = jnp.stack(
        [ones, zeros, zeros, zeros, cp, -sp, zeros, sp, cp], axis=-1
    ).reshape(-1, 3, 3)
    ry = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=-1
    ).reshape(-1, 3, 3)
    R = jnp.einsum("bij,bjk->bik", ry, rx, precision="highest")
    if inverse:
        R = jnp.swapaxes(R, -1, -2)
    return R


def rotate_feature_planes(
    featmap: jnp.ndarray, gaze: jnp.ndarray, inverse: bool = False
) -> jnp.ndarray:
    """Rotate an NHWC feature map's channel triplets by the gaze rotation.

    The ``C = 3*K`` channels are interpreted as ``K`` 3-vectors; each vector
    ``v`` maps to ``v @ R`` (row-vector convention — equivalent to ``R^T v``),
    matching the reference's ``matmul(embedding^T, R)``
    (utils/model_utils.py:32-46; reshape plumbing models/gaze_nerf.py:181-197).

    Args:
      featmap: ``[B, H, W, C]`` with ``C % 3 == 0``.
      gaze: ``[B, 2]`` (pitch, yaw).
    """
    B, H, W, C = featmap.shape
    assert C % 3 == 0, "featmap channels must be a multiple of 3"
    R = gaze_rotation_matrices(gaze, inverse=inverse)  # [B, 3, 3]
    v = featmap.reshape(B, H, W, C // 3, 3)
    out = jnp.einsum("bhwkc,bcd->bhwkd", v, R, precision="highest")
    return out.reshape(B, H, W, C)


def euler_to_rotation(angles: jnp.ndarray) -> jnp.ndarray:
    """Batched XYZ Euler angles -> ``Rz @ Ry @ Rx`` rotation matrices.

    Reference: utils/model_utils.py:189-222 (numpy, single) and
    trainer/base.py:92 (batched torch twin).  ``angles``: ``[B, 3]``.
    """
    sx, sy, sz = (jnp.sin(angles[:, i]) for i in range(3))
    cx, cy, cz = (jnp.cos(angles[:, i]) for i in range(3))
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)

    rx = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=-1
    ).reshape(-1, 3, 3)
    ry = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=-1
    ).reshape(-1, 3, 3)
    rz = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=-1
    ).reshape(-1, 3, 3)
    return jnp.einsum("bij,bjk,bkl->bil", rz, ry, rx, precision="highest")


def rotation_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`euler_to_rotation` (reference utils/model_utils.py:225-237).

    ``R``: ``[B, 3, 3]`` -> ``[B, 3]``.  Uses the gimbal-lock-safe branch via
    ``jnp.where`` (no data-dependent control flow).
    """
    sy = jnp.sqrt(R[:, 0, 0] ** 2 + R[:, 1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(
        singular,
        jnp.arctan2(-R[:, 1, 2], R[:, 1, 1]),
        jnp.arctan2(R[:, 2, 1], R[:, 2, 2]),
    )
    y = jnp.arctan2(-R[:, 2, 0], sy)
    z = jnp.where(singular, jnp.zeros_like(sy), jnp.arctan2(R[:, 1, 0], R[:, 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


def pitchyaw_to_vector(pitchyaw: jnp.ndarray) -> jnp.ndarray:
    """``[B, 2]`` (pitch, yaw) -> ``[B, 3]`` unit gaze vectors.

    Reference: losses/gazenerf_loss.py:147-150.
    """
    sin = jnp.sin(pitchyaw)
    cos = jnp.cos(pitchyaw)
    return jnp.stack(
        [cos[:, 0] * sin[:, 1], sin[:, 0], cos[:, 0] * cos[:, 1]], axis=1
    )


def angular_error_deg(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Mean angular distance in degrees between batches of 3-vectors.

    Reference: losses/gazenerf_loss.py:142-145 (cosine-similarity + acos with
    hardtanh clamping).
    """
    num = jnp.sum(a * b, axis=-1)
    den = jnp.maximum(
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), eps
    )
    sim = jnp.clip(num / den, -1.0, 1.0)
    return jnp.arccos(sim) * (180.0 / jnp.pi)
