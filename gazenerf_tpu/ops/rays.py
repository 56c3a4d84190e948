"""Ray generation and sampling for the z-plane-bounded volume.

TPU-native re-design of the reference's ``GenSamplePoints`` / ``FineSample``
(reference: utils/model_utils.py:283-490).  Differences from the reference:

* channels-last layout: rays are ``[B, R, 3]``, sample points ``[B, R, S, 3]``
  (the reference uses ``[B, 3, R, S]`` NCHW).
* explicit PRNG keys instead of global torch RNG for the stratified jitter.
* the hierarchical inverse-CDF sampler is implemented *correctly* (the
  reference's hier path is dead/broken: models/gaze_nerf.py:290,308-316); it
  uses a vectorized ``searchsorted`` + ``take_along_axis``.

Semantics preserved exactly (z-plane parameterization, ``ray_l = -1/d_z``
normalization, epsilons) so transplanted weights reproduce reference pixels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RayBundle(NamedTuple):
    """Per-ray geometry (channels-last)."""

    origins: jnp.ndarray  # [B, R, 3]
    directions: jnp.ndarray  # [B, R, 3] unit-norm
    ray_l: jnp.ndarray  # [B, R]  z-plane scale = -1 / d_z


class SampleSet(NamedTuple):
    """Stratified samples along rays."""

    pts: jnp.ndarray  # [B, R, S, 3]
    dirs: jnp.ndarray  # [B, R, S, 3]
    zvals: jnp.ndarray  # [B, R, S]   (plane-relative z values)
    z_dists: jnp.ndarray  # [B, R, S] (world-space segment lengths)
    rays: RayBundle


def pixel_grid(featmap_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """``[R, 2]`` grid of (x, y) pixel coordinates in row-major order.

    Matches the reference ray grid (utils/render_utils.py:24-28): index i maps
    to ``x = i % W``, ``y = i // W``.
    """
    idx = jnp.arange(featmap_size * featmap_size)
    x = (idx % featmap_size).astype(dtype)
    y = (idx // featmap_size).astype(dtype)
    return jnp.stack([x, y], axis=-1)


def generate_rays(
    batch_xy: jnp.ndarray,
    Rmats: jnp.ndarray,
    Tvecs: jnp.ndarray,
    inv_inmats: jnp.ndarray,
) -> RayBundle:
    """Camera-to-world ray directions via ``R @ K^-1 @ [x, y, 1]``.

    Reference: utils/model_utils.py:364-372.

    Args:
      batch_xy: ``[B, R, 2]`` pixel coordinates.
      Rmats: ``[B, 3, 3]`` camera-to-world rotations.
      Tvecs: ``[B, 3]`` or ``[B, 3, 1]`` camera centers (world frame).
      inv_inmats: ``[B, 3, 3]`` inverse intrinsics (at featmap resolution).
    """
    B, R, _ = batch_xy.shape
    ones = jnp.ones((B, R, 1), dtype=batch_xy.dtype)
    xyz = jnp.concatenate([batch_xy, ones], axis=-1)  # [B, R, 3]
    # d = Rmat @ inv_inmat @ xyz  (row-vector form: xyz @ (R @ K^-1)^T)
    M = jnp.einsum("bij,bjk->bik", Rmats, inv_inmats, precision="highest")  # [B, 3, 3]
    d = jnp.einsum("brk,bik->bri", xyz, M, precision="highest")  # [B, R, 3]
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / norm
    # NOTE: the reference computes ray_l = |d| then overwrites it with -1/d_z
    # (utils/model_utils.py:367-369); only the overwrite survives.
    ray_l = -1.0 / d[..., 2]
    origins = jnp.broadcast_to(Tvecs.reshape(B, 1, 3), (B, R, 3))
    return RayBundle(origins=origins, directions=d, ray_l=ray_l)


def _samples_from_zvals(
    zvals: jnp.ndarray, rays: RayBundle
) -> SampleSet:
    """Turn ``[B, R, S+1]`` z-plane edges into sample points + dists.

    Reference: utils/model_utils.py:291-330.
    """
    z_dists = (zvals[..., 1:] - zvals[..., :-1]) * rays.ray_l[..., None]
    z = zvals[..., :-1]  # [B, R, S]
    # pts = o + d * ray_l * z    (broadcast over samples)
    scale = (rays.ray_l[..., None] * z)[..., None]  # [B, R, S, 1]
    pts = rays.origins[..., None, :] + rays.directions[..., None, :] * scale
    dirs = jnp.broadcast_to(rays.directions[..., None, :], pts.shape)
    return SampleSet(pts=pts, dirs=dirs, zvals=z, z_dists=z_dists, rays=rays)


def stratified_zvals(
    rays: RayBundle,
    num_samples: int,
    world_z1: float,
    world_z2: float,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """``[B, R, S+1]`` z-plane sample edges, optionally jittered.

    The volume is bounded by two world-space z planes (z1=2.5, z2=-3.5 by
    default); samples are linear in plane-relative depth
    ``rela_z = o_z - world_z`` (reference utils/model_utils.py:339-357).
    When ``key`` is given, applies the reference's mid-point jitter
    (utils/model_utils.py:303-307).
    """
    oz = rays.origins[..., 2]  # [B, R]
    rela_z1 = (oz - world_z1)[..., None]
    rela_z2 = (oz - world_z2)[..., None]
    t = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=oz.dtype)
    zvals = rela_z1 * (1.0 - t) + rela_z2 * t  # [B, R, S+1]
    if key is not None:
        mids = 0.5 * (zvals[..., 1:] + zvals[..., :-1])
        upper = jnp.concatenate([mids, zvals[..., -1:]], axis=-1)
        lower = jnp.concatenate([zvals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, zvals.shape, dtype=zvals.dtype)
        zvals = lower + (upper - lower) * t_rand
    return zvals


def sample_coarse(
    batch_xy: jnp.ndarray,
    Rmats: jnp.ndarray,
    Tvecs: jnp.ndarray,
    inv_inmats: jnp.ndarray,
    num_samples: int,
    world_z1: float,
    world_z2: float,
    key: Optional[jax.Array] = None,
) -> SampleSet:
    """Full coarse sampling pipeline (reference ``GenSamplePoints.forward``)."""
    rays = generate_rays(batch_xy, Rmats, Tvecs, inv_inmats)
    zvals = stratified_zvals(rays, num_samples, world_z1, world_z2, key)
    return _samples_from_zvals(zvals, rays)


def sample_fine(
    weights: jnp.ndarray,
    coarse: SampleSet,
    num_fine: int,
    key: Optional[jax.Array] = None,
) -> SampleSet:
    """Hierarchical inverse-CDF importance sampling.

    Correct re-implementation of the reference ``FineSample``
    (utils/model_utils.py:378-490) whose call path is broken upstream.
    ``weights``: ``[B, R, S_c]`` coarse integration weights.
    Draws ``num_fine + 1`` fine z-values (reference ``n_sample =
    num_sample_fine + 1``, :381), sorts their union with the ``S_c`` coarse
    zvals into ``S_c + num_fine + 1`` EDGES, and returns a SampleSet with
    ``S_c + num_fine`` samples — matching the reference, whose
    ``_calc_sample_points_by_zvals`` consumes the sorted union as edges and
    drops the last (:393-397).  Oracle-tested against the imported reference
    ``FineSample`` in tests/test_ops.py.
    """
    B, R, Sc = weights.shape
    n_draw = num_fine + 1  # reference FineSample.n_sample = num_sample_fine + 1
    w = jax.lax.stop_gradient(weights[..., 1:-1])  # [B, R, Sc-2]
    pdf = w / jnp.sum(w + 1e-5, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B,R,Sc-1]

    if key is not None:
        u = jax.random.uniform(key, (B, R, n_draw), dtype=weights.dtype)
    else:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_draw, dtype=weights.dtype), (B, R, n_draw)
        )

    # searchsorted per ray: vectorize over flattened batch*rays
    flat_cdf = cdf.reshape(B * R, -1)
    flat_u = u.reshape(B * R, n_draw)
    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        flat_cdf, flat_u
    )
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, Sc - 2)

    zc = coarse.zvals.reshape(B * R, Sc)
    bins = 0.5 * (zc[:, 1:] + zc[:, :-1])  # [BR, Sc-1]

    cdf_b = jnp.take_along_axis(flat_cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(flat_cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (flat_u - cdf_b) / denom
    fine_z = bins_b + t * (bins_a - bins_b)  # [BR, n_draw]

    all_z = jnp.sort(jnp.concatenate([zc, fine_z], axis=-1), axis=-1)
    all_z = all_z.reshape(B, R, Sc + n_draw)
    return _samples_from_zvals(all_z, coarse.rays)
