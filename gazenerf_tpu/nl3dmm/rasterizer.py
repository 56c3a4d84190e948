"""Differentiable mesh rasterizer — tile-binned soft z-buffer, pure JAX.

TPU-native replacement for the reference's PyTorch3D C++/CUDA rasterizer
(reference: surface_fitting/nl3dmm/nl3dmm_renderer.py:136-234 uses
``MeshRasterizer`` + a soft shader).  Design:

* static shapes throughout (jit/vmap-able, no dynamic triangle lists):
  screen tiles of ``tile_size`` pixels; each tile keeps the top
  ``tris_per_tile`` overlapping triangles by bbox-overlap ranking —
  the classic GPU binned rasterizer expressed as argsort + gather.
* per-(tile, pixel, triangle) barycentric/инside/z math is one big
  vectorized block — VPU-friendly elementwise work over a
  ``[tiles, px, K]`` lattice.
* SoftRas-style aggregation: triangle influence =
  ``sigmoid(signed_dist / sigma)``; softmax over ``-z / gamma`` blends
  colors with a background, so gradients flow to vertices even across
  silhouette edges (same role as PyTorch3D's soft blending).

The result is a fully differentiable ``render(vertices, colors) ->
image`` usable inside the jitted, ``lax.scan``-driven 3DMM fitting loop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RasterSettings(NamedTuple):
    image_size: int = 128
    tile_size: int = 16
    tris_per_tile: int = 64
    sigma: float = 1e-4  # silhouette softness (barycentric units)
    gamma: float = 1e-2  # z-softmax temperature
    z_near: float = 0.05
    z_far: float = 50.0  # background pseudo-depth for the blend softmax


def project_vertices(
    vertices: jnp.ndarray,
    w2c_R: jnp.ndarray,
    w2c_T: jnp.ndarray,
    inmat: jnp.ndarray,
) -> jnp.ndarray:
    """World -> screen: ``[B, V, 3]`` -> ``[B, V, 3]`` of (x_px, y_px, depth)."""
    cam = jnp.einsum("bij,bvj->bvi", w2c_R, vertices) + w2c_T[:, None, :]
    z = jnp.maximum(cam[..., 2:], 1e-6)
    xy1 = cam / z
    pix = jnp.einsum("bij,bvj->bvi", inmat, xy1)
    return jnp.concatenate([pix[..., :2], cam[..., 2:]], axis=-1)


def _bin_triangles(
    screen: jnp.ndarray, tris: jnp.ndarray, s: RasterSettings
) -> jnp.ndarray:
    """Top-K triangle ids per tile by bbox-overlap area: ``[ntiles, K]``."""
    nt = s.image_size // s.tile_size
    v0, v1, v2 = (screen[tris[:, k]] for k in range(3))  # [T, 3]
    xy = jnp.stack([v0[:, :2], v1[:, :2], v2[:, :2]], axis=1)  # [T, 3, 2]
    tmin = xy.min(axis=1)  # [T, 2]
    tmax = xy.max(axis=1)

    # tile grid boxes
    t_idx = jnp.arange(nt, dtype=jnp.float32) * s.tile_size
    tx0 = t_idx[None, :, None]  # broadcast helpers
    # overlap area of each triangle bbox with each tile (separable)
    def overlap_1d(lo, hi, t0):
        return jnp.clip(
            jnp.minimum(hi[:, None], t0 + s.tile_size) - jnp.maximum(lo[:, None], t0),
            0.0,
            s.tile_size,
        )  # [T, nt]

    ox = overlap_1d(tmin[:, 0], tmax[:, 0], t_idx)  # [T, nt]
    oy = overlap_1d(tmin[:, 1], tmax[:, 1], t_idx)
    # [T, nt_y, nt_x] -> [T, ntiles]
    area = (oy[:, :, None] * ox[:, None, :]).reshape(tris.shape[0], nt * nt)
    # rank triangles per tile; zero-overlap => id padded with -1
    order = jnp.argsort(-area, axis=0)[: s.tris_per_tile]  # [K, ntiles]
    top_area = jnp.take_along_axis(area, order, axis=0)
    ids = jnp.where(top_area > 0, order, -1)
    return ids.T  # [ntiles, K]


def rasterize_soft(
    screen: jnp.ndarray,
    colors: jnp.ndarray,
    tris: jnp.ndarray,
    s: RasterSettings,
    bg_color: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-rasterize one mesh.

    Args:
      screen: ``[V, 3]`` (x_px, y_px, depth).
      colors: ``[V, 3]`` per-vertex colors.
      tris: ``[T, 3]``.

    Returns ``(image [H, W, 3], alpha [H, W])``.
    """
    H = s.image_size
    nt = H // s.tile_size
    K = s.tris_per_tile
    ids = _bin_triangles(screen, tris, s)  # [ntiles, K]
    safe = jnp.maximum(ids, 0)

    tri_v = tris[safe]  # [ntiles, K, 3]
    p0 = screen[tri_v[..., 0]]  # [ntiles, K, 3]
    p1 = screen[tri_v[..., 1]]
    p2 = screen[tri_v[..., 2]]
    c0 = colors[tri_v[..., 0]]
    c1 = colors[tri_v[..., 1]]
    c2 = colors[tri_v[..., 2]]

    # pixel centers per tile: [ntiles, px, 2]
    ty = jnp.arange(nt) * s.tile_size
    within = jnp.stack(
        jnp.meshgrid(
            jnp.arange(s.tile_size) + 0.5, jnp.arange(s.tile_size) + 0.5,
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 2)  # [px, (y, x)]
    tile_origin = jnp.stack(
        jnp.meshgrid(ty, ty, indexing="ij"), axis=-1
    ).reshape(-1, 2)  # [ntiles, (y0, x0)]
    pix = tile_origin[:, None, :] + within[None, :, :]  # [ntiles, px, (y, x)]
    px_xy = pix[..., ::-1]  # -> (x, y)

    # barycentric coords per (tile, pixel, tri)
    def edge(a, b, p):
        return (p[..., 0] - a[..., 0]) * (b[..., 1] - a[..., 1]) - (
            p[..., 1] - a[..., 1]
        ) * (b[..., 0] - a[..., 0])

    P = px_xy[:, :, None, :]  # [ntiles, px, 1, 2]
    A = p0[:, None, :, :2]  # [ntiles, 1, K, 2]
    Bv = p1[:, None, :, :2]
    Cv = p2[:, None, :, :2]
    area = edge(A, Bv, Cv)  # [ntiles, 1, K] signed 2x area
    w0 = edge(Bv, Cv, P)
    w1 = edge(Cv, A, P)
    w2 = edge(A, Bv, P)
    denom = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom  # [ntiles, px, K]

    inside_dist = jnp.minimum(jnp.minimum(b0, b1), b2)  # >0 inside
    influence = jax.nn.sigmoid(inside_dist / s.sigma)

    z0 = p0[:, None, :, 2]
    z1 = p1[:, None, :, 2]
    z2 = p2[:, None, :, 2]
    z = b0 * z0 + b1 * z1 + b2 * z2  # [ntiles, px, K]
    valid = (ids[:, None, :] >= 0) & (z > s.z_near)
    influence = jnp.where(valid, influence, 0.0)

    # softmax over -z with the background as a far-plane candidate
    # (SoftRas aggregation: nearest surface dominates, empty pixels fall to
    # the background)
    bg_score = -s.z_far / s.gamma
    # a pixel far outside a triangle extrapolates z arbitrarily -- only
    # near-inside candidates may compete in the depth softmax, else a bogus
    # extrapolated z dominates zmax and underflows the true surface weight
    competing = valid & (influence > 1e-4)
    zinv = jnp.where(competing, -z / s.gamma, bg_score)
    zmax = jnp.maximum(jnp.max(zinv, axis=-1, keepdims=True), bg_score)
    expz = influence * jnp.exp(zinv - zmax)
    bg_w = jnp.exp(bg_score - zmax[..., 0])
    denom_w = jnp.sum(expz, axis=-1) + bg_w + 1e-12
    wgt = expz / denom_w[..., None]  # [ntiles, px, K]

    col = (
        b0[..., None] * c0[:, None] + b1[..., None] * c1[:, None]
        + b2[..., None] * c2[:, None]
    )  # [ntiles, px, K, 3]
    img_tiles = jnp.einsum("tpk,tpkc->tpc", wgt, col)
    alpha_tiles = jnp.sum(wgt, axis=-1)
    img_tiles = img_tiles + (1.0 - alpha_tiles[..., None]) * bg_color

    # untile: [nt, nt, ts, ts, ...] -> [H, W, ...]
    ts = s.tile_size
    img = img_tiles.reshape(nt, nt, ts, ts, 3).transpose(0, 2, 1, 3, 4).reshape(H, H, 3)
    alpha = alpha_tiles.reshape(nt, nt, ts, ts).transpose(0, 2, 1, 3).reshape(H, H)
    return img, alpha


def render_mesh(
    vertices: jnp.ndarray,
    colors: jnp.ndarray,
    tris: jnp.ndarray,
    w2c_R: jnp.ndarray,
    w2c_T: jnp.ndarray,
    inmat: jnp.ndarray,
    settings: RasterSettings,
    bg_color: float = 1.0,
):
    """Batched render: ``[B, V, 3]`` vertices/colors -> ``[B, H, W, 3]``."""
    screen = project_vertices(vertices, w2c_R, w2c_T, inmat)

    def one(sc, co):
        return rasterize_soft(sc, co, tris, settings, bg_color)

    return jax.vmap(one)(screen, colors)


def project_landmarks(
    vertices: jnp.ndarray,
    landmark_index: jnp.ndarray,
    w2c_R: jnp.ndarray,
    w2c_T: jnp.ndarray,
    inmat: jnp.ndarray,
) -> jnp.ndarray:
    """``[B, 68, 2]`` projected landmark pixels (reference render_utils.py:59-100)."""
    screen = project_vertices(vertices, w2c_R, w2c_T, inmat)
    return screen[:, landmark_index, :2]
