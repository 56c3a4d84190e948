"""NL-3DMM face model: nonlinear geometry decoder + linear texture + SH light.

TPU (JAX) re-design of the reference's NL-3DMM
(reference: surface_fitting/nl3dmm/face_models.py:25-92 — linear texture
3DMM + a nonlinear geometry decoder MLP 179 -> 1024 -> 3V initialized from
the PCA basis; nl3dmm_renderer.py:81-127 — vertex normals + 2nd-order
spherical-harmonics lighting).

The PCA basis/topology blobs ship separately (the reference loads
``nl_3dmm_topo_info.npz``); :func:`random_basis` builds a structurally
identical synthetic basis so the whole fitting pipeline is testable without
the asset.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BasisData(NamedTuple):
    mean_shape: jnp.ndarray  # [V, 3]
    shape_basis: jnp.ndarray  # [V*3, Ds]   (identity ++ expression columns)
    mean_texture: jnp.ndarray  # [V, 3]
    texture_basis: jnp.ndarray  # [V*3, Dt]
    triangles: jnp.ndarray  # [T, 3] int32
    landmark_index: jnp.ndarray  # [68] int32 vertex ids


def random_basis(
    n_vertices: int = 1024,
    n_tris: int = 2000,
    iden_dims: int = 100,
    expr_dims: int = 79,
    text_dims: int = 100,
    seed: int = 0,
) -> BasisData:
    """Synthetic sphere-ish basis with valid topology (for tests/dev)."""
    rng = np.random.default_rng(seed)
    # Fibonacci sphere for a well-distributed mean shape
    i = np.arange(n_vertices)
    phi = np.arccos(1 - 2 * (i + 0.5) / n_vertices)
    theta = np.pi * (1 + 5**0.5) * i
    mean = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    )
    from scipy.spatial import ConvexHull

    tris = ConvexHull(mean).simplices[:n_tris].astype(np.int32)
    Ds = iden_dims + expr_dims
    return BasisData(
        mean_shape=jnp.asarray(mean, jnp.float32),
        shape_basis=jnp.asarray(
            rng.standard_normal((n_vertices * 3, Ds)).astype(np.float32) * 0.02
        ),
        mean_texture=jnp.asarray(
            np.full((n_vertices, 3), 0.6, np.float32)
        ),
        texture_basis=jnp.asarray(
            rng.standard_normal((n_vertices * 3, text_dims)).astype(np.float32) * 0.05
        ),
        triangles=jnp.asarray(tris),
        landmark_index=jnp.asarray(
            rng.choice(n_vertices, 68, replace=False).astype(np.int32)
        ),
    )


def load_basis(npz_path: str) -> BasisData:
    """Load a framework-native basis blob (one npz with all fields)."""
    d = np.load(npz_path)
    return BasisData(
        mean_shape=jnp.asarray(d["mean_shape"].reshape(-1, 3), jnp.float32),
        shape_basis=jnp.asarray(d["shape_basis"], jnp.float32),
        mean_texture=jnp.asarray(d["mean_texture"].reshape(-1, 3), jnp.float32),
        texture_basis=jnp.asarray(d["texture_basis"], jnp.float32),
        triangles=jnp.asarray(d["triangles"], jnp.int32),
        landmark_index=jnp.asarray(d["landmark_index"], jnp.int32),
    )


def load_topology(npz_path: str):
    """Load the reference's mesh-topology blob
    (``configs/config_files/nl_3dmm_topo_info.npz``, read at
    nl3dmm_renderer.py:44-49).

    Returns ``(fv_indices [T, 3] int32, corr_vf_indices [V, K] int32)`` —
    face-vertex triangles and the padded per-vertex adjacent-face table
    whose padding sentinel is T (one zero face is appended before the
    gather; see :func:`vertex_normals`).
    """
    z = np.load(npz_path)
    fv = np.asarray(z["fv_indices"], np.int32)
    corr = np.asarray(z["corr_vf_indices"], np.int32)
    V = int(fv.max()) + 1
    assert corr.shape[0] == V, (corr.shape, V)
    assert corr.max() <= fv.shape[0], "padding sentinel must be n_faces"
    return fv, corr


def load_basis_pkl(
    pkl_path: str,
    topo_npz_path: str = None,
    iden_dims: int = 100,
    expr_dims: int = 79,
    landmark_pkl_path: str = None,
) -> BasisData:
    """Load the reference's basis pickle
    (``configs/config_models/nl3dmm_dict.pkl``, read at
    face_models.py:9-23: keys ``mu`` [3V], ``b`` [Ds, 3V], ``sig_id``,
    ``sig_exp``, ``mu_tex`` [3V], ``b_tex`` [Dt, 3V], ``sig_tex``).

    The triangles come from the separate topology npz (pass
    ``topo_npz_path``); landmark vertex ids from ``LandMarkInfo.pkl``
    when available.
    """
    import pickle

    with open(pkl_path, "rb") as f:
        d = pickle.load(f)
    mu = np.asarray(d["mu"], np.float32).reshape(-1)
    b = np.asarray(d["b"], np.float32)  # [Ds, 3V]
    mu_tex = np.asarray(d["mu_tex"], np.float32).reshape(-1)
    b_tex = np.asarray(d["b_tex"], np.float32)  # [Dt, 3V]
    V = mu.shape[0] // 3
    if topo_npz_path is not None:
        tris, _ = load_topology(topo_npz_path)
    else:
        tris = np.zeros((1, 3), np.int32)
    if landmark_pkl_path is not None:
        with open(landmark_pkl_path, "rb") as f:
            lm = np.asarray(pickle.load(f), np.int64).reshape(-1)[:68]
    else:
        lm = np.linspace(0, V - 1, 68).astype(np.int64)
    return BasisData(
        mean_shape=jnp.asarray(mu.reshape(V, 3)),
        shape_basis=jnp.asarray(b.T),  # [3V, Ds]
        mean_texture=jnp.asarray(mu_tex.reshape(V, 3)),
        texture_basis=jnp.asarray(b_tex.T),  # [3V, Dt]
        triangles=jnp.asarray(tris, jnp.int32),
        landmark_index=jnp.asarray(lm, jnp.int32),
    )


class GeometryDecoder:
    """Nonlinear geometry decoder: MLP 179 -> hidden -> 3V, PCA-initialized.

    Reference: surface_fitting/nl3dmm/face_models.py:25-62 — the last layer
    is initialized from the PCA shape basis so the decoder starts as the
    linear 3DMM and learns nonlinearity during fitting.
    """

    def __init__(self, basis: BasisData, hidden: int = 1024, seed: int = 0):
        self.basis = basis
        V3, Ds = basis.shape_basis.shape
        k = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(k)
        scale = 1.0 / np.sqrt(Ds)
        self.init_params = {
            "w1": jax.random.normal(k1, (Ds, hidden)) * scale,
            "b1": jnp.zeros(hidden),
            # near-linear init: w2 approximates basis through the random w1
            "w2": jax.random.normal(k2, (hidden, V3)) * 1e-4,
            "b2": jnp.zeros(V3),
            "linear_skip": basis.shape_basis.T,  # [Ds, V3]
        }

    def __call__(self, params: Dict, shape_code: jnp.ndarray) -> jnp.ndarray:
        """``shape_code``: [B, Ds] -> vertices [B, V, 3]."""
        h = jnp.tanh(shape_code @ params["w1"] + params["b1"])
        delta = h @ params["w2"] + params["b2"]
        linear = shape_code @ params["linear_skip"]
        out = linear + delta
        B = shape_code.shape[0]
        return self.basis.mean_shape[None] + out.reshape(B, -1, 3)


def decode_texture(basis: BasisData, texture_code: jnp.ndarray) -> jnp.ndarray:
    """Linear texture model: [B, Dt] -> per-vertex albedo [B, V, 3]."""
    B = texture_code.shape[0]
    tex = texture_code @ basis.texture_basis.T
    return jnp.clip(basis.mean_texture[None] + tex.reshape(B, -1, 3), 0.0, 1.0)


def vertex_normals(
    vertices: jnp.ndarray,
    triangles: jnp.ndarray,
    corr_vf: jnp.ndarray = None,
) -> jnp.ndarray:
    """Vertex normals (reference nl3dmm_renderer.py:81-94).

    ``vertices``: [B, V, 3]; ``triangles``: [T, 3].

    With ``corr_vf`` ([V, K] padded per-vertex adjacent-face table, the
    reference's ``corr_vf_indices`` where padding points at a zero sentinel
    face appended at index T) this reproduces the reference exactly: each
    face normal is UNIT-normalized before the per-vertex sum (uniform
    weighting), then the sum is normalized.  Without it, faces are
    area-weighted via scatter-add — the common NeRF-tooling convention,
    equal in the limit of uniform triangle areas.
    """
    v0 = vertices[:, triangles[:, 0]]
    v1 = vertices[:, triangles[:, 1]]
    v2 = vertices[:, triangles[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # [B, T, 3] (area-weighted)
    B, V, _ = vertices.shape
    if corr_vf is not None:
        fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
        # zero sentinel face at index T (reference pads tri_normal with one
        # zero row — nl3dmm_renderer.py:89)
        fn = jnp.concatenate([fn, jnp.zeros((B, 1, 3), fn.dtype)], axis=1)
        normals = jnp.sum(fn[:, corr_vf, :], axis=2)  # [B, V, 3]
    else:
        normals = jnp.zeros((B, V, 3), vertices.dtype)
        for k in range(3):
            normals = normals.at[:, triangles[:, k]].add(fn)
    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    return normals / jnp.maximum(norm, 1e-8)


# 2nd-order SH basis constants (reference nl3dmm_renderer.py:96-127)
_SH_C = [
    0.282095, 0.488603, 0.488603, 0.488603,
    1.092548, 1.092548, 1.092548, 0.315392, 0.546274,
]


def sh_basis(normals: jnp.ndarray) -> jnp.ndarray:
    """9-term 2nd-order SH basis per normal: ``[..., 9]``."""
    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    ones = jnp.ones_like(x)
    return jnp.stack(
        [
            _SH_C[0] * ones,
            -_SH_C[1] * y,
            _SH_C[2] * z,
            -_SH_C[3] * x,
            _SH_C[4] * x * y,
            -_SH_C[5] * y * z,
            _SH_C[7] * (3.0 * z * z - 1.0),
            -_SH_C[6] * x * z,
            _SH_C[8] * (x * x - y * y),
        ],
        axis=-1,
    )


def sh_shade(
    albedo: jnp.ndarray, normals: jnp.ndarray, illu_code: jnp.ndarray
) -> jnp.ndarray:
    """Per-vertex SH-lit color.

    ``albedo``: [B, V, 3]; ``illu_code``: [B, 27] (9 SH coeffs x RGB).
    Reference: nl3dmm_renderer.py:96-127.
    """
    B = albedo.shape[0]
    gamma = illu_code.reshape(B, 3, 9)
    gamma = gamma.at[:, :, 0].add(0.8)  # ambient init offset (reference)
    basis = sh_basis(normals)  # [B, V, 9]
    shading = jnp.einsum("bvn,bcn->bvc", basis, gamma)
    return albedo * shading
