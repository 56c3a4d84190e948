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
    mean_texture: jnp.ndarray  # [V, 3]  (0..255 scale, reference convention)
    texture_basis: jnp.ndarray  # [V*3, Dt]
    triangles: jnp.ndarray  # [T, 3] int32
    landmark_index: jnp.ndarray  # [68] int32 vertex ids
    # per-dimension texture-code sigmas: the stored/fitted texture code is
    # normalized, the decoder rescales (reference face_models.py:86-91)
    sig_tex: jnp.ndarray = None  # [Dt]
    skinmask: jnp.ndarray = None  # [V] 0/1 (reference skinmask.npy)


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
        # reference texture convention is 0..255 (rasterized then /255)
        mean_texture=jnp.asarray(
            np.full((n_vertices, 3), 153.0, np.float32)
        ),
        texture_basis=jnp.asarray(
            rng.standard_normal((n_vertices * 3, text_dims)).astype(np.float32) * 10.0
        ),
        triangles=jnp.asarray(tris),
        landmark_index=jnp.asarray(
            rng.choice(n_vertices, 68, replace=False).astype(np.int32)
        ),
        sig_tex=jnp.ones(text_dims, jnp.float32),
        skinmask=jnp.asarray(
            (rng.random(n_vertices) > 0.5).astype(np.float32)
        ),
    )


def load_basis(npz_path: str) -> BasisData:
    """Load a framework-native basis blob (one npz with all fields)."""
    d = np.load(npz_path)
    Dt = d["texture_basis"].shape[-1]
    V = d["mean_shape"].size // 3
    return BasisData(
        mean_shape=jnp.asarray(d["mean_shape"].reshape(-1, 3), jnp.float32),
        shape_basis=jnp.asarray(d["shape_basis"], jnp.float32),
        mean_texture=jnp.asarray(d["mean_texture"].reshape(-1, 3), jnp.float32),
        texture_basis=jnp.asarray(d["texture_basis"], jnp.float32),
        triangles=jnp.asarray(d["triangles"], jnp.int32),
        landmark_index=jnp.asarray(d["landmark_index"], jnp.int32),
        sig_tex=jnp.asarray(
            d["sig_tex"] if "sig_tex" in d else np.ones(Dt), jnp.float32
        ).reshape(-1),
        skinmask=jnp.asarray(
            d["skinmask"] if "skinmask" in d else np.ones(V), jnp.float32
        ).reshape(-1),
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
    skinmask_npy_path: str = None,
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
    sig_tex = np.asarray(
        d.get("sig_tex", np.ones(b_tex.shape[0])), np.float32
    ).reshape(-1)
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
    if skinmask_npy_path is not None:
        skinmask = np.asarray(np.load(skinmask_npy_path), np.float32).reshape(-1)
    else:
        skinmask = np.ones(V, np.float32)
    return BasisData(
        mean_shape=jnp.asarray(mu.reshape(V, 3)),
        shape_basis=jnp.asarray(b.T),  # [3V, Ds]
        mean_texture=jnp.asarray(mu_tex.reshape(V, 3)),
        texture_basis=jnp.asarray(b_tex.T),  # [3V, Dt]
        triangles=jnp.asarray(tris, jnp.int32),
        landmark_index=jnp.asarray(lm, jnp.int32),
        sig_tex=jnp.asarray(sig_tex),
        skinmask=jnp.asarray(skinmask),
    )


class GeometryDecoder:
    """Nonlinear geometry decoder — exact reference topology.

    Reference: surface_fitting/nl3dmm/face_models.py:25-62 ``NonLinear_3DMM``:
    ``geometry = fc3(relu(fc2(code)))`` where fc2 is Linear(Ds -> 1024) with
    default init and fc3 is Linear(1024 -> 3V) whose bias is initialized to
    the mean shape ``mu`` and whose weight's first ``Ds`` input columns hold
    the PCA shape basis (columns Ds..500 are filled with 0.001, the rest keep
    default init).  The mean shape lives in the BIAS — the decoder output IS
    the geometry.  In practice the fitted weights come from the pretrained
    ``nl3dmm_net_dict.pth`` (soft-loaded at fitting_nl3dmm.py:44-51); use
    :func:`geometry_decoder_params_from_torch` to transplant them.
    """

    def __init__(self, basis: BasisData, hidden: int = 1024, seed: int = 0):
        self.basis = basis
        V3, Ds = basis.shape_basis.shape
        k = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        # torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        bound1 = 1.0 / np.sqrt(Ds)
        w2 = jax.random.uniform(
            k3, (hidden, V3), minval=-1.0, maxval=1.0
        ) / np.sqrt(hidden)
        w2 = w2.at[:Ds, :].set(basis.shape_basis.T)  # PCA basis columns
        w2 = w2.at[Ds : min(500, hidden), :].set(0.001)  # ref :45-51
        self.init_params = {
            "w1": jax.random.uniform(k1, (Ds, hidden), minval=-bound1, maxval=bound1),
            "b1": jax.random.uniform(k2, (hidden,), minval=-bound1, maxval=bound1),
            "w2": w2,
            "b2": basis.mean_shape.reshape(-1),  # mu in the bias (ref :41)
        }
        del k4

    def __call__(
        self, params: Dict, shape_code: jnp.ndarray, scale: float = 1.0
    ) -> jnp.ndarray:
        """``shape_code``: [B, Ds] (iden ++ expr) -> vertices [B, V, 3]."""
        h = jax.nn.relu(shape_code @ params["w1"] + params["b1"])
        geometry = h @ params["w2"] + params["b2"]
        B = shape_code.shape[0]
        return geometry.reshape(B, -1, 3) * scale


def geometry_decoder_params_from_torch(state_dict: Dict) -> Dict:
    """Transplant the reference's pretrained decoder weights
    (``nl3dmm_net_dict.pth`` entries ``...geo_fc2/geo_fc3.{weight,bias}``,
    torch Linear stores [out, in] — transposed here)."""
    def find(suffix):
        for k, v in state_dict.items():
            if k.endswith(suffix):
                return np.asarray(v, np.float32)
        raise KeyError(suffix)

    return {
        "w1": jnp.asarray(find("geo_fc2.weight").T),
        "b1": jnp.asarray(find("geo_fc2.bias")),
        "w2": jnp.asarray(find("geo_fc3.weight").T),
        "b2": jnp.asarray(find("geo_fc3.bias")),
    }


def decode_texture(basis: BasisData, texture_code: jnp.ndarray) -> jnp.ndarray:
    """Linear texture model: [B, Dt] normalized code -> albedo [B, V, 3].

    Reference face_models.py:86-91: the stored code is sigma-normalized
    (``tex = (code * sig_tex) @ b_tex + mu_tex``), colors in 0..255, NOT
    clipped (the rasterized image is divided by 255 and clamped later).
    """
    B = texture_code.shape[0]
    code = texture_code * basis.sig_tex[None]
    tex = code @ basis.texture_basis.T
    return basis.mean_texture[None] + tex.reshape(B, -1, 3)


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


# 2nd-order SH *irradiance* constants (reference nl3dmm_renderer.py:51-57):
# the a_l (Lambertian convolution) x c_l (SH normalization) products, the
# Ramamoorthi-Hanrahan formulation — NOT the raw SH basis constants.
_SH_A0C0 = float(np.pi * (1.0 / np.sqrt(4.0 * np.pi)))
_SH_A1C1 = float((2.0 * np.pi / np.sqrt(3.0)) * (np.sqrt(3.0) / np.sqrt(4.0 * np.pi)))
_SH_A2C2 = float(
    (2.0 * np.pi / np.sqrt(8.0)) * (3.0 * np.sqrt(5.0) / np.sqrt(12.0 * np.pi))
)
_SH_D0 = float(0.5 / np.sqrt(3.0))


def sh_basis(normals: jnp.ndarray) -> jnp.ndarray:
    """9-term irradiance SH basis per normal (reference
    nl3dmm_renderer.py:108-122 ``build_color``'s ``arrH``): ``[..., 9]``."""
    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    ones = jnp.ones_like(x)
    return jnp.stack(
        [
            _SH_A0C0 * ones,
            -_SH_A1C1 * y,
            _SH_A1C1 * z,
            -_SH_A1C1 * x,
            _SH_A2C2 * x * y,
            -_SH_A2C2 * y * z,
            _SH_A2C2 * _SH_D0 * (3.0 * z * z - 1.0),
            -_SH_A2C2 * x * z,
            _SH_A2C2 * 0.5 * (x * x - y * y),
        ],
        axis=-1,
    )


def sh_shade(
    albedo: jnp.ndarray, normals: jnp.ndarray, illu_code: jnp.ndarray
) -> jnp.ndarray:
    """Per-vertex SH-lit color (reference nl3dmm_renderer.py:96-127).

    ``albedo``: [B, V, 3] (0..255 scale); ``illu_code``: [B, 27] laid out
    SH-major — ``view(-1, 9, 3)`` — matching the reference.  The +0.8
    ambient lives in the ILLUMINATION CODE (initialized at
    fitting_nl3dmm.py:153-161), not here.
    """
    B = albedo.shape[0]
    gamma = illu_code.reshape(B, 9, 3)
    basis = sh_basis(normals)  # [B, V, 9]
    shading = jnp.einsum("bvn,bnc->bvc", basis, gamma)
    return albedo * shading


def init_illu_code(batch_size: int) -> jnp.ndarray:
    """Zero SH code with the +0.8 ambient band (reference
    fitting_nl3dmm.py:153-161)."""
    illu = np.zeros((batch_size, 9, 3), np.float32)
    illu[:, 0, :] = 0.8
    return jnp.asarray(illu.reshape(batch_size, 27))
