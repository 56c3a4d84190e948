"""NL-3DMM parity vs the PyTorch reference.

Oracles:
* the reference ``losses/nl3dmm_loss.py`` imported directly (it only needs
  torch + the real ``skinmask.npy``, loaded relative to the reference root),
* the reference ``face_models.py`` decoders instantiated from a synthetic
  ``nl3dmm_dict.pkl`` and weight-transplanted into the JAX modules,
* inline torch transcriptions of the SH ``build_color`` irradiance basis and
  the Euler ``compute_rotation`` (their home modules import PyTorch3D and
  cannot load here; formulas from nl3dmm_renderer.py:96-127 and
  fitting_nl3dmm.py:57-124).
"""

import contextlib
import os
import pickle
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE_ROOT = "/root/reference"


@contextlib.contextmanager
def _reference_cwd(path=REFERENCE_ROOT):
    old = os.getcwd()
    if path not in sys.path:
        sys.path.insert(0, path)
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def ref_loss():
    with _reference_cwd():
        from losses.nl3dmm_loss import NL3DMMLoss as RefLoss

        return RefLoss()


def test_nl3dmm_loss_term_parity(ref_loss, rng):
    """Every term of calc_total_loss matches the reference on random inputs."""
    from gazenerf_tpu.nl3dmm.loss import NL3DMMLoss

    skinmask = np.load(os.path.join(REFERENCE_ROOT, "configs/config_files/skinmask.npy"))
    mine = NL3DMMLoss(skinmask=skinmask)

    B, V, H = 2, skinmask.shape[0], 32
    vcs = rng.random((B, V, 3)).astype(np.float32) * 255.0
    illus = rng.standard_normal((B, 27)).astype(np.float32)
    pred = rng.random((B, H, H, 3)).astype(np.float32)
    gt = rng.random((B, H, H, 3)).astype(np.float32)
    mask = rng.random((B, H, H, 1)) > 0.3
    lm_p = rng.random((B, 68, 2)).astype(np.float32) * H
    lm_g = rng.random((B, 68, 2)).astype(np.float32) * H
    iden = rng.standard_normal((B, 100)).astype(np.float32)
    expr = rng.standard_normal((B, 79)).astype(np.float32)
    text = rng.standard_normal((B, 100)).astype(np.float32)

    # reference operates NCHW with a [B, 3, H, W] mask
    t = lambda a: torch.from_numpy(np.asarray(a))
    mask3 = np.broadcast_to(mask, (B, H, H, 3))
    ref = ref_loss.calc_total_loss(
        batch_vcs=t(vcs),
        cur_illus=t(illus),
        rendered_imgs=t(pred).permute(0, 3, 1, 2),
        gt_imgs=t(gt).permute(0, 3, 1, 2),
        mask_c3d=t(mask3.copy()).permute(0, 3, 1, 2),
        proj_lm2ds=t(lm_p),
        gt_lm2ds=t(lm_g),
        iden_codes=t(iden),
        text_codes=t(text),
        expr_codes=t(expr),
        lm_w=25.0,
    )
    got = mine.calc_total_loss(
        batch_vcs=jnp.asarray(vcs),
        cur_illus=jnp.asarray(illus),
        rendered_imgs=jnp.asarray(pred),
        gt_imgs=jnp.asarray(gt),
        mask_c3d=jnp.asarray(mask),
        proj_lm2ds=jnp.asarray(lm_p),
        gt_lm2ds=jnp.asarray(lm_g),
        iden_codes=jnp.asarray(iden),
        expr_codes=jnp.asarray(expr),
        text_codes=jnp.asarray(text),
        lm_w=25.0,
    )
    for k in ["img", "lm", "illu_mean_loss", "code_regu", "skin", "total_loss"]:
        np.testing.assert_allclose(
            float(got[k]), float(ref[k]), rtol=2e-5, atol=1e-6, err_msg=k
        )


def _write_synthetic_3dmm_pkl(root, V, Ds=179, Dt=100, seed=0):
    rng = np.random.default_rng(seed)
    d = {
        "mu": rng.standard_normal(3 * V).astype(np.float32),
        "b": (rng.standard_normal((Ds, 3 * V)) * 0.05).astype(np.float32),
        "sig_id": np.abs(rng.standard_normal(100)).astype(np.float32),
        "sig_exp": np.abs(rng.standard_normal(79)).astype(np.float32),
        "mu_tex": (rng.random(3 * V) * 255).astype(np.float32),
        "b_tex": (rng.standard_normal((Dt, 3 * V)) * 5).astype(np.float32),
        "sig_tex": np.abs(rng.standard_normal(Dt)).astype(np.float32) + 0.5,
    }
    os.makedirs(os.path.join(root, "configs/config_models"), exist_ok=True)
    with open(os.path.join(root, "configs/config_models/nl3dmm_dict.pkl"), "wb") as f:
        pickle.dump(d, f)
    return d


def test_geometry_and_texture_decoder_transplant(tmp_path, rng):
    """Reference NonLinear_3DMM / Linear_3DMM weights transplant into the JAX
    decoders with allclose outputs (reference face_models.py:25-92).

    V must be the reference's hardcoded 34650 (face_models.py:33)."""
    V, Ds, Dt = 34650, 179, 100
    d = _write_synthetic_3dmm_pkl(str(tmp_path), V=V, Ds=Ds, Dt=Dt)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    old = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        from configs.gazenerf_options import BaseOptions
        from surface_fitting.nl3dmm.face_models import Linear_3DMM, NonLinear_3DMM

        opt = BaseOptions()
        torch.manual_seed(0)
        ref_geo = NonLinear_3DMM(opt).eval()
        ref_tex = Linear_3DMM(opt).eval()
    finally:
        os.chdir(old)

    from gazenerf_tpu.nl3dmm.face_model import (
        BasisData,
        GeometryDecoder,
        decode_texture,
        geometry_decoder_params_from_torch,
    )

    basis = BasisData(
        mean_shape=jnp.asarray(d["mu"].reshape(V, 3)),
        shape_basis=jnp.asarray(d["b"].T),
        mean_texture=jnp.asarray(d["mu_tex"].reshape(V, 3)),
        texture_basis=jnp.asarray(d["b_tex"].T),
        triangles=jnp.zeros((1, 3), jnp.int32),
        landmark_index=jnp.zeros(68, jnp.int32),
        sig_tex=jnp.asarray(d["sig_tex"]),
        skinmask=jnp.ones(V, jnp.float32),
    )

    code = rng.standard_normal((2, Ds)).astype(np.float32)
    ref_out = ref_geo(
        torch.from_numpy(code[:, :100]), torch.from_numpy(code[:, 100:])
    ).detach().numpy()

    dec = GeometryDecoder(basis)
    params = geometry_decoder_params_from_torch(
        {k: v.detach().numpy() for k, v in ref_geo.state_dict().items()}
    )
    got = np.asarray(dec(params, jnp.asarray(code)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)

    # PCA-init structure: transplanting the FRESH reference init must equal
    # the JAX init on the deterministic parts (basis columns + mu bias)
    w2 = np.asarray(dec.init_params["w2"])
    np.testing.assert_allclose(w2[:Ds, :], d["b"], atol=1e-6)
    assert np.all(w2[Ds:500][: min(500, 1024) - Ds] == 0.001)
    np.testing.assert_allclose(
        np.asarray(dec.init_params["b2"]), d["mu"], atol=1e-6
    )

    tex_code = rng.standard_normal((2, Dt)).astype(np.float32)
    ref_tex_out = ref_tex(torch.from_numpy(tex_code)).detach().numpy()
    got_tex = np.asarray(decode_texture(basis, jnp.asarray(tex_code)))
    np.testing.assert_allclose(got_tex, ref_tex_out, rtol=1e-4, atol=1e-4)


def test_sh_shading_parity(rng):
    """sh_basis/sh_shade match the reference build_color formula
    (nl3dmm_renderer.py:51-57,96-127, transcribed as a torch oracle)."""
    from gazenerf_tpu.nl3dmm.face_model import sh_shade

    B, V = 2, 50
    vcolor = rng.random((B, V, 3)).astype(np.float32) * 255
    norm = rng.standard_normal((B, V, 3)).astype(np.float32)
    norm /= np.linalg.norm(norm, axis=-1, keepdims=True)
    gamma27 = rng.standard_normal((B, 27)).astype(np.float32)

    a0, a1, a2 = np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0)
    c0 = 1 / np.sqrt(4 * np.pi)
    c1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
    c2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)
    d0 = 0.5 / np.sqrt(3.0)

    g = torch.from_numpy(gamma27).view(-1, 9, 3)
    n = torch.from_numpy(norm).view(-1, 3)
    nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
    H = torch.stack(
        [
            torch.ones_like(nx) * a0 * c0,
            -a1 * c1 * ny,
            a1 * c1 * nz,
            -a1 * c1 * nx,
            a2 * c2 * nx * ny,
            -a2 * c2 * ny * nz,
            a2 * c2 * d0 * (3 * nz.pow(2) - 1),
            -a2 * c2 * nx * nz,
            a2 * c2 * 0.5 * (nx.pow(2) - ny.pow(2)),
        ],
        1,
    ).view(B, V, 9)
    ref = (torch.from_numpy(vcolor) * H.bmm(g)).numpy()

    got = np.asarray(
        sh_shade(jnp.asarray(vcolor), jnp.asarray(norm), jnp.asarray(gamma27))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_compute_rotation_parity(rng):
    """compute_rotation_ref matches the reference Euler convention
    (fitting_nl3dmm.py:57-124, transcribed as a torch oracle)."""
    from gazenerf_tpu.nl3dmm.fitting import compute_rotation_ref

    angles = rng.standard_normal((4, 3)).astype(np.float32)
    a = torch.from_numpy(angles)
    x, y, z = a[:, :1], a[:, 1:2], a[:, 2:]
    ones, zeros = torch.ones_like(x), torch.zeros_like(x)
    rot_x = torch.cat(
        [ones, zeros, zeros, zeros, x.cos(), -x.sin(), zeros, x.sin(), x.cos()], 1
    ).reshape(-1, 3, 3)
    rot_y = torch.cat(
        [y.cos(), zeros, y.sin(), zeros, ones, zeros, -y.sin(), zeros, y.cos()], 1
    ).reshape(-1, 3, 3)
    rot_z = torch.cat(
        [z.cos(), -z.sin(), zeros, z.sin(), z.cos(), zeros, zeros, zeros, ones], 1
    ).reshape(-1, 3, 3)
    ref = (rot_z @ rot_y @ rot_x).permute(0, 2, 1).numpy()

    got = np.asarray(compute_rotation_ref(jnp.asarray(angles)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_illu_init_matches_reference():
    """Illumination code init: +0.8 on the first SH band of each channel
    (fitting_nl3dmm.py:153-161)."""
    from gazenerf_tpu.nl3dmm.face_model import init_illu_code

    illu = np.asarray(init_illu_code(3))
    assert illu.shape == (3, 27)
    g = illu.reshape(3, 9, 3)
    assert np.all(g[:, 0, :] == 0.8)
    assert np.all(g[:, 1:, :] == 0.0)
