"""Preprocessing + NL-3DMM tests: normalization math, masks, rasterizer, fit."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gazenerf_tpu.nl3dmm.face_model import (
    GeometryDecoder,
    decode_texture,
    random_basis,
    sh_shade,
    vertex_normals,
)
from gazenerf_tpu.nl3dmm.fitting import FitConfig, NL3DMMFitter
from gazenerf_tpu.nl3dmm.rasterizer import (
    RasterSettings,
    project_vertices,
    render_mesh,
)
from gazenerf_tpu.preprocess.landmarks import LandmarkDetector, synthetic_landmarks
from gazenerf_tpu.preprocess.masks import correct_head_mask, landmark_masks
from gazenerf_tpu.preprocess.normalize import (
    estimate_head_pose,
    normalize_face,
    vector_to_pitchyaw,
)

FACE_MODEL_6 = np.array(
    [
        [-45.0, -30.0, 30.0],  # right eye outer
        [-15.0, -30.0, 35.0],  # right eye inner
        [15.0, -30.0, 35.0],
        [45.0, -30.0, 30.0],
        [-25.0, 30.0, 30.0],  # mouth corners
        [25.0, 30.0, 30.0],
    ],
    np.float64,
)


def test_head_pose_roundtrip():
    """solvePnP recovers a synthetic camera pose (project -> solve)."""
    import cv2

    K = np.array([[1200.0, 0, 320], [0, 1200.0, 240], [0, 0, 1]])
    rvec_gt = np.array([[0.1], [-0.2], [0.05]])
    tvec_gt = np.array([[10.0], [-5.0], [900.0]])
    pts2d, _ = cv2.projectPoints(FACE_MODEL_6, rvec_gt, tvec_gt, K, None)
    rvec, tvec = estimate_head_pose(pts2d.reshape(-1, 2), FACE_MODEL_6, K)
    np.testing.assert_allclose(rvec, rvec_gt, atol=1e-4)
    np.testing.assert_allclose(tvec, tvec_gt, atol=1e-2)


def test_normalize_face_geometry():
    """The warped image is the right size and the rotation is orthonormal."""
    import cv2

    K = np.array([[1200.0, 0, 320], [0, 1200.0, 240], [0, 0, 1]])
    rvec = np.array([[0.05], [-0.1], [0.0]])
    tvec = np.array([[0.0], [0.0], [900.0]])
    img = np.random.default_rng(0).integers(0, 255, (480, 640, 3), np.uint8)
    warped, R, W = normalize_face(
        img, FACE_MODEL_6, rvec, tvec, K, img_dim=128, focal_norm=1600.0
    )
    assert warped.shape == (128, 128, 3)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    # forward axis points at the face center
    fc_dir = R[2]
    assert fc_dir[2] > 0.9


def test_vector_pitchyaw_roundtrip():
    from gazenerf_tpu.ops.rotation import pitchyaw_to_vector

    py = np.array([0.2, -0.3], np.float32)
    v = np.asarray(pitchyaw_to_vector(jnp.asarray(py[None])))[0]
    back = vector_to_pitchyaw(v)
    np.testing.assert_allclose(back, py, atol=1e-6)


def test_landmark_masks_and_cleanup():
    lm = synthetic_landmarks((32, 24, 96, 120))
    head, left, right = landmark_masks(lm, 128)
    assert head.max() == 255 and head.dtype == np.uint8
    assert left.sum() > 0 and right.sum() > 0
    # eyes sit inside the head region
    assert (head & left).sum() > 0
    # per-camera half-profile: cam 11 blanks the right eye
    _, l2, r2 = landmark_masks(lm, 128, cam_index=11)
    assert r2.sum() == 0 and l2.sum() > 0

    noisy = head.copy()
    noisy[2:6, 2:6] = 255  # speckle far from the face
    cleaned = correct_head_mask(noisy)
    assert cleaned[2:6, 2:6].sum() == 0


def test_landmark_detector_fallback_chain():
    det = LandmarkDetector()
    img = np.zeros((64, 64, 3), np.uint8)
    lm = det(img)
    assert lm.shape == (68, 2)
    lm2 = det(img)  # second call reuses/redetects without error
    assert lm2.shape == (68, 2)


# ---------------- NL-3DMM ----------------


@pytest.fixture(scope="module")
def basis():
    return random_basis(n_vertices=256, n_tris=400)


def test_face_model_decoders(basis):
    dec = GeometryDecoder(basis)
    code = jnp.zeros((2, 179))
    params = jax.tree_util.tree_map(jnp.asarray, dec.init_params)
    verts = dec(params, code)
    assert verts.shape == (2, 256, 3)
    # the mean shape lives in the fc3 BIAS (reference face_models.py:41):
    # with the hidden path zeroed the decoder emits exactly the mean shape
    params0 = {**params, "w1": jnp.zeros_like(params["w1"]),
               "b1": jnp.zeros_like(params["b1"])}
    verts0 = dec(params0, code)
    np.testing.assert_allclose(
        np.asarray(verts0[0]), np.asarray(basis.mean_shape), atol=1e-6
    )
    tex = decode_texture(basis, jnp.zeros((2, 100)))
    np.testing.assert_allclose(np.asarray(tex[0]), np.asarray(basis.mean_texture))
    normals = vertex_normals(verts, basis.triangles)
    n = np.linalg.norm(np.asarray(normals), axis=-1)
    # all vertices of the convex-hull mesh are referenced -> unit normals
    assert (n > 0.99).mean() > 0.9  # a few verts unreferenced by the truncated tri list
    from gazenerf_tpu.nl3dmm.face_model import init_illu_code

    shaded = sh_shade(tex, normals, init_illu_code(2))
    assert np.isfinite(np.asarray(shaded)).all()


def _camera(B):
    R = np.tile(np.diag([1.0, -1.0, -1.0]).astype(np.float32), (B, 1, 1))
    T = np.tile(np.array([0.0, 0.0, 4.0], np.float32), (B, 1))
    K = np.tile(
        np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]], np.float32), (B, 1, 1)
    )
    return jnp.asarray(R), jnp.asarray(T), jnp.asarray(K)


def test_rasterizer_renders_sphere(basis):
    """The unit sphere renders as a centered disk with correct depth order."""
    s = RasterSettings(image_size=128, tile_size=16, tris_per_tile=64)
    R, T, K = _camera(1)
    verts = basis.mean_shape[None]
    colors = jnp.full((1, 256, 3), 0.5)
    img, alpha = render_mesh(verts, colors, basis.triangles, R, T, K, s)
    img, alpha = np.asarray(img[0]), np.asarray(alpha[0])
    assert img.shape == (128, 128, 3)
    assert alpha[64, 64] > 0.9  # center covered
    assert alpha[2, 2] < 0.1  # corner background
    assert abs(img[2, 2, 0] - 1.0) < 0.05  # white background


def test_rasterizer_gradients(basis):
    s = RasterSettings(image_size=64, tile_size=16, tris_per_tile=32)
    R, T, K = _camera(1)
    colors = jnp.full((1, 256, 3), 0.5)

    def loss(verts):
        img, alpha = render_mesh(verts, colors, basis.triangles, R, T, K, s)
        return jnp.mean((img - 0.2) ** 2)

    g = jax.grad(loss)(basis.mean_shape[None])
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_nl3dmm_fitting_reduces_loss(basis):
    """Fit from a perturbed camera toward a rendered target: loss decreases."""
    cfg = FitConfig(
        stage1_steps=20, stage2_steps=30, image_size=64, lr_cam=3e-3,
    )
    raster = RasterSettings(image_size=64, tile_size=16, tris_per_tile=32)
    fitter = NL3DMMFitter(basis, cfg, raster)
    R, T, K = _camera(1)

    from gazenerf_tpu.nl3dmm.rasterizer import project_landmarks

    verts = basis.mean_shape[None]
    colors = jnp.full((1, 256, 3), 0.55)
    target, _ = render_mesh(verts, colors, basis.triangles, R, T, K, raster)
    lms = project_landmarks(verts, basis.landmark_index, R, T, K)

    # start the fit from a translated base camera: stage 1 must undo it
    T_off = np.asarray(T) + np.array([[0.08, -0.05, 0.2]], np.float32)
    res = fitter.fit(
        np.asarray(target), np.asarray(lms), np.asarray(R), T_off,
        np.asarray(K),
    )
    assert res["code"].shape == (1, 306)
    assert np.isfinite(res["stage2_losses"]).all()
    assert res["stage2_losses"][-1] < res["stage1_losses"][0]
    # output cameras invert correctly
    RT = res["w2c_Rmat"][0] @ res["c2w_Rmat"][0]
    np.testing.assert_allclose(RT, np.eye(3), atol=1e-5)


def test_fit_qa_renders_and_standalone_h5_qa(basis, tmp_path):
    """Fit-QA panels (ori | alpha-composite | mesh) from a finished fit, and
    the standalone --qa_from_h5 flow that re-renders SAVED fits from a
    preprocessed subject h5 (reference gen_nl3dmm_render_res.py:18-205)."""
    import h5py

    from gazenerf_tpu.preprocess.driver import (
        qa_renders_from_h5,
        write_fit_qa_renders,
    )

    cfg = FitConfig(stage1_steps=2, stage2_steps=2, image_size=64)
    raster = RasterSettings(image_size=64, tile_size=16, tris_per_tile=32)
    fitter = NL3DMMFitter(basis, cfg, raster)
    R, T, K = _camera(1)
    verts = basis.mean_shape[None]
    colors = jnp.full((1, 256, 3), 0.55)
    target, _ = render_mesh(verts, colors, basis.triangles, R, T, K, raster)

    res = {
        "code": np.zeros((1, 306), np.float32),
        "w2c_Rmat": np.asarray(R),
        "w2c_Tvec": np.asarray(T).reshape(1, 3),
        "inmat": np.asarray(K),
    }
    qa1 = str(tmp_path / "qa_fresh")
    paths = write_fit_qa_renders(fitter, res, np.asarray(target), qa1)
    assert len(paths) == 1 and os.path.exists(paths[0])
    import cv2

    panel = cv2.imread(paths[0])
    assert panel.shape == (64, 3 * 64, 3)  # ori | composite | mesh

    # standalone: QA from a saved subject h5 (codes + fitted cams + frames).
    # Full-size intrinsics are stored at 512 and rescaled to the fitter size.
    h5_path = str(tmp_path / "xgaze_subject.h5")
    K512 = np.asarray(K)[0] * (512.0 / 64.0)
    K512[2, 2] = 1.0
    with h5py.File(h5_path, "w") as f:
        u8 = (np.asarray(target)[0] * 255).astype(np.uint8)[..., ::-1]
        f["face_patch"] = np.stack([cv2.resize(u8, (512, 512))] * 2)
        f["latent_codes"] = np.zeros((2, 306), np.float32)
        f["w2c_Rmat"] = np.repeat(np.asarray(R), 2, axis=0)
        f["w2c_Tvec"] = np.repeat(np.asarray(T).reshape(1, 3), 2, axis=0)
        f["inmat"] = np.stack([K512] * 2)
    qa2 = str(tmp_path / "qa_h5")
    paths2 = qa_renders_from_h5(fitter, h5_path, qa2, limit=1)
    assert len(paths2) == 1
    assert cv2.imread(paths2[0]).shape == (64, 3 * 64, 3)

    # CLI surface: --qa_from_h5 drives the same path end-to-end
    from gazenerf_tpu.cli.preprocess import main

    qa3 = str(tmp_path / "qa_cli")
    rc = main([
        "--qa_from_h5", h5_path, "--qa_render_dir", qa3,
        "--fit_image_size", "64", "--qa_limit", "1",
    ])
    assert rc == 0
    assert len(os.listdir(qa3)) == 1


def test_unet_parity_with_reference():
    """flax U-Net == reference pre_processing/unet.py on transplanted weights."""
    import sys
    import torch

    from reference_oracle import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from pre_processing.unet import unet as TorchUNet

    from gazenerf_tpu.preprocess.unet import UNet, unet_params_from_torch

    torch.manual_seed(3)
    tnet = TorchUNet()
    tnet.eval()
    # make BN running stats non-trivial
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_t = tnet(torch.from_numpy(x)).numpy()  # [1, 19, H, W]

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = unet_params_from_torch(sd)
    jnet = UNet()
    out_j = jnet.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=2e-4, rtol=1e-3
    )


REFERENCE_TOPO = "/root/reference/configs/config_files/nl_3dmm_topo_info.npz"


@pytest.mark.skipif(
    not __import__("os").path.exists(REFERENCE_TOPO),
    reason="reference topo blob not present",
)
def test_load_reference_topology_and_corr_vf_normals():
    """The topology loader reads the REAL reference blob, and corr_vf-based
    vertex normals match the reference's torch computation
    (nl3dmm_renderer.py:81-94) on it."""
    import torch
    import torch.nn.functional as F

    from gazenerf_tpu.nl3dmm.face_model import load_topology, vertex_normals

    fv, corr = load_topology(REFERENCE_TOPO)
    V = int(fv.max()) + 1
    assert corr.shape == (V, 8)

    # random geometry over the full mesh, exercise the padded gather
    rng = np.random.default_rng(0)
    geo = rng.standard_normal((1, V, 3)).astype(np.float32)

    ours = np.asarray(
        vertex_normals(jnp.asarray(geo), jnp.asarray(fv), corr_vf=jnp.asarray(corr))
    )

    g = torch.from_numpy(geo)
    tris = torch.from_numpy(fv).long()
    v1, v2, v3 = (g[:, tris[:, k], :] for k in range(3))
    nnorm = torch.cross(v2 - v1, v3 - v1, 2)
    tri_normal = F.normalize(nnorm, dim=2)
    tri_normal = F.pad(tri_normal, [0, 0, 0, 1, 0, 0])
    v_norm = tri_normal[:, torch.from_numpy(corr).long(), :].sum(2)
    ref = F.normalize(v_norm, dim=-1).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_load_basis_pkl_roundtrip(tmp_path):
    """load_basis_pkl consumes the reference nl3dmm_dict.pkl layout."""
    import pickle

    from gazenerf_tpu.nl3dmm.face_model import decode_texture, load_basis_pkl

    rng = np.random.default_rng(1)
    V, Ds, Dt = 40, 179, 100
    d = {
        "mu": rng.standard_normal(3 * V).astype(np.float32),
        "b": rng.standard_normal((Ds, 3 * V)).astype(np.float32),
        "sig_id": rng.random(100).astype(np.float32),
        "sig_exp": rng.random(79).astype(np.float32),
        "mu_tex": rng.random(3 * V).astype(np.float32),
        "b_tex": rng.standard_normal((Dt, 3 * V)).astype(np.float32),
        "sig_tex": rng.random(Dt).astype(np.float32),
    }
    p = tmp_path / "nl3dmm_dict.pkl"
    with open(p, "wb") as f:
        pickle.dump(d, f)
    basis = load_basis_pkl(str(p))
    assert basis.mean_shape.shape == (V, 3)
    assert basis.shape_basis.shape == (3 * V, Ds)
    tex = decode_texture(basis, jnp.zeros((1, Dt)))
    np.testing.assert_allclose(
        np.asarray(tex)[0], np.clip(d["mu_tex"].reshape(V, 3), 0, 1), atol=1e-6
    )


def test_bisenet_torch_parity():
    """Flax BiSeNet == the reference's vendored torch BiSeNet on transplanted
    random weights (reference pre_processing/bisenet.py:226, resnet.py:56) —
    main head, eval mode, including the nearest / align-corners=True
    interpolation semantics."""
    import sys

    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch.utils.model_zoo as modelzoo

    # the reference trunk downloads ImageNet weights at init; zero-egress env
    modelzoo.load_url = lambda url: {}
    from pre_processing.bisenet import BiSeNet as RefBiSeNet

    from gazenerf_tpu.preprocess.bisenet import BiSeNet, bisenet_from_torch

    tnet = RefBiSeNet(19)
    g = torch.Generator().manual_seed(21)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.05)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
    tnet.eval()

    variables = bisenet_from_torch(
        {k: v.numpy() for k, v in tnet.state_dict().items()}
    )
    rng = np.random.default_rng(22)
    x = rng.random((1, 64, 64, 3), np.float32)
    got = np.asarray(BiSeNet().apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0]
    want = want.numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (1, 64, 64, 19)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-2)


def test_xgaze_layout_roundtrip(tmp_path):
    """A synthetic ETH-XGaze raw layout (frameNNNN/*camCC.JPG dirs +
    per-subject CSV + per-camera xml calibration) round-trips through the
    layout-driven driver into a trainer-readable h5 with correct per-camera
    indices, CSV head poses and upside-down-camera rotation (VERDICT round-2
    item: replaces cam_index = i % 18; reference
    dataset_pre_processing.py:80-445, pre_processing/data_process.py:107-192).
    """
    import cv2
    import h5py

    from gazenerf_tpu.cli.preprocess import DEFAULT_FACE_MODEL
    from gazenerf_tpu.data.cameras import load_camera_calibrations
    from gazenerf_tpu.data.h5_dataset import GazeH5Dataset
    from gazenerf_tpu.preprocess.driver import process_subject_records
    from gazenerf_tpu.preprocess.enumerate import iter_xgaze_subject

    rng = np.random.default_rng(0)
    subj = tmp_path / "subject0000"
    calib = tmp_path / "calib"
    calib.mkdir()

    # 18 camera calibrations (only 3 used); zero distortion
    for c in range(18):
        fs = cv2.FileStorage(
            str(calib / f"cam{c:02d}.xml"), cv2.FILE_STORAGE_WRITE
        )
        K = np.array([[600.0, 0, 120.0], [0, 600.0, 120.0], [0, 0, 1.0]])
        fs.write("Camera_Matrix", K)
        fs.write("Distortion_Coefficients", np.zeros((4, 1)))
        fs.write("cam_translation", np.zeros((3, 1)))
        fs.write("cam_rotation", np.eye(3))
        fs.release()

    # 2 frames x cams (02, 03, 07); cam03 is in the rotated set
    cams_used = [2, 3, 7]
    csv_rows = []
    marker = {}
    for f in range(2):
        fdir = subj / f"frame{f:04d}"
        fdir.mkdir(parents=True)
        for c in cams_used:
            img = (rng.random((240, 240, 3)) * 255).astype(np.uint8)
            img[:8, :8] = 255  # corner marker to detect the 180-deg rotation
            img[-8:, -8:] = 0
            name = f"frame{f:04d}_cam{c:02d}.JPG"
            cv2.imwrite(str(fdir / name), img)
            marker[(f, c)] = img
            hr = [0.01 * c, -0.02, 0.03]
            ht = [0.0, 0.0, 580.0]
            gaze3 = [0.05, -0.02, -0.99]
            csv_rows.append(
                [f"frame{f:04d}", name, "0.1", "-0.2"]
                + [str(v) for v in gaze3 + hr + ht]
            )
    csv_path = tmp_path / "subject0000.csv"
    with open(csv_path, "w") as fh:
        fh.write("\n".join(",".join(r) for r in csv_rows))

    cams = load_camera_calibrations("eth_xgaze", str(calib))
    records = iter_xgaze_subject(str(subj), str(csv_path), cams)
    assert len(records) == 6
    assert [r.cam_index for r in records[:3]] == cams_used
    assert records[1].rotate180 and not records[0].rotate180
    # CSV pose flowed into the record
    np.testing.assert_allclose(records[1].hr.ravel(), [0.03, -0.02, 0.03])

    out = str(tmp_path / "xgaze_subject0000.h5")
    process_subject_records(
        records, out, DEFAULT_FACE_MODEL, fitter=None, img_size=64
    )
    with h5py.File(out) as h:
        assert h["face_patch"].shape == (6, 64, 64, 3)
        np.testing.assert_array_equal(
            h["cam_index"][:].ravel(), cams_used * 2
        )
        assert np.isfinite(h["pitchyaw_head"][:]).all()
        # gaze label flowed through (nonzero head-coordinate pitchyaw)
        assert np.abs(h["pitchyaw_head"][:]).max() > 0

    # and the trainer-side dataset reads it
    ds = GazeH5Dataset(str(tmp_path), subjects=["subject0000.h5"], shuffle=False)
    s = ds[1]
    assert int(s["cam_index"][0]) == 3
    assert s["image"].shape == (64, 64, 3)


def test_mpii_layout_enumeration(tmp_path):
    """MPIIFaceGaze layout: dayNN dirs + pNN.txt + Calibration/Camera.mat
    (reference dataset_pre_processing.py:468-560).  Head pose, face center
    and 3D gaze flow from the annotation row into the record and the
    face-center anchors the normalization warp."""
    import cv2
    import scipy.io

    from gazenerf_tpu.cli.preprocess import DEFAULT_FACE_MODEL
    from gazenerf_tpu.preprocess.driver import process_subject_records
    from gazenerf_tpu.preprocess.enumerate import iter_mpii_subject

    subj = tmp_path / "p03"
    (subj / "Calibration").mkdir(parents=True)
    scipy.io.savemat(
        str(subj / "Calibration" / "Camera.mat"),
        {
            "cameraMatrix": np.array(
                [[600.0, 0, 120], [0, 600.0, 120], [0, 0, 1]]
            ),
            "distCoeffs": np.zeros((1, 5)),
        },
    )
    rng = np.random.default_rng(1)
    rows = []
    for day in ("day01", "day02"):
        (subj / day).mkdir()
        name = "0001.jpg"
        cv2.imwrite(str(subj / day / name),
                    (rng.random((240, 240, 3)) * 255).astype(np.uint8))
        row = [f"{day}/{name}"] + ["0"] * 14
        row += ["0.01", "-0.02", "0.03"]          # hr 15-17
        row += ["1.0", "2.0", "580.0"]            # ht 18-20
        row += ["0.5", "1.0", "575.0"]            # fc 21-23
        row += ["0.05", "-0.02", "-0.99"]         # gaze 24-26
        rows.append(" ".join(row))
    (subj / "p03.txt").write_text("\n".join(rows))

    records = iter_mpii_subject(str(subj))
    assert len(records) == 2
    np.testing.assert_allclose(records[0].hr.ravel(), [0.01, -0.02, 0.03])
    np.testing.assert_allclose(records[0].face_center.ravel(), [0.5, 1.0, 575.0])

    out = str(tmp_path / "mpii_subject0003.h5")
    process_subject_records(
        records, out, DEFAULT_FACE_MODEL, img_size=64, dataset="mpii_face_gaze"
    )
    import h5py

    with h5py.File(out) as h:
        assert h["face_patch"].shape == (2, 64, 64, 3)
        assert np.isfinite(h["pitchyaw_head"][:]).all()


def test_columbia_layout_enumeration(tmp_path):
    """Columbia layout: filename-encoded gaze label [-V, P-H] degrees
    (reference dataset_pre_processing.py:47) lands in pitchyaw_head
    directly; raw frames take the columbia crop path."""
    import cv2

    from gazenerf_tpu.cli.preprocess import DEFAULT_FACE_MODEL
    from gazenerf_tpu.preprocess.driver import process_subject_records
    from gazenerf_tpu.preprocess.enumerate import iter_columbia_subject

    d = tmp_path / "0001"
    d.mkdir()
    rng = np.random.default_rng(2)
    for name in ("0001_2m_0P_-10V_5H.jpg", "0001_2m_15P_10V_-5H.jpg"):
        cv2.imwrite(str(d / name), (rng.random((120, 160, 3)) * 255).astype(np.uint8))
    K = np.array([[600.0, 0, 80], [0, 600.0, 60], [0, 0, 1]])
    records = iter_columbia_subject(str(d), K)
    assert len(records) == 2 and records[0].columbia_crop
    np.testing.assert_allclose(
        records[0].pitchyaw_head_direct,
        [10 * np.pi / 180.0, -5 * np.pi / 180.0], atol=1e-6,
    )
    out = str(tmp_path / "columbia_subject0001.h5")
    process_subject_records(
        records, out, DEFAULT_FACE_MODEL, img_size=64, dataset="columbia"
    )
    import h5py

    with h5py.File(out) as h:
        got = h["pitchyaw_head"][0]
        np.testing.assert_allclose(
            got, [10 * np.pi / 180.0, -5 * np.pi / 180.0], atol=1e-6
        )


def test_gazecapture_layout_enumeration(tmp_path):
    """GazeCapture layout: per-frame camera params + head pose + 3D gaze
    target arrays (reference data_process.py:356-405); gaze = target - face
    center from the posed 3D face model."""
    import cv2

    from gazenerf_tpu.preprocess.enumerate import iter_gazecapture_subject

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        cv2.imwrite(str(d / f"{i:05d}.jpg"),
                    (rng.random((120, 120, 3)) * 255).astype(np.uint8))
    N = 2
    anno = {
        "camera_parameters": np.tile([600.0, 600.0, 60.0, 60.0], (N, 1)),
        "distortion_parameters": np.zeros((N, 5)),
        "head_pose": np.tile([0.01, -0.02, 0.03, 1.0, 2.0, 580.0], (N, 1)),
        "3d_gaze_target": np.tile([10.0, 20.0, 30.0], (N, 1)),
    }
    fm3d = np.zeros((14, 3))
    fm3d[10] = [1.0, 0.0, 0.0]
    fm3d[11] = [-1.0, 0.0, 0.0]
    records = iter_gazecapture_subject(str(d), anno, fm3d)
    assert len(records) == 2
    # fc = mean of posed rows 10:12 ~= ht; gaze = target - fc
    np.testing.assert_allclose(
        records[0].gaze_3d, [10.0 - 1.0, 20.0 - 2.0, 30.0 - 580.0], atol=1e-6
    )
    assert records[0].camera_matrix[0, 0] == 600.0
