"""Camera utilities: intrinsics scaling, ray grids, orbit cameras.

Mirrors the reference's camera plumbing:

* featmap-resolution intrinsics + analytic inverse
  (reference trainer/gazenerf_trainer.py:317-328)
* the 64x64 base ray grid + base camera
  (reference utils/render_utils.py:20-40, 88-97)
* the 45-view orbit used for novel-view GIFs
  (reference utils/render_utils.py:42-99)
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

# configs/config_files/cam_inmat_info_32x32.json (reference repo)
BASE_INV_INMAT_32 = np.array(
    [
        [0.007790804840624332, 0.0, -0.12553827464580536],
        [0.0, 0.007790804840624332, -0.12832458317279816],
        [0.0, 0.0, 1.0],
    ],
    np.float32,
)
BASE_INMAT_32 = np.array(
    [
        [128.3564453125, 0.0, 16.1136474609375],
        [0.0, 128.3564453125, 16.47128677368164],
        [0.0, 0.0, 1.0],
    ],
    np.float32,
)


def scale_intrinsics_to_featmap(
    inmat: np.ndarray, img_size: int, featmap_size: int
) -> np.ndarray:
    """Scale full-image intrinsics to featmap resolution and invert analytically.

    Reference trainer/gazenerf_trainer.py:317-325: rows 0-1 scaled by
    ``featmap/img``; the inverse is built entry-wise (assumes zero skew).
    Returns ``inv_inmat`` with the same batch shape as ``inmat``.
    """
    t = np.array(inmat, np.float32, copy=True)
    t[..., :2, :] *= featmap_size / img_size
    inv = np.zeros_like(t)
    inv[..., 0, 0] = 1.0 / t[..., 0, 0]
    inv[..., 1, 1] = 1.0 / t[..., 1, 1]
    inv[..., 0, 2] = -(t[..., 0, 2] / t[..., 0, 0])
    inv[..., 1, 2] = -(t[..., 1, 2] / t[..., 1, 1])
    inv[..., 2, 2] = 1.0
    return inv


def base_inv_inmat(featmap_size: int) -> np.ndarray:
    """The demo-render inverse intrinsics at a given featmap size.

    Reference utils/render_utils.py:36-40 divides the 32x32 focal block by
    ``featmap_size / 32``.
    """
    m = BASE_INV_INMAT_32.copy()
    m[:2, :2] /= featmap_size / 32.0
    return m


def base_camera(featmap_size: int) -> Dict[str, np.ndarray]:
    """Identity-ish frontal camera (reference utils/render_utils.py:88-97)."""
    R = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    T = np.array([0.0, 0.0, 12.0], np.float32)
    return {
        "Rmats": R[None],
        "Tvecs": T[None, :, None],
        "inv_inmats": base_inv_inmat(featmap_size)[None],
    }


def orbit_cameras(view_num: int, featmap_size: int) -> List[Dict[str, np.ndarray]]:
    """The 45-view circular orbit (reference utils/render_utils.py:42-99)."""
    tv_z = 12.0
    tv_x = 5.3
    center = np.zeros(3)
    radius = math.sqrt(tv_x**2)  # sqrt(|[tv_x,0,tv_z]|^2 - |[0,0,tv_z]|^2)
    d2_up = np.array([0.0, -1.0, 0.0])

    cams = []
    for angle in np.linspace(0.0, 360.0, view_num):
        theta = angle / 180.0 * math.pi
        vp = np.array([math.cos(theta) * radius, math.sin(theta) * radius, tv_z])
        d1 = center - vp
        d2 = np.cross(d2_up, d1)
        d3 = np.cross(d1, d2)
        d1, d2, d3 = (v / np.linalg.norm(v) for v in (d1, d2, d3))
        R = np.stack([d2, d3, d1], axis=1).astype(np.float32)
        cams.append(
            {
                "Rmats": R[None],
                "Tvecs": vp.astype(np.float32)[None, :, None],
                "inv_inmats": base_inv_inmat(featmap_size)[None],
            }
        )
    return cams


def load_camera_calibrations(dataset: str, cam_dir: str):
    """Per-camera (matrix, distortion) calibration loading.

    Mirrors reference evaluate_metrics.py:57-99 ``load_cams``:
    ETH-XGaze: 18 OpenCV-XML files ``cam00.xml..cam17.xml``; MPII: 15
    ``CameraNN.mat``; Columbia / GazeCapture: a single ``cam00.xml``.
    Returns a list of (K, dist) for multi-camera datasets, or one pair.
    """
    import os

    import cv2

    def read_xml(path):
        fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
        K = fs.getNode("Camera_Matrix").mat()
        d = fs.getNode("Distortion_Coefficients").mat()
        fs.release()
        return np.asarray(K, np.float64), np.asarray(d, np.float64)

    if dataset == "eth_xgaze":
        return [
            read_xml(os.path.join(cam_dir, "cam%02d.xml" % i)) for i in range(18)
        ]
    if dataset == "mpii_face_gaze":
        import scipy.io

        out = []
        for i in range(15):
            mat = scipy.io.loadmat(os.path.join(cam_dir, "Camera%02d.mat" % i))
            out.append(
                (
                    np.asarray(mat["cameraMatrix"], np.float64),
                    np.asarray(mat["distCoeffs"], np.float64),
                )
            )
        return out
    # columbia / gaze_capture: one camera
    return read_xml(os.path.join(cam_dir, "cam00.xml"))


def make_cam_lookup(dataset: str, cams, subject: str = ""):
    """``cam_index -> (K, dist)`` (reference utils/metrics_utils.py:124-136
    ``select_cam_matrix``).

    MPII indexes by the subject number and pins the principal point to 256;
    Columbia / GazeCapture have a single camera regardless of index.
    """

    def lookup(cam_ind: int):
        if dataset == "eth_xgaze":
            return cams[cam_ind]
        if dataset == "mpii_face_gaze":
            K, d = cams[int(subject[-5:-3])]
            K = np.array(K, np.float64, copy=True)
            K[0, 2] = 256.0
            K[1, 2] = 256.0
            return K, d
        return cams  # single (K, dist) pair

    return lookup
