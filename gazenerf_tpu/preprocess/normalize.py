"""Face normalization: head pose -> virtual-camera warp.

TPU-framework port of the xucong-zhang-style normalization used by the
reference (reference: pre_processing/data_process.py:60-104 ``normalizeData_face``,
utils/gaze_estimation_utils.py:55-143 eval-time twin): solvePnP head pose
from 2D landmarks + a generic 3D face model, then warp the image to a
virtual camera looking at the face center from a fixed distance.

This stage is host-side CPU work (OpenCV), exactly as in the reference — it
produces the ``.h5`` training data, it is not on the TPU training path.
Per-dataset focal/distance presets follow the reference
(pre_processing/data_process.py:107,194,285,356: ETH-XGaze 1600/680,
MPII 960/600-ish variants).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# (focal_norm, distance_norm) per dataset (reference data_process.py variants)
# PREPROCESSING-time virtual-camera presets (focal, distance): the reference
# normalizes every dataset at distance 680 with a per-dataset focal
# (pre_processing/data_process.py:62-63 + per-dataset calls :190 xgaze 1600,
# :277 mpii 1400, :348 columbia 1600, :399 gazecapture 1200).  EVAL-time
# estimator-input normalization is a different preset (960/600 at 224,
# utils/gaze_estimation_utils.py:55-143 -> eval/protocols.make_eval_normalizer).
NORMALIZATION_PRESETS = {
    "eth_xgaze": (1600.0, 680.0),
    "mpii_face_gaze": (1400.0, 680.0),
    "columbia": (1600.0, 680.0),
    "gaze_capture": (1200.0, 680.0),
}


def estimate_head_pose(
    landmarks_2d: np.ndarray,
    face_model_3d: np.ndarray,
    camera_matrix: np.ndarray,
    dist_coeffs: Optional[np.ndarray] = None,
    iterations: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """solvePnP head pose with iterative refinement.

    Reference: utils/gaze_estimation_utils.py ``estimateHeadPose`` — an
    initial EPnP solve refined by iterative solvePnP.

    Args:
      landmarks_2d: ``[N, 2]`` image points.
      face_model_3d: ``[N, 3]`` generic face-model points (same order).
      camera_matrix: ``[3, 3]``.

    Returns ``(rvec [3,1], tvec [3,1])``.
    """
    assert cv2 is not None, "OpenCV required for preprocessing"
    lm = np.ascontiguousarray(landmarks_2d, np.float64).reshape(-1, 1, 2)
    fm = np.ascontiguousarray(face_model_3d, np.float64).reshape(-1, 1, 3)
    dist = (
        np.zeros((5, 1)) if dist_coeffs is None else np.asarray(dist_coeffs, np.float64)
    )
    ok, rvec, tvec = cv2.solvePnP(
        fm, lm, camera_matrix, dist, flags=cv2.SOLVEPNP_EPNP
    )
    for _ in range(iterations):
        ok, rvec, tvec = cv2.solvePnP(
            fm, lm, camera_matrix, dist, rvec, tvec, True
        )
    return rvec, tvec


def face_center_from_pose(
    face_model_3d: np.ndarray, rvec: np.ndarray, tvec: np.ndarray
) -> np.ndarray:
    """3D face center: mean of (eye corners x4, mouth corners x2) landmarks.

    Reference: pre_processing/data_process.py:68-75 — the 6-point generic
    face model orders [4 eye corners, 2 mouth corners].
    """
    hR = cv2.Rodrigues(rvec)[0]
    Fc = hR @ face_model_3d.T + tvec.reshape(3, 1)
    two_eye = np.mean(Fc[:, 0:4], axis=1, keepdims=True)
    mouth = np.mean(Fc[:, 4:6], axis=1, keepdims=True)
    return np.mean(np.concatenate([two_eye, mouth], axis=1), axis=1).reshape(3, 1)


def normalize_face(
    img: np.ndarray,
    face_model_3d: np.ndarray,
    rvec: np.ndarray,
    tvec: np.ndarray,
    camera_matrix: np.ndarray,
    img_dim: int = 512,
    focal_norm: float = 1600.0,
    distance_norm: float = 680.0,
    face_center: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Warp ``img`` to the normalized virtual camera.

    Reference: pre_processing/data_process.py:60-104.  Returns
    ``(warped_img [img_dim, img_dim, 3], R [3,3], W [3,3])`` where ``R`` is
    the normalization rotation (world->normalized axes) and ``W`` the applied
    homography.
    """
    assert cv2 is not None, "OpenCV required for preprocessing"
    hR = cv2.Rodrigues(rvec)[0]
    fc = (
        face_center_from_pose(face_model_3d, rvec, tvec)
        if face_center is None
        else np.asarray(face_center, np.float64).reshape(3, 1)
    )
    distance = float(np.linalg.norm(fc))
    z_scale = distance_norm / distance
    cam_norm = np.array(
        [
            [focal_norm, 0, img_dim / 2],
            [0, focal_norm, img_dim / 2],
            [0, 0, 1.0],
        ]
    )
    S = np.diag([1.0, 1.0, z_scale])
    hRx = hR[:, 0]
    forward = (fc / distance).reshape(3)
    down = np.cross(forward, hRx)
    down /= np.linalg.norm(down)
    right = np.cross(down, forward)
    right /= np.linalg.norm(right)
    R = np.stack([right, down, forward], axis=0)  # == np.c_[...].T

    W = cam_norm @ S @ (R @ np.linalg.inv(camera_matrix))
    warped = cv2.warpPerspective(img, W, (img_dim, img_dim))
    return warped, R, W


def normalize_gaze_vector(gaze_vec: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Rotate a world-frame gaze vector into the normalized camera frame."""
    g = R @ np.asarray(gaze_vec, np.float64).reshape(3, 1)
    return (g / np.linalg.norm(g)).reshape(3)


def vector_to_pitchyaw(v: np.ndarray) -> np.ndarray:
    """3D gaze vector -> (pitch, yaw); inverse of
    :func:`gazenerf_tpu.ops.rotation.pitchyaw_to_vector` conventions."""
    v = np.asarray(v, np.float64).reshape(3)
    v = v / np.linalg.norm(v)
    pitch = np.arcsin(v[1])
    yaw = np.arctan2(v[0], v[2])
    return np.array([pitch, yaw], np.float32)


def gaze_to_head_coordinates(
    gaze_pitchyaw: np.ndarray, head_rotation: np.ndarray
) -> np.ndarray:
    """Convert a camera-frame gaze to head-coordinate pitch-yaw.

    Reference: dataset_pre_processing.py:404-430 rotates the gaze vector by
    the inverse head rotation before storing ``pitchyaw_head``.
    """
    from gazenerf_tpu.ops.rotation import pitchyaw_to_vector

    v = np.asarray(pitchyaw_to_vector(np.asarray(gaze_pitchyaw)[None]))[0]
    v_head = np.asarray(head_rotation).T @ v
    return vector_to_pitchyaw(v_head)


def normalized_head_pose(R_norm: np.ndarray, hR: np.ndarray) -> np.ndarray:
    """(pitch, yaw) of the head in the normalized camera.

    Reference: dataset_pre_processing.py:50-77 ``calc_normalized_head_pose``:
    ``hR_norm = R_norm @ hR``; the pose angles come from its z column.
    """
    hR_norm = R_norm @ hR
    z = hR_norm[:, 2]
    return np.array([np.arcsin(z[1]), np.arctan2(z[0], z[2])], np.float32)


class Undistorter:
    """Cached-map image undistortion (reference data_process.py:407-444)."""

    def __init__(self):
        self._maps = None
        self._key = None

    def __call__(self, img, camera_matrix, dist_coeffs):
        assert cv2 is not None
        key = (camera_matrix.tobytes(), np.asarray(dist_coeffs).tobytes(), img.shape)
        if key != self._key:
            h, w = img.shape[:2]
            self._maps = cv2.initUndistortRectifyMap(
                camera_matrix, dist_coeffs, None, camera_matrix, (w, h), cv2.CV_32FC1
            )
            self._key = key
        return cv2.remap(img, self._maps[0], self._maps[1], cv2.INTER_LINEAR)
