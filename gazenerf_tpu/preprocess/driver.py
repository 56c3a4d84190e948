"""Offline data factory driver: raw frames -> per-subject training h5.

TPU-framework twin of the reference's preprocessing driver
(reference: dataset_pre_processing.py:80-445,1354-1505): per frame —
normalize to the virtual camera, detect landmarks, generate masks, fit the
NL-3DMM, convert gaze to head coordinates — then write one h5 row in the
schema the trainer reads (datasets/eth_xgaze.py:330-356; our
data/synthetic.py documents it).

The heavy neural detectors (face-alignment, BiSeNet weights) are optional;
the driver degrades to geometric fallbacks so the pipeline runs end-to-end
anywhere (masks/landmarks quality then limits data quality, not
functionality).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None
import h5py

from gazenerf_tpu.preprocess.landmarks import LandmarkDetector
from gazenerf_tpu.preprocess.masks import (
    BiSeNetMasker,
    UNetEyeMasker,
    landmark_masks,
)
from gazenerf_tpu.preprocess.normalize import (
    NORMALIZATION_PRESETS,
    estimate_head_pose,
    gaze_to_head_coordinates,
    normalize_face,
    normalized_head_pose,
    vector_to_pitchyaw,
)

logger = logging.getLogger(__name__)

# generic 6-point 3D face model column order: 4 eye corners, 2 mouth corners
# (reference data/eth_xgaze/face_model.txt consumed at data_process.py:68-75);
# iBUG-68 indices of those points:
FACE_MODEL_LM68 = [36, 39, 42, 45, 48, 54]


class SubjectWriter:
    """Appends schema rows to one per-subject h5 file."""

    def __init__(self, path: str, img_size: int = 512):
        from gazenerf_tpu.data.synthetic import SCHEMA

        self.img_size = img_size
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = h5py.File(path, "w")
        for key, (shape, dtype) in SCHEMA.items():
            if key == "face_patch":
                shape = (img_size, img_size, 3)
            elif key in ("head_mask", "left_eye_mask", "right_eye_mask"):
                shape = (img_size, img_size)
            self.f.create_dataset(
                key, (0,) + shape, maxshape=(None,) + shape, dtype=dtype,
                chunks=(1,) + shape,
            )

    def append(self, row: Dict[str, np.ndarray]):
        n = self.f["face_patch"].shape[0]
        for key, ds in self.f.items():
            ds.resize(n + 1, axis=0)
            ds[n] = row[key]

    def close(self):
        self.f.close()


def process_frame(
    img_bgr: np.ndarray,
    camera_matrix: np.ndarray,
    face_model_3d: np.ndarray,
    landmark_detector: LandmarkDetector,
    masker: Optional[BiSeNetMasker] = None,
    eye_masker: Optional[UNetEyeMasker] = None,
    gaze_vector: Optional[np.ndarray] = None,
    cam_index: int = 0,
    img_size: int = 512,
    dataset: str = "eth_xgaze",
    dist_coeffs: Optional[np.ndarray] = None,
    head_pose: Optional[tuple] = None,
    undistort: bool = False,
    rotate180: bool = False,
    face_center: Optional[np.ndarray] = None,
    columbia_crop: bool = False,
    pitchyaw_head_direct: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Full per-frame pipeline -> one h5 row (minus the fitted code).

    ``head_pose``: known (rvec, tvec) from the dataset annotations — the
    reference's ETH-XGaze path takes the pose from the per-subject CSV and
    never runs solvePnP (pre_processing/data_process.py:173-186); other
    datasets estimate it from detected landmarks.
    ``undistort``/``rotate180``: the reference's per-camera raw-image fixes
    (undistort with the camera calibration, 180-degree rotation for the
    upside-down cameras 03/06/13 — data_process.py:160-168).
    """
    focal, dist = NORMALIZATION_PRESETS.get(dataset, (1600.0, 680.0))

    if undistort and dist_coeffs is not None:
        img_bgr = cv2.undistort(img_bgr, camera_matrix, dist_coeffs)
    if rotate180:
        (h, w) = img_bgr.shape[:2]
        M = cv2.getRotationMatrix2D((w / 2, h / 2), 180, 1.0)
        img_bgr = cv2.warpAffine(img_bgr, M, (w, h))
    if columbia_crop:
        # Columbia raws: center crop + 512^2 INTER_AREA resize BEFORE
        # everything else (reference data_process.py:336-338)
        if img_bgr.shape[1] > 4320:
            img_bgr = img_bgr[:, 864:4320]
        img_bgr = cv2.resize(img_bgr, (512, 512), interpolation=cv2.INTER_AREA)

    lm_full = landmark_detector(cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB))
    if head_pose is not None:
        rvec = np.asarray(head_pose[0], np.float64).reshape(3, 1)
        tvec = np.asarray(head_pose[1], np.float64).reshape(3, 1)
    else:
        rvec, tvec = estimate_head_pose(
            lm_full[FACE_MODEL_LM68], face_model_3d, camera_matrix, dist_coeffs
        )
    warped, R_norm, W = normalize_face(
        img_bgr, face_model_3d, rvec, tvec, camera_matrix,
        img_dim=img_size, focal_norm=focal, distance_norm=dist,
        face_center=face_center,
    )

    # landmarks in the normalized image: re-detect (reference re-runs the
    # detector on warped frames); fall back to homography-projected points
    lm_norm = landmark_detector(cv2.cvtColor(warped, cv2.COLOR_BGR2RGB))
    if not landmark_detector.available:
        ones = np.ones((68, 1))
        proj = (W @ np.concatenate([lm_full, ones], axis=1).T).T
        lm_norm = (proj[:, :2] / proj[:, 2:]).astype(np.float32)

    if masker is not None and masker.available:
        head, left, right = masker(warped.astype(np.float32) / 255.0, cam_index)
        # tier-2 U-Net fallback when BiSeNet finds no eye pixels (the
        # reference's second_net pass, gen_all_masks.py:117-143); the
        # per-camera half-profile cases legitimately have one empty side
        want_left = cam_index not in (14, 15)
        want_right = cam_index not in (11, 12)
        missing_left = want_left and not left.any()
        missing_right = want_right and not right.any()
        if (missing_left or missing_right) and (
            eye_masker is not None and eye_masker.available
        ):
            u_left, u_right = eye_masker(warped.astype(np.float32) / 255.0)
            if missing_left:
                left = u_left
            if missing_right:
                right = u_right
            missing_left = want_left and not left.any()
            missing_right = want_right and not right.any()
        # tier-3 landmark rectangles for any side still empty
        if missing_left or missing_right:
            _, lm_left, lm_right = landmark_masks(lm_norm, img_size, cam_index)
            if missing_left:
                left = lm_left
            if missing_right:
                right = lm_right
    else:
        head, left, right = landmark_masks(lm_norm, img_size, cam_index)

    hR = cv2.Rodrigues(rvec)[0]
    head_pose = normalized_head_pose(R_norm, hR)
    if pitchyaw_head_direct is not None:
        # Columbia: the label IS the head-coordinate pitchyaw (decoded from
        # the filename; reference dataset_pre_processing.py:47,1043-1048)
        pitchyaw_head = np.asarray(pitchyaw_head_direct, np.float32)
    elif gaze_vector is not None:
        g_norm = R_norm @ np.asarray(gaze_vector, np.float64).reshape(3)
        pitchyaw_cam = vector_to_pitchyaw(g_norm)
        hR_norm = R_norm @ hR
        pitchyaw_head = gaze_to_head_coordinates(pitchyaw_cam, hR_norm)
    else:
        pitchyaw_head = np.zeros(2, np.float32)

    inmat = np.array(
        [[focal, 0, img_size / 2], [0, focal, img_size / 2], [0, 0, 1]], np.float32
    )
    return {
        "face_patch": warped.astype(np.uint8),  # stored BGR like the reference
        "head_mask": head,
        "left_eye_mask": left,
        "right_eye_mask": right,
        "facial_landmarks": lm_norm.astype(np.float64),
        "cam_index": np.array([cam_index], np.int64),
        "pitchyaw_head": pitchyaw_head.astype(np.float32),
        "face_head_pose": head_pose.astype(np.float32),
        "inmat": inmat,
        "inv_inmat": np.linalg.inv(inmat).astype(np.float32),
        # w2c/c2w + latent code are produced by the NL-3DMM fit stage
        "w2c_Rmat": np.eye(3, dtype=np.float32),
        "w2c_Tvec": np.zeros(3, np.float32),
        "c2w_Rmat": np.eye(3, dtype=np.float32),
        "c2w_Tvec": np.zeros(3, np.float32),
        "latent_codes": np.zeros(306, np.float32),
    }


def process_subject_records(
    records,
    out_path: str,
    face_model_3d: np.ndarray,
    fitter=None,
    img_size: int = 512,
    dataset: str = "eth_xgaze",
    qa_dir: Optional[str] = None,
) -> str:
    """Process enumerated :class:`~gazenerf_tpu.preprocess.enumerate.FrameRecord`
    rows into one per-subject h5; optional NL-3DMM fitting.

    This is the layout-driven path (reference
    dataset_pre_processing.py:80-445): camera identity, calibration,
    undistortion, upside-down-camera rotation and the CSV head pose all come
    from the record, not from file order.

    ``qa_dir``: write fitted-mesh-vs-frame side-by-side renders there (the
    reference's fit-QA loop, surface_fitting/nl3dmm/gen_nl3dmm_render_res.py:18).
    """
    det = LandmarkDetector()
    writer = SubjectWriter(out_path, img_size)
    rows = []
    for rec in records:
        img = cv2.imread(rec.image_path)
        if img is None:
            logger.warning("unreadable frame %s; skipping", rec.image_path)
            continue
        row = process_frame(
            img, rec.camera_matrix, face_model_3d, det,
            cam_index=rec.cam_index, img_size=img_size, dataset=dataset,
            dist_coeffs=rec.distortion,
            gaze_vector=rec.gaze_3d,
            head_pose=(rec.hr, rec.ht) if rec.hr is not None else None,
            undistort=rec.distortion is not None and np.any(rec.distortion),
            rotate180=rec.rotate180,
            face_center=rec.face_center,
            columbia_crop=rec.columbia_crop,
            pitchyaw_head_direct=rec.pitchyaw_head_direct,
        )
        rows.append(row)

    if fitter is not None and rows:
        images = np.stack(
            [cv2.resize(r["face_patch"], (fitter.cfg.image_size,) * 2) for r in rows]
        ).astype(np.float32)[..., ::-1] / 255.0
        scale = fitter.cfg.image_size / img_size
        lms = np.stack([r["facial_landmarks"] for r in rows]).astype(np.float32) * scale
        B = len(rows)
        base_R = np.tile(np.diag([1.0, -1.0, -1.0]).astype(np.float32), (B, 1, 1))
        base_T = np.tile(np.array([0, 0, 12.0], np.float32), (B, 1))
        inmat_fit = np.stack([r["inmat"] for r in rows]) * scale
        inmat_fit[:, 2, 2] = 1.0
        res = fitter.fit(images, lms, base_R, base_T, inmat_fit)
        # identity/expr/texture averaged over the first frames
        # (reference dataset_pre_processing.py:391-395 averages identity)
        code = np.array(res["code"], copy=True)
        code[:, :279] = code[: min(3, B), :279].mean(axis=0, keepdims=True)
        for i, r in enumerate(rows):
            r["latent_codes"] = code[i]
            r["w2c_Rmat"] = res["w2c_Rmat"][i]
            r["w2c_Tvec"] = res["w2c_Tvec"][i]
            r["c2w_Rmat"] = res["c2w_Rmat"][i]
            r["c2w_Tvec"] = res["c2w_Tvec"][i]

        if qa_dir:
            write_fit_qa_renders(fitter, res, images, qa_dir)

    for r in rows:
        writer.append(r)
    writer.close()
    logger.info("wrote %d frames -> %s", len(rows), out_path)
    return out_path


def write_fit_qa_renders(
    fitter, res, images: np.ndarray, qa_dir: str, prefix: str = "fit_qa"
) -> List[str]:
    """Per-frame fitted-mesh QA panels: original | mesh composited over the
    original (alpha-masked, like the reference's ``img_1[mask_img] =
    render_img[mask_img]``) | raw mesh render.

    Reference twin: surface_fitting/nl3dmm/gen_nl3dmm_render_res.py:45-118
    ``render_3dmm`` (its phong panel needs the Phong pipeline the rasterizer
    deliberately omits; the alpha composite is the fit-QA signal).

    ``images``: [B,H,W,3] float01 RGB at the fitter's image size.
    """
    from gazenerf_tpu.utils.logging import side_by_side

    os.makedirs(qa_dir, exist_ok=True)
    qa_imgs, alpha, _ = fitter.render_fit(res)
    paths = []
    for i in range(qa_imgs.shape[0]):
        ori = np.clip(np.asarray(images[i]), 0.0, 1.0)
        m = np.asarray(alpha[i])[..., None] > 0.5
        composite = np.where(m, qa_imgs[i], ori)
        panel = side_by_side(ori, composite, qa_imgs[i])
        p = os.path.join(qa_dir, "%s_%04d.png" % (prefix, i))
        cv2.imwrite(p, panel[..., ::-1])
        paths.append(p)
    logger.info("fit QA renders -> %s (%d panels)", qa_dir, len(paths))
    return paths


def qa_renders_from_h5(
    fitter, h5_path: str, qa_dir: str, limit: Optional[int] = None
) -> List[str]:
    """Standalone fit-QA: re-render SAVED fits from a preprocessed subject
    h5 (codes + fitted cameras) and composite them over the stored frames —
    the reference's ``gen_nl3dmm_render_res.py`` entry flow (:18-205 renders
    from saved pkl fit artifacts without re-fitting).
    """
    import h5py

    with h5py.File(h5_path, "r") as f:
        n = f["face_patch"].shape[0]
        if limit is not None:
            n = min(n, limit)
        full = f["face_patch"].shape[1]
        s = fitter.cfg.image_size / full
        imgs = np.stack([
            cv2.resize(f["face_patch"][i], (fitter.cfg.image_size,) * 2)
            for i in range(n)
        ]).astype(np.float32)[..., ::-1] / 255.0  # BGR -> RGB
        inmat = np.asarray(f["inmat"][:n], np.float32) * s
        inmat[:, 2, 2] = 1.0
        res = {
            "code": np.asarray(f["latent_codes"][:n], np.float32),
            "w2c_Rmat": np.asarray(f["w2c_Rmat"][:n], np.float32),
            "w2c_Tvec": np.asarray(f["w2c_Tvec"][:n], np.float32).reshape(
                n, 3
            ),
            "inmat": inmat,
        }
    return write_fit_qa_renders(fitter, res, imgs, qa_dir)


def process_subject(
    frame_paths: List[str],
    out_path: str,
    camera_matrix: np.ndarray,
    face_model_3d: np.ndarray,
    fitter=None,
    img_size: int = 512,
    dataset: str = "eth_xgaze",
    qa_dir: Optional[str] = None,
) -> str:
    """Flat-list convenience wrapper: one shared camera, no annotations
    (Columbia/GazeCapture-style single-camera layouts — reference
    dataset_pre_processing.py:816,1083).  For the real ETH-XGaze layout use
    :func:`gazenerf_tpu.preprocess.enumerate.iter_xgaze_subject` +
    :func:`process_subject_records`."""
    from gazenerf_tpu.preprocess.enumerate import FrameRecord

    records = [
        FrameRecord(
            image_path=p,
            frame_name=os.path.splitext(os.path.basename(p))[0],
            cam_index=0,
            camera_matrix=np.asarray(camera_matrix, np.float64),
            distortion=np.zeros((5, 1)),
        )
        for p in frame_paths
    ]
    return process_subject_records(
        records, out_path, face_model_3d, fitter=fitter,
        img_size=img_size, dataset=dataset, qa_dir=qa_dir,
    )
