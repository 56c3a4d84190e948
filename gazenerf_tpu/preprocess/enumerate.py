"""Raw-dataset layout enumeration for the offline factory.

Replaces the placeholder ``cam_index = i % 18`` frame walk with the
reference's real per-dataset enumeration (reference
dataset_pre_processing.py:80-445 + pre_processing/data_process.py:107-192):

ETH-XGaze layout::

    <subject_dir>/frameNNNN/*camCC.JPG      (CC = camera id, 18 cameras)
    <annotation_dir>/subjectNNNN.csv        (per image: pitchyaw label cols
                                             2-3, 3D gaze cols 4-6, head pose
                                             rvec cols 7-9, tvec cols 10-12)
    <calib_dir>/camCC.xml                   (K, distortion per camera)

Per image the reference undistorts with the camera's calibration, rotates
cameras 03/06/13 by 180 degrees (they are mounted upside-down,
data_process.py:163-168), and face-normalizes with the CSV head pose (no
solvePnP — the annotations carry the pose).
"""

from __future__ import annotations

import csv
import dataclasses
import logging
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# cameras physically mounted upside-down (reference data_process.py:163)
ROTATED_CAMS = (3, 6, 13)

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


@dataclasses.dataclass
class FrameRecord:
    """One raw image + everything the per-frame pipeline needs."""

    image_path: str
    frame_name: str
    cam_index: int
    camera_matrix: np.ndarray  # [3,3]
    distortion: np.ndarray  # [N,1]
    hr: Optional[np.ndarray] = None  # [3,1] head rotation rvec (CSV)
    ht: Optional[np.ndarray] = None  # [3,1] head translation (CSV)
    gaze_3d: Optional[np.ndarray] = None  # [3] gaze direction (camera coords)
    pitchyaw: Optional[np.ndarray] = None  # [2] normalized-space gaze label
    rotate180: bool = False


def load_xgaze_annotations(csv_path: str) -> Dict[Tuple[str, str], List[str]]:
    """subjectNNNN.csv -> {(frame_name, image_name): row} (the reference
    looks rows up by exactly this pair — data_process.py:149-186)."""
    out: Dict[Tuple[str, str], List[str]] = {}
    with open(csv_path) as f:
        for row in csv.reader(f):
            if len(row) >= 13:
                out[(row[0], row[1])] = row
    return out


def iter_xgaze_subject(
    subject_dir: str,
    annotation_csv: str,
    cams: List[Tuple[np.ndarray, np.ndarray]],
) -> List[FrameRecord]:
    """Enumerate an ETH-XGaze raw subject directory into FrameRecords.

    ``cams``: the 18 (K, distortion) pairs from
    :func:`gazenerf_tpu.data.cameras.load_camera_calibrations`.
    Frames with no annotation row are skipped with a warning (the reference
    wraps each frame in try/except-continue, dataset_pre_processing.py:159).
    """
    anno = load_xgaze_annotations(annotation_csv) if annotation_csv else {}
    records: List[FrameRecord] = []
    frames = sorted(
        d for d in os.listdir(subject_dir)
        if os.path.isdir(os.path.join(subject_dir, d))
    )
    for frame_name in frames:
        fdir = os.path.join(subject_dir, frame_name)
        for image_name in sorted(os.listdir(fdir)):
            stem, ext = os.path.splitext(image_name)
            if ext.lower() not in _IMG_EXTS or stem.endswith("_resized"):
                continue
            # camera id = last two characters of the stem ("...cam07")
            try:
                cam_index = int(stem[-2:])
            except ValueError:
                logger.warning("unparseable camera id in %s; skipped", image_name)
                continue
            if cam_index >= len(cams):
                logger.warning("camera id %d out of range; skipped", cam_index)
                continue
            K, dist = cams[cam_index]
            rec = FrameRecord(
                image_path=os.path.join(fdir, image_name),
                frame_name=frame_name,
                cam_index=cam_index,
                camera_matrix=np.asarray(K, np.float64),
                distortion=np.asarray(dist, np.float64),
                rotate180=cam_index in ROTATED_CAMS,
            )
            row = anno.get((frame_name, image_name))
            if row is not None:
                rec.pitchyaw = np.asarray(row[2:4], np.float32)
                rec.gaze_3d = np.asarray(row[4:7], np.float64)
                rec.hr = np.asarray(row[7:10], np.float64).reshape(3, 1)
                rec.ht = np.asarray(row[10:13], np.float64).reshape(3, 1)
            elif anno:
                logger.warning(
                    "no annotation for (%s, %s); head pose will come from "
                    "solvePnP on detected landmarks", frame_name, image_name,
                )
            records.append(rec)
    return records


def iter_flat_subject(
    subject_dir: str,
    camera_matrix: np.ndarray,
    distortion: Optional[np.ndarray] = None,
    cam_index: int = 0,
) -> List[FrameRecord]:
    """Single-camera flat-directory layout (Columbia / GazeCapture-style:
    one folder of frames, one calibration — reference
    dataset_pre_processing.py:816,1083)."""
    records = []
    for name in sorted(os.listdir(subject_dir)):
        if os.path.splitext(name)[1].lower() not in _IMG_EXTS:
            continue
        records.append(
            FrameRecord(
                image_path=os.path.join(subject_dir, name),
                frame_name=os.path.splitext(name)[0],
                cam_index=cam_index,
                camera_matrix=np.asarray(camera_matrix, np.float64),
                distortion=(
                    np.zeros((5, 1)) if distortion is None
                    else np.asarray(distortion, np.float64)
                ),
            )
        )
    return records
