"""Synthetic per-subject HDF5 factory matching the reference schema.

The trainer only depends on the ``.h5`` schema produced by the offline data
factory (reference dataset_pre_processing.py:258-381; read back at
datasets/eth_xgaze.py:330-356).  This module writes schema-identical files
with synthetic content so the full training/eval stack is testable without
the 100+ GB ETH-XGaze download (SURVEY.md §7 step 8 names this generator the
first data-factory deliverable).
"""

from __future__ import annotations

import os
from typing import Optional

import h5py
import numpy as np

SCHEMA = {
    "face_patch": ((512, 512, 3), np.uint8),
    "head_mask": ((512, 512), np.uint8),
    "left_eye_mask": ((512, 512), np.uint8),
    "right_eye_mask": ((512, 512), np.uint8),
    "facial_landmarks": ((68, 2), np.float64),
    "cam_index": ((1,), np.int64),
    "latent_codes": ((306,), np.float32),
    "w2c_Rmat": ((3, 3), np.float32),
    "w2c_Tvec": ((3,), np.float32),
    "c2w_Rmat": ((3, 3), np.float32),
    "c2w_Tvec": ((3,), np.float32),
    "inmat": ((3, 3), np.float32),
    "inv_inmat": ((3, 3), np.float32),
    "pitchyaw_head": ((2,), np.float32),
    "face_head_pose": ((2,), np.float32),
}


def write_synthetic_subject(
    path: str,
    num_frames: int = 8,
    img_size: int = 512,
    seed: int = 0,
    prefix: str = "xgaze_",
    subject: str = "subject0000.h5",
) -> str:
    """Write one schema-complete synthetic subject file; returns its path."""
    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    fpath = os.path.join(path, prefix + subject)

    inmat = np.array(
        [[1600.0, 0.0, img_size / 2], [0.0, 1600.0, img_size / 2], [0.0, 0.0, 1.0]],
        np.float32,
    )
    inv_inmat = np.linalg.inv(inmat).astype(np.float32)

    with h5py.File(fpath, "w") as f:
        for key, (shape, dtype) in SCHEMA.items():
            if key in ("face_patch", "head_mask", "left_eye_mask", "right_eye_mask"):
                shape = (
                    (img_size, img_size, 3)
                    if key == "face_patch"
                    else (img_size, img_size)
                )
            ds = f.create_dataset(
                key, (num_frames,) + shape, dtype=dtype, chunks=(1,) + shape
            )
            for i in range(num_frames):
                if key == "face_patch":
                    img = np.full(shape, 255, np.uint8)
                    c = img_size // 2
                    yy, xx = np.mgrid[:img_size, :img_size]
                    face = ((yy - c) ** 2 + (xx - c) ** 2) < (img_size // 3) ** 2
                    img[face] = (180, 140, 120)
                    ds[i] = img
                elif key == "head_mask":
                    c = img_size // 2
                    yy, xx = np.mgrid[:img_size, :img_size]
                    m = (((yy - c) ** 2 + (xx - c) ** 2) < (img_size // 3) ** 2)
                    ds[i] = m.astype(np.uint8) * 255
                elif key in ("left_eye_mask", "right_eye_mask"):
                    m = np.zeros(shape, np.uint8)
                    c = img_size // 2
                    off = -img_size // 10 if key == "left_eye_mask" else img_size // 10
                    h = max(img_size // 16, 2)
                    w = max(img_size // 20, 2)
                    top = max(c - img_size // 12 - h, 0)
                    m[top : top + h, c + off - w : c + off + w] = 255
                    ds[i] = m
                elif key == "facial_landmarks":
                    ds[i] = rng.uniform(100, 400, (68, 2))
                elif key == "cam_index":
                    ds[i] = [i % 18]
                elif key == "latent_codes":
                    ds[i] = rng.standard_normal(306).astype(np.float32) * 0.1
                elif key == "w2c_Rmat":
                    ds[i] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
                elif key == "c2w_Rmat":
                    ds[i] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
                elif key == "w2c_Tvec":
                    ds[i] = np.array([0.0, 0.0, 12.0], np.float32)
                elif key == "c2w_Tvec":
                    ds[i] = np.array([0.0, 0.0, 12.0], np.float32)
                elif key == "inmat":
                    ds[i] = inmat
                elif key == "inv_inmat":
                    ds[i] = inv_inmat
                elif key == "pitchyaw_head":
                    ds[i] = rng.uniform(-0.5, 0.5, 2).astype(np.float32)
                elif key == "face_head_pose":
                    ds[i] = rng.uniform(-0.3, 0.3, 2).astype(np.float32)
    return fpath
