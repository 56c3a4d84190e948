"""68-landmark detection with the reference's fallback chain.

TPU-framework port of the reference landmark stage
(reference: pre_processing/gen_landmark.py:14-103): primary detector
(face-alignment, a gated optional dependency here), retry on a
histogram-equalized grayscale image, then reuse of the previous frame's
landmarks.  A geometric synthesizer provides a last-resort 68-point layout
from a face bounding box so the pipeline never hard-fails.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

logger = logging.getLogger(__name__)


def synthetic_landmarks(bbox, jitter: float = 0.0, seed: int = 0) -> np.ndarray:
    """A plausible 68-point layout inside ``bbox = (x0, y0, x1, y1)``.

    Standard iBUG-68 ordering: 0-16 jaw, 17-26 brows, 27-35 nose, 36-47
    eyes, 48-67 mouth.  Used as the no-detector fallback and by tests.
    """
    x0, y0, x1, y1 = [float(v) for v in bbox]
    w, h = x1 - x0, y1 - y0
    cx = (x0 + x1) / 2
    pts = []
    # jaw: half-ellipse
    for i in range(17):
        t = i / 16.0 * np.pi
        pts.append([cx - np.cos(t) * w / 2, y0 + h * 0.45 + np.sin(t) * h * 0.55])
    # brows
    for i in range(5):
        pts.append([x0 + w * (0.18 + 0.12 * i), y0 + h * 0.28])
    for i in range(5):
        pts.append([x0 + w * (0.54 + 0.12 * i), y0 + h * 0.28])
    # nose bridge + base
    for i in range(4):
        pts.append([cx, y0 + h * (0.35 + 0.08 * i)])
    for i in range(5):
        pts.append([cx + w * (0.08 * (i - 2)), y0 + h * 0.62])
    # eyes (6 each)
    for ex in (0.31, 0.66):
        exc, eyc, ew, eh = x0 + w * ex, y0 + h * 0.40, w * 0.10, h * 0.035
        for i in range(6):
            t = i / 6.0 * 2 * np.pi
            pts.append([exc + np.cos(t) * ew, eyc + np.sin(t) * eh])
    # mouth (20)
    mcx, mcy = cx, y0 + h * 0.76
    for i in range(20):
        t = i / 20.0 * 2 * np.pi
        pts.append([mcx + np.cos(t) * w * 0.18, mcy + np.sin(t) * h * 0.06])
    lm = np.asarray(pts, np.float32)
    if jitter:
        lm = lm + np.random.default_rng(seed).normal(0, jitter, lm.shape)
    return lm


class LandmarkDetector:
    """face-alignment detector with equalization + previous-frame fallbacks."""

    def __init__(self, device: str = "cpu"):
        self._fa = None
        try:
            import face_alignment  # optional dependency

            self._fa = face_alignment.FaceAlignment(
                face_alignment.LandmarksType.TWO_D, device=device
            )
        except ImportError:
            logger.warning(
                "face_alignment not installed; landmark detection will use "
                "fallbacks only"
            )
        self.previous: Optional[np.ndarray] = None

    @property
    def available(self) -> bool:
        return self._fa is not None

    def _detect(self, img: np.ndarray) -> Optional[np.ndarray]:
        preds = self._fa.get_landmarks(img)
        if preds:
            return np.asarray(preds[0], np.float32)
        return None

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """``img``: [H, W, 3] uint8 RGB -> ``[68, 2]`` landmarks.

        Fallback chain mirrors reference gen_landmark.py:32-87.
        """
        if self.available:
            lm = self._detect(img)
            if lm is None and cv2 is not None:
                eq = cv2.equalizeHist(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY))
                lm = self._detect(cv2.cvtColor(eq, cv2.COLOR_GRAY2RGB))
            if lm is not None:
                self.previous = lm
                return lm
        if self.previous is not None:
            logger.info("landmarks: reusing previous frame")
            return self.previous
        h, w = img.shape[:2]
        logger.info("landmarks: synthesizing from center bbox")
        lm = synthetic_landmarks((w * 0.25, h * 0.2, w * 0.75, h * 0.85))
        self.previous = lm
        return lm
