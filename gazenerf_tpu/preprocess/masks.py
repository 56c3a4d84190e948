"""Head / eye mask generation.

TPU-framework port of the reference mask stack
(reference: pre_processing/gen_all_masks.py:19-285 BiSeNet face parsing +
U-Net fallback + landmark-polygon last resort; correct_head_mask.py:5-69).

Three tiers, matching the reference's fallback chain:

1. :class:`BiSeNetMasker` — flax port of the BiSeNet face-parsing net
   (19 classes -> head mask via label LUT + hair correction).  Requires
   transplanted weights; architecture-complete otherwise.
2. :class:`UNetEyeMasker` — flax port of the U-Net eye segmenter the
   reference runs when BiSeNet finds no eye pixels
   (gen_all_masks.py:117-143; net pre_processing/unet.py:6-77).
3. landmark-polygon masks (:func:`landmark_masks`) — works with no weights
   at all (reference gen_all_masks.py's last resort + the eye-region
   rectangles of datasets/eth_xgaze.py:14-67).
4. mask cleanup (:func:`correct_head_mask`) — largest-connected-component +
   hole fill + erosion, reference correct_head_mask.py:5-61.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# BiSeNet face-parsing labels counted as "head" (reference
# gen_all_masks.py label LUT: skin, brows, eyes, ears, nose, mouth, lips,
# hair, hat excluded-background etc.)
HEAD_LABELS = (1, 2, 3, 4, 5, 6, 10, 11, 12, 13, 17)
LEFT_EYE_LABEL = 4
RIGHT_EYE_LABEL = 5


def correct_head_mask(mask: np.ndarray) -> np.ndarray:
    """Keep the largest component, fill holes, erode once.

    Reference: pre_processing/correct_head_mask.py:5-61.
    """
    assert cv2 is not None
    m = (np.asarray(mask) > 127).astype(np.uint8)
    num, labels, stats, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
    if num > 1:
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        m = (labels == largest).astype(np.uint8)
    # fill holes: flood from border on the inverse
    inv = 1 - m
    ff = inv.copy()
    h, w = m.shape
    fmask = np.zeros((h + 2, w + 2), np.uint8)
    cv2.floodFill(ff, fmask, (0, 0), 0)
    m = m | ff
    m = cv2.erode(m, np.ones((3, 3), np.uint8), iterations=1)
    return (m * 255).astype(np.uint8)


def landmark_masks(
    landmarks: np.ndarray, img_size: int, cam_index: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Head + left/right eye masks from 68 landmarks (no-weights fallback).

    Head: convex hull of the 68 points extended upward over the forehead
    (the reference's polygon last resort, gen_all_masks.py:250-285).
    Eyes: rectangles around landmark groups 36-41 / 42-47 with the
    per-camera special cases of the reference (cams 11/12 left-only,
    14/15 right-only — gen_all_masks.py:... and datasets/eth_xgaze.py:14-67).
    """
    assert cv2 is not None
    lm = np.asarray(landmarks, np.float32).reshape(-1, 2)
    head = np.zeros((img_size, img_size), np.uint8)
    # forehead extension: mirror the brow points upward by the eye-to-brow gap
    brows = lm[17:27]
    eyes_line = lm[36:48].mean(axis=0)
    lift = max(10.0, 1.5 * float(np.abs(eyes_line[1] - brows[:, 1].mean())))
    forehead = brows.copy()
    forehead[:, 1] -= lift * 2.0
    pts = np.concatenate([lm, forehead], axis=0).astype(np.int32)
    hull = cv2.convexHull(pts)
    cv2.fillConvexPoly(head, hull, 255)

    def eye_rect(group):
        g = lm[group]
        x0, y0 = g.min(axis=0)
        x1, y1 = g.max(axis=0)
        padx = max(4.0, 0.4 * (x1 - x0))
        pady = max(4.0, 1.2 * (y1 - y0))
        m = np.zeros((img_size, img_size), np.uint8)
        m[
            max(int(y0 - pady), 0) : min(int(y1 + pady), img_size),
            max(int(x0 - padx), 0) : min(int(x1 + padx), img_size),
        ] = 255
        return m

    left = eye_rect(range(36, 42))
    right = eye_rect(range(42, 48))
    # per-camera half-profile special cases (reference cams 11/12, 14/15)
    if cam_index in (11, 12):
        right = np.zeros_like(right)
    elif cam_index in (14, 15):
        left = np.zeros_like(left)
    return head, left, right


class BiSeNetMasker:
    """BiSeNet face-parsing masker (flax port).

    Architecture: ResNet18 spatial/context paths with attention-refinement
    and feature-fusion heads, 19-class output at input resolution
    (reference pre_processing/bisenet.py:226, resnet.py:56).  With no
    transplanted weights the parse is meaningless — callers should fall
    back to :func:`landmark_masks` (the driver does).
    """

    def __init__(self, variables=None):
        from gazenerf_tpu.preprocess.bisenet import BiSeNet

        import jax

        self.net = BiSeNet(n_classes=19)
        self.variables = variables
        if variables is not None:
            self._apply = jax.jit(
                lambda img: self.net.apply(self.variables, img)
            )

    @property
    def available(self) -> bool:
        return self.variables is not None

    def __call__(self, img: np.ndarray, cam_index: int = 0):
        """``img``: [H, W, 3] float [0,1] -> (head, left_eye, right_eye) u8."""
        import jax.numpy as jnp

        assert self.available, "BiSeNetMasker needs transplanted weights"
        logits = np.asarray(self._apply(jnp.asarray(img)[None]))[0]
        labels = logits.argmax(-1)
        head = np.isin(labels, HEAD_LABELS).astype(np.uint8) * 255
        head = correct_head_mask(head)
        left = (labels == LEFT_EYE_LABEL).astype(np.uint8) * 255
        right = (labels == RIGHT_EYE_LABEL).astype(np.uint8) * 255
        if cam_index in (11, 12):
            right = np.zeros_like(right)
        elif cam_index in (14, 15):
            left = np.zeros_like(left)
        return head, left, right


class UNetEyeMasker:
    """U-Net eye-segmentation fallback (flax port of the reference's
    ``second_net``, gen_all_masks.py:47-66,117-143).

    The reference normalizes the warped frame to [-1, 1]
    ((x - 0.5) / 0.5, gen_all_masks.py:61-66), takes the 19-class argmax,
    LUTs the two eye labels to 255 and splits left/right by image half.
    """

    def __init__(self, variables=None):
        from gazenerf_tpu.preprocess.unet import UNet

        import jax

        self.net = UNet(n_classes=19)
        self.variables = variables
        if variables is not None:
            self._apply = jax.jit(lambda img: self.net.apply(self.variables, img))

    @property
    def available(self) -> bool:
        return self.variables is not None

    def __call__(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """``img``: [H, W, 3] float [0,1] -> (left_eye, right_eye) u8."""
        import jax.numpy as jnp

        assert self.available, "UNetEyeMasker needs transplanted weights"
        x = (np.asarray(img, np.float32) - 0.5) / 0.5
        logits = np.asarray(self._apply(jnp.asarray(x)[None]))[0]
        labels = logits.argmax(-1)
        eyes = np.isin(labels, (LEFT_EYE_LABEL, RIGHT_EYE_LABEL)).astype(np.uint8)
        eyes = eyes * 255
        w = eyes.shape[1]
        left = eyes.copy()
        left[:, w // 2 :] = 0
        right = eyes.copy()
        right[:, : w // 2] = 0
        return left, right
