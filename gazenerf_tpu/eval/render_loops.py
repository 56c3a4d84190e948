"""Demo render loops: novel-view orbits, gaze sweeps, morphing, GIF export.

TPU twin of the reference ``RenderUtils`` loops
(reference: utils/render_utils.py:101-324) and the GIF export in
``evaluate_single_image`` (trainer/gazenerf_trainer.py:928-942).

Each loop drives ONE jitted render function over a list of cameras/gazes —
the per-frame camera is just data, so there is exactly one compilation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.config import ModelConfig
from gazenerf_tpu.data.cameras import base_camera, orbit_cameras
from gazenerf_tpu.models.gaze_nerf import GazeNeRF
from gazenerf_tpu.ops.rays import pixel_grid

# the 45-frame gaze trajectory used by the head orbit (reference
# utils/render_utils.py:104-197)
ORBIT_GAZE_H = [-0.3, -0.3, -0.3, -0.3, -0.3, -0.2, -0.2, -0.2, -0.1, -0.1,
                -0.1, 0.0, 0.1, 0.1, 0.1, 0.2, 0.2, 0.2, 0.3, 0.3, 0.3, 0.3,
                0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.2, 0.2, 0.2, 0.1, 0.0, -0.1,
                -0.2, -0.2, -0.2, -0.3, -0.3, -0.3, -0.3, -0.3, -0.3, -0.3, -0.3]
ORBIT_GAZE_V = [0.0, -0.1, -0.2, -0.2, -0.3, -0.3, -0.4, -0.4, -0.4, -0.4,
                -0.4, -0.4, -0.4, -0.4, -0.4, -0.4, -0.4, -0.4, -0.3, -0.3,
                -0.2, -0.2, -0.1, 0.0, 0.1, 0.2, 0.2, 0.3, 0.3, 0.4, 0.4, 0.4,
                0.4, 0.4, 0.4, 0.4, 0.4, 0.4, 0.4, 0.3, 0.3, 0.2, 0.2, 0.1, 0.0]


def gaze_sweep_trajectory() -> List[List[float]]:
    """The rectangular gaze sweep (reference utils/render_utils.py:223-289)."""
    traj = []
    for j in range(-50, 51, 10):
        traj.append([-0.20, j / 100.0])
    for j in range(-20, 21, 4):
        traj.append([j / 100.0, 0.50])
    for j in range(50, -51, -10):
        traj.append([0.20, j / 100.0])
    for j in range(20, -21, -4):
        traj.append([j / 100.0, -0.50])
    return traj


class RenderLoops:
    def __init__(self, cfg: ModelConfig, view_num: int = 45):
        self.cfg = cfg
        self.view_num = view_num
        self.xy = np.asarray(pixel_grid(cfg.featmap_size))[None]
        self.cams = orbit_cameras(view_num, cfg.featmap_size)
        self.base_cam = base_camera(cfg.featmap_size)
        model = GazeNeRF(cfg)

        @jax.jit
        def render(params, shape_code, appea_code, gaze, R, T, K):
            out = model.apply(
                params, jnp.asarray(self.xy), shape_code, appea_code, gaze, R, T, K
            )
            return out["coarse_dict"]["merge_img"][0]

        self._render = render

    def _to_u8(self, img) -> np.ndarray:
        return (np.asarray(img) * 255.0).clip(0, 255).astype(np.uint8)

    def render_novel_views(
        self, params, shape_code, appea_code, move_gaze: bool = True
    ) -> List[np.ndarray]:
        """45-camera orbit; gaze follows the reference trajectory or stays
        fixed at (0, -0.5) (reference :199-221)."""
        frames = []
        for i, cam in enumerate(self.cams[: self.view_num]):
            gz = (
                np.array([[ORBIT_GAZE_H[i % 45], ORBIT_GAZE_V[i % 45]]], np.float32)
                if move_gaze
                else np.array([[0.0, -0.5]], np.float32)
            )
            img = self._render(
                params, shape_code, appea_code, jnp.asarray(gz),
                jnp.asarray(cam["Rmats"]), jnp.asarray(cam["Tvecs"]),
                jnp.asarray(cam["inv_inmats"]),
            )
            frames.append(self._to_u8(img))
        return frames

    def render_gaze_sweep(
        self, params, shape_code, appea_code, cam: Optional[Dict] = None
    ) -> List[np.ndarray]:
        cam = cam or self.base_cam
        frames = []
        for gz in gaze_sweep_trajectory():
            img = self._render(
                params, shape_code, appea_code,
                jnp.asarray(np.array([gz], np.float32)),
                jnp.asarray(cam["Rmats"]), jnp.asarray(cam["Tvecs"]),
                jnp.asarray(cam["inv_inmats"]),
            )
            frames.append(self._to_u8(img))
        return frames

    def render_morphing(
        self, params, codes_1, codes_2, nums: int = 16
    ) -> List[np.ndarray]:
        """Latent interpolation (reference :291-324)."""
        cam = self.base_cam
        frames = []
        for i in range(nums):
            tv = 1.0 - (i / (nums - 1))
            sc = codes_1["shape_code"] * tv + codes_2["shape_code"] * (1 - tv)
            ac = codes_1["appea_code"] * tv + codes_2["appea_code"] * (1 - tv)
            gz = jnp.zeros((1, 2), jnp.float32)
            img = self._render(
                params, sc, ac, gz,
                jnp.asarray(cam["Rmats"]), jnp.asarray(cam["Tvecs"]),
                jnp.asarray(cam["inv_inmats"]),
            )
            frames.append(self._to_u8(img))
        return frames


def save_gif(path: str, frames: Sequence[np.ndarray], duration: float = 3.0 / 45):
    import imageio

    imageio.mimsave(path, list(frames), "GIF", duration=duration)
