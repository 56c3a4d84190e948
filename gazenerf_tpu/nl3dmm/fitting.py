"""NL-3DMM fitting: recover codes + cameras from images, fully jitted.

TPU re-design of the reference's two-stage Adam fit
(reference: surface_fitting/nl3dmm/fitting_nl3dmm.py:125-290 — stage 1: 50
iters camera-offset only; stage 2: 200 iters cameras + codes) with the loss
stack of losses/nl3dmm_loss.py:6-121 (masked photo MSE, weighted 68-landmark
L2, SH-gamma regularizer, code regularizer).

Each stage is ONE ``lax.scan`` over optimizer steps — the whole fit is two
device dispatches instead of 250 Python-loop steps.  Output dict matches the
h5 schema the trainer consumes (``code`` 306, ``w2c/c2w`` mats,
``inmat/inv_inmat`` — reference fitting_nl3dmm.py:292-340 ``save_res``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gazenerf_tpu.nl3dmm.face_model import (
    BasisData,
    GeometryDecoder,
    decode_texture,
    sh_shade,
    vertex_normals,
)
from gazenerf_tpu.nl3dmm.rasterizer import (
    RasterSettings,
    project_landmarks,
    render_mesh,
)
from gazenerf_tpu.ops.rotation import euler_to_rotation

# landmark weighting: eyes/nose/mouth count more (reference nl3dmm_loss.py
# weighted 68-landmark L2)
_LM_WEIGHTS = np.ones(68, np.float32)
_LM_WEIGHTS[17:27] = 2.0  # brows
_LM_WEIGHTS[27:36] = 3.0  # nose
_LM_WEIGHTS[36:48] = 5.0  # eyes
_LM_WEIGHTS[48:68] = 3.0  # mouth


class FitConfig(NamedTuple):
    iden_dims: int = 100
    expr_dims: int = 79
    text_dims: int = 100
    illu_dims: int = 27
    stage1_steps: int = 50
    stage2_steps: int = 200
    lr_cam: float = 1e-2
    lr_code: float = 1e-2
    w_photo: float = 1.0
    w_lm: float = 1e-3
    w_code: float = 1e-3
    w_gamma: float = 1e-2
    image_size: int = 128


class NL3DMMFitter:
    """Fit NL-3DMM codes + camera offsets to a batch of images."""

    def __init__(
        self,
        basis: BasisData,
        cfg: FitConfig = FitConfig(),
        raster: Optional[RasterSettings] = None,
    ):
        self.basis = basis
        self.cfg = cfg
        self.raster = raster or RasterSettings(image_size=cfg.image_size)
        self.decoder = GeometryDecoder(basis)

    def _render(self, codes, cams, decoder_params):
        cfg = self.cfg
        code = codes["code"]  # [B, 306]
        shape_code = code[:, : cfg.iden_dims + cfg.expr_dims]
        text_code = code[
            :, cfg.iden_dims + cfg.expr_dims : cfg.iden_dims + cfg.expr_dims + cfg.text_dims
        ]
        illu_code = code[:, cfg.iden_dims + cfg.expr_dims + cfg.text_dims :]

        verts = self.decoder(decoder_params, shape_code)
        albedo = decode_texture(self.basis, text_code)
        normals = vertex_normals(verts, self.basis.triangles)
        colors = jnp.clip(sh_shade(albedo, normals, illu_code), 0.0, 1.0)

        dR = euler_to_rotation(cams["delta_euler"])
        R = jnp.einsum("bij,bjk->bik", dR, cams["base_w2c_R"])
        T = (
            jnp.einsum("bij,bj->bi", dR, cams["base_w2c_T"])
            + cams["delta_tvec"]
        )
        img, alpha = render_mesh(
            verts, colors, self.basis.triangles, R, T, cams["inmat"], self.raster
        )
        lm2d = project_landmarks(verts, self.basis.landmark_index, R, T, cams["inmat"])
        return img, alpha, lm2d, (R, T)

    def _loss(self, trainable, frozen, batch):
        cfg = self.cfg
        codes = {"code": trainable["code"]}
        cams = {**frozen, "delta_euler": trainable["delta_euler"],
                "delta_tvec": trainable["delta_tvec"]}
        # the geometry decoder is a FIXED model during per-image fitting
        # (reference fits codes + cameras only, fitting_nl3dmm.py:179-274)
        img, alpha, lm2d, _ = self._render(codes, cams, frozen["decoder"])

        mask = batch.get("mask")
        diff = (img - batch["image"]) ** 2
        if mask is not None:
            m = mask[..., None]
            photo = jnp.sum(diff * m) / jnp.maximum(jnp.sum(m) * 3.0, 1.0)
        else:
            photo = jnp.mean(diff)

        lmw = jnp.asarray(_LM_WEIGHTS)
        lm_err = jnp.sum((lm2d - batch["landmarks"]) ** 2, axis=-1)  # [B, 68]
        lm_loss = jnp.mean(lm_err * lmw[None])

        code = trainable["code"]
        code_reg = jnp.mean(code[:, : cfg.iden_dims + cfg.expr_dims + cfg.text_dims] ** 2)
        gamma = code[:, cfg.iden_dims + cfg.expr_dims + cfg.text_dims :]
        gamma_reg = jnp.mean((gamma - jnp.mean(gamma, axis=-1, keepdims=True)) ** 2)

        total = (
            cfg.w_photo * photo
            + cfg.w_lm * lm_loss
            + cfg.w_code * code_reg
            + cfg.w_gamma * gamma_reg
        )
        return total, {"photo": photo, "lm": lm_loss}

    def fit(
        self,
        images: np.ndarray,
        landmarks: np.ndarray,
        base_w2c_R: np.ndarray,
        base_w2c_T: np.ndarray,
        inmat: np.ndarray,
        mask: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Two-stage fit; returns the h5-schema result dict per image."""
        cfg = self.cfg
        B = images.shape[0]
        frozen = {
            "base_w2c_R": jnp.asarray(base_w2c_R),
            "base_w2c_T": jnp.asarray(base_w2c_T),
            "inmat": jnp.asarray(inmat),
        }
        batch = {
            "image": jnp.asarray(images),
            "landmarks": jnp.asarray(landmarks),
            "mask": None if mask is None else jnp.asarray(mask),
        }
        frozen["decoder"] = jax.tree_util.tree_map(
            jnp.asarray, self.decoder.init_params
        )
        trainable = {
            "code": jnp.zeros((B, cfg.iden_dims + cfg.expr_dims + cfg.text_dims + cfg.illu_dims)),
            "delta_euler": jnp.zeros((B, 3)),
            "delta_tvec": jnp.zeros((B, 3)),
        }

        def run_stage(trainable, steps, lr, cam_only):
            opt = optax.adam(lr)

            def mask_grads(g):
                if not cam_only:
                    return g
                zero = jax.tree_util.tree_map(jnp.zeros_like, g)
                return {
                    **zero,
                    "delta_euler": g["delta_euler"],
                    "delta_tvec": g["delta_tvec"],
                }

            @jax.jit
            def stage(trainable):
                opt_state = opt.init(trainable)

                def body(carry, _):
                    tr, st = carry
                    (loss, aux), g = jax.value_and_grad(
                        self._loss, has_aux=True
                    )(tr, frozen, batch)
                    g = mask_grads(g)
                    upd, st = opt.update(g, st, tr)
                    tr = jax.tree_util.tree_map(lambda p, u: p + u, tr, upd)
                    return (tr, st), loss

                (tr, _), losses = jax.lax.scan(
                    body, (trainable, opt_state), None, length=steps
                )
                return tr, losses

            return stage(trainable)

        trainable, l1 = run_stage(trainable, cfg.stage1_steps, cfg.lr_cam, True)
        trainable, l2 = run_stage(trainable, cfg.stage2_steps, cfg.lr_code, False)

        # final camera + outputs (reference save_res :292-340)
        dR = euler_to_rotation(trainable["delta_euler"])
        w2c_R = np.asarray(jnp.einsum("bij,bjk->bik", dR, frozen["base_w2c_R"]))
        w2c_T = np.asarray(
            jnp.einsum("bij,bj->bi", dR, frozen["base_w2c_T"])
            + trainable["delta_tvec"]
        )
        c2w_R = w2c_R.transpose(0, 2, 1)
        c2w_T = -np.einsum("bij,bj->bi", c2w_R, w2c_T)
        inmat_np = np.asarray(frozen["inmat"])
        inv_inmat = np.linalg.inv(inmat_np)
        return {
            "code": np.asarray(trainable["code"]),
            "w2c_Rmat": w2c_R,
            "w2c_Tvec": w2c_T,
            "c2w_Rmat": c2w_R,
            "c2w_Tvec": c2w_T,
            "inmat": inmat_np,
            "inv_inmat": inv_inmat.astype(np.float32),
            "stage1_losses": np.asarray(l1),
            "stage2_losses": np.asarray(l2),
        }
