"""NL-3DMM fitting: recover codes + cameras from images, fully jitted.

TPU re-design of the reference's two-stage Adam fit
(reference: surface_fitting/nl3dmm/fitting_nl3dmm.py:125-290 — stage 1: 50
iters camera-offset only at lm_w=100; stage 2: 200 iters cameras + codes at
lm_w=25, codes at half the camera LR) with the exact loss stack of
losses/nl3dmm_loss.py:6-121 (masked photo MSE x10, normalized-weight
landmark L2, (9,3) SH-gamma regularizer x0.01, code regularizer x0.001,
skin-color constancy x0.1 — see :mod:`gazenerf_tpu.nl3dmm.loss`).

Geometry/shading semantics follow nl3dmm_renderer.py:194-234 ``render_img``:
the camera offset is a LOCAL transform applied to the vertices BEFORE the
base w2c (``live = verts @ c2l_R^T + c2l_T``, so the composed extrinsics are
``R' = w2c_R @ c2l_R``, ``T' = w2c_R @ c2l_T + w2c_T`` — the save path at
fitting_nl3dmm.py:276-281), and vertex normals + SH lighting are computed in
CAMERA space (normals of ``cam_vps``).

Each stage is ONE ``lax.scan`` over optimizer steps — the whole fit is two
device dispatches instead of 250 Python-loop steps.  Output dict matches the
h5 schema the trainer consumes (``code`` 306, ``w2c/c2w`` mats,
``inmat/inv_inmat`` — reference fitting_nl3dmm.py:292-340 ``save_res``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gazenerf_tpu.nl3dmm.face_model import (
    BasisData,
    GeometryDecoder,
    decode_texture,
    init_illu_code,
    sh_shade,
    vertex_normals,
)
from gazenerf_tpu.nl3dmm.loss import NL3DMMLoss
from gazenerf_tpu.nl3dmm.rasterizer import (
    RasterSettings,
    project_landmarks,
    render_mesh,
)


def compute_rotation_ref(angles: jnp.ndarray) -> jnp.ndarray:
    """Euler -> rotation, the reference's exact convention
    (fitting_nl3dmm.py:57-124 ``compute_rotation``): ``(Rz @ Ry @ Rx)^T``.
    ``angles``: [B, 3] radians -> [B, 3, 3]."""
    x, y, z = angles[:, 0], angles[:, 1], angles[:, 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)

    def mat(rows):
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )  # [B, 3, 3]

    rot_x = mat([[one, zero, zero], [zero, cx, -sx], [zero, sx, cx]])
    rot_y = mat([[cy, zero, sy], [zero, one, zero], [-sy, zero, cy]])
    rot_z = mat([[cz, -sz, zero], [sz, cz, zero], [zero, zero, one]])
    rot = rot_z @ rot_y @ rot_x
    return jnp.swapaxes(rot, -1, -2)


class FitConfig(NamedTuple):
    iden_dims: int = 100
    expr_dims: int = 79
    text_dims: int = 100
    illu_dims: int = 27
    stage1_steps: int = 50  # camera-only (reference iter_num_1)
    stage2_steps: int = 200  # + codes (reference iter_num_2 - iter_num_1)
    lr_cam: float = 1e-2  # reference init_lr_1 / init_lr_2
    code_lr_scale: float = 0.5  # codes train at half LR (ref :224-227)
    lm_w_stage1: float = 100.0  # ref :216
    lm_w_stage2: float = 25.0  # ref :233
    image_size: int = 128


class NL3DMMFitter:
    """Fit NL-3DMM codes + camera offsets to a batch of images."""

    def __init__(
        self,
        basis: BasisData,
        cfg: FitConfig = FitConfig(),
        raster: Optional[RasterSettings] = None,
        decoder_params: Optional[Dict] = None,
    ):
        self.basis = basis
        self.cfg = cfg
        self.raster = raster or RasterSettings(image_size=cfg.image_size)
        self.decoder = GeometryDecoder(basis)
        # pretrained decoder weights (the reference soft-loads
        # nl3dmm_net_dict.pth — fitting_nl3dmm.py:44-51)
        self.decoder_params = (
            decoder_params if decoder_params is not None else self.decoder.init_params
        )
        self.loss_utils = NL3DMMLoss(skinmask=np.asarray(basis.skinmask))

    def _render(self, codes, cams, decoder_params):
        """Forward render; mirrors nl3dmm_renderer.py:194-234 ``render_img``."""
        cfg = self.cfg
        code = codes["code"]  # [B, 306]
        shape_code = code[:, : cfg.iden_dims + cfg.expr_dims]
        text_code = code[
            :, cfg.iden_dims + cfg.expr_dims : cfg.iden_dims + cfg.expr_dims + cfg.text_dims
        ]
        illu_code = code[:, cfg.iden_dims + cfg.expr_dims + cfg.text_dims :]

        verts = self.decoder(decoder_params, shape_code)
        albedo = decode_texture(self.basis, text_code)  # [B, V, 3], 0..255

        # local camera offset first, then the base w2c (ref :205-210)
        c2l_R = compute_rotation_ref(cams["delta_euler"])
        live = jnp.einsum("bij,bvj->bvi", c2l_R, verts) + cams["delta_tvec"][:, None]
        cam_vps = (
            jnp.einsum("bij,bvj->bvi", cams["base_w2c_R"], live)
            + cams["base_w2c_T"][:, None]
        )

        # normals + SH shading in CAMERA space (ref :212-217)
        normals = vertex_normals(cam_vps, self.basis.triangles)
        sh_vcs = sh_shade(albedo, normals, illu_code)  # 0..255 scale

        B = verts.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=verts.dtype), (B, 3, 3))
        zero = jnp.zeros((B, 3), verts.dtype)
        img255, alpha = render_mesh(
            cam_vps, sh_vcs, self.basis.triangles, eye, zero, cams["inmat"],
            self.raster, bg_color=255.0,
        )
        img = jnp.clip(img255 / 255.0, 0.0, 1.0)  # ref :226-231
        lm2d = project_landmarks(
            cam_vps, self.basis.landmark_index, eye, zero, cams["inmat"]
        )
        return img, alpha, lm2d, sh_vcs

    def render_fit(self, result: Dict[str, np.ndarray]):
        """Re-render a finished fit for visual QA (the reference's
        fitted-mesh render loop, surface_fitting/nl3dmm/gen_nl3dmm_render_res.py:18).

        The fitted camera offsets are already composed into ``w2c_*``
        (``w2c_R = base_R @ c2l_R``), so rendering with zero deltas over the
        fitted w2c reproduces the fit view.  Returns
        ``(images [B,H,W,3] in [0,1], alpha [B,H,W], landmarks2d [B,68,2])``.
        """
        code = jnp.asarray(result["code"])
        B = code.shape[0]
        cams = {
            "base_w2c_R": jnp.asarray(result["w2c_Rmat"]),
            "base_w2c_T": jnp.asarray(result["w2c_Tvec"]),
            "inmat": jnp.asarray(result["inmat"]),
            "delta_euler": jnp.zeros((B, 3)),
            "delta_tvec": jnp.zeros((B, 3)),
        }
        dec = jax.tree_util.tree_map(jnp.asarray, self.decoder_params)
        img, alpha, lm2d, _ = self._render({"code": code}, cams, dec)
        return np.asarray(img), np.asarray(alpha), np.asarray(lm2d)

    def _loss(self, trainable, frozen, batch, lm_w):
        cfg = self.cfg
        codes = {"code": trainable["code"]}
        cams = {**frozen, "delta_euler": trainable["delta_euler"],
                "delta_tvec": trainable["delta_tvec"]}
        # the geometry decoder is FIXED during fitting (reference fits codes
        # + cameras only, fitting_nl3dmm.py:179-274)
        img, alpha, lm2d, sh_vcs = self._render(codes, cams, frozen["decoder"])

        # photometric mask = the RENDER's coverage (detached), matching the
        # reference's mask_c3b from the rasterizer alpha (:228, loss :96)
        mask = jax.lax.stop_gradient(alpha > 1e-4)[..., None]

        code = trainable["code"]
        i0, i1 = cfg.iden_dims, cfg.iden_dims + cfg.expr_dims
        i2 = i1 + cfg.text_dims
        loss_dict = self.loss_utils.calc_total_loss(
            batch_vcs=sh_vcs,
            cur_illus=code[:, i2:],
            rendered_imgs=img,
            gt_imgs=batch["image"],
            mask_c3d=mask,
            proj_lm2ds=lm2d,
            gt_lm2ds=batch["landmarks"],
            iden_codes=code[:, :i0],
            expr_codes=code[:, i0:i1],
            text_codes=code[:, i1:i2],
            lm_w=lm_w,
        )
        return loss_dict["total_loss"], loss_dict

    def fit(
        self,
        images: np.ndarray,
        landmarks: np.ndarray,
        base_w2c_R: np.ndarray,
        base_w2c_T: np.ndarray,
        inmat: np.ndarray,
        mask: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Two-stage fit; returns the h5-schema result dict per image.

        ``mask`` is accepted for API compatibility but unused: the reference
        masks the photometric term with the RENDER's own coverage
        (nl3dmm_renderer.py:228 ``mask_c3b``), not a ground-truth mask.
        """
        cfg = self.cfg
        B = images.shape[0]
        frozen = {
            "base_w2c_R": jnp.asarray(base_w2c_R),
            "base_w2c_T": jnp.asarray(base_w2c_T),
            "inmat": jnp.asarray(inmat),
            "decoder": jax.tree_util.tree_map(jnp.asarray, self.decoder_params),
        }
        batch = {
            "image": jnp.asarray(images),
            "landmarks": jnp.asarray(landmarks),
        }
        code0 = jnp.zeros(
            (B, cfg.iden_dims + cfg.expr_dims + cfg.text_dims + cfg.illu_dims)
        )
        code0 = code0.at[:, cfg.iden_dims + cfg.expr_dims + cfg.text_dims :].set(
            init_illu_code(B)
        )
        trainable = {
            "code": code0,
            "delta_euler": jnp.zeros((B, 3)),
            "delta_tvec": jnp.zeros((B, 3)),
        }

        def run_stage(trainable, steps, lm_w, cam_only):
            # per-group LRs: cameras at lr_cam, codes at half (ref :224-227)
            opt = optax.multi_transform(
                {
                    "cam": optax.adam(cfg.lr_cam),
                    "code": optax.adam(cfg.lr_cam * cfg.code_lr_scale),
                },
                {"code": "code", "delta_euler": "cam", "delta_tvec": "cam"},
            )

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
                    )(tr, frozen, batch, lm_w)
                    g = mask_grads(g)
                    upd, st = opt.update(g, st, tr)
                    tr = jax.tree_util.tree_map(lambda p, u: p + u, tr, upd)
                    return (tr, st), loss

                (tr, _), losses = jax.lax.scan(
                    body, (trainable, opt_state), None, length=steps
                )
                return tr, losses

            return stage(trainable)

        trainable, l1 = run_stage(
            trainable, cfg.stage1_steps, cfg.lm_w_stage1, True
        )
        trainable, l2 = run_stage(
            trainable, cfg.stage2_steps, cfg.lm_w_stage2, False
        )

        # final camera composition (reference fitting_nl3dmm.py:276-281):
        # w2c_T = base_R @ c2l_T + base_T ; w2c_R = base_R @ c2l_R
        c2l_R = compute_rotation_ref(trainable["delta_euler"])
        base_R = frozen["base_w2c_R"]
        w2c_R = np.asarray(jnp.einsum("bij,bjk->bik", base_R, c2l_R))
        w2c_T = np.asarray(
            jnp.einsum("bij,bj->bi", base_R, trainable["delta_tvec"])
            + frozen["base_w2c_T"]
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
