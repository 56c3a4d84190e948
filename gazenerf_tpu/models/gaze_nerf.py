"""GazeNeRF — the full two-stream conditional NeRF, TPU-native.

Re-design of the reference ``GazeNeRFNet`` (reference: models/gaze_nerf.py:13-351):
a face field and an eye field each predict a 258-channel feature + density
volume, alpha-composited into 64x64 feature maps; the eye feature planes are
rotated in 3D by the gaze direction; the two streams fuse via elementwise max;
the neural renderer upsamples features to the 512x512 RGB image.

TPU-first choices:

* channels-last everywhere; all shapes static under ``jit``.
* the positional embedding is computed ONCE and shared by both branches — the
  reference instantiates two identical parameterless embedders
  (models/gaze_nerf.py:63-68) whose outputs are equal.
* conditioning codes are folded into the field matmuls per batch element
  (see :mod:`gazenerf_tpu.models.mlp_nerf`) instead of being broadcast to
  every sample (reference models/gaze_nerf.py:250-262).
* the gaze rotation of eye feature planes is one batched einsum
  (:func:`gazenerf_tpu.ops.rotation.rotate_feature_planes`) instead of a
  per-sample Python loop (reference utils/model_utils.py:32-46).
* stratified-jitter randomness comes from an explicit ``rngs={"sampling": key}``
  instead of global RNG state.
* optional fused Pallas ray-march path (``config.use_pallas``) evaluates
  embedding + both field MLPs + integration per ray-tile in VMEM.

The broken reference hierarchical-sampling branch (models/gaze_nerf.py:282-318
references an attribute that is never created) is implemented *correctly* here
and stays off by default, matching reference behaviour (train.py:44).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gazenerf_tpu.config import ModelConfig
from gazenerf_tpu.models.mlp_nerf import NeRFFieldMLP
from gazenerf_tpu.models.neural_renderer import NeuralRenderer
from gazenerf_tpu.ops.embedding import positional_encoding
from gazenerf_tpu.ops.integrate import integrate_rays
from gazenerf_tpu.ops.rays import SampleSet, sample_coarse, sample_fine
from gazenerf_tpu.ops.rotation import rotate_feature_planes


class GazeNeRF(nn.Module):
    """Full model.  ``cfg`` is a frozen :class:`ModelConfig`."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        field_cls = nn.remat(NeRFFieldMLP) if cfg.remat_fields else NeRFFieldMLP
        field = lambda name: field_cls(  # noqa: E731
            embed_dims=cfg.vp_embed_dims,
            cond_dims=cfg.shape_ext_code_dims,
            vd_cond_dims=cfg.vd_channels,
            hidden=cfg.mlp_hidden,
            res_nfeat=cfg.featmap_nc,
            dtype=dtype,
            name=name,
        )
        # names mirror the reference modules for transplant clarity
        self.fg_CD_predictor_face = field("fg_CD_predictor_face")
        self.fg_CD_predictor_eyes = field("fg_CD_predictor_eyes")
        if cfg.hier_sampling:
            self.fine_fg_CD_predictor = field("fine_fg_CD_predictor")
        ren_dtype = (
            jnp.bfloat16 if cfg.renderer_dtype == "bfloat16" else jnp.float32
        )
        shuffle_mode = cfg.shuffle_mode
        interpret = False
        if shuffle_mode == "pallas" and jax.default_backend() != "tpu":
            if cfg.pallas_interpret:
                interpret = True
            else:
                shuffle_mode = "phase"  # XLA fallback off-TPU
        if shuffle_mode == "fused" and jax.default_backend() != "tpu":
            if cfg.pallas_interpret:
                interpret = True
            else:
                # phase_gm + fold computes the identical function in XLA
                shuffle_mode = "phase_gm"
        self.neural_render = NeuralRenderer(
            bg_type=cfg.bg_type,
            feat_nc=cfg.featmap_nc,
            out_dim=3,
            final_actvn=True,
            min_feat=cfg.min_feat,
            featmap_size=cfg.featmap_size,
            img_size=cfg.pred_img_size,
            dtype=ren_dtype,
            shuffle_mode=shuffle_mode,
            pallas_interpret=interpret,
            fold_feat_layer=cfg.renderer_fold_feat,
            rgb_channel_first=cfg.renderer_rgb_cf,
            name="neural_render",
        )

    def _fused_dims(self, embed: jnp.ndarray):
        """FieldDims for the fused Pallas path, or None if it doesn't apply.

        The fused kernel computes in bf16 (like the XLA bf16 path) and only
        exists for TPU backends, so it is gated on ``compute_dtype=bfloat16``
        and the default backend; any other case falls back to the XLA path.
        """
        cfg = self.cfg
        if not cfg.use_pallas or cfg.compute_dtype != "bfloat16":
            return None
        interpret = False
        if jax.default_backend() != "tpu":
            if not cfg.pallas_interpret:
                return None
            interpret = True
        from gazenerf_tpu.kernels.fused_field import default_dims

        B, R, S, De = embed.shape
        # keep ray-tiles at <=2048 points so VMEM holds the f32 intermediates
        tr = cfg.pallas_tile_rays or max(8, 2048 // S)
        while R % tr:
            tr //= 2
        btr = cfg.pallas_bwd_tile_rays or min(8, tr)
        while R % btr:
            btr //= 2
        dims = default_dims(cfg, interpret=interpret)._replace(
            samples=S, tile_rays=tr, bwd_tile_rays=btr,
            vmem_limit_mb=cfg.pallas_vmem_mb,
            stash_acts=cfg.pallas_stash_acts or cfg.pallas_split_dw,
            stash_every=1 if cfg.pallas_split_dw else cfg.pallas_stash_every,
            split_dw=cfg.pallas_split_dw,
            dens_vpu=cfg.pallas_dens_vpu,
            # int8 stash is a single-branch-kernel feature; split_dw's XLA
            # dW epilogue contracts over raw bf16 stash tensors
            stash_dtype=(
                "bfloat16" if cfg.pallas_split_dw else cfg.pallas_stash_dtype
            ),
        )
        return dims if R % dims.tile_rays == 0 else None

    def _render_branch(
        self,
        field: NeRFFieldMLP,
        embed: jnp.ndarray,
        shape_ext_code: jnp.ndarray,
        appea_code: jnp.ndarray,
        samples: SampleSet,
        embed_vd: jnp.ndarray = None,
    ):
        """Field evaluation + volume integration for one stream."""
        cfg = self.cfg
        if embed_vd is None:
            dims = self._fused_dims(embed)
            if dims is not None:
                x_in = embed
                if (
                    cfg.pallas_fuse_embed
                    and not cfg.pallas_split_dw
                    and cfg.include_input_vp
                    and cfg.vp_embed_dims == 3 + 6 * cfg.vp_n_freqs
                ):
                    # feed raw points; the kernel encodes in VMEM (the embed
                    # computed above is unused here and DCE'd by XLA)
                    dims = dims._replace(
                        embed_in_kernel=True, n_freqs=cfg.vp_n_freqs
                    )
                    x_in = samples.pts
                elif cfg.pallas_embed_bf16:
                    # feed the kernel bf16 (it casts internally anyway, so
                    # forward values are unchanged) — the dembed cotangent
                    # then comes back bf16, halving the kernel write + the
                    # whole XLA-side dembed/dpts chain
                    x_in = embed.astype(jnp.bfloat16)
                feat_int, bg_alpha, depth, w = field.fused_render(
                    x_in, shape_ext_code, appea_code,
                    samples.zvals, samples.z_dists, dims,
                )
                from gazenerf_tpu.ops.integrate import Integrated

                return Integrated(
                    features=feat_int, bg_alpha=bg_alpha, depth=depth, weights=w
                )
        feat, density = field(embed, shape_ext_code, appea_code, embed_vd)
        out = integrate_rays(
            feat.astype(jnp.float32),
            density[..., 0].astype(jnp.float32),
            samples.z_dists,
            samples.zvals,
        )
        return out

    def _render_both(self, embed, shape_ext_code, appea_code, samples, embed_vd):
        """Both streams, optionally in sequential ray chunks.

        ``cfg.ray_chunk`` bounds the live per-ray activation/stash footprint
        to one chunk (lax.map + jax.checkpoint — the SURVEY §5 sample-axis
        scaling story): deep marches (S=256 at full size needs ~16.7 GB
        unchunked, over v5e HBM) become a sequential sweep of
        memory-bounded tiles.
        """
        cfg = self.cfg
        R = embed.shape[1]
        rc = cfg.ray_chunk
        if (
            rc
            and R > rc
            and R % rc == 0
            and embed_vd is None
            and not self.is_initializing()
        ):
            import jax

            from gazenerf_tpu.ops.integrate import Integrated

            n = R // rc

            def per_chunk(chunk):
                e, pts, zv, zd = chunk
                sub = samples._replace(pts=pts, zvals=zv, z_dists=zd)
                f, ey = self._render_both_impl(
                    e, shape_ext_code, appea_code, sub, None
                )
                return (tuple(f), tuple(ey))

            def split(x):  # [B, R, ...] -> [n, B, rc, ...]
                return jnp.moveaxis(
                    x.reshape(x.shape[0], n, rc, *x.shape[2:]), 1, 0
                )

            chunks = tuple(
                split(x) for x in (embed, samples.pts, samples.zvals, samples.z_dists)
            )
            f, ey = jax.lax.map(jax.checkpoint(per_chunk), chunks)

            def join(x):  # [n, B, rc, ...] -> [B, R, ...]
                x = jnp.moveaxis(x, 0, 1)
                return x.reshape(x.shape[0], R, *x.shape[3:])

            return (
                Integrated(*(join(t) for t in f)),
                Integrated(*(join(t) for t in ey)),
            )
        return self._render_both_impl(
            embed, shape_ext_code, appea_code, samples, embed_vd
        )

    def _render_both_impl(self, embed, shape_ext_code, appea_code, samples, embed_vd):
        """Both streams; one dual-branch kernel when it applies (the two
        independent field chains interleave on the MXU — kernels/fused_field2)."""
        cfg = self.cfg
        if embed_vd is None and cfg.pallas_dual_branch:
            dims = self._fused_dims(embed)
            if dims is not None:
                from gazenerf_tpu.kernels.fused_field2 import fused_dual_render
                from gazenerf_tpu.ops.integrate import Integrated

                # the dual kernels implement neither the split-dW epilogue nor
                # the VPU density head; clear those probe flags (and the stash
                # split_dw would otherwise force) so an A/B of them against
                # the dual path isn't silently a no-op
                dims = dims._replace(
                    split_dw=False,
                    dens_vpu=False,
                    stash_acts=cfg.pallas_stash_acts,
                    stash_dtype="bfloat16",  # dual kernels: bf16 stash only
                )

                outs = fused_dual_render(
                    dict(self.fg_CD_predictor_face.flat),
                    dict(self.fg_CD_predictor_eyes.flat),
                    embed, shape_ext_code, appea_code,
                    samples.zvals, samples.z_dists, dims,
                )
                face, eyes = (
                    Integrated(
                        features=o[0], bg_alpha=o[1], depth=o[2], weights=o[3]
                    )
                    for o in outs
                )
                return face, eyes
        face = self._render_branch(
            self.fg_CD_predictor_face, embed, shape_ext_code, appea_code,
            samples, embed_vd,
        )
        eyes = self._render_branch(
            self.fg_CD_predictor_eyes, embed, shape_ext_code, appea_code,
            samples, embed_vd,
        )
        return face, eyes

    def __call__(
        self,
        batch_xy: jnp.ndarray,
        shape_code: jnp.ndarray,
        appea_code: jnp.ndarray,
        gaze_code: jnp.ndarray,
        Rmats: jnp.ndarray,
        Tvecs: jnp.ndarray,
        inv_inmats: jnp.ndarray,
        train: bool = False,
    ) -> Dict[str, Any]:
        """Render a batch.

        Args:
          batch_xy: ``[B, R, 2]`` featmap pixel grid (R = featmap_size**2).
          shape_code: ``[B, 179]`` identity(100) ++ expression(79).
          appea_code: ``[B, 127]`` texture(100) ++ illumination(27).
          gaze_code: ``[B, 2]`` (pitch, yaw).
          Rmats/Tvecs/inv_inmats: camera-to-world extrinsics + inverse
            intrinsics at featmap resolution.
          train: enables stratified jitter (uses the ``sampling`` RNG stream).

        Returns a dict matching the reference's ``coarse_dict``
        (models/gaze_nerf.py:207): ``merge_img``, ``merge_img_face``,
        ``merge_img_eyes``, ``bg_img`` (all ``[B, H, W, 3]`` NHWC) plus
        auxiliary feature maps and integration weights.
        """
        cfg = self.cfg
        B = batch_xy.shape[0]
        F = cfg.featmap_size

        key = self.make_rng("sampling") if train else None
        samples = sample_coarse(
            batch_xy,
            Rmats,
            Tvecs.reshape(B, 3),
            inv_inmats,
            num_samples=cfg.num_sample_coarse,
            world_z1=cfg.world_z1,
            world_z2=cfg.world_z2,
            key=key,
        )

        # one shared positional embedding for both branches
        embed = positional_encoding(
            samples.pts, cfg.vp_n_freqs, cfg.include_input_vp
        )
        embed_vd = (
            positional_encoding(samples.dirs, cfg.vd_n_freqs, cfg.include_input_vd)
            if cfg.include_vd
            else None
        )
        shape_ext_code = jnp.concatenate(
            [shape_code, gaze_code.reshape(B, 2)], axis=-1
        )

        face, eyes = self._render_both(
            embed, shape_ext_code, appea_code, samples, embed_vd
        )

        fg_feat_face = face.features.reshape(B, F, F, cfg.featmap_nc)
        fg_feat_eyes = eyes.features.reshape(B, F, F, cfg.featmap_nc)
        bg_alpha_face = face.bg_alpha.reshape(B, F, F, 1)
        bg_alpha_eyes = eyes.bg_alpha.reshape(B, F, F, 1)

        bg_featmap = self.neural_render.get_bg_featmap()

        merge_featmap_face = fg_feat_face + bg_alpha_face * bg_featmap
        merge_featmap_eyes = fg_feat_eyes + bg_alpha_eyes * bg_featmap

        eyes_planes = rotate_feature_planes(
            merge_featmap_eyes, gaze_code.reshape(B, 2)
        )
        merge_featmap = jnp.maximum(merge_featmap_face, eyes_planes)

        if cfg.batch_renderer_passes:
            # one batched renderer pass for bg + face + eyes + merge: the
            # reference runs 4 sequential CNN forwards (models/gaze_nerf.py:
            # 175,186-189); stacking them along batch feeds the MXU 4x the
            # rows per matmul for the same weights (identical math per image)
            stacked = jnp.concatenate(
                [bg_featmap, merge_featmap_face, eyes_planes, merge_featmap],
                axis=0,
            )
            imgs = self.neural_render(stacked)
            bg_img = imgs[:1]
            merge_img_face = imgs[1 : 1 + B]
            merge_img_eyes = imgs[1 + B : 1 + 2 * B]
            merge_img = imgs[1 + 2 * B :]
        elif cfg.batch_fg_passes:
            # the three foreground maps share shape [B,F,F,C]: stacking them
            # keeps every renderer matmul at 3B rows (even tiles — the
            # 3B+1 variant above tiled poorly, PERF_NOTES round 1); the
            # constant 1-row bg featmap renders separately
            stacked = jnp.concatenate(
                [merge_featmap_face, eyes_planes, merge_featmap], axis=0
            )
            imgs = self.neural_render(stacked)
            merge_img_face = imgs[:B]
            merge_img_eyes = imgs[B : 2 * B]
            merge_img = imgs[2 * B :]
            bg_img = self.neural_render(bg_featmap)
        else:
            bg_img = self.neural_render(bg_featmap)
            merge_img_face = self.neural_render(merge_featmap_face)
            merge_img_eyes = self.neural_render(eyes_planes)
            merge_img = self.neural_render(merge_featmap)

        res: Dict[str, Any] = {
            "coarse_dict": {
                "merge_img": merge_img,
                "merge_img_face": merge_img_face,
                "merge_img_eyes": merge_img_eyes,
                "bg_img": bg_img,
            },
            "featmaps": {
                "face": merge_featmap_face,
                "eyes": eyes_planes,
                "merge": merge_featmap,
            },
            "weights": face.weights,
            "depth": {"face": face.depth, "eyes": eyes.depth},
        }

        if cfg.hier_sampling:
            fine_key = self.make_rng("sampling") if train else None
            fine_samples = sample_fine(
                face.weights, samples, cfg.num_sample_fine, key=fine_key
            )
            fine_embed = positional_encoding(
                fine_samples.pts, cfg.vp_n_freqs, cfg.include_input_vp
            )
            fine_embed_vd = (
                positional_encoding(
                    fine_samples.dirs, cfg.vd_n_freqs, cfg.include_input_vd
                )
                if cfg.include_vd
                else None
            )
            fine = self._render_branch(
                self.fine_fg_CD_predictor,
                fine_embed,
                shape_ext_code,
                appea_code,
                fine_samples,
                fine_embed_vd,
            )
            fine_feat = fine.features.reshape(B, F, F, cfg.featmap_nc)
            fine_bga = fine.bg_alpha.reshape(B, F, F, 1)
            fine_merge = fine_feat + fine_bga * bg_featmap
            res["fine_dict"] = {
                "merge_img": self.neural_render(fine_merge),
                "bg_img": bg_img,
            }

        return res
