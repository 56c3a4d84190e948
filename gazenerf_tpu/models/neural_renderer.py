"""Neural renderer: 64x64x258 feature map -> 512x512 RGB, NHWC.

TPU-native re-design of the reference ``NeuralRenderer`` /
``PixelShuffleUpsample`` (reference: models/neural_renderer.py:12-113,
models/pixel_shuffle_upsample.py:19-42).  All convolutions are 1x1 (pointwise
Dense over the channel dim) — large NHWC matmuls for the MXU; pixel-shuffle,
bilinear upsample and the binomial blur are the ops in
:mod:`gazenerf_tpu.ops.image` (torch-parity verified).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

import numpy as np

from gazenerf_tpu.ops.image import (
    blur3x3,
    pixel_shuffle2,
    pixel_shuffle2_blur,
    pixel_shuffle2_blur_gm,
    upsample2x_blur,
)


class PermutedDense(nn.Module):
    """Dense whose OUTPUT channels are statically permuted at compute time
    by permuting the weight columns — the stored ``kernel``/``bias`` params
    keep the reference layout (weight-transplant compatible), and the
    activation-side gather costs nothing."""

    features: int
    perm: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        p = np.asarray(self.perm)
        return x.astype(self.dtype) @ k[:, p].astype(self.dtype) + b[p].astype(
            self.dtype
        )


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree (kernel/bias) and inits —
    used by the fused-kernel path, which consumes raw weights."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return k, b


class PixelShuffleUpsample(nn.Module):
    """x2 spatial upsample: 1x1 convs + channel-tile residual + shuffle + blur.

    Reference: models/pixel_shuffle_upsample.py:19-42.  The residual is the
    input tiled 4x along channels (torch ``x.repeat(1, 4, 1, 1)`` == NHWC
    ``jnp.tile(x, (..., 4))`` — same [C,C,C,C] block order).
    """

    in_feature: int
    dtype: jnp.dtype = jnp.float32
    # "naive": transpose-based shuffle + depthwise blur (reference-shaped)
    # "phase": fused phase-arithmetic blur-shuffle (exact, faster)
    # "phase_gm": phase variant with the conv emitting group-major channels
    #   (static weight-column permutation; params stay transplant-layout) so
    #   the phase groups are contiguous slices instead of strided gathers
    # "pallas": gm ordering + the fused Pallas blur-shuffle kernel
    #   (kernels/shuffle_blur.py) — one VMEM pass instead of ~36 XLA FMAs
    shuffle_mode: str = "phase"
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, fold=None) -> jnp.ndarray:
        """``fold``: an optional channel-mixing Dense (the renderer's
        following ``feat_layer``) applied PER PHASE before the stencil.
        The blur-shuffle is per-channel linear with taps summing to 1, so
        ``dense(blur(shuffle(z))) == blur(shuffle(per_phase_dense(z)))``
        exactly (bias included) — the stencil then runs on the folded
        (usually halved) channel count and the full-resolution matmul
        disappears.  Only valid for the gm modes."""
        F = self.in_feature
        if self.shuffle_mode == "fused":
            # one Pallas kernel: conv1 + lrelu + conv2(gm) + lrelu +
            # channel-tile residual + folded feat_layer + blur-shuffle
            # (kernels/fused_upsampler.py); param tree identical to the
            # unfused path
            from gazenerf_tpu.kernels.fused_upsampler import (
                fused_upsample_block,
                residual_matrix,
            )

            assert fold is not None, "fused mode requires the folded feat_layer"
            k1, b1 = _DenseParams(x.shape[-1], F * 2, name="layer_1")()
            k2, b2 = _DenseParams(F * 2, F * 4, name="layer_2")()
            perm = np.empty(4 * F, np.int64)
            for c in range(F):
                for k in range(4):
                    perm[k * F + c] = c * 4 + k
            k3, b3 = fold
            return fused_upsample_block(
                x.astype(self.dtype),
                k1, b1, k2[:, perm], b2[perm],
                jnp.asarray(residual_matrix(F)), k3, b3,
                self.pallas_interpret,
                self.dtype == jnp.bfloat16,
            )
        out = nn.leaky_relu(
            nn.Dense(F * 2, dtype=self.dtype, name="layer_1")(x),
            negative_slope=0.2,
        )
        if self.shuffle_mode in ("phase_gm", "pallas"):
            # output channels permuted c*4+k -> k*F+c at ZERO activation
            # cost: the conv's weight columns are statically permuted
            # (stored layout stays reference/transplant order)
            perm = np.empty(4 * F, np.int64)
            for c in range(F):
                for k in range(4):
                    perm[k * F + c] = c * 4 + k
            out2 = nn.leaky_relu(
                PermutedDense(F * 4, perm=tuple(perm), dtype=self.dtype,
                              name="layer_2")(out),
                negative_slope=0.2,
            )
            # gm channel-tile residual as a 0/1 matmul (MXU; beats a
            # full-tensor lane gather): y_gm[k*F + c] = x[(4c + k) % F]
            P = np.zeros((F, 4 * F), np.float32)
            for k in range(4):
                for c in range(F):
                    P[(4 * c + k) % F, k * F + c] = 1.0
            y_gm = x.astype(self.dtype) @ jnp.asarray(P, self.dtype)
            z_gm = out2 + y_gm
            if fold is not None:
                z_gm = jnp.concatenate(
                    [
                        fold(z_gm[..., k * F : (k + 1) * F])
                        for k in range(4)
                    ],
                    axis=-1,
                )
            if self.shuffle_mode == "pallas":
                from gazenerf_tpu.kernels.shuffle_blur import (
                    pallas_shuffle_blur_gm,
                )

                return pallas_shuffle_blur_gm(z_gm, self.pallas_interpret)
            return pixel_shuffle2_blur_gm(z_gm)
        l2 = nn.Dense(F * 4, dtype=self.dtype, name="layer_2")
        y = jnp.tile(x, (1, 1, 1, 4))
        out = nn.leaky_relu(l2(out), negative_slope=0.2)
        out = out + y
        if self.shuffle_mode == "phase":
            return pixel_shuffle2_blur(out)
        out = pixel_shuffle2(out)
        return blur3x3(out)


class NeuralRenderer(nn.Module):
    """Pixel-shuffle upsampling CNN with per-scale RGB skip connections.

    Reference: models/neural_renderer.py:12-113.  ``n_blocks =
    log2(img_size / featmap_size)`` (= 3 for 64 -> 512); channel widths follow
    ``max(feat_nc // 2**i, min_feat)``.  Owns the learnable background feature
    map (reference ``_build_bg_featmap``, :35-52) as a parameter initialized to
    ones (white bg) or zeros (black).
    """

    bg_type: str = "white"
    feat_nc: int = 258
    out_dim: int = 3
    final_actvn: bool = True
    min_feat: int = 32
    featmap_size: int = 64
    img_size: int = 512
    dtype: jnp.dtype = jnp.float32
    shuffle_mode: str = "phase"
    pallas_interpret: bool = False
    # fold each feat_layer into the preceding blur-shuffle per phase (exact;
    # halves the stencil channel count) — gm modes only
    fold_feat_layer: bool = True
    # run the rgb skip chain channel-first ([B,3,H,W], W on TPU lanes):
    # NHWC C=3 tensors lane-pad 3 -> 128, so every blur/upsample on the rgb
    # accumulator otherwise touches 42x the real bytes.  Exact.
    rgb_channel_first: bool = True

    def setup(self):
        import math

        self.n_blocks = int(math.log2(self.img_size) - math.log2(self.featmap_size))
        widths = [
            max(self.feat_nc // (2**i), self.min_feat)
            for i in range(self.n_blocks + 1)
        ]
        self.feat_upsample_list = [
            PixelShuffleUpsample(
                widths[i], dtype=self.dtype, shuffle_mode=self.shuffle_mode,
                pallas_interpret=self.pallas_interpret,
                name=f"feat_upsample_{i}",
            )
            for i in range(self.n_blocks)
        ]
        if self.shuffle_mode == "fused":
            self.feat_layers = [
                _DenseParams(widths[i], widths[i + 1], name=f"feat_layer_{i}")
                for i in range(self.n_blocks)
            ]
        else:
            self.feat_layers = [
                nn.Dense(widths[i + 1], dtype=self.dtype, name=f"feat_layer_{i}")
                for i in range(self.n_blocks)
            ]
        if self.rgb_channel_first:
            self.feat_2_rgb_list = [
                _DenseParams(widths[i], self.out_dim, name=f"feat_2_rgb_{i}")
                for i in range(self.n_blocks + 1)
            ]
        else:
            self.feat_2_rgb_list = [
                nn.Dense(self.out_dim, dtype=self.dtype, name=f"feat_2_rgb_{i}")
                for i in range(self.n_blocks + 1)
            ]
        init = nn.initializers.ones if self.bg_type == "white" else nn.initializers.zeros
        self.bg_featmap = self.param(
            "bg_featmap",
            init,
            (1, self.featmap_size, self.featmap_size, self.feat_nc),
        )

    def get_bg_featmap(self) -> jnp.ndarray:
        return self.bg_featmap

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """``[B, h, w, feat_nc]`` feature map -> ``[B, H, W, 3]`` RGB."""
        cf = self.rgb_channel_first

        def rgb_head(idx, t):
            if not cf:
                return self.feat_2_rgb_list[idx](t)
            # channel-first head: einsum straight into [B, 3, H, W] — the
            # 3-channel accumulator keeps W on lanes (no 3->128 pad)
            k, b = self.feat_2_rgb_list[idx]()
            return (
                jnp.einsum(
                    "bhwf,fc->bchw", t.astype(self.dtype), k.astype(self.dtype)
                )
                + b.astype(self.dtype)[None, :, None, None]
            )

        up = (
            __import__(
                "gazenerf_tpu.ops.image", fromlist=["upsample2x_blur_cf"]
            ).upsample2x_blur_cf
            if cf
            else upsample2x_blur
        )

        if self.n_blocks == 0:
            # degenerate img_size == featmap_size config: plain 1x1 RGB head
            # (the reference's initial rgb_upsample would break here —
            # models/neural_renderer.py:99 — so this config is ours only)
            rgb = rgb_head(0, x)
            if cf:
                rgb = jnp.transpose(rgb, (0, 2, 3, 1))
            return nn.sigmoid(rgb) if self.final_actvn else rgb
        rgb = up(rgb_head(0, x))
        net = x
        fold_ok = self.fold_feat_layer and self.shuffle_mode in (
            "phase_gm", "pallas",
        )
        for idx in range(self.n_blocks):
            if self.shuffle_mode == "fused":
                hid = self.feat_upsample_list[idx](
                    net, fold=self.feat_layers[idx]()
                )
            elif fold_ok:
                hid = self.feat_upsample_list[idx](
                    net, fold=self.feat_layers[idx]
                )
            else:
                hid = self.feat_layers[idx](self.feat_upsample_list[idx](net))
            net = nn.leaky_relu(hid, negative_slope=0.2)
            rgb = rgb + rgb_head(idx + 1, net)
            if idx < self.n_blocks - 1:
                rgb = up(rgb)
        if cf:
            rgb = jnp.transpose(rgb, (0, 2, 3, 1))
        if self.final_actvn:
            rgb = nn.sigmoid(rgb)
        return rgb
