"""NeRF field MLP — the hottest compute in the framework.

TPU-native re-design of the reference ``MLPforNeRF``
(reference: models/mlp_nerf.py:13-119).  The reference implements the MLP as
8 stacked 1x1 ``Conv2d`` over an NCHW ``[B, C, N_rays, N_samples]`` tensor;
that is just a pointwise MLP.  Here every layer is one large
``[N, C_in] x [C_in, C_out]`` matmul that XLA tiles straight onto the MXU
(N = B*R*S is hundreds of thousands of points — ideal systolic shapes).

**Split-conditioning optimization (TPU-first, not in the reference):** the
reference broadcasts the per-image conditioning codes to every sample and
concatenates them onto the positional embedding before each affected layer
(models/gaze_nerf.py:250-262 materializes ``[B, 181, 4096, 64]``).  Because a
matmul over a concat factorizes — ``cat(e, c) @ W == e @ W[:De] + c @ W[De:]``
— we keep the *parameter layout* identical to the reference (transplant
compatible) but compute the code contribution once per batch element
([B, Dc] @ [Dc, H] -> broadcast add), never materializing the broadcast.
This removes ~180 channels x B*R*S of HBM traffic and redundant MXU work
from layers 0, 5 (skip) and rgb_1.

Topology (must match the reference exactly for weight transplant):

* ``fea_0``: (vp_embed ++ shape_ext_code) -> H, ReLU
* ``fea_1..7``: H -> H, ReLU; after ``fea_4``'s ReLU the full input is
  re-concatenated **in front** (``cat([vps, x])``, reference
  models/mlp_nerf.py:107), so ``fea_5`` consumes ``vp_channels + H``.
* ``density``: H -> 1, ReLU at the output (reference :115)
* ``rgb_0``: H -> H (NO activation, reference :110)
* ``rgb_1``: (rgb_0_out ++ vd_code) -> H/2, ReLU
* ``rgb_2``: H/2 -> res_nfeat; sigmoid only when ``res_nfeat == 3``
  (reference :116-117 — the 258-ch feature field has NO sigmoid).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


def _kernel_init():
    # torch xavier_uniform over [out, in] == variance-scaling uniform fan_avg
    return nn.initializers.xavier_uniform()


class NeRFFieldMLP(nn.Module):
    """Pointwise radiance/density field with split conditioning.

    Parameters are stored with the reference-compatible layout: e.g.
    ``fea_0/kernel`` has shape ``[embed_dims + cond_dims, hidden]`` where the
    first ``embed_dims`` rows act on the positional embedding and the rest on
    the conditioning code (matching the reference concat order
    ``cat([vp_embed, shape_ext_code])`` — models/gaze_nerf.py:137).

    Params are created in ``setup`` (not ``@nn.compact``) so both the XLA
    ``__call__`` path and :meth:`fused_render` (the fused Pallas ray-march
    kernel, which consumes the raw flat param dict) share one param tree.
    """

    embed_dims: int  # positional embedding width (63)
    cond_dims: int  # shape_ext conditioning width (181)
    vd_cond_dims: int  # appearance conditioning width (127)
    hidden: int = 384
    n_layers: int = 8
    res_nfeat: int = 258
    dtype: jnp.dtype = jnp.float32

    @property
    def vp_channels(self) -> int:
        return self.embed_dims + self.cond_dims

    def setup(self):
        H = self.hidden
        skip_at = self.n_layers // 2  # = 4 (reference models/mlp_nerf.py:24)
        specs = [("fea_0", self.vp_channels, H)]
        for i in range(1, self.n_layers):
            cin = self.vp_channels + H if i == skip_at + 1 else H
            specs.append((f"fea_{i}", cin, H))
        specs += [
            ("density", H, 1),
            ("rgb_0", H, H),
            ("rgb_1", H + self.vd_cond_dims, H // 2),
            ("rgb_2", H // 2, self.res_nfeat),
        ]
        flat = {}
        for name, cin, cout in specs:
            flat[f"{name}/kernel"] = self.param(
                f"{name}/kernel", _kernel_init(), (cin, cout), jnp.float32
            )
            flat[f"{name}/bias"] = self.param(
                f"{name}/bias", nn.initializers.zeros, (cout,), jnp.float32
            )
        self.flat = flat

    def fused_render(self, embed_vp, shape_cond, appea_cond, zvals, zdists, dims):
        """Fused Pallas field evaluation + volume integration (TPU).

        Returns ``(feat_int [B,R,C], bg_alpha [B,R], depth [B,R], w [B,R,S])``
        — the field MLP and the alpha-compositing integration run per ray-tile
        in VMEM; the ``[B,R,S,258]`` feature volume never exists in HBM.
        """
        from gazenerf_tpu.kernels.fused_field import fused_field_render

        # flax freezes dict attributes; the custom VJP produces a plain dict
        return fused_field_render(
            dict(self.flat), embed_vp, shape_cond, appea_cond, zvals, zdists, dims
        )

    def __call__(
        self,
        embed_vp: jnp.ndarray,
        shape_cond: jnp.ndarray,
        appea_cond: jnp.ndarray,
        embed_vd: jnp.ndarray = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Evaluate the field.

        Args:
          embed_vp: ``[B, ..., embed_dims]`` positional encodings.
          shape_cond: ``[B, cond_dims]`` per-image shape++gaze code.
          appea_cond: ``[B, vd_cond_dims - Dvd]`` per-image appearance code.
          embed_vd: optional ``[B, ..., Dvd]`` per-sample view-direction
            encodings (the reference's ``include_vd`` path,
            models/gaze_nerf.py:140-143: ``cat([vd_embed, appea_code])`` with
            the vd block FIRST).

        Returns:
          ``(features [B, ..., res_nfeat], density [B, ..., 1])``.
        """
        H = self.hidden
        skip_at = self.n_layers // 2  # = 4 (reference models/mlp_nerf.py:24)
        B = embed_vp.shape[0]
        bshape = (B,) + (1,) * (embed_vp.ndim - 2)  # broadcast over rays/samples

        def param(name, cin, cout):
            k = self.flat[f"{name}/kernel"]
            b = self.flat[f"{name}/bias"]
            return k.astype(self.dtype), b.astype(self.dtype)

        x = embed_vp.astype(self.dtype)
        sc = shape_cond.astype(self.dtype)
        ac = appea_cond.astype(self.dtype)

        # fea_0: [De + Dc] -> H
        k, b = param("fea_0", self.vp_channels, H)
        cond_bias0 = sc @ k[self.embed_dims :]  # [B, H]
        x = x @ k[: self.embed_dims] + cond_bias0.reshape(bshape + (H,)) + b
        x = nn.relu(x)

        for i in range(1, self.n_layers):
            if i == skip_at + 1:
                # fea_5 consumes cat([vp_embed, cond, x]) (reference :107)
                k, b = param(f"fea_{i}", self.vp_channels + H, H)
                cond_bias = sc @ k[self.embed_dims : self.vp_channels]
                x = (
                    embed_vp.astype(self.dtype) @ k[: self.embed_dims]
                    + cond_bias.reshape(bshape + (H,))
                    + x @ k[self.vp_channels :]
                    + b
                )
            else:
                k, b = param(f"fea_{i}", H, H)
                x = x @ k + b
            x = nn.relu(x)

        k, b = param("density", H, 1)
        density = nn.relu(x @ k + b)

        k, b = param("rgb_0", H, H)
        y = x @ k + b  # no activation (reference :110)

        # rgb_1 consumes cat([y, vd_embed?, appea_cond]) (reference :111;
        # vd block first when include_vd — models/gaze_nerf.py:140-143)
        k, b = param("rgb_1", H + self.vd_cond_dims, H // 2)
        if embed_vd is not None:
            dvd = embed_vd.shape[-1]
            cond_bias1 = ac @ k[H + dvd :]
            y = (
                y @ k[:H]
                + embed_vd.astype(self.dtype) @ k[H : H + dvd]
                + cond_bias1.reshape(bshape + (H // 2,))
                + b
            )
        else:
            cond_bias1 = ac @ k[H:]
            y = y @ k[:H] + cond_bias1.reshape(bshape + (H // 2,)) + b
        y = nn.relu(y)

        k, b = param("rgb_2", H // 2, self.res_nfeat)
        feat = y @ k + b
        if self.res_nfeat == 3:
            feat = nn.sigmoid(feat)
        return feat, density
