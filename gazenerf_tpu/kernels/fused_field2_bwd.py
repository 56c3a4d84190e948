"""Dual-branch fused field kernel — Pallas backward (stash-acts).

Backward twin of :mod:`gazenerf_tpu.kernels.fused_field2`: ONE pallas_call
backpropagates BOTH field branches per (batch, ray-tile) grid step, reading
the forward's stashed activations.  The two branches' chains are independent,
so the scheduler can fill each branch's matmul->mask->matmul gaps with the
other branch's work; the shared-input cotangents (``dembed``, ``dzvals``,
``dzdists``) are summed in VMEM instead of by XLA adds over [B,R,S,*]
tensors in HBM.

Math identical to :mod:`gazenerf_tpu.kernels.fused_field_bwd` (suffix-sum as
upper-triangular matmul, f32 data-grad matmuls, in-VMEM dW accumulation
across grid steps via constant-index-map outputs).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gazenerf_tpu.kernels.fused_field import _EPS, FieldDims, compiler_params
from gazenerf_tpu.kernels.fused_field2 import _NB, _stack_operands


def _bwd_kernel(dims: FieldDims):
    De, H, C, S, TR = dims.embed, dims.hidden, dims.feat, dims.samples, dims.tile_rays
    H2 = H // 2
    N = TR * S

    def kernel(*refs):
        f32, bf = jnp.float32, jnp.bfloat16
        (
            embed_ref, zvals_ref, zdists_ref,
            cb0_ref, cb5_ref, cbr1_ref,
            W0e_ref, Wmid_ref, bmid_ref, W5e_ref, W5x_ref,
            Wd_ref, bd_ref, Wr0_ref, br0_ref, Wr1x_ref, Wr2_ref, br2_ref,
        ) = refs[:18]
        rest = refs[18:]
        gs = [rest[b * 4:(b + 1) * 4] for b in range(_NB)]  # gfeat,gbga,gdepth,gw
        stash = [rest[_NB * 4 + b * 10:_NB * 4 + (b + 1) * 10] for b in range(_NB)]
        outs = rest[_NB * 4 + _NB * 10:]
        (dembed_ref, dzvals_ref, dzdists_ref) = outs[:3]
        (
            dcb0_ref, dcb5_ref, dcbr1_ref,
            dW0e_ref, dWmid_ref, dbmid_ref, dW5e_ref, dW5x_ref,
            dWd_ref, dbd_ref, dWr0_ref, dbr0_ref, dWr1x_ref, dWr2_ref, dbr2_ref,
        ) = outs[3:]

        bidx = pl.program_id(0)
        ridx = pl.program_id(1)
        is_first = (bidx == 0) & (ridx == 0)
        is_first_of_batch = ridx == 0

        def dense(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        def dgrad(g, w):  # g @ w^T in f32 (A/B'd EQUAL to bf16; keep precision)
            return jax.lax.dot_general(
                g.astype(f32), w.astype(f32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )

        def outer(x, g):  # x^T @ g
            return jax.lax.dot_general(
                x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        def acc(ref, val, first=is_first):
            @pl.when(first)
            def _():
                ref[...] = val

            @pl.when(jnp.logical_not(first))
            def _():
                ref[...] += val

        embed = embed_ref[0].reshape(N, De).astype(bf)
        zdists = zdists_ref[0]
        zvals = zvals_ref[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        ltri = (row < col).astype(f32)
        utri = (row > col).astype(f32)

        # ---- per-branch stash reads + cheap head/integration recompute ----
        acts = [[stash[b][i][0].reshape(N, H) for i in range(8)] for b in range(_NB)]
        y0b = [stash[b][8][0].reshape(N, H) for b in range(_NB)]
        y1 = [stash[b][9][0].reshape(N, H2) for b in range(_NB)]

        dens_pre = [
            dense(acts[b][7], Wd_ref[b].astype(bf)) + bd_ref[b][None, :]
            for b in range(_NB)
        ]
        feat = [
            dense(y1[b], Wr2_ref[b].astype(bf)) + br2_ref[b][None, :]
            for b in range(_NB)
        ]

        dz_acc = None
        dd_acc = None
        dx = [None, None]
        for b in range(_NB):
            sigma = jnp.maximum(dens_pre[b], 0.0).reshape(TR, S)
            expterm = jnp.exp(-sigma * zdists)
            alpha = 1.0 - expterm
            logx = jnp.log(1.0 - alpha + _EPS)
            trans = jnp.exp(dense(logx, ltri))
            w = alpha * trans
            feat3 = feat[b].reshape(TR, S, C)

            gfeat = gs[b][0][0]
            gbga = gs[b][1][0][:, 0]
            gdepth = gs[b][2][0][:, 0]
            gw_in = gs[b][3][0]

            dfeat3 = w[:, :, None] * gfeat[:, None, :]
            dw_t = (
                jnp.sum(feat3 * gfeat[:, None, :], axis=-1)
                + zvals * gdepth[:, None]
                - gbga[:, None]
                + gw_in
            )
            suffix = dense(w * dw_t, utri)
            dalpha = dw_t * trans - suffix / (1.0 - alpha + _EPS)
            dsigma = dalpha * zdists * expterm
            ddists = dalpha * sigma * expterm
            dzv = w * gdepth[:, None]
            dz_acc = dzv if dz_acc is None else dz_acc + dzv
            dd_acc = ddists if dd_acc is None else dd_acc + ddists

            # head backward
            dpre_dens = jnp.where(dens_pre[b] > 0.0, 1.0, 0.0) * dsigma.reshape(N, 1)
            dfeat = dfeat3.reshape(N, C)
            dy1 = dgrad(dfeat, Wr2_ref[b])
            dy1 = jnp.where(y1[b].astype(f32) > 0.0, dy1, 0.0)
            dy0 = dgrad(dy1, Wr1x_ref[b])
            dx[b] = dgrad(dpre_dens, Wd_ref[b]) + dgrad(dy0, Wr0_ref[b])

            acc(dWr2_ref.at[b], outer(y1[b], dfeat.astype(bf)))
            acc(dbr2_ref.at[b], jnp.sum(dfeat, axis=0))
            acc(dWr1x_ref.at[b], outer(y0b[b], dy1.astype(bf)))
            acc(dWr0_ref.at[b], outer(acts[b][7], dy0.astype(bf)))
            acc(dbr0_ref.at[b], jnp.sum(dy0, axis=0))
            acc(dWd_ref.at[b], outer(acts[b][7], dpre_dens.astype(bf)))
            acc(dbd_ref.at[b], jnp.sum(dpre_dens, axis=0))
            acc(
                dcbr1_ref.at[b],
                jnp.sum(dy1, axis=0)[None, None, :],
                first=is_first_of_batch,
            )

        dzvals_ref[0] = dz_acc
        dzdists_ref[0] = dd_acc

        # ---- trunk backward, branch-interleaved per layer ----
        dembed_acc = jnp.zeros((N, De), f32)
        for i in range(7, 0, -1):
            mid_slot = {1: 0, 2: 1, 3: 2, 4: 3, 6: 4, 7: 5}.get(i)
            for b in range(_NB):
                dpre = jnp.where(acts[b][i].astype(f32) > 0.0, dx[b], 0.0)
                if i == 5:
                    acc(dW5e_ref.at[b], outer(embed, dpre.astype(bf)))
                    acc(dW5x_ref.at[b], outer(acts[b][4], dpre.astype(bf)))
                    acc(
                        dcb5_ref.at[b],
                        jnp.sum(dpre, axis=0)[None, None, :],
                        first=is_first_of_batch,
                    )
                    dembed_acc = dembed_acc + dgrad(dpre, W5e_ref[b])
                    dx[b] = dgrad(dpre, W5x_ref[b])
                else:
                    acc(dWmid_ref.at[b, mid_slot], outer(acts[b][i - 1], dpre.astype(bf)))
                    acc(dbmid_ref.at[b, mid_slot], jnp.sum(dpre, axis=0))
                    dx[b] = dgrad(dpre, Wmid_ref[b, mid_slot])
        for b in range(_NB):
            dpre = jnp.where(acts[b][0].astype(f32) > 0.0, dx[b], 0.0)
            acc(dW0e_ref.at[b], outer(embed, dpre.astype(bf)))
            acc(
                dcb0_ref.at[b],
                jnp.sum(dpre, axis=0)[None, None, :],
                first=is_first_of_batch,
            )
            dembed_acc = dembed_acc + dgrad(dpre, W0e_ref[b])

        dembed_ref[0] = dembed_acc.reshape(TR, S, De)

    return kernel


def dual_backward(params_list, embed, sc, ac, zvals, zdists, dims: FieldDims,
                  g, stash):
    """Returns cotangents ``(dparams_face, dparams_eye, dembed, dsc, dac,
    dzvals, dzdists)``."""
    B, R, S, De = embed.shape
    TR = dims.tile_rays
    H, C = dims.hidden, dims.feat
    H2 = H // 2
    f32, bf = jnp.float32, jnp.bfloat16
    ps, cb0, cb5, cbr1, weights = _stack_operands(params_list, sc, ac, dims)

    grid = (B, R // TR)
    vm = pltpu.VMEM
    tile = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=vm)  # noqa: E731
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda b, r: (0,) * arr.ndim, memory_space=vm
    )

    def const_shape(shape):
        return pl.BlockSpec(shape, lambda b, r: (0,) * len(shape), memory_space=vm)

    g_specs, g_ops = [], []
    for gfeat, gbga, gdepth, gw in g:
        g_specs += [
            tile((1, TR, C), lambda b, r: (b, r, 0)),
            tile((1, TR, 1), lambda b, r: (b, r, 0)),
            tile((1, TR, 1), lambda b, r: (b, r, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
        ]
        g_ops += [gfeat, gbga[..., None], gdepth[..., None], gw]
    stash_specs, stash_ops = [], []
    for br in stash:
        for a in br:
            stash_specs.append(tile((1, TR, S, a.shape[-1]), lambda b, r: (b, r, 0, 0)))
            stash_ops.append(a)

    out_shapes = [
        jax.ShapeDtypeStruct((B, R, S, De), f32),  # dembed (summed)
        jax.ShapeDtypeStruct((B, R, S), f32),  # dzvals (summed)
        jax.ShapeDtypeStruct((B, R, S), f32),  # dzdists (summed)
        jax.ShapeDtypeStruct((_NB, B, 1, H), f32),  # dcb0
        jax.ShapeDtypeStruct((_NB, B, 1, H), f32),  # dcb5
        jax.ShapeDtypeStruct((_NB, B, 1, H2), f32),  # dcbr1
        jax.ShapeDtypeStruct((_NB, De, H), f32),
        jax.ShapeDtypeStruct((_NB, 6, H, H), f32),
        jax.ShapeDtypeStruct((_NB, 6, H), f32),
        jax.ShapeDtypeStruct((_NB, De, H), f32),
        jax.ShapeDtypeStruct((_NB, H, H), f32),
        jax.ShapeDtypeStruct((_NB, H, 1), f32),
        jax.ShapeDtypeStruct((_NB, 1), f32),
        jax.ShapeDtypeStruct((_NB, H, H), f32),
        jax.ShapeDtypeStruct((_NB, H), f32),
        jax.ShapeDtypeStruct((_NB, H, H2), f32),
        jax.ShapeDtypeStruct((_NB, H2, C), f32),
        jax.ShapeDtypeStruct((_NB, C), f32),
    ]
    out_specs = [
        tile((1, TR, S, De), lambda b, r: (b, r, 0, 0)),
        tile((1, TR, S), lambda b, r: (b, r, 0)),
        tile((1, TR, S), lambda b, r: (b, r, 0)),
        pl.BlockSpec((_NB, 1, 1, H), lambda b, r: (0, b, 0, 0), memory_space=vm),
        pl.BlockSpec((_NB, 1, 1, H), lambda b, r: (0, b, 0, 0), memory_space=vm),
        pl.BlockSpec((_NB, 1, 1, H2), lambda b, r: (0, b, 0, 0), memory_space=vm),
        const_shape((_NB, De, H)),
        const_shape((_NB, 6, H, H)),
        const_shape((_NB, 6, H)),
        const_shape((_NB, De, H)),
        const_shape((_NB, H, H)),
        const_shape((_NB, H, 1)),
        const_shape((_NB, 1)),
        const_shape((_NB, H, H)),
        const_shape((_NB, H)),
        const_shape((_NB, H, H2)),
        const_shape((_NB, H2, C)),
        const_shape((_NB, C)),
    ]

    outs = pl.pallas_call(
        _bwd_kernel(dims),
        grid=grid,
        in_specs=[
            tile((1, TR, S, De), lambda b, r: (b, r, 0, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            const(cb0), const(cb5), const(cbr1),
        ]
        + [const(w) for w in weights]
        + g_specs
        + stash_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=dims.interpret,
        compiler_params=compiler_params(dims),
    )(
        embed.astype(bf), zvals, zdists, cb0, cb5, cbr1, *weights,
        *g_ops, *stash_ops,
    )

    (dembed, dzvals, dzdists, dcb0, dcb5, dcbr1,
     dW0e, dWmid, dbmid, dW5e, dW5x, dWd, dbd,
     dWr0, dbr0, dWr1x, dWr2, dbr2) = outs

    dsc = jnp.zeros_like(sc)
    dac = jnp.zeros_like(ac)
    dparams: List[Dict] = []
    for b in range(_NB):
        p = ps[b]
        cb0b = dcb0[b, :, 0, :]
        cb5b = dcb5[b, :, 0, :]
        cbr1b = dcbr1[b, :, 0, :]
        dsc = dsc + cb0b @ p["W0c"].T + cb5b @ p["W5c"].T
        dac = dac + cbr1b @ p["Wr1c"].T
        dp = {
            "fea_0/kernel": jnp.concatenate([dW0e[b], sc.T @ cb0b], axis=0),
            "fea_0/bias": jnp.sum(cb0b, axis=0),
            "fea_5/kernel": jnp.concatenate(
                [dW5e[b], sc.T @ cb5b, dW5x[b]], axis=0
            ),
            "fea_5/bias": jnp.sum(cb5b, axis=0),
            "density/kernel": dWd[b],
            "density/bias": dbd[b],
            "rgb_0/kernel": dWr0[b],
            "rgb_0/bias": dbr0[b],
            "rgb_1/kernel": jnp.concatenate([dWr1x[b], ac.T @ cbr1b], axis=0),
            "rgb_1/bias": jnp.sum(cbr1b, axis=0),
            "rgb_2/kernel": dWr2[b],
            "rgb_2/bias": dbr2[b],
        }
        for slot, i in enumerate((1, 2, 3, 4, 6, 7)):
            dp[f"fea_{i}/kernel"] = dWmid[b, slot]
            dp[f"fea_{i}/bias"] = dbmid[b, slot]
        dparams.append(dp)

    return dparams[0], dparams[1], dembed, dsc, dac, dzvals, dzdists
