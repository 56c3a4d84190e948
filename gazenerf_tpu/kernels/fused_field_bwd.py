"""Fused ray-march field kernel — Pallas backward pass.

Completes the custom VJP of :mod:`gazenerf_tpu.kernels.fused_field`: one
``pallas_call`` per (batch, ray-tile) grid step that

1. **recomputes** the forward activations for the tile in VMEM (flash-
   attention-style rematerialization — the [B,R,S,384] activations never
   exist in HBM),
2. backpropagates through the volume integration (the transmittance
   cotangent's suffix sum is a strictly-UPPER-triangular matmul, the mirror
   of the forward's cumsum-as-matmul) and the 8-layer MLP,
3. **accumulates the weight gradients in VMEM across grid steps**: every dW
   output uses a constant index map, so Pallas keeps the block resident for
   the whole grid; step (0, 0) initializes, later steps add (the standard
   Pallas K-loop accumulation pattern).

Conditioning-code gradients come out as per-batch bias-row cotangents
(``dcb*``); the XLA epilogue in fused_field.py folds them back into the
reference-layout parameter tree (``dW0c = sc^T @ dcb0`` etc.).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gazenerf_tpu.kernels.fused_field import (
    FieldDims,
    _embed_bwd_tile,
    _embed_tile,
    _split_params,
    compiler_params,
    stash_layout,
    stash_quant_tags,
)

_EPS = 1e-10


def _bwd_kernel(dims: FieldDims):
    De, H, C, S, TR = dims.embed, dims.hidden, dims.feat, dims.samples, dims.tile_rays
    H2 = H // 2
    N = TR * S

    def kernel(
        # inputs (tiled / const)
        embed_ref, zvals_ref, zdists_ref,
        cb0_ref, cb5_ref, cbr1_ref,
        W0e_ref, Wmid_ref, bmid_ref, W5e_ref, W5x_ref,
        Wd_ref, bd_ref, Wr0_ref, br0_ref, Wr1x_ref, Wr2_ref, br2_ref,
        gfeat_ref, gbga_ref, gdepth_ref, gw_ref,
        # [optional stashed activations: acts0..7, y0b, y1] then outputs
        *rest,
    ):
        n_tail = 22 if dims.split_dw else 18
        stash_refs = rest[:-n_tail]
        q_tags = stash_quant_tags(dims)
        q_slot = {t: i for i, t in enumerate(q_tags)}
        if q_tags:  # last stash input carries the per-(ray,sample) scales
            q_scales = stash_refs[-1][0].reshape(N, len(q_tags))  # f32
            stash_refs = stash_refs[:-1]
        if dims.split_dw:
            (
                dembed_ref, dzvals_ref, dzdists_ref,
                dcb0_ref, dcb5_ref, dcbr1_ref,
                dbmid_ref, dbd_ref, dbr0_ref, dbr2_ref,
                *dpre_refs,  # dpre0..7, ddens, dy0, dy1, dfeat
            ) = rest[-n_tail:]
        else:
            (
                dembed_ref, dzvals_ref, dzdists_ref,
                dcb0_ref, dcb5_ref, dcbr1_ref,
                dW0e_ref, dWmid_ref, dbmid_ref, dW5e_ref, dW5x_ref,
                dWd_ref, dbd_ref, dWr0_ref, dbr0_ref, dWr1x_ref, dWr2_ref,
                dbr2_ref,
            ) = rest[-n_tail:]
        f32 = jnp.float32
        bf = jnp.bfloat16
        bidx = pl.program_id(0)
        ridx = pl.program_id(1)
        is_first = (bidx == 0) & (ridx == 0)
        is_first_of_batch = ridx == 0

        def dense(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )

        def dense_t(g, w):  # g @ w^T
            return jax.lax.dot_general(
                g, w, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

        def outer(x, g):  # x^T @ g
            return jax.lax.dot_general(
                x, g, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )

        # ---------- forward activations: read the stash, or recompute ----------
        if dims.embed_in_kernel:
            pts = embed_ref[0].reshape(N, 3)
            embed_f32 = _embed_tile(pts, dims)
            embed = embed_f32.astype(bf)
        else:
            embed = embed_ref[0].reshape(N, De).astype(bf)

        if stash_refs:
            # forward stashed per stash_layout(dims) in HBM (bf16):
            # stash_every=1 -> x0..x7 + y0b + y1, only the two cheap head
            # matmuls (density, rgb_2) recomputed here (recomputing y0b/y1
            # instead measured 10 ms WORSE at S=64 — per-matmul Mosaic
            # overhead ~5 us dwarfs the pipelined HBM reads saved);
            # stash_every=k>1 -> only every k-th trunk layer stashed, the
            # rest rebuilt in forward order from the nearest stashed
            # predecessor (deep-march regime, PERF_NOTES r5)
            by_tag = {
                tag: ref
                for (tag, _), ref in zip(stash_layout(dims), stash_refs)
            }

            def read_stash(tag, width):
                v = by_tag[tag][0].reshape(N, width)
                if tag in q_slot:
                    # dequantize per-(ray,sample) int8 -> bf16 (sign
                    # preserved, so the ReLU masks below are exact w.r.t.
                    # the quantized value); big-tensor math stays 2-D
                    # [N, width] — Mosaic rejects the cross-shape casts a
                    # coarser per-ray scale would need
                    j = q_slot[tag]
                    v = (v.astype(f32) * q_scales[:, j : j + 1]).astype(bf)
                return v

            acts = [None] * 8
            for i in range(8):
                if f"x{i}" in by_tag:
                    acts[i] = read_stash(f"x{i}", H)
            mid_of = {1: 0, 2: 1, 3: 2, 4: 3, 6: 4, 7: 5}
            for i in range(8):
                if acts[i] is not None:
                    continue
                if i == 0:
                    y = (
                        dense(embed, W0e_ref[...].astype(bf))
                        + cb0_ref[bidx][None, :]
                    )
                elif i == 5:
                    y = (
                        dense(embed, W5e_ref[...].astype(bf))
                        + dense(acts[4], W5x_ref[...].astype(bf))
                        + cb5_ref[bidx][None, :]
                    )
                else:
                    m = mid_of[i]
                    y = (
                        dense(acts[i - 1], Wmid_ref[m].astype(bf))
                        + bmid_ref[m][None, :]
                    )
                acts[i] = jnp.maximum(y, 0.0).astype(bf)
            x7 = acts[7]
            if "y0b" in by_tag:
                y0b = read_stash("y0b", H)
                y1 = read_stash("y1", H2)
            else:
                y0 = dense(x7, Wr0_ref[...].astype(bf)) + br0_ref[...][None, :]
                y0b = y0.astype(bf)
                y1 = dense(y0b, Wr1x_ref[...].astype(bf)) + cbr1_ref[bidx][None, :]
                y1 = jnp.maximum(y1, 0.0).astype(bf)
        else:
            acts = []
            x = dense(embed, W0e_ref[...].astype(bf)) + cb0_ref[bidx][None, :]
            x = jnp.maximum(x, 0.0).astype(bf)
            acts.append(x)  # x0
            mid = 0
            for i in range(1, 8):
                if i == 5:
                    x = (
                        dense(embed, W5e_ref[...].astype(bf))
                        + dense(x, W5x_ref[...].astype(bf))
                        + cb5_ref[bidx][None, :]
                    )
                else:
                    x = dense(x, Wmid_ref[mid].astype(bf)) + bmid_ref[mid][None, :]
                    mid += 1
                x = jnp.maximum(x, 0.0).astype(bf)
                acts.append(x)
            x7 = acts[7]
            y0 = dense(x7, Wr0_ref[...].astype(bf)) + br0_ref[...][None, :]
            y0b = y0.astype(bf)
            y1 = dense(y0b, Wr1x_ref[...].astype(bf)) + cbr1_ref[bidx][None, :]
            y1 = jnp.maximum(y1, 0.0).astype(bf)
        if dims.dens_vpu:
            dens_pre = (
                jnp.sum(
                    x7.astype(f32) * Wd_ref[...].astype(f32)[:, 0][None, :],
                    axis=1, keepdims=True,
                )
                + bd_ref[...][None, :]
            )
        else:
            dens_pre = dense(x7, Wd_ref[...].astype(bf)) + bd_ref[...][None, :]
        sigma = jnp.maximum(dens_pre, 0.0).reshape(TR, S)
        feat = dense(y1, Wr2_ref[...].astype(bf)) + br2_ref[...][None, :]  # [N,C] f32

        zdists = zdists_ref[0]
        zvals = zvals_ref[0]
        expterm = jnp.exp(-sigma * zdists)  # [TR, S]
        alpha = 1.0 - expterm
        logx = jnp.log(1.0 - alpha + _EPS)
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        ltri = (row < col).astype(f32)
        utri = (row > col).astype(f32)
        trans = jnp.exp(dense(logx, ltri))
        w = alpha * trans  # [TR, S]
        feat3 = feat.reshape(TR, S, C)

        # ---------- integration backward ----------
        gfeat = gfeat_ref[0]  # [TR, C]
        gbga = gbga_ref[0][:, 0]  # [TR]
        gdepth = gdepth_ref[0][:, 0]  # [TR]
        gw_in = gw_ref[0]  # [TR, S]

        dfeat3 = w[:, :, None] * gfeat[:, None, :]  # [TR, S, C]
        dw_t = (
            jnp.sum(feat3 * gfeat[:, None, :], axis=-1)
            + zvals * gdepth[:, None]
            - gbga[:, None]
            + gw_in
        )  # [TR, S]
        # suffix sum over t > s of (w * dw) via upper-triangular matmul
        suffix = dense(w * dw_t, utri)  # [TR, S]
        dalpha = dw_t * trans - suffix / (1.0 - alpha + _EPS)
        dsigma = dalpha * zdists * expterm
        ddists = dalpha * sigma * expterm
        dzv = w * gdepth[:, None]

        dzvals_ref[0] = dzv
        dzdists_ref[0] = ddists

        # ---------- head backward ----------
        # data-gradient matmuls in f32: A/B'd EQUAL to bf16 in the recompute
        # bwd (TR=8/32, round 2) AND in the stash bwd (99.7 vs 99.2, round 3)
        # — the kernel is not MXU-dtype-bound; keep the extra precision
        def dgrad(g, w):  # g @ w^T, f32 accumulate
            return dense_t(g.astype(f32), w.astype(f32))

        dpre_dens = jnp.where(dens_pre > 0.0, 1.0, 0.0) * dsigma.reshape(N, 1)
        dfeat = dfeat3.reshape(N, C)

        dy1 = dgrad(dfeat, Wr2_ref[...])  # [N, H2]
        dy1 = jnp.where(y1.astype(f32) > 0.0, dy1, 0.0)
        dy0 = dgrad(dy1, Wr1x_ref[...])  # [N, H]
        if dims.dens_vpu:
            # rank-1 dgrad as a VPU broadcast-multiply (1 useful MXU column)
            dx = (
                dpre_dens * Wd_ref[...].astype(f32)[:, 0][None, :]
                + dgrad(dy0, Wr0_ref[...])
            )
        else:
            dx = dgrad(dpre_dens, Wd_ref[...]) + dgrad(dy0, Wr0_ref[...])

        # head weight grads
        def acc(ref, val, first=is_first):
            @pl.when(first)
            def _():
                ref[...] = val

            @pl.when(jnp.logical_not(first))
            def _():
                ref[...] += val

        if dims.split_dw:
            # stash the head cotangents; their dW contractions run in the
            # XLA epilogue as one [C_in, N] x [N, C_out] matmul per weight
            dpre_refs[9][0] = dy0.astype(bf).reshape(TR, S, H)
            dpre_refs[10][0] = dy1.astype(bf).reshape(TR, S, H2)
            dpre_refs[11][0] = dfeat.astype(bf).reshape(TR, S, C)
            dpre_refs[8][0] = dpre_dens.reshape(TR, S)
        else:
            acc(dWr2_ref, outer(y1, dfeat.astype(bf)))
            acc(dWr1x_ref, outer(y0b, dy1.astype(bf)))
            acc(dWr0_ref, outer(x7, dy0.astype(bf)))
            if dims.dens_vpu:
                # [384,1] outer as a VPU multiply-reduce over the tile
                acc(
                    dWd_ref,
                    jnp.sum(x7.astype(f32) * dpre_dens, axis=0)[:, None],
                )
            else:
                acc(dWd_ref, outer(x7, dpre_dens.astype(bf)))
        acc(dbr2_ref, jnp.sum(dfeat, axis=0))
        acc(dbr0_ref, jnp.sum(dy0, axis=0))
        acc(dbd_ref, jnp.sum(dpre_dens, axis=0))
        # per-batch conditioning rows: reset at each batch's first tile
        acc(dcbr1_ref, jnp.sum(dy1, axis=0)[None, None, :], first=is_first_of_batch)

        # ---------- trunk backward (layers 7 -> 0) ----------
        dembed_acc = jnp.zeros((N, De), f32)
        mid = 5  # Wmid holds layers (1,2,3,4,6,7); walk backwards
        for i in range(7, 0, -1):
            dpre = jnp.where(acts[i].astype(f32) > 0.0, dx, 0.0)
            if dims.split_dw:
                dpre_refs[i][0] = dpre.astype(bf).reshape(TR, S, H)
            if i == 5:
                if not dims.split_dw:
                    acc(dW5e_ref, outer(embed, dpre.astype(bf)))
                    acc(dW5x_ref, outer(acts[4], dpre.astype(bf)))
                acc(dcb5_ref, jnp.sum(dpre, axis=0)[None, None, :], first=is_first_of_batch)
                dembed_acc = dembed_acc + dgrad(dpre, W5e_ref[...])
                dx = dgrad(dpre, W5x_ref[...])
            else:
                acc_slot = mid
                if not dims.split_dw:
                    acc(
                        dWmid_ref.at[acc_slot],
                        outer(acts[i - 1], dpre.astype(bf)),
                    )
                acc(dbmid_ref.at[acc_slot], jnp.sum(dpre, axis=0))
                dx = dgrad(dpre, Wmid_ref[acc_slot])
                mid -= 1
        dpre = jnp.where(acts[0].astype(f32) > 0.0, dx, 0.0)
        if dims.split_dw:
            dpre_refs[0][0] = dpre.astype(bf).reshape(TR, S, H)
        else:
            acc(dW0e_ref, outer(embed, dpre.astype(bf)))
        acc(dcb0_ref, jnp.sum(dpre, axis=0)[None, None, :], first=is_first_of_batch)
        dembed_acc = dembed_acc + dgrad(dpre, W0e_ref[...])

        if dims.embed_in_kernel:
            dembed_ref[0] = _embed_bwd_tile(pts, dembed_acc, dims).reshape(TR, S, 3)
        else:
            # cotangent dtype follows the primal embed (bf16 when the model
            # feeds the kernel bf16): halves the write + the whole XLA-side
            # dembed chain (face+eyes add, slice, dpts) downstream
            dembed_ref[0] = dembed_acc.reshape(TR, S, De).astype(dembed_ref.dtype)

    return kernel


def pallas_backward(
    params: Dict, embed, sc, ac, zvals, zdists, dims: FieldDims, g, stash=()
):
    """Run the backward kernel; returns cotangents for
    ``(params, embed, sc, ac, zvals, zdists)``.

    ``embed`` is the raw sample-point tensor [B,R,S,3] when
    ``dims.embed_in_kernel`` (its cotangent ``dpts`` comes straight out of
    the kernel); otherwise the precomputed [B,R,S,De] encoding."""
    B, R, S, Din = embed.shape
    De = dims.embed
    TR = dims.tile_rays
    H, C = dims.hidden, dims.feat
    H2 = H // 2
    p = _split_params(params, dims)
    f32 = jnp.float32
    bf = jnp.bfloat16

    gfeat, gbga, gdepth, gw = g
    gbga3 = gbga[..., None]
    gdepth3 = gdepth[..., None]

    cb0 = (sc @ p["W0c"] + p["b0"]).astype(f32)
    cb5 = (sc @ p["W5c"] + p["b5"]).astype(f32)
    cbr1 = (ac @ p["Wr1c"] + p["br1"]).astype(f32)

    weights = [
        p["W0e"].astype(bf), p["Wmid"].astype(bf), p["bmid"].astype(f32),
        p["W5e"].astype(bf), p["W5x"].astype(bf),
        p["Wd"].astype(bf), p["bd"].astype(f32),
        p["Wr0"].astype(bf), p["br0"].astype(f32),
        p["Wr1x"].astype(bf),
        p["Wr2"].astype(bf), p["br2"].astype(f32),
    ]

    grid = (B, R // TR)
    vm = pltpu.VMEM
    tile = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=vm)  # noqa: E731
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda b, r: (0,) * arr.ndim, memory_space=vm
    )

    def const_shape(shape):
        return pl.BlockSpec(shape, lambda b, r: (0,) * len(shape), memory_space=vm)

    if dims.split_dw:
        assert dims.stash_acts and stash, "split_dw requires stash_acts"
        assert not dims.embed_in_kernel, "split_dw x embed_in_kernel unsupported"
        assert dims.stash_every == 1, (
            "split_dw's XLA dW epilogue contracts over the FULL stash"
        )
        out_shapes = [
            jax.ShapeDtypeStruct((B, R, S, Din), embed.dtype),  # dembed
            jax.ShapeDtypeStruct((B, R, S), f32),  # dzvals
            jax.ShapeDtypeStruct((B, R, S), f32),  # dzdists
            jax.ShapeDtypeStruct((B, 1, H), f32),  # dcb0
            jax.ShapeDtypeStruct((B, 1, H), f32),  # dcb5
            jax.ShapeDtypeStruct((B, 1, H2), f32),  # dcbr1
            jax.ShapeDtypeStruct((6, H), f32),  # dbmid
            jax.ShapeDtypeStruct((1,), f32),  # dbd
            jax.ShapeDtypeStruct((H,), f32),  # dbr0
            jax.ShapeDtypeStruct((C,), f32),  # dbr2
        ] + [jax.ShapeDtypeStruct((B, R, S, H), bf) for _ in range(8)] + [
            jax.ShapeDtypeStruct((B, R, S), f32),  # ddens_pre
            jax.ShapeDtypeStruct((B, R, S, H), bf),  # dy0
            jax.ShapeDtypeStruct((B, R, S, H2), bf),  # dy1
            jax.ShapeDtypeStruct((B, R, S, C), bf),  # dfeat
        ]
        out_specs = [
            tile((1, TR, S, Din), lambda b, r: (b, r, 0, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            pl.BlockSpec((1, 1, H), lambda b, r: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, H), lambda b, r: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, H2), lambda b, r: (b, 0, 0), memory_space=vm),
            const_shape((6, H)),
            const_shape((1,)),
            const_shape((H,)),
            const_shape((C,)),
        ] + [tile((1, TR, S, H), lambda b, r: (b, r, 0, 0)) for _ in range(8)] + [
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            tile((1, TR, S, H), lambda b, r: (b, r, 0, 0)),
            tile((1, TR, S, H2), lambda b, r: (b, r, 0, 0)),
            tile((1, TR, S, C), lambda b, r: (b, r, 0, 0)),
        ]
    else:
        out_shapes = [
            jax.ShapeDtypeStruct(
                (B, R, S, Din), f32 if dims.embed_in_kernel else embed.dtype
            ),  # dembed (f32 dpts if fused)
            jax.ShapeDtypeStruct((B, R, S), f32),  # dzvals
            jax.ShapeDtypeStruct((B, R, S), f32),  # dzdists
            jax.ShapeDtypeStruct((B, 1, H), f32),  # dcb0
            jax.ShapeDtypeStruct((B, 1, H), f32),  # dcb5
            jax.ShapeDtypeStruct((B, 1, H2), f32),  # dcbr1
            jax.ShapeDtypeStruct((De, H), f32),  # dW0e
            jax.ShapeDtypeStruct((6, H, H), f32),  # dWmid
            jax.ShapeDtypeStruct((6, H), f32),  # dbmid
            jax.ShapeDtypeStruct((De, H), f32),  # dW5e
            jax.ShapeDtypeStruct((H, H), f32),  # dW5x
            jax.ShapeDtypeStruct((H, 1), f32),  # dWd
            jax.ShapeDtypeStruct((1,), f32),  # dbd
            jax.ShapeDtypeStruct((H, H), f32),  # dWr0
            jax.ShapeDtypeStruct((H,), f32),  # dbr0
            jax.ShapeDtypeStruct((H, H2), f32),  # dWr1x
            jax.ShapeDtypeStruct((H2, C), f32),  # dWr2
            jax.ShapeDtypeStruct((C,), f32),  # dbr2
        ]
        out_specs = [
            tile((1, TR, S, Din), lambda b, r: (b, r, 0, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            pl.BlockSpec((1, 1, H), lambda b, r: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, H), lambda b, r: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, H2), lambda b, r: (b, 0, 0), memory_space=vm),
            const_shape((De, H)),
            const_shape((6, H, H)),
            const_shape((6, H)),
            const_shape((De, H)),
            const_shape((H, H)),
            const_shape((H, 1)),
            const_shape((1,)),
            const_shape((H, H)),
            const_shape((H,)),
            const_shape((H, H2)),
            const_shape((H2, C)),
            const_shape((C,)),
        ]

    stash = tuple(stash) if dims.stash_acts else ()
    n_q = len(stash_quant_tags(dims))
    stash_tensors = stash[: len(stash) - 1] if n_q else stash  # scales last
    stash_specs = [
        tile((1, TR, S, a.shape[-1]), lambda b, r: (b, r, 0, 0))
        for a in stash_tensors
    ]
    if n_q:
        stash_specs.append(tile((1, TR, S, n_q), lambda b, r: (b, r, 0, 0)))

    outs = pl.pallas_call(
        _bwd_kernel(dims),
        grid=grid,
        in_specs=[
            tile((1, TR, S, Din), lambda b, r: (b, r, 0, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            const(cb0), const(cb5), const(cbr1),
        ]
        + [const(w) for w in weights]
        + [
            tile((1, TR, C), lambda b, r: (b, r, 0)),
            tile((1, TR, 1), lambda b, r: (b, r, 0)),
            tile((1, TR, 1), lambda b, r: (b, r, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
        ]
        + stash_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=dims.interpret,
        compiler_params=compiler_params(dims),
    )(
        embed if dims.embed_in_kernel else embed.astype(bf),
        zvals, zdists, cb0, cb5, cbr1, *weights,
        gfeat, gbga3, gdepth3, gw, *stash,
    )

    if dims.split_dw:
        (
            dembed, dzvals, dzdists, dcb0, dcb5, dcbr1,
            dbmid, dbd, dbr0, dbr2, *rest_outs
        ) = outs
        dpres = rest_outs[:8]
        ddens, dy0, dy1, dfeat = rest_outs[8:]

        # weight gradients as one [C_in, N] x [N, C_out] contraction each —
        # XLA tiles these giant-K matmuls at ~87% MFU vs ~60% for the
        # in-kernel accumulate pattern (PERF_NOTES round 3)
        def mmT(a, b):  # a^T @ b, f32 accumulate
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )

        a = [s.reshape(-1, s.shape[-1]) for s in stash]  # acts0..7, y0b, y1
        dp = [d.reshape(-1, H) for d in dpres]
        e2 = embed.reshape(-1, De).astype(bf)
        dW0e = mmT(e2, dp[0])
        dWmid = jnp.stack([mmT(a[i - 1], dp[i]) for i in (1, 2, 3, 4, 6, 7)])
        dW5e = mmT(e2, dp[5])
        dW5x = mmT(a[4], dp[5])
        dWd = mmT(a[7], ddens.reshape(-1, 1).astype(bf))
        dWr0 = mmT(a[7], dy0.reshape(-1, H))
        dWr1x = mmT(a[8], dy1.reshape(-1, H2))
        dWr2 = mmT(a[9], dfeat.reshape(-1, C))
    else:
        (
            dembed, dzvals, dzdists, dcb0, dcb5, dcbr1,
            dW0e, dWmid, dbmid, dW5e, dW5x, dWd, dbd,
            dWr0, dbr0, dWr1x, dWr2, dbr2,
        ) = outs

    dcb0 = dcb0[:, 0, :]
    dcb5 = dcb5[:, 0, :]
    dcbr1 = dcbr1[:, 0, :]

    # fold conditioning-row cotangents back into reference-layout params
    dW0c = sc.T @ dcb0
    dW5c = sc.T @ dcb5
    dWr1c = ac.T @ dcbr1
    dsc = dcb0 @ p["W0c"].T + dcb5 @ p["W5c"].T
    dac = dcbr1 @ p["Wr1c"].T

    dparams = {
        "fea_0/kernel": jnp.concatenate([dW0e, dW0c], axis=0),
        "fea_0/bias": jnp.sum(dcb0, axis=0),
        "fea_5/kernel": jnp.concatenate([dW5e, dW5c, dW5x], axis=0),
        "fea_5/bias": jnp.sum(dcb5, axis=0),
        "density/kernel": dWd,
        "density/bias": dbd,
        "rgb_0/kernel": dWr0,
        "rgb_0/bias": dbr0,
        "rgb_1/kernel": jnp.concatenate([dWr1x, dWr1c], axis=0),
        "rgb_1/bias": jnp.sum(dcbr1, axis=0),
        "rgb_2/kernel": dWr2,
        "rgb_2/bias": dbr2,
    }
    mids = (1, 2, 3, 4, 6, 7)
    for slot, i in enumerate(mids):
        dparams[f"fea_{i}/kernel"] = dWmid[slot]
        dparams[f"fea_{i}/bias"] = dbmid[slot]

    return dparams, dembed, dsc, dac, dzvals, dzdists
