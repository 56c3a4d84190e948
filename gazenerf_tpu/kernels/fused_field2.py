"""Dual-branch fused ray-march kernel: face + eye fields in ONE pallas_call.

The GazeNeRF forward evaluates TWO independent 8-layer field MLPs on the
same embedded sample points (reference models/gaze_nerf.py:87-99,223-230).
Running them as separate kernels leaves the MXU idle in every gap of the
serial matmul -> relu-mask -> matmul chain; fusing both branches into one
kernel gives the Mosaic scheduler two INDEPENDENT chains to interleave
(branch 1's layer i sits between branch 0's layers i and i+1 in program
order), filling those gaps.  Side wins: the embed/zvals tiles are read once
instead of twice, and in the backward the two branches' ``dembed`` /
``dzvals`` / ``dzdists`` cotangents are summed in VMEM — the XLA-side
[B,R,S,63] ``add`` + the second f32 dembed round-trip disappear.

Layout: per-branch weights are stacked on a leading axis ([2, De, H] etc.);
math is identical to :mod:`gazenerf_tpu.kernels.fused_field` (same
``_split_params`` scheme, bf16 matmuls with f32 accumulation,
cumsum-as-triangular-matmul integration, stash-acts backward).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gazenerf_tpu.kernels.fused_field import (
    _EPS,
    FieldDims,
    _split_params,
    compiler_params,
    xla_reference,
)

_NB = 2  # branches (face, eyes)


def _stack_operands(params_list, sc, ac, dims):
    """Per-branch params -> stacked kernel operands + conditioning rows."""
    f32, bf = jnp.float32, jnp.bfloat16
    ps = [_split_params(p, dims) for p in params_list]

    def stk(key, dt):
        return jnp.stack([p[key] for p in ps]).astype(dt)

    cb0 = jnp.stack([(sc @ p["W0c"] + p["b0"]).astype(f32) for p in ps])
    cb5 = jnp.stack([(sc @ p["W5c"] + p["b5"]).astype(f32) for p in ps])
    cbr1 = jnp.stack([(ac @ p["Wr1c"] + p["br1"]).astype(f32) for p in ps])
    weights = [
        stk("W0e", bf), stk("Wmid", bf), stk("bmid", f32),
        stk("W5e", bf), stk("W5x", bf),
        stk("Wd", bf), stk("bd", f32),
        stk("Wr0", bf), stk("br0", f32),
        stk("Wr1x", bf),
        stk("Wr2", bf), stk("br2", f32),
    ]
    return ps, cb0, cb5, cbr1, weights


def _fwd_kernel(dims: FieldDims):
    De, H, C, S, TR = dims.embed, dims.hidden, dims.feat, dims.samples, dims.tile_rays
    H2 = H // 2
    N = TR * S

    def kernel(
        embed_ref, zvals_ref, zdists_ref,
        cb0_ref, cb5_ref, cbr1_ref,
        W0e_ref, Wmid_ref, bmid_ref, W5e_ref, W5x_ref,
        Wd_ref, bd_ref, Wr0_ref, br0_ref, Wr1x_ref, Wr2_ref, br2_ref,
        *outs,  # per branch: feat, bga, depth, w  (+10 stash when enabled)
    ):
        f32, bf = jnp.float32, jnp.bfloat16
        bidx = pl.program_id(0)
        embed = embed_ref[0].reshape(N, De).astype(bf)
        per = len(outs) // _NB
        branch_outs = [outs[i * per:(i + 1) * per] for i in range(_NB)]

        def dense(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )

        # interleaved trunk: branch b's layer i sits between the other
        # branch's layers i and i+1 in program order
        xs = []
        for b in range(_NB):
            x = dense(embed, W0e_ref[b].astype(bf)) + cb0_ref[b, bidx][None, :]
            x = jnp.maximum(x, 0.0).astype(bf)
            if per > 4:
                branch_outs[b][4][0] = x.reshape(TR, S, H)
            xs.append(x)
        mid = 0
        for i in range(1, 8):
            ys = []
            for b in range(_NB):
                if i == 5:
                    y = (
                        dense(embed, W5e_ref[b].astype(bf))
                        + dense(xs[b], W5x_ref[b].astype(bf))
                        + cb5_ref[b, bidx][None, :]
                    )
                else:
                    y = dense(xs[b], Wmid_ref[b, mid].astype(bf)) + bmid_ref[b, mid][None, :]
                ys.append(y)
            if i != 5:
                mid += 1
            xs = []
            for b in range(_NB):
                x = jnp.maximum(ys[b], 0.0).astype(bf)
                if per > 4:
                    branch_outs[b][4 + i][0] = x.reshape(TR, S, H)
                xs.append(x)

        # heads + integration per branch (still interleaved per stage)
        dens, feats = [], []
        for b in range(_NB):
            dens.append(
                jnp.maximum(dense(xs[b], Wd_ref[b].astype(bf)) + bd_ref[b][None, :], 0.0)
            )
        y0bs, y1s = [], []
        for b in range(_NB):
            y = dense(xs[b], Wr0_ref[b].astype(bf)) + br0_ref[b][None, :]
            y0b = y.astype(bf)
            y = dense(y0b, Wr1x_ref[b].astype(bf)) + cbr1_ref[b, bidx][None, :]
            y1 = jnp.maximum(y, 0.0).astype(bf)
            if per > 4:
                branch_outs[b][12][0] = y0b.reshape(TR, S, H)
                branch_outs[b][13][0] = y1.reshape(TR, S, H2)
            y0bs.append(y0b)
            y1s.append(y1)
        for b in range(_NB):
            feats.append(dense(y1s[b], Wr2_ref[b].astype(bf)) + br2_ref[b][None, :])

        zdists = zdists_ref[0]
        zvals = zvals_ref[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        ltri = (row < col).astype(f32)
        for b in range(_NB):
            sigma = dens[b].reshape(TR, S)
            alpha = 1.0 - jnp.exp(-sigma * zdists)
            logx = jnp.log(1.0 - alpha + _EPS)
            trans = jnp.exp(dense(logx, ltri))
            w = alpha * trans
            feat3 = feats[b].reshape(TR, S, C)
            branch_outs[b][0][0] = jnp.sum(
                feat3 * w[:, :, None].astype(feat3.dtype), axis=1
            ).astype(branch_outs[b][0].dtype)
            branch_outs[b][1][0] = (1.0 - jnp.sum(w, axis=1))[:, None]
            branch_outs[b][2][0] = jnp.sum(w * zvals, axis=1)[:, None]
            branch_outs[b][3][0] = w

    return kernel


def _dual_forward(params_list, embed, sc, ac, zvals, zdists, dims: FieldDims):
    B, R, S, De = embed.shape
    TR = dims.tile_rays
    assert R % TR == 0, (R, TR)
    H, C = dims.hidden, dims.feat
    H2 = H // 2
    f32, bf = jnp.float32, jnp.bfloat16
    _, cb0, cb5, cbr1, weights = _stack_operands(params_list, sc, ac, dims)

    grid = (B, R // TR)
    vm = pltpu.VMEM
    tile = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=vm)  # noqa: E731
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda b, r: (0,) * arr.ndim, memory_space=vm
    )

    per_specs = [
        tile((1, TR, C), lambda b, r: (b, r, 0)),
        tile((1, TR, 1), lambda b, r: (b, r, 0)),
        tile((1, TR, 1), lambda b, r: (b, r, 0)),
        tile((1, TR, S), lambda b, r: (b, r, 0)),
    ]
    per_shapes = [
        jax.ShapeDtypeStruct((B, R, C), f32),
        jax.ShapeDtypeStruct((B, R, 1), f32),
        jax.ShapeDtypeStruct((B, R, 1), f32),
        jax.ShapeDtypeStruct((B, R, S), f32),
    ]
    if dims.stash_acts:
        for w_ in [H] * 9 + [H2]:
            per_specs.append(tile((1, TR, S, w_), lambda b, r: (b, r, 0, 0)))
            per_shapes.append(jax.ShapeDtypeStruct((B, R, S, w_), bf))

    out = pl.pallas_call(
        _fwd_kernel(dims),
        grid=grid,
        in_specs=[
            tile((1, TR, S, De), lambda b, r: (b, r, 0, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            const(cb0), const(cb5), const(cbr1),
        ]
        + [const(w) for w in weights],
        out_specs=per_specs * _NB,
        out_shape=per_shapes * _NB,
        interpret=dims.interpret,
        compiler_params=compiler_params(dims),
    )(embed.astype(bf), zvals, zdists, cb0, cb5, cbr1, *weights)

    per = len(out) // _NB
    branch = [out[i * per:(i + 1) * per] for i in range(_NB)]
    outs = tuple(
        (bo[0], bo[1][..., 0], bo[2][..., 0], bo[3]) for bo in branch
    )
    stash = tuple(tuple(bo[4:]) for bo in branch)
    return outs, stash


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_dual_render(params_face, params_eye, embed, sc, ac, zvals, zdists,
                      dims: FieldDims):
    """Both field branches + integration in one kernel.

    Returns ``((feat, bga, depth, w) for face, (…) for eyes)``.
    """
    # primal path: skip the activation stash (backward-only; see fused_field)
    outs, _ = _dual_forward(
        [params_face, params_eye], embed, sc, ac, zvals, zdists,
        dims._replace(stash_acts=False),
    )
    return outs


def _fwd(params_face, params_eye, embed, sc, ac, zvals, zdists, dims):
    outs, stash = _dual_forward(
        [params_face, params_eye], embed, sc, ac, zvals, zdists, dims
    )
    return outs, (params_face, params_eye, embed, sc, ac, zvals, zdists, stash)


def _bwd(dims, res, g):
    params_face, params_eye, embed, sc, ac, zvals, zdists, stash = res
    if dims.use_pallas_bwd and dims.stash_acts:
        from gazenerf_tpu.kernels.fused_field2_bwd import dual_backward

        bdims = dims._replace(tile_rays=dims.bwd_tile_rays)
        return dual_backward(
            [params_face, params_eye], embed, sc, ac, zvals, zdists,
            bdims, g, stash
        )

    # fallback: differentiate the XLA twin per branch
    def ref2(pf, pe, embed, sc, ac, zvals, zdists):
        return (
            xla_reference(pf, embed, sc, ac, zvals, zdists, dims),
            xla_reference(pe, embed, sc, ac, zvals, zdists, dims),
        )

    _, vjp = jax.vjp(ref2, params_face, params_eye, embed, sc, ac, zvals, zdists)
    return vjp(g)


fused_dual_render.defvjp(_fwd, _bwd)
