"""Fused ray-march field kernel (Pallas TPU).

This is the framework's native-kernel replacement for the reference's
"implicit native component" — PyTorch's CUDA kernels under the 8-layer field
MLP + volume integration (reference models/mlp_nerf.py:95-119 +
utils/model_utils.py:493-534; plan: SURVEY.md §7 step 4).

One ``pallas_call`` evaluates, per (batch, ray-tile) grid step, entirely in
VMEM:

    positional-embedding tile -> 8x Dense(+skip) -> density & 258-ch feature
    heads -> alpha compositing -> per-ray integrated feature / bg-alpha /
    depth / sample weights

so the huge per-sample tensors (``[B,R,S,384]`` activations, ``[B,R,S,258]``
features — ~10 GB/step at full size) never touch HBM.  MXU notes:

* every Dense is a ``[TR*S, Cin] x [Cin, Cout]`` matmul with
  ``preferred_element_type=f32`` accumulation (bf16 weights/activations);
* the exclusive cumulative product of transmittance is computed in log space
  as a matmul with a strictly-lower-triangular ones matrix — cumsum-as-matmul
  rides the MXU instead of serializing a scan;
* the conditioning-code contribution is folded in as per-batch bias rows
  (computed once in the XLA prologue), matching
  :mod:`gazenerf_tpu.models.mlp_nerf`'s split-conditioning scheme.

The op is wrapped in ``jax.custom_vjp``: forward runs the Pallas kernel; the
backward currently rematerializes through the XLA reference implementation
(bit-compatible math below) — a Pallas backward with in-VMEM dW accumulation
is the next step (PERF_NOTES.md).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10


class FieldDims(NamedTuple):
    embed: int  # positional embedding width (63)
    hidden: int  # MLP width (384)
    feat: int  # output feature channels (258)
    samples: int  # samples per ray (64)
    tile_rays: int  # rays per grid step (forward)
    interpret: bool = False
    bwd_tile_rays: int = 8  # backward ray-tile (16 + stash_acts is the
    # measured sweet spot on v5e; see PERF_NOTES round 3)
    use_pallas_bwd: bool = True
    vmem_limit_mb: int = 0  # raise Mosaic's scoped-VMEM cap (default ~16MB;
    # v5e physically has 128MB — larger tiles need a larger cap)
    stash_acts: bool = False  # forward kernel writes its trunk/head
    # activations (bf16) to HBM; the backward reads them instead of
    # recomputing the forward in-tile — trades ~3.8 GB/branch of (pipelined)
    # HBM traffic for 1/3 of the backward's MXU FLOPs
    dens_vpu: bool = False  # compute the 1-wide density head on the VPU
    # (broadcast-multiply + lane reduction) instead of MXU matmuls: the
    # [N,384]x[384,1] forward, its rank-1 [N,1]x[1,384] dgrad and the [384,1]
    # dWd outer are the kernel's worst-shaped MXU ops (1 useful column of
    # 128) — per-matmul sequencing overhead dominates their flops
    split_dw: bool = False  # backward kernel computes ONLY the data-gradient
    # chain (writing the masked per-layer cotangents ``dpre`` to HBM, bf16);
    # the weight gradients become one giant [C_in, N] x [N, C_out] XLA matmul
    # per layer over the stashed activations in the epilogue.  Rationale: the
    # in-kernel dW accumulation runs ~35 small (<=0.3 GFLOP) matmuls per grid
    # step against resident accumulators — Mosaic sequencing overhead puts
    # the fused bwd at ~60% MFU while XLA runs the same contraction shapes at
    # ~87% (PERF_NOTES round 3).  Requires stash_acts.
    stash_every: int = 1  # two-level stash/recompute ladder for the backward
    # (deep marches): 1 = stash all 10 activation tensors; k>1 = stash only
    # trunk layers i with i % k == k-1 (k=2 -> x1,x3,x5,x7) and recompute the
    # rest (and the head intermediates) in-tile from the nearest stashed
    # predecessor.  Interpolates between the full-stash regime (wins at S=64:
    # HBM traffic cheap, MXU flops saved) and the full-recompute regime (wins
    # at S=256: the S-scaled stash traffic is the bottleneck) — PERF_NOTES
    # round 4 crossover, round 5 A/B.
    embed_in_kernel: bool = False  # take raw sample points [B,R,S,3] and
    # compute the positional encoding in VMEM (and its cotangent dpts in the
    # backward) — the [B,R,S,63] embed/dembed tensors never touch HBM and
    # the XLA-side sin/cos + concat + layout-copy chain disappears
    n_freqs: int = 10  # octaves for the in-kernel encoding (embed = 3+6*F)
    stash_dtype: str = "bfloat16"  # "int8": store the stash tensors that are
    # consumed ONLY by ReLU masks and dW outer products (x0..x6, y0b) as
    # per-(ray,sample)-row symmetrically quantized int8 — halves their HBM write+read
    # traffic, the exact term that makes the stash backward lose at deep
    # marches (S-scaled, PERF_NOTES round 4/5).  x7 and y1 stay bf16: the
    # backward recomputes the density/feature heads from them, so their
    # error would propagate nonlinearly through the integration backward.
    # Opt-in (gradients deviate by ~the quantization step instead of being
    # bitwise-equal to the recompute path); requires stash_every == 1.


def _split_params(params: Dict, dims: FieldDims):
    """Split the NeRFFieldMLP param dict into kernel operands.

    Layout must match gazenerf_tpu.models.mlp_nerf (reference-compatible):
    ``fea_0`` rows [0:embed] act on the embedding, [embed:] on the shape code;
    ``fea_5`` rows [0:embed] embed, [embed:embed+cond] code, rest hidden;
    ``rgb_1`` rows [0:hidden] activations, [hidden:] appearance code.
    """
    De, H = dims.embed, dims.hidden
    g = lambda n: params[f"{n}/kernel"]  # noqa: E731
    b = lambda n: params[f"{n}/bias"]  # noqa: E731
    w0 = g("fea_0")
    w5 = g("fea_5")
    wr1 = g("rgb_1")
    return {
        "W0e": w0[:De],
        "W0c": w0[De:],
        "b0": b("fea_0"),
        "Wmid": jnp.stack([g(f"fea_{i}") for i in (1, 2, 3, 4, 6, 7)]),
        "bmid": jnp.stack([b(f"fea_{i}") for i in (1, 2, 3, 4, 6, 7)]),
        "W5e": w5[:De],
        "W5c": w5[De : w5.shape[0] - H],
        "W5x": w5[w5.shape[0] - H :],
        "b5": b("fea_5"),
        "Wd": g("density"),
        "bd": b("density"),
        "Wr0": g("rgb_0"),
        "br0": b("rgb_0"),
        "Wr1x": wr1[:H],
        "Wr1c": wr1[H:],
        "br1": b("rgb_1"),
        "Wr2": g("rgb_2"),
        "br2": b("rgb_2"),
    }


def stash_layout(dims: FieldDims):
    """Which activation tensors the forward writes to HBM for the backward.

    Returns ``[(tag, width), ...]`` in kernel-output order; tags are
    ``x0..x7`` (trunk), ``y0b``/``y1`` (head intermediates).
    """
    if not dims.stash_acts:
        return []
    H, H2 = dims.hidden, dims.hidden // 2
    k = max(1, dims.stash_every)
    if k == 1:
        return [(f"x{i}", H) for i in range(8)] + [("y0b", H), ("y1", H2)]
    return [(f"x{i}", H) for i in range(8) if i % k == k - 1]


# stash tensors the backward feeds into recomputed head matmuls whose outputs
# enter the integration backward (sigma via x7, feat via y1): these stay bf16
# under stash_dtype="int8" so quantization error cannot propagate through the
# nonlinear alpha/transmittance chain
_EXACT_STASH_TAGS = frozenset({"x7", "y1"})


def stash_quant_tags(dims: FieldDims):
    """Ordered tags stored as per-row-scaled int8 under stash_dtype='int8'."""
    if not dims.stash_acts or dims.stash_dtype != "int8":
        return []
    assert dims.stash_every == 1, "int8 stash requires stash_every == 1"
    assert not dims.split_dw, "split_dw's XLA dW epilogue reads a bf16 stash"
    return [t for t, _ in stash_layout(dims) if t not in _EXACT_STASH_TAGS]


def _embed_consts(dims: FieldDims):
    """Static helpers for the in-kernel positional encoding.

    Column c of the [N,De] encoding is ``g(f_c * pts[:, d_c])`` where g is
    identity / sin / cos.  ``P [3,De]`` scatters each point dim into its
    columns pre-scaled by the frequency (ONE tiny MXU matmul instead of 21
    lane-padded [N,3] ops + a lane concat — that formulation measured ~2x
    slower end-to-end); the masks select g per column at full lane width.
    Channel order matches gazenerf_tpu.ops.embedding.positional_encoding
    (reference utils/model_utils.py:255-270).
    """
    De = dims.embed
    f32 = jnp.float32
    # built from iota (pallas kernels cannot capture array constants);
    # everything here is shape-static and constant-folded by the compiler
    row = jax.lax.broadcasted_iota(jnp.int32, (3, De), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (3, De), 1)
    dim = jnp.where(col < 3, col, (col - 3) % 3)
    f = jnp.where(col < 3, 0, (col - 3) // 6).astype(f32)
    P = jnp.where(row == dim, jnp.exp2(f), 0.0).astype(f32)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, De), 1)
    m_id = (c < 3).astype(f32)
    m_sin = ((c >= 3) & (((c - 3) % 6) < 3)).astype(f32)
    return P, m_id, m_sin


def _embed_tile(pts, dims: FieldDims):
    """In-VMEM positional encoding of a [N,3] point tile -> [N,De] f32."""
    P, m_id, m_sin = _embed_consts(dims)
    m_cos = 1.0 - m_id - m_sin
    xb = jax.lax.dot_general(
        pts, P, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return m_id * xb + m_sin * jnp.sin(xb) + m_cos * jnp.cos(xb)


def _embed_bwd_tile(pts, dembed, dims: FieldDims):
    """Cotangent of :func:`_embed_tile`: [N,De] f32 -> dpts [N,3] f32."""
    P, m_id, m_sin = _embed_consts(dims)
    m_cos = 1.0 - m_id - m_sin
    xb = jax.lax.dot_general(
        pts, P, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dxb = dembed * (m_id + m_sin * jnp.cos(xb) - m_cos * jnp.sin(xb))
    return jax.lax.dot_general(
        dxb, P, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _field_kernel(dims: FieldDims):
    De, H, C, S, TR = dims.embed, dims.hidden, dims.feat, dims.samples, dims.tile_rays
    H2 = H // 2
    N = TR * S
    stash_slot = {tag: i for i, (tag, _) in enumerate(stash_layout(dims))}
    q_tags = stash_quant_tags(dims)
    q_slot = {tag: i for i, tag in enumerate(q_tags)}

    def kernel(
        embed_ref, zvals_ref, zdists_ref,
        cb0_ref, cb5_ref, cbr1_ref,
        W0e_ref, Wmid_ref, bmid_ref, W5e_ref, W5x_ref,
        Wd_ref, bd_ref, Wr0_ref, br0_ref, Wr1x_ref, Wr2_ref, br2_ref,
        feat_out_ref, bga_out_ref, depth_out_ref, w_out_ref,
        *stash_refs,  # when dims.stash_acts: acts0..7, y0b, y1 [+ scales]
    ):
        f32 = jnp.float32
        bf = jnp.bfloat16
        scale_cols = [None] * len(q_tags)  # per-ray scales, written at the end

        bidx = pl.program_id(0)
        if dims.embed_in_kernel:
            pts = embed_ref[0].reshape(N, 3)
            embed = _embed_tile(pts, dims).astype(bf)
        else:
            embed = embed_ref[0].reshape(N, De).astype(bf)

        def dense(x, w, prefer=f32):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=prefer
            )

        def stash(tag, val, width):
            if tag not in stash_slot:
                return
            if tag in q_slot:
                # per-sample-row symmetric int8: s = amax/127 over each
                # (ray, sample) row's `width` lanes — finer than a per-ray
                # scale AND the only granularity whose ops all stay in the
                # big tensor's native [N, width] 2-D shape (cross-shape
                # casts like (TR,S)->(N,1) are unsupported shape casts in
                # Mosaic; 3-D arithmetic crashes its layout pass).
                vf = val.astype(f32)  # [N, width]
                a = jnp.max(jnp.abs(vf), axis=1, keepdims=True)  # [N, 1]
                s = jnp.maximum(a, 1e-12) / 127.0
                q = jnp.clip(jnp.round(vf * (1.0 / s)), -127.0, 127.0)
                stash_refs[stash_slot[tag]][0] = q.astype(jnp.int8).reshape(
                    TR, S, width
                )
                scale_cols[q_slot[tag]] = s
            else:
                stash_refs[stash_slot[tag]][0] = val.reshape(TR, S, width)

        x = dense(embed, W0e_ref[...].astype(bf)) + cb0_ref[bidx][None, :]
        x = jnp.maximum(x, 0.0).astype(bf)
        stash("x0", x, H)
        mid = 0
        for i in range(1, 8):
            if i == 5:
                y = (
                    dense(embed, W5e_ref[...].astype(bf))
                    + dense(x, W5x_ref[...].astype(bf))
                    + cb5_ref[bidx][None, :]
                )
            else:
                y = dense(x, Wmid_ref[mid].astype(bf)) + bmid_ref[mid][None, :]
                mid += 1
            x = jnp.maximum(y, 0.0).astype(bf)
            stash(f"x{i}", x, H)

        if dims.dens_vpu:
            dens_pre = (
                jnp.sum(
                    x.astype(f32) * Wd_ref[...].astype(f32)[:, 0][None, :],
                    axis=1, keepdims=True,
                )
                + bd_ref[...][None, :]
            )
            density = jnp.maximum(dens_pre, 0.0)
        else:
            density = jnp.maximum(
                dense(x, Wd_ref[...].astype(bf)) + bd_ref[...][None, :], 0.0
            )
        y = dense(x, Wr0_ref[...].astype(bf)) + br0_ref[...][None, :]
        y0b = y.astype(bf)
        y = dense(y0b, Wr1x_ref[...].astype(bf)) + cbr1_ref[bidx][None, :]
        y = jnp.maximum(y, 0.0).astype(bf)
        stash("y0b", y0b, H)
        stash("y1", y, H2)
        feat = dense(y, Wr2_ref[...].astype(bf)) + br2_ref[...][None, :]

        # ---- volume integration in VMEM ----
        sigma = density.reshape(TR, S)
        zdists = zdists_ref[0]
        zvals = zvals_ref[0]
        alpha = 1.0 - jnp.exp(-sigma * zdists)  # [TR, S]
        logx = jnp.log(1.0 - alpha + _EPS)
        # exclusive cumsum along samples as a strictly-lower-triangular matmul
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        ltri = (row < col).astype(f32)  # M[j, s] = 1 iff j < s
        trans = jnp.exp(
            jax.lax.dot_general(
                logx, ltri, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )
        )
        w = alpha * trans  # [TR, S]

        feat3 = feat.reshape(TR, S, C)
        feat_int = jnp.sum(feat3 * w[:, :, None].astype(feat3.dtype), axis=1)
        depth = jnp.sum(w * zvals, axis=1)
        acc = jnp.sum(w, axis=1)

        feat_out_ref[0] = feat_int.astype(feat_out_ref.dtype)
        bga_out_ref[0] = (1.0 - acc)[:, None].astype(bga_out_ref.dtype)
        depth_out_ref[0] = depth[:, None].astype(depth_out_ref.dtype)
        w_out_ref[0] = w.astype(w_out_ref.dtype)
        if q_tags:
            stash_refs[-1][0] = jnp.concatenate(scale_cols, axis=1).reshape(
                TR, S, len(q_tags)
            )

    return kernel


def compiler_params(dims: FieldDims):
    """Mosaic compiler params for a kernel at these dims (None = defaults)."""
    if not dims.vmem_limit_mb or dims.interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=dims.vmem_limit_mb * 1024 * 1024)


def _pallas_forward(params, embed, sc, ac, zvals, zdists, dims: FieldDims):
    # ``embed`` is the raw sample points [B,R,S,3] when dims.embed_in_kernel
    # (encoded in VMEM, f32 in); otherwise the precomputed [B,R,S,De] encoding
    B, R, S, Din = embed.shape
    De = dims.embed
    TR = dims.tile_rays
    assert R % TR == 0, (R, TR)
    H, C = dims.hidden, dims.feat
    H2 = H // 2
    p = _split_params(params, dims)

    f32 = jnp.float32
    bf = jnp.bfloat16
    # conditioning prologue: per-batch bias rows (XLA, tiny)
    cb0 = (sc @ p["W0c"] + p["b0"]).astype(f32)  # [B, H]
    cb5 = (sc @ p["W5c"] + p["b5"]).astype(f32)
    cbr1 = (ac @ p["Wr1c"] + p["br1"]).astype(f32)

    grid = (B, R // TR)
    vm = pltpu.VMEM
    tile = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=vm)  # noqa: E731
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda b, r: (0,) * arr.ndim, memory_space=vm
    )

    weights = [
        p["W0e"].astype(bf), p["Wmid"].astype(bf), p["bmid"].astype(f32),
        p["W5e"].astype(bf), p["W5x"].astype(bf),
        p["Wd"].astype(bf), p["bd"].astype(f32),
        p["Wr0"].astype(bf), p["br0"].astype(f32),
        p["Wr1x"].astype(bf),
        p["Wr2"].astype(bf), p["br2"].astype(f32),
    ]

    out_specs = [
        tile((1, TR, C), lambda b, r: (b, r, 0)),
        tile((1, TR, 1), lambda b, r: (b, r, 0)),
        tile((1, TR, 1), lambda b, r: (b, r, 0)),
        tile((1, TR, S), lambda b, r: (b, r, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, R, C), f32),
        jax.ShapeDtypeStruct((B, R, 1), f32),
        jax.ShapeDtypeStruct((B, R, 1), f32),
        jax.ShapeDtypeStruct((B, R, S), f32),
    ]
    if dims.stash_acts:
        # stash_every=1: trunk acts x0..x7 + head intermediates (y0b, y1),
        # bf16 in HBM.  (A "heads diet" that recomputed y0b/y1 from x7 in
        # the backward — 2 matmuls for ~1.2 GB/branch of traffic — measured
        # 10 ms WORSE at S=64: per-matmul Mosaic overhead in this kernel is
        # ~5 us, so adding matmuls to save pipelined HBM reads is backwards
        # there.  PERF_NOTES r3.)  stash_every=k>1: only every k-th trunk
        # layer, for deep marches where the S-scaled stash traffic is the
        # bottleneck (PERF_NOTES r5).
        q_tags = set(stash_quant_tags(dims))
        for tag, w_ in stash_layout(dims):
            out_specs.append(tile((1, TR, S, w_), lambda b, r: (b, r, 0, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (B, R, S, w_), jnp.int8 if tag in q_tags else bf
                )
            )
        if q_tags:
            # per-(ray,sample) quantization scales, one f32 lane per tag
            n_q = len(q_tags)
            out_specs.append(
                tile((1, TR, S, n_q), lambda b, r: (b, r, 0, 0))
            )
            out_shape.append(jax.ShapeDtypeStruct((B, R, S, n_q), f32))

    x_in = embed if dims.embed_in_kernel else embed.astype(bf)
    out = pl.pallas_call(
        _field_kernel(dims),
        grid=grid,
        in_specs=[
            tile((1, TR, S, Din), lambda b, r: (b, r, 0, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            tile((1, TR, S), lambda b, r: (b, r, 0)),
            const(cb0),
            const(cb5),
            const(cbr1),
        ]
        + [const(w) for w in weights],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=dims.interpret,
        compiler_params=compiler_params(dims),
    )(x_in, zvals, zdists, cb0, cb5, cbr1, *weights)
    feat_int, bga, depth, w = out[:4]
    stash = tuple(out[4:])
    return (feat_int, bga[..., 0], depth[..., 0], w), stash


def xla_reference(params, embed, sc, ac, zvals, zdists, dims: FieldDims):
    """Pure-XLA twin of the kernel (same math; used for VJP + tests)."""
    if dims.embed_in_kernel:
        from gazenerf_tpu.ops.embedding import positional_encoding

        embed = positional_encoding(embed, dims.n_freqs, include_input=True)
    p = _split_params(params, dims)
    bf = jnp.bfloat16
    f32 = jnp.float32
    B = embed.shape[0]
    bshape = (B, 1, 1)

    cb0 = (sc @ p["W0c"] + p["b0"]).astype(bf)
    cb5 = (sc @ p["W5c"] + p["b5"]).astype(bf)
    cbr1 = (ac @ p["Wr1c"] + p["br1"]).astype(bf)

    e = embed.astype(bf)
    x = jax.nn.relu(e @ p["W0e"].astype(bf) + cb0.reshape(bshape + (-1,)))
    mid = 0
    for i in range(1, 8):
        if i == 5:
            x = e @ p["W5e"].astype(bf) + x @ p["W5x"].astype(bf) + cb5.reshape(
                bshape + (-1,)
            )
        else:
            x = x @ p["Wmid"][mid].astype(bf) + p["bmid"][mid].astype(bf)
            mid += 1
        x = jax.nn.relu(x)
    density = jax.nn.relu(
        (x @ p["Wd"].astype(bf)).astype(f32) + p["bd"]
    )[..., 0]
    y = x @ p["Wr0"].astype(bf) + p["br0"].astype(bf)
    y = jax.nn.relu(y @ p["Wr1x"].astype(bf) + cbr1.reshape(bshape + (-1,)))
    feat = (y @ p["Wr2"].astype(bf)).astype(f32) + p["br2"]

    alpha = 1.0 - jnp.exp(-density * zdists)
    x_ = 1.0 - alpha + _EPS
    trans = jnp.concatenate(
        [jnp.ones_like(x_[..., :1]), jnp.cumprod(x_, axis=-1)[..., :-1]], axis=-1
    )
    w = alpha * trans
    feat_int = jnp.einsum("brs,brsc->brc", w, feat)
    depth = jnp.sum(w * zvals, axis=-1)
    return feat_int, 1.0 - jnp.sum(w, axis=-1), depth, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_field_render(params, embed, sc, ac, zvals, zdists, dims: FieldDims):
    """Fused field evaluation + integration.

    Returns ``(feat_int [B,R,C], bg_alpha [B,R], depth [B,R], weights [B,R,S])``.
    """
    # primal path (no grad in flight): never write the activation stash —
    # it exists only for the backward (inference would pay ~3.8 GB/branch
    # of HBM writes for nothing)
    out, _ = _pallas_forward(
        params, embed, sc, ac, zvals, zdists, dims._replace(stash_acts=False)
    )
    return out


def _fwd(params, embed, sc, ac, zvals, zdists, dims):
    out, stash = _pallas_forward(params, embed, sc, ac, zvals, zdists, dims)
    return out, (params, embed, sc, ac, zvals, zdists, stash)


def _bwd(dims, res, g):
    params, embed, sc, ac, zvals, zdists, stash = res
    if dims.use_pallas_bwd:
        from gazenerf_tpu.kernels.fused_field_bwd import pallas_backward

        bdims = dims._replace(tile_rays=dims.bwd_tile_rays)
        dparams, dembed, dsc, dac, dzvals, dzdists = pallas_backward(
            params, embed, sc, ac, zvals, zdists, bdims, g, stash=stash
        )
        return dparams, dembed, dsc, dac, dzvals, dzdists
    _, vjp = jax.vjp(
        lambda *a: xla_reference(*a, dims), params, embed, sc, ac, zvals, zdists
    )
    return vjp(g)


fused_field_render.defvjp(_fwd, _bwd)


def default_dims(cfg, interpret: bool = False) -> FieldDims:
    """Pick a ray-tile size that divides R and keeps VMEM happy."""
    R = cfg.num_rays
    tr = 32
    while R % tr:
        tr //= 2
    return FieldDims(
        embed=cfg.vp_embed_dims,
        hidden=cfg.mlp_hidden,
        feat=cfg.featmap_nc,
        samples=cfg.num_sample_coarse,
        tile_rays=tr,
        interpret=interpret,
    )
