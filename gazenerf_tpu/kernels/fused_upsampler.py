"""Fused pixel-shuffle upsampler block — Pallas forward + backward.

One VMEM pass per (batch, row-tile) computes the renderer's whole
PixelShuffleUpsample block with the folded feat_layer (reference workload:
models/pixel_shuffle_upsample.py:19-42 + models/neural_renderer.py:110;
our XLA formulation is models/neural_renderer.py PixelShuffleUpsample with
``fold``):

    h1  = lrelu(x @ W1 + b1)                       # [*, 2F]
    z   = lrelu(h1 @ W2g + b2g) + x @ P            # [*, 4F]  gm phases
    z3  = per_phase(z) @ W3 + b3                   # [*, 4F3] folded mixer
    out = 9-tap binomial phase stencil(z3)         # 4 phases [H, W, F3]

The interleave to [B, 2H, 2W, F3] stays in XLA (layout-only).  The
intermediates h1/z/z3 never exist in HBM; the backward recomputes them per
tile and accumulates all weight gradients in VMEM across grid steps
(constant output index maps — the fused_field_bwd pattern).

The transposed stencil in the backward mirrors kernels/shuffle_blur.py:
zero-padded space-to-depth cotangent phases + edge folds; here it feeds
straight into the conv backward instead of being written out.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F = np.array([1.0, 2.0, 1.0]) / 4.0
_KB = np.outer(_F, _F)  # 3x3 binomial / 16


def _pick_tile(H: int, target: int) -> int:
    t = target
    while H % t:
        t //= 2
    return max(t, 1)


def residual_matrix(F: int) -> np.ndarray:
    """gm channel-tile residual as a 0/1 matmul: y_gm[k*F + c] = x[(4c+k) % F]
    (matches models/neural_renderer.py PixelShuffleUpsample)."""
    P = np.zeros((F, 4 * F), np.float32)
    for k in range(4):
        for c in range(F):
            P[(4 * c + k) % F, k * F + c] = 1.0
    return P


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(tH: int, W: int, F: int, F3: int, use_bf16: bool = True):
    def kernel(
        xm_ref, xp_ref, xn_ref,
        W1_ref, b1_ref, W2_ref, b2_ref, P_ref, W3_ref, b3_ref,
        o0_ref, o1_ref, o2_ref, o3_ref,
    ):
        f32 = jnp.float32
        bf = jnp.bfloat16 if use_bf16 else jnp.float32

        def dense(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )

        # halo-extended rows: the stencil reads z3 at h-1 and h+1
        x = jnp.concatenate([xp_ref[0], xm_ref[0], xn_ref[0]], axis=0)
        R = tH + 2
        xf = x.reshape(R * W, F).astype(bf)

        h1 = dense(xf, W1_ref[...].astype(bf)) + b1_ref[...][None, :]
        h1 = jnp.where(h1 > 0, h1, 0.2 * h1).astype(bf)
        z = dense(h1, W2_ref[...].astype(bf)) + b2_ref[...][None, :]
        z = jnp.where(z > 0, z, 0.2 * z)
        z = z + dense(xf, P_ref[...].astype(bf))

        # folded feat_layer per phase -> [R*W, 4*F3]
        w3 = W3_ref[...].astype(bf)
        b3 = b3_ref[...][None, :]
        z3 = jnp.concatenate(
            [
                dense(z[:, k * F : (k + 1) * F].astype(bf), w3) + b3
                for k in range(4)
            ],
            axis=-1,
        ).reshape(R, W, 4 * F3)

        # edge-replicate columns (reflect at phase granularity)
        z3 = jnp.concatenate([z3[:, :1], z3, z3[:, -1:]], axis=1)

        def src(k, dh, dw):
            return jax.lax.slice(
                z3,
                (1 + dh, 1 + dw, k * F3),
                (1 + dh + tH, 1 + dw + W, (k + 1) * F3),
            )

        out_refs = [o0_ref, o1_ref, o2_ref, o3_ref]
        for i in range(2):
            for j in range(2):
                acc = None
                for a in range(3):
                    for b in range(3):
                        m, n = i + a - 1, j + b - 1
                        k = (m % 2) * 2 + (n % 2)
                        t = _KB[a, b] * src(k, m // 2, n // 2)
                        acc = t if acc is None else acc + t
                ref = out_refs[i * 2 + j]
                ref[0] = acc.astype(ref.dtype)

    return kernel


def _fwd_pallas(x, W1, b1, W2, b2, P, W3, b3, interpret, use_bf16=True):
    B, H, W, F = x.shape
    F3 = W3.shape[1]
    tH = _pick_tile(H, target=min(8, max(1, 1024 // W)))
    grid = (B, H // tH)
    vm = pltpu.VMEM
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda b, i: (0,) * arr.ndim, memory_space=vm
    )
    phase_spec = pl.BlockSpec(
        (1, tH, W, F3), lambda b, i: (b, i, 0, 0), memory_space=vm
    )
    phases = pl.pallas_call(
        _fwd_kernel(tH, W, F, F3, use_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tH, W, F), lambda b, i: (b, i, 0, 0), memory_space=vm),
            pl.BlockSpec(
                (1, 1, W, F),
                lambda b, i: (b, jnp.maximum(i * tH - 1, 0), 0, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1, 1, W, F),
                lambda b, i: (b, jnp.minimum(i * tH + tH, H - 1), 0, 0),
                memory_space=vm,
            ),
            const(W1), const(b1), const(W2), const(b2), const(P),
            const(W3), const(b3),
        ],
        out_specs=[phase_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, F3), x.dtype)] * 4,
        interpret=interpret,
    )(x, x, x, W1, b1, W2, b2, P, W3, b3)
    return phases


def _depth_to_space4(phases) -> jnp.ndarray:
    """4 x [B,H,W,C] (phase (i,j) = phases[2i+j]) -> [B,2H,2W,C]."""
    p0, p1, p2, p3 = phases
    B, H, W, C = p0.shape
    row0 = jnp.stack([p0, p1], axis=3).reshape(B, H, 2 * W, C)
    row1 = jnp.stack([p2, p3], axis=3).reshape(B, H, 2 * W, C)
    return jnp.stack([row0, row1], axis=2).reshape(B, 2 * H, 2 * W, C)


def _space_to_depth_gm(y: jnp.ndarray) -> jnp.ndarray:
    B, H2, W2, C = y.shape
    y = y.reshape(B, H2 // 2, 2, W2 // 2, 2, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H2 // 2, W2 // 2, 4 * C)


# ---------------------------------------------------------------------------
# backward


def _bwd_kernel(tU: int, H: int, W: int, F: int, F3: int, use_bf16: bool = True):
    n_tiles = H // tU

    def kernel(
        xm_ref, d_main_ref, d_tail_ref,
        W1_ref, b1_ref, W2_ref, b2_ref, P_ref, W3_ref, b3_ref,
        dx_ref, dW1_ref, db1_ref, dW2_ref, db2_ref, dW3_ref, db3_ref,
    ):
        f32 = jnp.float32
        bf = jnp.bfloat16 if use_bf16 else jnp.float32
        bidx = pl.program_id(0)
        i = pl.program_id(1)
        is_first = (bidx == 0) & (i == 0)

        def dense(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )

        def dense_t(g, w):
            return jax.lax.dot_general(
                g, w, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

        def outer(x, g):
            return jax.lax.dot_general(
                x, g, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )

        # ---- transposed stencil: dz3 phases for OWN rows (mirrors
        # kernels/shuffle_blur._bwd_kernel: zero-padded space-to-depth
        # cotangent + edge folds) ----
        D = jnp.concatenate([d_main_ref[0], d_tail_ref[0]], axis=0)

        def dz3_rows(ki, kj, lo, rows):
            acc = None
            for d in (-1, 0, 1):
                for e in (-1, 0, 1):
                    pi, pj = (ki + d) % 2, (kj + e) % 2
                    ro = (ki + d) // 2
                    co = (kj + e) // 2
                    k = pi * 2 + pj
                    wgt = _KB[1 + d, 1 + e]
                    t = wgt * jax.lax.slice(
                        D,
                        (lo + 1 + ro, 1 + co, k * F3),
                        (lo + 1 + ro + rows, 1 + co + W + 2, (k + 1) * F3),
                    )
                    acc = t if acc is None else acc + t
            return acc  # [rows, W+2, F3]

        def foldc(r):
            mid = r[:, 1 : W + 1]
            return jnp.concatenate(
                [
                    mid[:, :1] + r[:, :1],
                    mid[:, 1 : W - 1],
                    mid[:, W - 1 :] + r[:, W + 1 :],
                ],
                axis=1,
            )

        def add_row0(d_, row):
            return jnp.concatenate([d_[:1] + row, d_[1:]], axis=0)

        def add_rowlast(d_, row):
            return jnp.concatenate([d_[:-1], d_[-1:] + row], axis=0)

        dz3_phases = []
        for ki in range(2):
            for kj in range(2):
                dz3 = foldc(dz3_rows(ki, kj, 1, tU))
                if n_tiles == 1:
                    top = foldc(dz3_rows(ki, kj, 0, 1))
                    bot = foldc(dz3_rows(ki, kj, tU + 1, 1))
                    dz3 = add_rowlast(add_row0(dz3, top), bot)
                else:
                    first_rows = foldc(dz3_rows(ki, kj, 0, 1))
                    last_rows = foldc(dz3_rows(ki, kj, tU + 1, 1))
                    dz3 = jnp.where(
                        i == 0, add_row0(dz3, first_rows), dz3
                    )
                    dz3 = jnp.where(
                        i == n_tiles - 1, add_rowlast(dz3, last_rows), dz3
                    )
                dz3_phases.append(dz3)  # [tU, W, F3]

        N = tU * W
        # ---- recompute forward for OWN rows ----
        xf = xm_ref[0].reshape(N, F).astype(bf)
        h1p = dense(xf, W1_ref[...].astype(bf)) + b1_ref[...][None, :]
        h1 = jnp.where(h1p > 0, h1p, 0.2 * h1p).astype(bf)
        zp = dense(h1, W2_ref[...].astype(bf)) + b2_ref[...][None, :]
        z = jnp.where(zp > 0, zp, 0.2 * zp) + dense(xf, P_ref[...].astype(bf))

        # ---- conv backward ----
        w3t = W3_ref[...].astype(f32)
        dz_parts = []
        dW3_acc = None
        db3_acc = None
        for k in range(4):
            dz3k = dz3_phases[k].reshape(N, F3)
            zk = z[:, k * F : (k + 1) * F].astype(bf)
            dzk = dense_t(dz3k, w3t)  # [N, F]
            dz_parts.append(dzk)
            w3g = outer(zk, dz3k.astype(bf))
            b3g = jnp.sum(dz3k, axis=0)
            dW3_acc = w3g if dW3_acc is None else dW3_acc + w3g
            db3_acc = b3g if db3_acc is None else db3_acc + b3g
        dz = jnp.concatenate(dz_parts, axis=-1)  # [N, 4F]

        dzp = jnp.where(zp > 0, dz, 0.2 * dz)  # lrelu'(zp) * dz
        dh1 = dense_t(dzp.astype(bf), W2_ref[...].astype(bf))
        dx_res = dense_t(dz.astype(bf), P_ref[...].astype(bf))
        dh1p = jnp.where(h1p > 0, dh1, 0.2 * dh1)
        dx = dense_t(dh1p.astype(bf), W1_ref[...].astype(bf)) + dx_res

        dx_ref[0] = dx.reshape(tU, W, F).astype(dx_ref.dtype)

        def acc(ref, val):
            @pl.when(is_first)
            def _():
                ref[...] = val

            @pl.when(jnp.logical_not(is_first))
            def _():
                ref[...] += val

        acc(dW3_ref, dW3_acc)
        acc(db3_ref, db3_acc)
        acc(dW2_ref, outer(h1, dzp.astype(bf)))
        acc(db2_ref, jnp.sum(dzp, axis=0))
        acc(dW1_ref, outer(xf, dh1p.astype(bf)))
        acc(db1_ref, jnp.sum(dh1p, axis=0))

    return kernel


def _bwd_pallas(x, W1, b1, W2, b2, P, W3, b3, dy, interpret, use_bf16=True):
    B, H, W, F = x.shape
    F3 = W3.shape[1]
    F2 = W1.shape[1]
    # zero-pad by 4 then phase-decompose (shuffle_blur._stencil_bwd layout)
    dyp = jnp.pad(dy, ((0, 0), (4, 4), (4, 4), (0, 0)))
    D4 = _space_to_depth_gm(dyp)  # [B, H+4, W+4, 4*F3]
    tU = _pick_tile(H, target=4)
    assert tU % 4 == 0 or H // tU == 1, (H, tU)
    grid = (B, H // tU)
    vm = pltpu.VMEM
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda b, i: (0,) * arr.ndim, memory_space=vm
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, H, W, F), jnp.float32),
        jax.ShapeDtypeStruct(W1.shape, jnp.float32),
        jax.ShapeDtypeStruct(b1.shape, jnp.float32),
        jax.ShapeDtypeStruct(W2.shape, jnp.float32),
        jax.ShapeDtypeStruct(b2.shape, jnp.float32),
        jax.ShapeDtypeStruct(W3.shape, jnp.float32),
        jax.ShapeDtypeStruct(b3.shape, jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, tU, W, F), lambda b, i: (b, i, 0, 0), memory_space=vm),
        const(W1), const(b1), const(W2), const(b2), const(W3), const(b3),
    ]
    outs = pl.pallas_call(
        _bwd_kernel(tU, H, W, F, F3, use_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tU, W, F), lambda b, i: (b, i, 0, 0), memory_space=vm),
            pl.BlockSpec(
                (1, tU, W + 4, 4 * F3), lambda b, i: (b, i, 0, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1, 4, W + 4, 4 * F3),
                lambda b, i: (b, (i + 1) * (tU // 4) if tU >= 4 else 1, 0, 0),
                memory_space=vm,
            ),
            const(W1), const(b1), const(W2), const(b2), const(P),
            const(W3), const(b3),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, D4, D4, W1, b1, W2, b2, P, W3, b3)
    return outs


# ---------------------------------------------------------------------------
# public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_upsample_block(x, W1, b1, W2, b2, P, W3, b3, interpret=False,
                         use_bf16=True):
    """lrelu-conv x2 + gm residual + folded feat_layer + blur-shuffle,
    one fused kernel.  Returns [B, 2H, 2W, F3]; apply the renderer's
    lrelu outside.  ``W2`` must already be gm-column-permuted and ``P`` the
    :func:`residual_matrix`."""
    phases = _fwd_pallas(x, W1, b1, W2, b2, P, W3, b3, interpret, use_bf16)
    return _depth_to_space4(phases)


def _vjp_fwd(x, W1, b1, W2, b2, P, W3, b3, interpret, use_bf16):
    out = fused_upsample_block(
        x, W1, b1, W2, b2, P, W3, b3, interpret, use_bf16
    )
    return out, (x, W1, b1, W2, b2, P, W3, b3)


def _vjp_bwd(interpret, use_bf16, res, dy):
    x, W1, b1, W2, b2, P, W3, b3 = res
    dx, dW1, db1, dW2, db2, dW3, db3 = _bwd_pallas(
        x, W1, b1, W2, b2, P, W3, b3, dy, interpret, use_bf16,
    )
    return (
        dx.astype(x.dtype), dW1, db1, dW2, db2,
        jnp.zeros_like(P), dW3, db3,
    )


fused_upsample_block.defvjp(_vjp_fwd, _vjp_bwd)


def xla_reference(x, W1, b1, W2, b2, P, W3, b3):
    """Unfused XLA twin for exactness tests (mirrors
    models/neural_renderer.py PixelShuffleUpsample with fold)."""
    from gazenerf_tpu.ops.image import pixel_shuffle2_blur_gm

    F = x.shape[-1]
    F3 = W3.shape[1]
    h1 = x @ W1 + b1
    h1 = jnp.where(h1 > 0, h1, 0.2 * h1)
    z = h1 @ W2 + b2
    z = jnp.where(z > 0, z, 0.2 * z) + x @ P
    z3 = jnp.concatenate(
        [z[..., k * F : (k + 1) * F] @ W3 + b3 for k in range(4)], axis=-1
    )
    return pixel_shuffle2_blur_gm(z3)
