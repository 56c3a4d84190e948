"""Fused blur∘pixel-shuffle Pallas kernel (the renderer's hot op).

``blur3x3(pixel_shuffle2(x))`` is linear, and the XLA phase-arithmetic
formulation (ops/image.pixel_shuffle2_blur) lowers to ~36 un-fused shifted
FMAs per level — measured ~29 ms of the 138 ms train step (PERF_NOTES).
This kernel computes the whole 9-tap phase stencil in one VMEM pass per
ray-row tile; the only XLA-side work left is the layout-only
depth-to-space (forward) / space-to-depth (backward) and a zero-pad.

Structure (both directions are the SAME stencil shape — the op is linear
and the binomial kernel is symmetric):

* forward: 4 output phases, each ``sum_{a,b} kb[a,b] * g[phase(a,b)]``
  over base offsets in {-1,0,1}, EDGE halo (one clamped neighbour row per
  side via extra BlockSpecs; edge columns handled in-kernel).  Equals
  ``blur3x3(pixel_shuffle2(.))`` with its reflect boundary exactly — at
  phase granularity 2 the reflect index and the edge-clone coincide
  (see ops/image._phase_shuffle_blur).
* backward (custom VJP): the transposed stencil on the space-to-depth
  phase decomposition of the zero-padded cotangent, followed by folding
  the out-of-image rows/cols back onto the edges (the transpose of edge
  replication).

Channel order is GROUP-MAJOR (phase k = channels [k*C, (k+1)*C)); the
producing conv emits this order via a static weight-column permutation
(models/neural_renderer.py shuffle_mode='pallas'), so no channel gather
exists anywhere on this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F = np.array([1.0, 2.0, 1.0]) / 4.0
_KB = np.outer(_F, _F)  # 3x3 binomial / 16


def _pick_tile(H: int, target: int = 8) -> int:
    t = target
    while H % t:
        t //= 2
    return max(t, 1)


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(tH: int, W: int, C: int):
    # 4 separate phase outputs: a lane-dim concat of C-slices at unaligned
    # offsets (C=258) has no Mosaic lowering ("offset mismatch on
    # non-concat dimension") — XLA assembles the phases instead
    def kernel(main_ref, prev_ref, next_ref, o0_ref, o1_ref, o2_ref, o3_ref):
        xm = main_ref[0]  # [tH, W, 4C]
        xp = prev_ref[0]  # [1, W, 4C]
        xn = next_ref[0]
        x = jnp.concatenate([xp, xm, xn], axis=0)  # [tH+2, W, 4C]
        # edge columns (reflect at phase granularity == edge clone)
        x = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)

        def src(k, dh, dw):
            return jax.lax.slice(
                x, (1 + dh, 1 + dw, k * C), (1 + dh + tH, 1 + dw + W, (k + 1) * C)
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


def _stencil_fwd(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[B, H, W, 4C] gm -> [B, H, W, 4C] output phases (gm)."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    # keep tH*W bounded so the 36 slice temporaries fit scoped VMEM at
    # every pyramid level even when co-resident with the rest of the model
    # (isolated compiles pass one size up; full-model leaves less headroom)
    tH = _pick_tile(H, target=min(8, max(1, 512 // W)))
    grid = (B, H // tH)
    vm = pltpu.VMEM
    phase_spec = pl.BlockSpec(
        (1, tH, W, C), lambda b, i: (b, i, 0, 0), memory_space=vm
    )
    phases = pl.pallas_call(
        _fwd_kernel(tH, W, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tH, W, C4), lambda b, i: (b, i, 0, 0), memory_space=vm),
            pl.BlockSpec(
                (1, 1, W, C4),
                lambda b, i: (b, jnp.maximum(i * tH - 1, 0), 0, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1, 1, W, C4),
                lambda b, i: (b, jnp.minimum(i * tH + tH, H - 1), 0, 0),
                memory_space=vm,
            ),
        ],
        out_specs=[phase_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, C), x.dtype)] * 4,
        interpret=interpret,
    )(x, x, x)
    return jnp.concatenate(phases, axis=-1)


def _depth_to_space_gm(p: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 4C] gm phases -> [B, 2H, 2W, C] (layout-only)."""
    B, H, W, C4 = p.shape
    C = C4 // 4
    p = p.reshape(B, H, W, 2, 2, C)
    p = p.transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(B, 2 * H, 2 * W, C)


def _space_to_depth_gm(y: jnp.ndarray) -> jnp.ndarray:
    """[B, 2H, 2W, C] -> [B, H, W, 4C] gm phases (layout-only)."""
    B, H2, W2, C = y.shape
    y = y.reshape(B, H2 // 2, 2, W2 // 2, 2, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H2 // 2, W2 // 2, 4 * C)


# ---------------------------------------------------------------------------
# backward (transposed stencil + edge fold)


def _bwd_kernel(tU: int, H: int, W: int, C: int):
    n_tiles = H // tU

    def kernel(main_ref, tail_ref, o0_ref, o1_ref, o2_ref, o3_ref):
        i = pl.program_id(1)
        # local D4 rows [u0, u0 + tU + 4)
        D = jnp.concatenate([main_ref[0], tail_ref[0]], axis=0)

        def dxp_rows(ki, kj, lo, rows):
            """dxp phase (ki,kj) for u' in [u0+lo, u0+lo+rows): reads local
            D4 rows u' - u0 + 1 + roff, cols v' + 1 + coff (v' in [0, W+2))."""
            acc = None
            for d in (-1, 0, 1):
                for e in (-1, 0, 1):
                    pi, pj = (ki + d) % 2, (kj + e) % 2
                    ro = (ki + d) // 2  # floor
                    co = (kj + e) // 2
                    k = pi * 2 + pj
                    w = _KB[1 + d, 1 + e]
                    t = w * jax.lax.slice(
                        D,
                        (lo + 1 + ro, 1 + co, k * C),
                        (lo + 1 + ro + rows, 1 + co + W + 2, (k + 1) * C),
                    )
                    acc = t if acc is None else acc + t
            return acc  # [rows, W+2, C]

        def foldc(r):
            # column fold (transpose of edge-replicated columns);
            # concat-built — scatter-add has no Mosaic lowering
            mid = r[:, 1 : W + 1]
            return jnp.concatenate(
                [
                    mid[:, :1] + r[:, :1],
                    mid[:, 1 : W - 1],
                    mid[:, W - 1 :] + r[:, W + 1 :],
                ],
                axis=1,
            )

        def add_row0(d, row):
            return jnp.concatenate([d[:1] + row, d[1:]], axis=0)

        def add_rowlast(d, row):
            return jnp.concatenate([d[:-1], d[-1:] + row], axis=0)

        out_refs = [o0_ref, o1_ref, o2_ref, o3_ref]
        for ki in range(2):
            for kj in range(2):
                ref = out_refs[ki * 2 + kj]
                dx = foldc(dxp_rows(ki, kj, 1, tU))  # dxp rows [u0+1, u0+tU]

                if n_tiles == 1:
                    top = foldc(dxp_rows(ki, kj, 0, 1))  # dxp row 0
                    bot = foldc(dxp_rows(ki, kj, tU + 1, 1))  # dxp row H+1
                    ref[0] = add_rowlast(add_row0(dx, top), bot).astype(ref.dtype)
                else:

                    @pl.when(i == 0)
                    def _(dx=dx, ref=ref, ki=ki, kj=kj):
                        top = foldc(dxp_rows(ki, kj, 0, 1))
                        ref[0] = add_row0(dx, top).astype(ref.dtype)

                    @pl.when(i == n_tiles - 1)
                    def _(dx=dx, ref=ref, ki=ki, kj=kj):
                        bot = foldc(dxp_rows(ki, kj, tU + 1, 1))
                        ref[0] = add_rowlast(dx, bot).astype(ref.dtype)

                    @pl.when((i != 0) & (i != n_tiles - 1))
                    def _(dx=dx, ref=ref):
                        ref[0] = dx.astype(ref.dtype)

    return kernel


def _stencil_bwd(dy: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[B, 2H, 2W, C] cotangent -> [B, H, W, 4C] gm input cotangent."""
    B, H2, W2, C = dy.shape
    H, W = H2 // 2, W2 // 2
    # zero-pad by 4 then phase-decompose: D4[s, t, (pi,pj)] = dyp[2s+pi, 2t+pj]
    dyp = jnp.pad(dy, ((0, 0), (4, 4), (4, 4), (0, 0)))
    D4 = _space_to_depth_gm(dyp)  # [B, H+4, W+4, 4C]
    # smaller tiles than forward: the transposed stencil's live set is
    # bigger (full-width D4 halo + per-phase fold copies)
    tU = _pick_tile(H, target=4)
    grid = (B, H // tU)
    vm = pltpu.VMEM
    C4 = 4 * C
    # tail block: D4 rows [u0+tU, u0+tU+4) — exact 4-row blocks need
    # (i+1)*tU % 4 == 0; tU from _pick_tile is a power of two >= 4 for any
    # real featmap (H >= 4), asserted here
    assert tU % 4 == 0, (H, tU)
    phase_spec = pl.BlockSpec(
        (1, tU, W, C), lambda b, i: (b, i, 0, 0), memory_space=vm
    )
    phases = pl.pallas_call(
        _bwd_kernel(tU, H, W, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tU, W + 4, C4), lambda b, i: (b, i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec(
                (1, 4, W + 4, C4),
                lambda b, i: (b, (i + 1) * (tU // 4), 0, 0),
                memory_space=vm,
            ),
        ],
        out_specs=[phase_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, C), dy.dtype)] * 4,
        interpret=interpret,
    )(D4, D4)
    return jnp.concatenate(phases, axis=-1)


# ---------------------------------------------------------------------------
# public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pallas_shuffle_blur_gm(x: jnp.ndarray, interpret: bool = False):
    """``blur3x3(pixel_shuffle2(x_torch_order))`` for GROUP-MAJOR ``x``.

    ``x``: [B, H, W, 4C], channel ``k*C + c`` = shuffle phase k of output
    channel c.  Returns [B, 2H, 2W, C].  Exact (incl. reflect boundary)
    match of ops.image.pixel_shuffle2_blur_gm.
    """
    return _depth_to_space_gm(_stencil_fwd(x, interpret))


def _fwd(x, interpret):
    return pallas_shuffle_blur_gm(x, interpret), None


def _bwd(interpret, _, g):
    return (_stencil_bwd(g, interpret),)


pallas_shuffle_blur_gm.defvjp(_fwd, _bwd)
