"""Fused Pallas field-kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gazenerf_tpu.kernels.fused_field import (
    FieldDims,
    fused_field_render,
    xla_reference,
)
from gazenerf_tpu.models.mlp_nerf import NeRFFieldMLP


def make_inputs(rng, B=1, R=64, S=8, De=63, H=64, C=258):
    mlp = NeRFFieldMLP(embed_dims=De, cond_dims=181, vd_cond_dims=127,
                       hidden=H, res_nfeat=C)
    embed = rng.standard_normal((B, R, S, De)).astype(np.float32) * 0.5
    sc = rng.standard_normal((B, 181)).astype(np.float32) * 0.1
    ac = rng.standard_normal((B, 127)).astype(np.float32) * 0.1
    zvals = np.sort(rng.standard_normal((B, R, S)).astype(np.float32), -1)
    zdists = np.abs(rng.standard_normal((B, R, S)).astype(np.float32)) * 0.2
    params = mlp.init(
        jax.random.PRNGKey(0), jnp.asarray(embed), jnp.asarray(sc), jnp.asarray(ac)
    )["params"]
    dims = FieldDims(embed=De, hidden=H, feat=C, samples=S, tile_rays=16,
                     interpret=True)
    args = tuple(jnp.asarray(x) for x in (embed, sc, ac, zvals, zdists))
    return mlp, params, args, dims


def test_kernel_matches_xla_reference(rng):
    mlp, params, args, dims = make_inputs(rng)
    out_k = fused_field_render(params, *args, dims)
    out_r = xla_reference(params, *args, dims)
    names = ["feat_int", "bg_alpha", "depth", "weights"]
    for n, a, b in zip(names, out_k, out_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-2, err_msg=n
        )


def test_xla_reference_matches_module(rng):
    """The kernel's XLA twin reproduces NeRFFieldMLP + integrate_rays."""
    from gazenerf_tpu.ops.integrate import integrate_rays

    mlp, params, args, dims = make_inputs(rng)
    embed, sc, ac, zvals, zdists = args
    feat, density = mlp.apply({"params": params}, embed, sc, ac)
    ref = integrate_rays(feat.astype(jnp.float32), density[..., 0], zdists, zvals)

    out = xla_reference(params, embed, sc, ac, zvals, zdists, dims)
    # xla_reference computes in bf16 like the kernel; module ran f32
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref.features), atol=0.1, rtol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(ref.bg_alpha), atol=2e-2
    )


def test_gradients_flow(rng):
    mlp, params, args, dims = make_inputs(rng)

    def loss2(params, embed, sc):
        feat_int, bga, depth, w = fused_field_render(
            params, embed, sc, args[2], args[3], args[4], dims
        )
        return (
            jnp.sum(feat_int**2) + jnp.sum(bga**2) + jnp.sum(depth**2)
        )

    g = jax.grad(loss2, argnums=(0, 1, 2))(params, args[0], args[1])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(jnp.abs(g[1]).max()) > 0  # embed grads nonzero
    assert float(jnp.abs(g[2]).max()) > 0  # shape-code grads nonzero


def test_pallas_backward_matches_f32_truth(rng):
    """The Pallas backward is as close to f32-truth as (or closer than) the
    bf16 XLA autodiff (both ~1% rel L2 from bf16 quantization)."""
    from gazenerf_tpu.ops.integrate import integrate_rays

    mlp, params, args, dims = make_inputs(rng, B=2, R=32, S=8)
    dims = dims._replace(bwd_tile_rays=16, use_pallas_bwd=True)
    embed, sc, ac, zvals, zdists = args

    def loss_kernel(params, embed, sc, ac):
        f, bga, dep, w = fused_field_render(params, embed, sc, ac, zvals, zdists, dims)
        return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

    def loss_truth(params, embed, sc, ac):
        feat, dens = mlp.apply({"params": params}, embed, sc, ac)
        o = integrate_rays(feat, dens[..., 0], zdists, zvals)
        return (
            jnp.sum(o.features**2) + jnp.sum(o.bg_alpha**2)
            + jnp.sum(o.depth**2) + jnp.sum(o.weights**2)
        )

    def loss_xla(params, embed, sc, ac):
        f, bga, dep, w = xla_reference(params, embed, sc, ac, zvals, zdists, dims)
        return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(params, embed, sc, ac)
    gt = jax.grad(loss_truth, argnums=(0, 1, 2, 3))(params, embed, sc, ac)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(params, embed, sc, ac)

    def rel_l2(a, b):
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        num = sum(float(jnp.sum((x - y) ** 2)) for x, y in zip(la, lb))
        den = sum(float(jnp.sum(y**2)) for y in lb)
        return (num / max(den, 1e-12)) ** 0.5

    # both bf16 paths deviate from f32 truth by bf16 quantization noise; the
    # kernel must be within 2x of the bf16 XLA autodiff's own deviation
    for i, name in enumerate(["params", "embed", "sc", "ac"]):
        k_err = rel_l2(gk[i], gt[i])
        x_err = rel_l2(gx[i], gt[i])
        assert k_err < max(2.0 * x_err, 0.03), (name, k_err, x_err)


def test_stash_acts_backward_matches_recompute(rng):
    """stash_acts=True reads forward activations from HBM instead of
    recomputing them in-tile; since the stash holds the exact bf16 values the
    recompute reproduces, the gradients must agree to float tolerance."""
    mlp, params, args, dims = make_inputs(rng, B=2, R=32, S=8)
    embed, sc, ac, zvals, zdists = args
    dims = dims._replace(bwd_tile_rays=16, use_pallas_bwd=True)

    def make_loss(d):
        def loss(params, embed, sc, ac):
            f, bga, dep, w = fused_field_render(params, embed, sc, ac, zvals, zdists, d)
            return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

        return loss

    g_re = jax.grad(make_loss(dims), argnums=(0, 1, 2, 3))(params, embed, sc, ac)
    g_st = jax.grad(make_loss(dims._replace(stash_acts=True)), argnums=(0, 1, 2, 3))(
        params, embed, sc, ac
    )
    for a, b in zip(jax.tree_util.tree_leaves(g_re), jax.tree_util.tree_leaves(g_st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_partial_stash_backward_matches_recompute(rng):
    """stash_every=k stashes only every k-th trunk layer and rebuilds the
    rest in-tile from the nearest stashed predecessor; the recompute follows
    the exact bf16 forward recipe, so gradients must match the full-recompute
    backward to float tolerance (deep-march ladder, PERF_NOTES r5)."""
    mlp, params, args, dims = make_inputs(rng, B=2, R=32, S=8)
    embed, sc, ac, zvals, zdists = args
    dims = dims._replace(bwd_tile_rays=16, use_pallas_bwd=True)

    def make_loss(d):
        def loss(params, embed, sc, ac):
            f, bga, dep, w = fused_field_render(params, embed, sc, ac, zvals, zdists, d)
            return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

        return loss

    g_re = jax.grad(make_loss(dims), argnums=(0, 1, 2, 3))(params, embed, sc, ac)
    for k in (2, 4):
        from gazenerf_tpu.kernels.fused_field import stash_layout

        d_k = dims._replace(stash_acts=True, stash_every=k)
        tags = [t for t, _ in stash_layout(d_k)]
        assert tags == [f"x{i}" for i in range(k - 1, 8, k)]
        g_k = jax.grad(make_loss(d_k), argnums=(0, 1, 2, 3))(
            params, embed, sc, ac
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_re), jax.tree_util.tree_leaves(g_k)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )


def test_int8_stash_backward_close_to_recompute(rng):
    """stash_dtype="int8" quantizes the mask/dW-only stash tensors (x0..x6,
    y0b) per sample row; x7/y1 stay bf16 so the recomputed density/feature heads —
    and through them the integration backward — are exact.  Gradients must
    track the recompute backward to ~the bf16-noise scale (the same order as
    the bf16 paths' own deviation from f32 truth), and the forward primal is
    untouched (the stash only exists for the backward)."""
    mlp, params, args, dims = make_inputs(rng, B=2, R=32, S=8)
    embed, sc, ac, zvals, zdists = args
    dims = dims._replace(bwd_tile_rays=16, use_pallas_bwd=True, stash_acts=True)
    d_q = dims._replace(stash_dtype="int8")

    from gazenerf_tpu.kernels.fused_field import stash_quant_tags

    assert stash_quant_tags(dims) == []
    assert stash_quant_tags(d_q) == [f"x{i}" for i in range(7)] + ["y0b"]

    def make_loss(d):
        def loss(params, embed, sc, ac):
            f, bga, dep, w = fused_field_render(params, embed, sc, ac, zvals, zdists, d)
            return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

        return loss

    # primal unchanged (value_and_grad's forward writes the stash; the value
    # itself never depends on it)
    v_re, g_re = jax.value_and_grad(make_loss(dims), argnums=(0, 1, 2, 3))(
        params, embed, sc, ac
    )
    v_q, g_q = jax.value_and_grad(make_loss(d_q), argnums=(0, 1, 2, 3))(
        params, embed, sc, ac
    )
    np.testing.assert_allclose(np.asarray(v_re), np.asarray(v_q), rtol=1e-6)

    la = jax.tree_util.tree_leaves(g_re)
    lb = jax.tree_util.tree_leaves(g_q)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(la, lb))
    den = sum(float(jnp.sum(a**2)) for a in la)
    rel = (num / max(den, 1e-12)) ** 0.5
    assert rel < 0.03, rel  # ~1% measured; bf16-vs-f32 is the same order


def test_split_dw_backward_matches_fused(rng):
    """split_dw=True (dX chain in-kernel, dW as XLA epilogue matmuls over the
    stashed activations) == the fully-fused stash backward.  Both contract the
    same bf16 operands with f32 accumulation; only the reduction order differs
    (per-tile accumulate vs one giant-K matmul)."""
    mlp, params, args, dims = make_inputs(rng, B=2, R=32, S=8)
    embed, sc, ac, zvals, zdists = args
    dims = dims._replace(bwd_tile_rays=16, use_pallas_bwd=True, stash_acts=True)

    def make_loss(d):
        def loss(params, embed, sc, ac):
            f, bga, dep, w = fused_field_render(params, embed, sc, ac, zvals, zdists, d)
            return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

        return loss

    g_f = jax.grad(make_loss(dims), argnums=(0, 1, 2, 3))(params, embed, sc, ac)
    g_s = jax.grad(make_loss(dims._replace(split_dw=True)), argnums=(0, 1, 2, 3))(
        params, embed, sc, ac
    )
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_s)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-3)


def test_dens_vpu_matches_mxu(rng):
    """dens_vpu=True (1-wide density head as VPU broadcast/reduce) == the
    MXU-matmul formulation for outputs AND gradients (slightly higher
    precision: f32 products vs bf16 matmul, hence the loose-ish atol)."""
    mlp, params, args, dims = make_inputs(rng, B=2, R=32, S=8)
    embed, sc, ac, zvals, zdists = args
    dims = dims._replace(bwd_tile_rays=16, use_pallas_bwd=True, stash_acts=True)

    out_m = fused_field_render(params, *args, dims)
    out_v = fused_field_render(params, *args, dims._replace(dens_vpu=True))
    for a, b in zip(out_m, out_v):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    def make_loss(d):
        def loss(params, embed, sc, ac):
            f, bga, dep, w = fused_field_render(params, embed, sc, ac, zvals, zdists, d)
            return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

        return loss

    g_m = jax.grad(make_loss(dims), argnums=(0, 1, 2, 3))(params, embed, sc, ac)
    g_v = jax.grad(make_loss(dims._replace(dens_vpu=True)), argnums=(0, 1, 2, 3))(
        params, embed, sc, ac
    )
    for a, b in zip(jax.tree_util.tree_leaves(g_m), jax.tree_util.tree_leaves(g_v)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-3)


def test_embed_in_kernel_matches_precomputed(rng):
    """embed_in_kernel=True (raw pts in, dpts out) == precomputed-embed path
    for both outputs and gradients (incl. the pts cotangent vs XLA autodiff
    through positional_encoding)."""
    from gazenerf_tpu.ops.embedding import positional_encoding

    n_freqs = 10
    De = 3 + 6 * n_freqs
    mlp, params, args, dims = make_inputs(rng, B=2, R=32, S=8, De=De)
    _, sc, ac, zvals, zdists = args
    dims = dims._replace(bwd_tile_rays=16, n_freqs=n_freqs)
    pts = jnp.asarray(rng.standard_normal((2, 32, 8, 3)).astype(np.float32))

    def loss_pre(params, pts, sc, ac):
        emb = positional_encoding(pts, n_freqs, include_input=True)
        f, bga, dep, w = fused_field_render(params, emb, sc, ac, zvals, zdists, dims)
        return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

    dimsk = dims._replace(embed_in_kernel=True)

    def loss_fused(params, pts, sc, ac):
        f, bga, dep, w = fused_field_render(params, pts, sc, ac, zvals, zdists, dimsk)
        return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

    l_pre, g_pre = jax.value_and_grad(loss_pre, argnums=(0, 1, 2, 3))(params, pts, sc, ac)
    l_fu, g_fu = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(params, pts, sc, ac)
    np.testing.assert_allclose(float(l_pre), float(l_fu), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_pre), jax.tree_util.tree_leaves(g_fu)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3
        )


def test_dual_branch_kernel_matches_two_singles(rng):
    """fused_dual_render (both field branches in one kernel) == two
    fused_field_render calls, for outputs AND gradients (incl. the in-VMEM
    summed dembed/dzvals/dzdists cotangents)."""
    from gazenerf_tpu.kernels.fused_field2 import fused_dual_render

    mlp, params_f, args, dims = make_inputs(rng, B=2, R=32, S=8)
    embed, sc, ac, zvals, zdists = args
    params_e = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.sin(jnp.arange(x.size).reshape(x.shape)),
        params_f,
    )
    dims = dims._replace(bwd_tile_rays=16, stash_acts=True)

    def loss_single(pf, pe, embed, sc, ac, zvals, zdists):
        of = fused_field_render(pf, embed, sc, ac, zvals, zdists, dims)
        oe = fused_field_render(pe, embed, sc, ac, zvals, zdists, dims)
        return sum(jnp.sum(t**2) for o in (of, oe) for t in o)

    def loss_dual(pf, pe, embed, sc, ac, zvals, zdists):
        of, oe = fused_dual_render(pf, pe, embed, sc, ac, zvals, zdists, dims)
        return sum(jnp.sum(t**2) for o in (of, oe) for t in o)

    a = (params_f, params_e, embed, sc, ac, zvals, zdists)
    ls, gs = jax.value_and_grad(loss_single, argnums=tuple(range(7)))(*a)
    ld, gd = jax.value_and_grad(loss_dual, argnums=tuple(range(7)))(*a)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_ray_chunked_render_matches_unchunked(rng):
    """cfg.ray_chunk (sequential lax.map + checkpoint over ray tiles) is
    numerically identical to the unchunked render, values AND gradients —
    the memory-bounded deep-march mode."""
    from gazenerf_tpu.config import ModelConfig
    from gazenerf_tpu.models.gaze_nerf import GazeNeRF
    from gazenerf_tpu.ops import pixel_grid

    def build(rc):
        cfg = ModelConfig(
            num_sample_coarse=8, featmap_size=16, pred_img_size=64,
            mlp_hidden=32, use_pallas=False, ray_chunk=rc,
        )
        return GazeNeRF(cfg), cfg

    model0, cfg = build(0)
    model1, _ = build(64)  # 256 rays -> 4 chunks
    B, W = 1, cfg.featmap_size
    xy = jnp.broadcast_to(jnp.asarray(np.asarray(pixel_grid(W)))[None], (B, W * W, 2))
    R = jnp.asarray(np.diag([1.0, -1.0, -1.0])[None].astype(np.float32))
    T3 = jnp.asarray(np.array([[0.0, 0.0, 10.0]], np.float32)).reshape(B, 3, 1)
    Kn = np.zeros((B, 3, 3), np.float32)
    Kn[:, 0, 0] = Kn[:, 1, 1] = 0.05
    Kn[:, 0, 2] = Kn[:, 1, 2] = -0.8
    Kn[:, 2, 2] = 1
    K = jnp.asarray(Kn)
    sc = jnp.zeros((B, 179))
    ac = jnp.zeros((B, 127))
    gz = jnp.asarray([[0.2, -0.1]], jnp.float32)
    params = model0.init({"params": jax.random.PRNGKey(0)}, xy, sc, ac, gz, R, T3, K)

    def loss(m, p, g):
        out = m.apply(p, xy, sc, ac, g, R, T3, K)
        return jnp.sum(out["coarse_dict"]["merge_img"] ** 2)

    l0, g0 = jax.value_and_grad(lambda p, g: loss(model0, p, g), argnums=(0, 1))(
        params, gz
    )
    l1, g1 = jax.value_and_grad(lambda p, g: loss(model1, p, g), argnums=(0, 1))(
        params, gz
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_model_fused_path_matches_xla(rng):
    """GazeNeRF with use_pallas (interpret on CPU) == the bf16 XLA path."""
    from gazenerf_tpu.config import ModelConfig
    from gazenerf_tpu.models.gaze_nerf import GazeNeRF
    from gazenerf_tpu.ops import pixel_grid

    def mk(use_pallas):
        return GazeNeRF(ModelConfig(
            num_sample_coarse=8, featmap_size=16, featmap_nc=258,
            pred_img_size=64, mlp_hidden=64,
            compute_dtype="bfloat16", use_pallas=use_pallas,
            pallas_interpret=True,
        ))

    B = 2
    xy = jnp.asarray(np.asarray(pixel_grid(16))[None].repeat(B, 0))
    shape = jnp.asarray((rng.standard_normal((B, 179)) * 0.1).astype(np.float32))
    appea = jnp.asarray((rng.standard_normal((B, 127)) * 0.1).astype(np.float32))
    gaze = jnp.asarray((rng.standard_normal((B, 2)) * 0.3).astype(np.float32))
    R = jnp.asarray(np.diag([1.0, -1.0, -1.0]).astype(np.float32)[None].repeat(B, 0))
    T = jnp.zeros((B, 3, 1)).at[:, 2, 0].set(12.0)
    Kinv = jnp.asarray(np.array(
        [[0.0077908 * 2, 0.0, -0.1255383],
         [0.0, 0.0077908 * 2, -0.1283246],
         [0.0, 0.0, 1.0]], np.float32)[None].repeat(B, 0))

    m_x, m_p = mk(False), mk(True)
    params = m_x.init(jax.random.PRNGKey(0), xy, shape, appea, gaze, R, T, Kinv)

    out_x = m_x.apply(params, xy, shape, appea, gaze, R, T, Kinv)
    out_p = m_p.apply(params, xy, shape, appea, gaze, R, T, Kinv)
    np.testing.assert_allclose(
        np.asarray(out_p["coarse_dict"]["merge_img"]),
        np.asarray(out_x["coarse_dict"]["merge_img"]),
        atol=3e-2,
    )

    def loss(variant, p):
        o = variant.apply(p, xy, shape, appea, gaze, R, T, Kinv)
        return jnp.mean(o["coarse_dict"]["merge_img"] ** 2)

    gp = jax.grad(lambda p: loss(m_p, p))(params)
    gx = jax.grad(lambda p: loss(m_x, p))(params)
    lp, lx = jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)
    assert all(np.isfinite(np.asarray(a)).all() for a in lp)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(lp, lx))
    den = sum(float(jnp.sum(b**2)) for b in lx)
    assert (num / max(den, 1e-12)) ** 0.5 < 0.15


def test_pallas_shuffle_blur_parity(rng):
    """Fused Pallas blur-shuffle == the exact XLA phase formulation,
    forward and VJP, across shapes incl. the single-tile case."""
    from gazenerf_tpu.kernels.shuffle_blur import pallas_shuffle_blur_gm
    from gazenerf_tpu.ops.image import pixel_shuffle2_blur_gm

    for (B, H, W, C) in [(2, 8, 8, 4), (1, 16, 12, 6), (1, 4, 4, 3)]:
        x = jnp.asarray(rng.standard_normal((B, H, W, 4 * C)).astype(np.float32))
        y_k = pallas_shuffle_blur_gm(x, True)
        y_r = pixel_shuffle2_blur_gm(x)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r), atol=1e-5)

        g = jnp.asarray(rng.standard_normal(y_r.shape).astype(np.float32))
        dx_k = jax.vjp(lambda v: pallas_shuffle_blur_gm(v, True), x)[1](g)[0]
        dx_r = jax.vjp(pixel_shuffle2_blur_gm, x)[1](g)[0]
        np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r), atol=1e-4)


def test_renderer_pallas_shuffle_mode_matches_phase(rng):
    """NeuralRenderer with shuffle_mode='pallas' (interpret) == 'phase'."""
    from gazenerf_tpu.models.neural_renderer import NeuralRenderer

    def mk(mode):
        return NeuralRenderer(
            feat_nc=32, min_feat=8, featmap_size=8, img_size=32,
            shuffle_mode=mode, pallas_interpret=True,
        )

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)).astype(np.float32))
    m_p, m_k, m_g = mk("phase"), mk("pallas"), mk("phase_gm")
    params = m_p.init(jax.random.PRNGKey(0), x)
    out_p = m_p.apply(params, x)
    out_k = m_k.apply(params, x)
    out_g = m_g.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_p), atol=1e-5)

    gp = jax.grad(lambda v: float(0) + jnp.sum(m_p.apply(params, v) ** 2))(x)
    gk = jax.grad(lambda v: jnp.sum(m_k.apply(params, v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gp), atol=1e-4)


# ---------------------------------------------------------------------------
# fused upsampler block (kernels/fused_upsampler.py)


def _upsampler_args(rng, B, H, W, F, F3):
    from gazenerf_tpu.kernels.fused_upsampler import residual_matrix

    x = jnp.asarray(rng.standard_normal((B, H, W, F)).astype(np.float32))
    W1 = jnp.asarray(rng.standard_normal((F, 2 * F)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.standard_normal((2 * F,)).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.standard_normal((2 * F, 4 * F)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal((4 * F,)).astype(np.float32) * 0.1)
    P = jnp.asarray(residual_matrix(F))
    W3 = jnp.asarray(rng.standard_normal((F, F3)).astype(np.float32) * 0.3)
    b3 = jnp.asarray(rng.standard_normal((F3,)).astype(np.float32) * 0.1)
    return (x, W1, b1, W2, b2, P, W3, b3)


@pytest.mark.parametrize("shape", [(1, 8, 8, 12, 6), (2, 16, 8, 8, 4), (1, 4, 4, 8, 4)])
def test_fused_upsampler_exact_f32(shape):
    """Interpret-mode f32 kernel == XLA reference bitwise (fwd + all grads),
    across single- and multi-tile grids (edge-fold coverage)."""
    from gazenerf_tpu.kernels.fused_upsampler import (
        fused_upsample_block,
        xla_reference,
    )

    rng = np.random.default_rng(0)
    args = _upsampler_args(rng, *shape)
    ref = xla_reference(*args)
    got = fused_upsample_block(*args, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    g_ref = jax.grad(
        lambda *a: jnp.sum(jnp.sin(xla_reference(*a))), argnums=(0, 1, 2, 3, 4, 6, 7)
    )(*args)
    g_got = jax.grad(
        lambda *a: jnp.sum(jnp.sin(fused_upsample_block(*a, True, False))),
        argnums=(0, 1, 2, 3, 4, 6, 7),
    )(*args)
    for i, (a, b) in enumerate(zip(g_got, g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, err_msg=f"grad {i}"
        )


@pytest.mark.slow
def test_fused_renderer_mode_matches_phase_gm():
    """NeuralRenderer shuffle_mode='fused' (interpret) == phase_gm+fold with
    an identical parameter tree."""
    from gazenerf_tpu.models.neural_renderer import NeuralRenderer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 16, 16, 66)).astype(np.float32))
    kw = dict(feat_nc=66, featmap_size=16, img_size=128, min_feat=8)
    m1 = NeuralRenderer(shuffle_mode="phase_gm", fold_feat_layer=True, **kw)
    m2 = NeuralRenderer(shuffle_mode="fused", pallas_interpret=True, **kw)
    p1 = m1.init({"params": jax.random.PRNGKey(0)}, x)
    p2 = m2.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    o1, o2 = m1.apply(p1, x), m2.apply(p1, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m1.apply(p, x))))(p1)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(m2.apply(p, x))))(p1)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_embed_bf16_backward_matches_f32_embed(rng):
    """pallas_embed_bf16 semantics: the kernel gets a bf16 embed (forward
    values unchanged — it casts internally anyway) and returns a bf16 dembed
    cotangent.  Gradients must track the f32-embed path at bf16 resolution
    (ADVICE round 3: this flag had no coverage)."""
    mlp, params, args, dims = make_inputs(rng, B=2, R=32, S=8)
    embed, sc, ac, zvals, zdists = args
    dims = dims._replace(use_pallas_bwd=True, stash_acts=True)

    def loss(params, embed, sc, ac):
        f, bga, dep, w = fused_field_render(
            params, embed, sc, ac, zvals, zdists, dims
        )
        return jnp.sum(f**2) + jnp.sum(bga**2) + jnp.sum(dep**2) + jnp.sum(w**2)

    g_f32 = jax.grad(loss, argnums=(0, 1, 2, 3))(params, embed, sc, ac)
    # bf16 embed in: the model feeds embed.astype(bf16) when the flag is set
    # (models/gaze_nerf.py _render_branch)
    g_b16 = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params, embed.astype(jnp.bfloat16), sc, ac
    )
    assert g_b16[1].dtype == jnp.bfloat16
    for a, b in zip(
        jax.tree_util.tree_leaves(g_f32), jax.tree_util.tree_leaves(g_b16)
    ):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-2)


def test_batch_fg_passes_matches_sequential(rng):
    """batch_fg_passes (face/eyes/merge stacked into one 3B-row renderer
    call, bg separate) == the 4-sequential-pass path, all output images."""
    from gazenerf_tpu.config import ModelConfig
    from gazenerf_tpu.models.gaze_nerf import GazeNeRF
    from gazenerf_tpu.ops import pixel_grid

    def build(fg):
        cfg = ModelConfig(
            num_sample_coarse=8, featmap_size=16, pred_img_size=64,
            mlp_hidden=32, use_pallas=False, batch_fg_passes=fg,
        )
        return GazeNeRF(cfg), cfg

    model0, cfg = build(False)
    model1, _ = build(True)
    B, W = 2, cfg.featmap_size
    xy = jnp.broadcast_to(jnp.asarray(np.asarray(pixel_grid(W)))[None], (B, W * W, 2))
    R = jnp.asarray(
        np.diag([1.0, -1.0, -1.0])[None].repeat(B, 0).astype(np.float32)
    )
    T3 = jnp.asarray(np.tile([0.0, 0.0, 10.0], (B, 1)).astype(np.float32)).reshape(
        B, 3, 1
    )
    Kn = np.zeros((B, 3, 3), np.float32)
    Kn[:, 0, 0] = Kn[:, 1, 1] = 0.05
    Kn[:, 0, 2] = Kn[:, 1, 2] = -0.8
    Kn[:, 2, 2] = 1
    K = jnp.asarray(Kn)
    sc = jnp.asarray(rng.standard_normal((B, 179)), jnp.float32) * 0.1
    ac = jnp.asarray(rng.standard_normal((B, 127)), jnp.float32) * 0.1
    gz = jnp.asarray([[0.2, -0.1], [-0.1, 0.3]], jnp.float32)
    params = model0.init({"params": jax.random.PRNGKey(0)}, xy, sc, ac, gz, R, T3, K)

    o0 = model0.apply(params, xy, sc, ac, gz, R, T3, K)["coarse_dict"]
    o1 = model1.apply(params, xy, sc, ac, gz, R, T3, K)["coarse_dict"]
    for k in ("merge_img", "merge_img_face", "merge_img_eyes", "bg_img"):
        np.testing.assert_allclose(
            np.asarray(o0[k]), np.asarray(o1[k]), atol=1e-6, err_msg=k
        )
