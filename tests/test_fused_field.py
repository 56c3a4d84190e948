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
