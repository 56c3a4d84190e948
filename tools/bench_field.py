"""Direct scan-timed bench of the fused field op (fwd / fwd+bwd) and the
XLA embed chain, at full training size.  One jit + lax.scan per variant,
interleaved reps (PERF_NOTES methodology).

Usage: python tools/bench_field.py [N] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from gazenerf_tpu.config import ModelConfig
    from gazenerf_tpu.kernels.fused_field import default_dims, fused_field_render
    from gazenerf_tpu.models.mlp_nerf import NeRFFieldMLP
    from gazenerf_tpu.ops.embedding import positional_encoding

    cfg = ModelConfig(compute_dtype="bfloat16")
    B, R, S, De = 2, 4096, 64, 63
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, R, S, 3)).astype(np.float32))
    embed = positional_encoding(pts, 10, True)
    sc = jnp.asarray(rng.standard_normal((B, 181)).astype(np.float32) * 0.1)
    ac = jnp.asarray(rng.standard_normal((B, 127)).astype(np.float32) * 0.1)
    zvals = jnp.asarray(np.sort(rng.random((B, R, S)).astype(np.float32), -1))
    zdists = jnp.abs(jnp.diff(zvals, append=zvals[..., -1:] + 0.01))

    net = NeRFFieldMLP(
        embed_dims=De, cond_dims=181, vd_cond_dims=127, hidden=384,
        res_nfeat=258, dtype=jnp.bfloat16,
    )
    params_all = net.init(
        {"params": jax.random.PRNGKey(0)}, embed, sc, ac, None
    )["params"]
    dims = default_dims(cfg)._replace(samples=S, tile_rays=32, bwd_tile_rays=8)

    def field_fwd(p, e):
        return fused_field_render(p, e, sc, ac, zvals, zdists, dims)

    def loss_full(p, e):
        f, bga, d, w = field_fwd(p, e)
        return jnp.sum(f) + jnp.sum(bga) + jnp.sum(d) + jnp.sum(w)

    def loss_embed(p, pts_):
        e = positional_encoding(pts_, 10, True)
        f, bga, d, w = field_fwd(p, e)
        return jnp.sum(f) + jnp.sum(bga) + jnp.sum(d) + jnp.sum(w)

    variants = {}

    @jax.jit
    def run_fwd(e):
        def body(acc, _):
            f, bga, d, w = field_fwd(params_all, e + acc * 0)
            return jnp.sum(f) * 1e-20, jnp.sum(f)

        return jax.lax.scan(body, 0.0, None, length=N)

    variants["field fwd (1 branch)"] = (run_fwd, embed)

    grad_full = jax.grad(loss_full, argnums=(0, 1))

    @jax.jit
    def run_fwdbwd(e):
        def body(acc, _):
            gp, ge = grad_full(params_all, e + acc * 0)
            s = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(gp))
            return s * 1e-20 + jnp.sum(ge) * 1e-20, s

        return jax.lax.scan(body, 0.0, None, length=N)

    variants["field fwd+bwd (1 branch)"] = (run_fwdbwd, embed)

    grad_embed = jax.grad(loss_embed, argnums=(0, 1))

    @jax.jit
    def run_embed_chain(pts_):
        def body(acc, _):
            gp, gpts = grad_embed(params_all, pts_ + acc * 0)
            s = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(gp))
            return s * 1e-20 + jnp.sum(gpts) * 1e-20, s

        return jax.lax.scan(body, 0.0, None, length=N)

    variants["embed+field fwd+bwd (1 branch)"] = (run_embed_chain, pts)

    # compile all first
    for name, (fn, arg) in variants.items():
        print("compiling", name, flush=True)
        jax.block_until_ready(fn(arg))
    times = {n: [] for n in variants}
    for r in range(reps):
        for name, (fn, arg) in variants.items():
            t0 = time.time()
            out = fn(arg)
            jax.block_until_ready(out)
            times[name].append((time.time() - t0) / N * 1000.0)
    for name in variants:
        ts = ", ".join(f"{t:.2f}" for t in times[name])
        print(f"{name}: min {min(times[name]):.2f} ms  (reps: {ts})", flush=True)


if __name__ == "__main__":
    main()
