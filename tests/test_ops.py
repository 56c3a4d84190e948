"""Golden-value tests for the core volumetric-rendering ops.

Oracles are independent re-derivations of the reference semantics
(SURVEY.md §2.1) written in torch/numpy NCHW here in the tests — they verify
that our channels-last TPU ops compute the same math.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gazenerf_tpu.ops import (
    angular_error_deg,
    blur3x3,
    euler_to_rotation,
    gaze_rotation_matrices,
    generate_rays,
    integrate_rays,
    pixel_grid,
    pixel_shuffle2,
    pitchyaw_to_vector,
    positional_encoding,
    resize_bilinear,
    rotate_feature_planes,
    rotation_to_euler,
    sample_coarse,
    sample_fine,
    stratified_zvals,
)


def test_positional_encoding_order(rng):
    """Channel order must be [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]."""
    x = rng.standard_normal((2, 5, 3)).astype(np.float32)
    out = np.asarray(positional_encoding(jnp.asarray(x), n_freqs=4))
    assert out.shape == (2, 5, 3 + 3 * 8)
    np.testing.assert_allclose(out[..., :3], x, rtol=1e-6)
    for fi, f in enumerate([1.0, 2.0, 4.0, 8.0]):
        s = 3 + fi * 6
        np.testing.assert_allclose(out[..., s : s + 3], np.sin(x * f), atol=1e-6)
        np.testing.assert_allclose(
            out[..., s + 3 : s + 6], np.cos(x * f), atol=1e-6
        )


def _torch_ray_oracle(xy, R, T, Kinv, n_samples, z1, z2):
    """Reference GenSamplePoints semantics (utils/model_utils.py:283-375), NCHW."""
    xy_t = torch.from_numpy(xy.transpose(0, 2, 1))  # [B, 2, R]
    ones = torch.ones_like(xy_t[:, :1])
    xyz = torch.cat([xy_t, ones], dim=1)
    ray_d = torch.from_numpy(R).bmm(torch.from_numpy(Kinv).bmm(xyz))
    ray_l = torch.norm(ray_d, dim=1, keepdim=True)
    ray_d = ray_d / ray_l
    ray_l = -1.0 / ray_d[:, -1:, :]
    B, _, nr = xy_t.shape
    ray_o = torch.from_numpy(T).reshape(B, 3, 1).expand(B, 3, nr)

    rela_z1 = (ray_o[:, -1, :] - z1).unsqueeze(-1)
    rela_z2 = (ray_o[:, -1, :] - z2).unsqueeze(-1)
    t = torch.linspace(0.0, 1.0, n_samples + 1).view(1, 1, -1).double()
    zvals = rela_z1.double() * (1 - t) + rela_z2.double() * t
    zvals = zvals.float()

    o = ray_o.unsqueeze(-1)
    d = ray_d.unsqueeze(-1)
    l = ray_l.unsqueeze(-1)
    z_dists = (zvals[:, :, 1:] - zvals[:, :, :-1]).unsqueeze(1) * l
    z = zvals[:, :, :-1].unsqueeze(1)
    pts = o + d * l * z
    return (
        pts.numpy(),  # [B, 3, R, S]
        z.numpy(),  # [B, 1, R, S]
        z_dists.numpy(),
        ray_d.numpy(),
        ray_l.numpy(),
    )


def _random_cams(rng, B):
    from scipy.stats import special_ortho_group

    R = np.stack([special_ortho_group.rvs(3, random_state=i) for i in range(B)])
    R = R.astype(np.float32)
    # keep cameras looking along -z with positive-z origin like the reference
    T = np.stack([[0.1 * b, -0.05 * b, 10.0 + b] for b in range(B)]).astype(
        np.float32
    )
    K = np.zeros((B, 3, 3), dtype=np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 0.0078
    K[:, 0, 2] = -0.125
    K[:, 1, 2] = -0.128
    K[:, 2, 2] = 1.0
    # make d_z negative so ray_l = -1/dz is positive: ensure R maps K^-1 dirs
    # to -z-ish; use fixed camera-to-world close to reference base cam
    base = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    R = np.repeat(base[None], B, axis=0)
    return R, T, K


def test_ray_generation_and_sampling(rng):
    B, W, S = 2, 8, 6
    R, T, Kinv = _random_cams(rng, B)
    xy = np.asarray(pixel_grid(W))[None].repeat(B, axis=0)  # [B, R, 2]

    pts_t, z_t, zd_t, rd_t, rl_t = _torch_ray_oracle(xy, R, T, Kinv, S, 2.5, -3.5)

    samples = sample_coarse(
        jnp.asarray(xy), jnp.asarray(R), jnp.asarray(T), jnp.asarray(Kinv),
        num_samples=S, world_z1=2.5, world_z2=-3.5, key=None,
    )
    np.testing.assert_allclose(
        np.asarray(samples.pts), pts_t.transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(samples.zvals), z_t[:, 0], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(samples.z_dists), zd_t[:, 0], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(samples.rays.directions),
        rd_t.transpose(0, 2, 1),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(samples.rays.ray_l), rl_t[:, 0], atol=1e-4
    )


def test_stratified_jitter_bounds(rng):
    B, W, S = 1, 4, 16
    R, T, Kinv = _random_cams(rng, B)
    xy = np.asarray(pixel_grid(W))[None]
    rays = generate_rays(
        jnp.asarray(xy), jnp.asarray(R), jnp.asarray(T), jnp.asarray(Kinv)
    )
    z_plain = stratified_zvals(rays, S, 2.5, -3.5, key=None)
    z_jit = stratified_zvals(rays, S, 2.5, -3.5, key=jax.random.PRNGKey(1))
    z_plain, z_jit = np.asarray(z_plain), np.asarray(z_jit)
    # jittered samples stay within neighbouring mid-point envelopes
    mids = 0.5 * (z_plain[..., 1:] + z_plain[..., :-1])
    upper = np.concatenate([mids, z_plain[..., -1:]], axis=-1)
    lower = np.concatenate([z_plain[..., :1], mids], axis=-1)
    assert np.all(z_jit <= upper + 1e-6) and np.all(z_jit >= lower - 1e-6)
    assert not np.allclose(z_jit, z_plain)


def _torch_integrate_oracle(feat, dens, dists, z):
    """Reference CalcRayColor semantics (utils/model_utils.py:493-534), NCHW."""
    alpha = 1.0 - torch.exp(-dens * dists)  # [B,1,R,S]
    x = 1.0 - alpha + 1e-10
    x = F.pad(x, [1, 0], mode="constant", value=1.0)
    x = torch.cumprod(x, dim=-1)
    w = alpha * x[..., :-1]
    rgb = torch.sum(w * feat, dim=-1)
    depth = torch.sum(w * z, dim=-1)
    acc = torch.sum(w, dim=-1)
    return rgb, 1.0 - acc, depth, w


@pytest.mark.parametrize("use_scan", [False, True])
def test_integrate_rays(rng, use_scan):
    B, R, S, C = 2, 7, 9, 5
    feat = rng.standard_normal((B, R, S, C)).astype(np.float32)
    dens = rng.random((B, R, S)).astype(np.float32) * 3.0
    dists = rng.random((B, R, S)).astype(np.float32)
    z = rng.standard_normal((B, R, S)).astype(np.float32)

    out = integrate_rays(
        jnp.asarray(feat), jnp.asarray(dens), jnp.asarray(dists),
        jnp.asarray(z), use_scan=use_scan,
    )

    ft = torch.from_numpy(feat.transpose(0, 3, 1, 2))  # [B,C,R,S]
    dt = torch.from_numpy(dens[:, None])
    st = torch.from_numpy(dists[:, None])
    zt = torch.from_numpy(z[:, None])
    rgb_t, bga_t, depth_t, w_t = _torch_integrate_oracle(ft, dt, st, zt)

    np.testing.assert_allclose(
        np.asarray(out.features), rgb_t.numpy().transpose(0, 2, 1), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.bg_alpha), bga_t.numpy()[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth_t.numpy()[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), w_t.numpy()[:, 0], atol=1e-6)


def test_rotate_feature_planes(rng):
    """Against a literal torch re-derivation of the reference rotate()."""
    B, H, W, K = 2, 4, 4, 6
    C = 3 * K
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    gaze = rng.standard_normal((B, 2)).astype(np.float32) * 0.4

    out = np.asarray(rotate_feature_planes(jnp.asarray(feat), jnp.asarray(gaze)))

    # torch oracle: NCHW [B, C, H, W] -> [B, K, 3, H, W]; per-sample
    # v_row @ (Ry @ Rx)  (reference utils/model_utils.py:11-46)
    ft = torch.from_numpy(feat.transpose(0, 3, 1, 2)).reshape(B, K, 3, H, W)
    res = []
    for i in range(B):
        p, y = float(gaze[i, 0]), float(gaze[i, 1])
        rx = torch.tensor(
            [[1, 0, 0], [0, np.cos(p), -np.sin(p)], [0, np.sin(p), np.cos(p)]]
        ).float()
        ry = torch.tensor(
            [[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]]
        ).float()
        rot = ry @ rx
        v = ft[i].permute(0, 2, 3, 1)  # [K, H, W, 3]
        res.append(torch.matmul(v, rot))
    oracle = torch.stack(res)  # [B, K, H, W, 3]
    oracle = oracle.permute(0, 2, 3, 1, 4).reshape(B, H, W, C).numpy()
    np.testing.assert_allclose(out, oracle, atol=1e-5)


def test_gaze_rotation_inverse(rng):
    gaze = jnp.asarray(rng.standard_normal((3, 2)).astype(np.float32))
    R = gaze_rotation_matrices(gaze)
    Rinv = gaze_rotation_matrices(gaze, inverse=True)
    eye = jnp.einsum("bij,bjk->bik", R, Rinv)
    np.testing.assert_allclose(np.asarray(eye), np.eye(3)[None].repeat(3, 0), atol=1e-6)


def test_euler_roundtrip():
    ang = jnp.asarray([[0.00872665, 0.337, 0.113], [-0.2, 0.05, -0.4]], jnp.float32)
    R = euler_to_rotation(ang)
    back = rotation_to_euler(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ang), atol=1e-5)


def test_pixel_shuffle_matches_torch(rng):
    B, H, W, C = 2, 3, 5, 8
    x = rng.standard_normal((B, H, W, 4 * C)).astype(np.float32)
    out = np.asarray(pixel_shuffle2(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    oracle = F.pixel_shuffle(xt, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, oracle, atol=1e-6)


def test_blur3x3_matches_torch_reflect(rng):
    B, H, W, C = 2, 6, 7, 3
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    out = np.asarray(blur3x3(jnp.asarray(x)))

    f = torch.tensor([1.0, 2.0, 1.0])
    k = (f[:, None] * f[None, :]) / 16.0
    kt = k.view(1, 1, 3, 3).repeat(C, 1, 1, 1)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = F.pad(xt, (1, 1, 1, 1), mode="reflect")
    oracle = F.conv2d(xt, kt, groups=C).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, oracle, atol=1e-6)


def test_resize_bilinear_matches_torch(rng):
    B, H, W, C = 2, 8, 8, 3
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    for out_hw in [(16, 16), (4, 4), (224, 224)]:
        out = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        oracle = (
            F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=False)
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(out, oracle, atol=1e-5)


def _torch_fine_oracle(weights, zc, n_fine):
    """Reference FineSample semantics (utils/model_utils.py:413-481), torch."""
    w = torch.from_numpy(weights)[:, None, :, :]  # [B,1,R,Sc]
    zvals = torch.from_numpy(zc)[:, None, :, :]  # [B,1,R,Sc]
    NF = n_fine + 1
    tw = w[:, :, :, 1:-1]
    B, _, R, Sm2 = tw.shape
    tw = tw.reshape(-1, Sm2)
    x = tw + 1e-5
    pdf = tw / torch.sum(x, dim=-1, keepdim=True)
    cdf = torch.cumsum(pdf, dim=-1)
    cdf = F.pad(cdf, [1, 0], value=0.0)
    N = cdf.size(0)
    u = torch.linspace(0.0, 1.0, NF).view(1, NF).expand(N, NF).contiguous()
    inds = torch.searchsorted(cdf.contiguous(), u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=Sm2)
    inds_g = torch.stack([below, above], dim=-1)
    zflat = zvals.reshape(N, Sm2 + 2)
    bins = 0.5 * (zflat[:, 1:] + zflat[:, :-1])
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(N, NF, Sm2 + 1), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(N, NF, Sm2 + 1), 2, inds_g)
    denom = cdf_g[:, :, 1] - cdf_g[:, :, 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[:, :, 0]) / denom
    fine_z = bins_g[:, :, 0] + t * (bins_g[:, :, 1] - bins_g[:, :, 0])
    all_z, _ = torch.sort(torch.cat([zflat, fine_z], dim=-1), dim=-1)
    return all_z.reshape(B, R, Sm2 + 2 + NF).numpy()


def test_fine_sampling_matches_oracle(rng):
    B, W, Sc, NF = 1, 4, 8, 5
    R_, T, Kinv = _random_cams(rng, B)
    xy = np.asarray(pixel_grid(W))[None]
    coarse = sample_coarse(
        jnp.asarray(xy), jnp.asarray(R_), jnp.asarray(T), jnp.asarray(Kinv),
        num_samples=Sc, world_z1=2.5, world_z2=-3.5, key=None,
    )
    weights = rng.random((B, W * W, Sc)).astype(np.float32)

    fine = sample_fine(jnp.asarray(weights), coarse, num_fine=NF, key=None)
    zc = np.asarray(coarse.zvals)
    oracle_z = _torch_fine_oracle(weights, zc, NF)
    # our SampleSet drops the final edge (zvals[:-1]); compare edge arrays
    got_edges = np.asarray(fine.zvals)
    np.testing.assert_allclose(got_edges, oracle_z[..., :-1], atol=1e-4)


def test_pitchyaw_and_angular():
    py = jnp.asarray([[0.0, 0.0], [0.1, -0.2]], jnp.float32)
    v = pitchyaw_to_vector(py)
    np.testing.assert_allclose(np.asarray(v[0]), [0.0, 0.0, 1.0], atol=1e-6)
    err = angular_error_deg(v, v)
    np.testing.assert_allclose(np.asarray(err), [0.0, 0.0], atol=1e-2)

    v2 = pitchyaw_to_vector(jnp.asarray([[0.0, np.pi / 2]], jnp.float32))
    err2 = angular_error_deg(v[:1], v2)
    np.testing.assert_allclose(np.asarray(err2), [90.0], atol=1e-3)


def test_fine_sampling_shape_semantics_vs_reference(rng):
    """Full-path parity vs the ACTUAL reference FineSample (imported from
    /root/reference): the sorted union is consumed as EDGES, so the output
    has S_c + num_fine samples — pts/zvals/z_dists all compared."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from utils.model_utils import FineSample as RefFineSample

    class Opt:
        num_sample_fine = 5

    B, W, Sc, NF = 1, 4, 8, 5
    R_, T, Kinv = _random_cams(rng, B)
    xy = np.asarray(pixel_grid(W))[None]
    coarse = sample_coarse(
        jnp.asarray(xy), jnp.asarray(R_), jnp.asarray(T), jnp.asarray(Kinv),
        num_samples=Sc, world_z1=2.5, world_z2=-3.5, key=None,
    )
    weights = rng.random((B, W * W, Sc)).astype(np.float32)
    fine = sample_fine(jnp.asarray(weights), coarse, num_fine=NF, key=None)

    # reference-format coarse dict: [B,3,R,1] rays, [B,1,R,Nc] zvals
    R = W * W
    ray_o = torch.from_numpy(
        np.asarray(coarse.rays.origins).transpose(0, 2, 1)[..., None]
    )
    ray_d = torch.from_numpy(
        np.asarray(coarse.rays.directions).transpose(0, 2, 1)[..., None]
    )
    ray_l = torch.from_numpy(np.asarray(coarse.rays.ray_l))[:, None, :, None]
    ref_coarse = {
        "zvals": torch.from_numpy(np.asarray(coarse.zvals))[:, None],
        "batch_ray_o": ray_o,
        "batch_ray_d": ray_d,
        "batch_ray_l": ray_l,
    }
    ref = RefFineSample(Opt())(
        torch.from_numpy(weights)[:, None], ref_coarse, disturb=False
    )
    want_pts = ref["pts"].numpy().transpose(0, 2, 3, 1)  # [B,R,S,3]
    want_z = ref["zvals"].numpy()[:, 0]
    want_d = ref["z_dists"].numpy()[:, 0]

    assert fine.zvals.shape == (B, R, Sc + NF) == want_z.shape
    np.testing.assert_allclose(np.asarray(fine.zvals), want_z, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fine.z_dists), want_d, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fine.pts), want_pts, atol=1e-4)
