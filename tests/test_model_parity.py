"""Pixel + gradient parity vs the PyTorch reference on transplanted weights.

This is BASELINE.json configs 2-3: the TPU model must reproduce the
reference's rendered images (and input gradients) when given identical
weights and identical inputs (disturb off — RNG streams cannot match).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gazenerf_tpu.config import ModelConfig
from gazenerf_tpu.models.gaze_nerf import GazeNeRF
from gazenerf_tpu.models.mlp_nerf import NeRFFieldMLP
from gazenerf_tpu.models.neural_renderer import NeuralRenderer
from gazenerf_tpu.ops import pixel_grid
from gazenerf_tpu.utils.transplant import (
    field_params_from_torch,
    gazenerf_params_from_torch,
    renderer_params_from_torch,
)

from reference_oracle import load_reference, small_reference_net


def _torch_sd_to_numpy(net, prefix=""):
    return {
        (prefix + k): v.detach().numpy() for k, v in net.state_dict().items()
    }


def test_field_mlp_parity(rng):
    """Our split-conditioning MLP == reference MLPforNeRF on same weights."""
    ref = load_reference()
    H, De, Dc, Da, C = 64, 63, 181, 127, 258
    torch.manual_seed(1)
    tnet = ref.MLPforNeRF(vp_channels=De + Dc, vd_channels=Da, h_channel=H, res_nfeat=C)
    tnet.eval()

    B, R, S = 2, 5, 4
    embed = rng.standard_normal((B, R, S, De)).astype(np.float32)
    shape_cond = rng.standard_normal((B, Dc)).astype(np.float32)
    appea_cond = rng.standard_normal((B, Da)).astype(np.float32)

    # reference consumes the broadcast concat in NCHW
    vp_full = np.concatenate(
        [embed, np.broadcast_to(shape_cond[:, None, None, :], (B, R, S, Dc))], -1
    )
    vd_full = np.broadcast_to(appea_cond[:, None, None, :], (B, R, S, Da))
    with torch.no_grad():
        rgb_t, dens_t = tnet(
            torch.from_numpy(vp_full.transpose(0, 3, 1, 2)),
            torch.from_numpy(vd_full.transpose(0, 3, 1, 2)),
        )

    jnet = NeRFFieldMLP(embed_dims=De, cond_dims=Dc, vd_cond_dims=Da, hidden=H, res_nfeat=C)
    sd = {f"x.{k}": v for k, v in _torch_sd_to_numpy(tnet).items()}
    params = {"params": field_params_from_torch(sd, "x")}
    feat_j, dens_j = jnet.apply(
        params, jnp.asarray(embed), jnp.asarray(shape_cond), jnp.asarray(appea_cond)
    )

    np.testing.assert_allclose(
        np.asarray(feat_j), rgb_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dens_j), dens_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


def test_neural_renderer_parity(rng):
    """Our NHWC renderer == reference NeuralRenderer on same weights."""
    net, _ = small_reference_net()
    tren = net.neural_render
    F_, C = 16, 258
    x = rng.standard_normal((2, F_, F_, C)).astype(np.float32)
    with torch.no_grad():
        out_t = tren(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    jren = NeuralRenderer(
        bg_type="white", feat_nc=C, out_dim=3, final_actvn=True,
        min_feat=32, featmap_size=F_, img_size=128,
    )
    sd = _torch_sd_to_numpy(tren, prefix="neural_render.")
    params = {"params": renderer_params_from_torch(sd, n_blocks=3)}
    out_j = jren.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 3, 1), atol=5e-5
    )
    # bg featmap transplant round-trips
    bg_j = jren.apply(params, method=jren.get_bg_featmap)
    np.testing.assert_allclose(
        np.asarray(bg_j), tren.get_bg_featmap().detach().numpy().transpose(0, 2, 3, 1),
        atol=0,
    )


def _camera_inputs(B, featmap_size):
    """Reference base camera (utils/render_utils.py:88-97, 36-40)."""
    R = np.diag([1.0, -1.0, -1.0]).astype(np.float32)[None].repeat(B, 0)
    T = np.zeros((B, 3, 1), np.float32)
    T[:, 2, 0] = 12.0
    inv_inmat = np.array(
        [
            [0.007790804840624332, 0.0, -0.12553827464580536],
            [0.0, 0.007790804840624332, -0.12832458317279816],
            [0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    inv = inv_inmat.copy()
    inv[:2, :2] /= featmap_size / 32.0
    return R, T, inv[None].repeat(B, 0)


@pytest.fixture(scope="module")
def parity_setup():
    net, opt = small_reference_net()
    cfg = ModelConfig(
        num_sample_coarse=opt.num_sample_coarse,
        featmap_size=opt.featmap_size,
        featmap_nc=opt.featmap_nc,
        pred_img_size=opt.pred_img_size,
        mlp_hidden=opt.mlp_hidden_nchannels,
        use_pallas=False,
    )
    model = GazeNeRF(cfg)
    params = gazenerf_params_from_torch(
        _torch_sd_to_numpy(net), n_blocks=cfg.n_upsample_blocks
    )
    return net, opt, model, cfg, params


def _random_inputs(rng, B, cfg):
    xy = np.asarray(pixel_grid(cfg.featmap_size))[None].repeat(B, 0)
    shape = (rng.standard_normal((B, 179)) * 0.1).astype(np.float32)
    appea = (rng.standard_normal((B, 127)) * 0.1).astype(np.float32)
    gaze = (rng.standard_normal((B, 2)) * 0.3).astype(np.float32)
    R, T, Kinv = _camera_inputs(B, cfg.featmap_size)
    return xy, shape, appea, gaze, R, T, Kinv


def _reference_forward(net, xy, shape, appea, gaze, R, T, Kinv, grad_wrt=None):
    xy_t = torch.from_numpy(xy.transpose(0, 2, 1))  # [B, 2, R]
    args = dict(
        batch_xy=xy_t,
        batch_uv=None,
        bg_code=None,
        shape_code=torch.from_numpy(shape),
        appea_code=torch.from_numpy(appea),
        gaze_code=torch.from_numpy(gaze),
        batch_Rmats=torch.from_numpy(R),
        batch_Tvecs=torch.from_numpy(T),
        batch_inv_inmats=torch.from_numpy(Kinv),
    )
    if grad_wrt is not None:
        args[grad_wrt] = args[grad_wrt].clone().requires_grad_(True)
    pred = net("test", **args)
    cd = pred["coarse_dict"]
    if grad_wrt is not None:
        loss = sum(v.sum() for v in cd.values())
        loss.backward()
        return cd, args[grad_wrt].grad.numpy()
    return cd, None


def test_full_model_pixel_parity(parity_setup, rng):
    net, opt, model, cfg, params = parity_setup
    B = 2
    xy, shape, appea, gaze, R, T, Kinv = _random_inputs(rng, B, cfg)

    with torch.no_grad():
        cd, _ = _reference_forward(net, xy, shape, appea, gaze, R, T, Kinv)

    out = model.apply(
        params, jnp.asarray(xy), jnp.asarray(shape), jnp.asarray(appea),
        jnp.asarray(gaze), jnp.asarray(R), jnp.asarray(T), jnp.asarray(Kinv),
        train=False,
    )
    ours = out["coarse_dict"]
    for k in ["merge_img", "merge_img_face", "merge_img_eyes", "bg_img"]:
        ref_img = cd[k].numpy().transpose(0, 2, 3, 1)
        got = np.asarray(ours[k])
        if k == "bg_img":
            ref_img = ref_img  # [1, H, W, 3] both
        np.testing.assert_allclose(got, ref_img, atol=2e-4, err_msg=k)


def test_full_model_gradient_parity(parity_setup, rng):
    """Gradient allclose wrt the shape code (the trained latent path)."""
    net, opt, model, cfg, params = parity_setup
    B = 1
    xy, shape, appea, gaze, R, T, Kinv = _random_inputs(rng, B, cfg)

    cd, grad_ref = _reference_forward(
        net, xy, shape, appea, gaze, R, T, Kinv, grad_wrt="shape_code"
    )

    def loss_fn(shape_code):
        out = model.apply(
            params, jnp.asarray(xy), shape_code, jnp.asarray(appea),
            jnp.asarray(gaze), jnp.asarray(R), jnp.asarray(T), jnp.asarray(Kinv),
            train=False,
        )
        return sum(jnp.sum(v) for v in out["coarse_dict"].values())

    grad_j = np.asarray(jax.grad(loss_fn)(jnp.asarray(shape)))
    # f32 accumulation order differs between XLA and torch through the deep
    # graph; require tight *relative L2* agreement plus a loose elementwise cap
    rel_l2 = np.linalg.norm(grad_j - grad_ref) / np.linalg.norm(grad_ref)
    assert rel_l2 < 2e-3, f"gradient relative L2 error {rel_l2}"
    np.testing.assert_allclose(grad_j, grad_ref, atol=0.05, rtol=2e-3)


def test_fold_feat_layer_exact():
    """Folding feat_layer per-phase before the blur-shuffle (stencil taps
    sum to 1, channel mixing commutes with per-channel taps) is exact in
    forward AND gradient, with an identical parameter tree."""
    from gazenerf_tpu.models.neural_renderer import NeuralRenderer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 16, 16, 66)).astype(np.float32))
    kw = dict(feat_nc=66, featmap_size=16, img_size=128, min_feat=8,
              shuffle_mode="phase_gm")
    m1 = NeuralRenderer(fold_feat_layer=False, **kw)
    m2 = NeuralRenderer(fold_feat_layer=True, **kw)
    p1 = m1.init({"params": jax.random.PRNGKey(0)}, x)
    p2 = m2.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    o1, o2 = m1.apply(p1, x), m2.apply(p1, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x) ** 2))(p1)
    g2 = jax.grad(lambda p: jnp.sum(m2.apply(p, x) ** 2))(p1)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
        )
