"""Misc coverage: face recognition, config serialization, CLI arg parsing."""

import numpy as np

import jax
import jax.numpy as jnp

from gazenerf_tpu.config import Config, ModelConfig


def test_identity_embedding(rng):
    from gazenerf_tpu.eval.metrics import identity_similarity
    from gazenerf_tpu.models import make_identity_embed_fn

    fn = make_identity_embed_fn()
    img = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    emb = fn(img)
    assert emb.shape == (2, 512)
    sim = identity_similarity(fn, img, img)
    np.testing.assert_allclose(np.asarray(sim), [1.0, 1.0], atol=1e-5)


def test_config_roundtrip():
    cfg = Config(model=ModelConfig(mlp_hidden=128, compute_dtype="bfloat16"))
    s = cfg.to_json()
    back = Config.from_json(s)
    assert back.model.mlp_hidden == 128
    assert back.model.compute_dtype == "bfloat16"
    assert back.model.vp_channels == cfg.model.vp_channels


def test_cli_arg_parsing():
    import argparse

    from gazenerf_tpu.cli.common import add_common_args, config_from_args, str2bool

    p = argparse.ArgumentParser()
    add_common_args(p)
    args = p.parse_args(
        ["--use_vgg_loss", "false", "--batch_size", "4", "--lr", "2e-4"]
    )
    cfg = config_from_args(args)
    assert cfg.loss.use_vgg_loss is False  # the reference's type=bool footgun, fixed
    assert cfg.train.batch_size == 4
    assert abs(cfg.train.lr - 2e-4) < 1e-12

    import pytest

    with pytest.raises(SystemExit):
        p.parse_args(["--use_vgg_loss", "maybe"])


def test_logging_helpers(tmp_path):
    from gazenerf_tpu.utils.logging import configure_logging, side_by_side, to_uint8

    configure_logging(str(tmp_path / "x.log"))
    a = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    u = to_uint8(a)
    assert u.dtype == np.uint8 and u.max() <= 255
    s = side_by_side(a, a, a)
    assert s.shape == (8, 24, 3)


def test_graft_entry_shapes():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    shapes = jax.eval_shape(fn, *args)
    assert shapes.shape == (1, 512, 512, 3)


def test_hier_sampling_and_include_vd_forward(rng):
    """The optional model variants (fixed hier sampling, view-dir cond) render."""
    from gazenerf_tpu.models.gaze_nerf import GazeNeRF
    from gazenerf_tpu.ops import pixel_grid

    cfg = ModelConfig(
        num_sample_coarse=8, num_sample_fine=4, featmap_size=8,
        pred_img_size=32, mlp_hidden=32, use_pallas=False,
        hier_sampling=True, include_vd=True,
    )
    model = GazeNeRF(cfg)
    B, W = 1, cfg.featmap_size
    xy = jnp.broadcast_to(jnp.asarray(np.asarray(pixel_grid(W)))[None], (B, W * W, 2))
    R = jnp.asarray(np.diag([1.0, -1.0, -1.0])[None].astype(np.float32))
    T3 = jnp.asarray(np.array([[0.0, 0.0, 12.0]], np.float32)).reshape(B, 3, 1)
    Kn = np.zeros((B, 3, 3), np.float32)
    Kn[:, 0, 0] = Kn[:, 1, 1] = 0.03
    Kn[:, 0, 2] = Kn[:, 1, 2] = -0.12
    Kn[:, 2, 2] = 1
    sc = jnp.zeros((B, 179))
    ac = jnp.zeros((B, 127))
    gz = jnp.zeros((B, 2))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, xy, sc, ac, gz, R, T3, jnp.asarray(Kn)
    )
    # the include_vd rgb_1 kernel rows include the vd-embed block
    k = variables["params"]["fg_CD_predictor_face"]["rgb_1/kernel"]
    assert k.shape[0] == 32 + 27 + 127  # hidden + vd_embed(4 freqs+input) + appea
    out = model.apply(variables, xy, sc, ac, gz, R, T3, jnp.asarray(Kn))
    assert "fine_dict" in out
    assert out["fine_dict"]["merge_img"].shape == (B, 32, 32, 3)
    assert np.isfinite(np.asarray(out["fine_dict"]["merge_img"])).all()
    # gradients flow through the fine path
    g = jax.grad(
        lambda v: jnp.sum(
            model.apply(v, xy, sc, ac, gz, R, T3, jnp.asarray(Kn))["fine_dict"]["merge_img"]
        )
    )(variables)
    leaves = jax.tree_util.tree_leaves(g["params"]["fine_fg_CD_predictor"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_viewer_server_end_to_end():
    """Viewer serves the page and renders PNGs over HTTP (tiny CPU config)."""
    import urllib.request

    from gazenerf_tpu.config import small_test_config
    from gazenerf_tpu.viewer import ViewerApp, lookat_camera, serve

    cfg = small_test_config()
    app = ViewerApp(cfg)
    server = serve(app, host="127.0.0.1", port=0, block=False)
    try:
        port = server.server_address[1]
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=60
        ).read()
        assert b"GazeNeRF viewer" in page
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?pitch=0.1&yaw=-0.2&az=10&el=5&dist=12",
            timeout=300,
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # a second render with different camera must differ (live control)
        png2 = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?pitch=0.1&yaw=-0.2&az=-30&el=5&dist=12",
            timeout=300,
        ).read()
        assert png2 != png
    finally:
        server.shutdown()

    # the look-at camera at the frontal pose matches the base demo camera
    import numpy as np
    from gazenerf_tpu.data.cameras import base_camera

    R, T, K = lookat_camera(0.0, 0.0, 12.0, cfg.model.featmap_size)
    base = base_camera(cfg.model.featmap_size)
    np.testing.assert_allclose(R, base["Rmats"], atol=1e-6)
    np.testing.assert_allclose(T, base["Tvecs"], atol=1e-6)


def test_render_fit_qa():
    """render_fit re-renders a finished NL-3DMM fit for visual QA (the
    reference's gen_nl3dmm_render_res.py loop)."""
    import numpy as np

    from gazenerf_tpu.nl3dmm.face_model import random_basis
    from gazenerf_tpu.nl3dmm.fitting import FitConfig, NL3DMMFitter
    from gazenerf_tpu.nl3dmm.rasterizer import RasterSettings

    fitter = NL3DMMFitter(
        random_basis(), FitConfig(image_size=32, stage1_steps=2, stage2_steps=2),
        RasterSettings(image_size=32),
    )
    rng = np.random.default_rng(0)
    B = 2
    imgs = rng.random((B, 32, 32, 3)).astype(np.float32)
    lms = rng.random((B, 68, 2)).astype(np.float32) * 32
    base_R = np.tile(np.diag([1.0, -1.0, -1.0]).astype(np.float32), (B, 1, 1))
    base_T = np.tile(np.array([0, 0, 12.0], np.float32), (B, 1))
    K = np.tile(np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32), (B, 1, 1))
    res = fitter.fit(imgs, lms, base_R, base_T, K)
    qa, alpha, lm2d = fitter.render_fit(res)
    assert qa.shape == (B, 32, 32, 3)
    assert np.isfinite(qa).all() and 0.0 <= qa.min() and qa.max() <= 1.0
    assert lm2d.shape == (B, 68, 2)


def test_eval_step_per_region_metrics():
    """make_eval_step reports per-region losses (reference eval epoch
    trainer/gazenerf_trainer.py:601-708)."""
    import numpy as np

    import jax.numpy as jnp

    import tempfile

    from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
    from gazenerf_tpu.data.synthetic import write_synthetic_subject
    from gazenerf_tpu.train.trainer import Trainer

    cfg = Config(
        model=ModelConfig(num_sample_coarse=8, featmap_size=16,
                          pred_img_size=64, mlp_hidden=32, use_pallas=False),
        loss=LossConfig(use_vgg_loss=False),
        train=TrainConfig(batch_size=2),
    )
    tr = Trainer(cfg, train_len=4, steps_per_epoch=1)
    d = tempfile.mkdtemp()
    write_synthetic_subject(d, num_frames=2, img_size=64)
    loader = BatchLoader(GazeH5Dataset(d, shuffle=False), batch_size=2)
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    metrics, cd = tr.eval_step(tr.state, batch)
    for k in ("mse", "psnr", "head_mse", "face_mse", "eyes_mse", "nonhead_mse"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert cd["merge_img"].shape == (2, 64, 64, 3)
