"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

The fake-multi-device harness the reference never needed (SURVEY.md §4):
verifies the train step compiles + executes SPMD over a ("data","ray") mesh
and that sharded results match single-device results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
from gazenerf_tpu.data.synthetic import write_synthetic_subject
from gazenerf_tpu.parallel.mesh import make_mesh
from gazenerf_tpu.parallel.sharding import shard_state, state_shardings
from gazenerf_tpu.train.trainer import Trainer


def tiny_config(batch: int) -> Config:
    return Config(
        model=ModelConfig(
            num_sample_coarse=8, featmap_size=16, pred_img_size=64,
            mlp_hidden=32, use_pallas=False,
        ),
        # MSE region losses: these tests assert cross-sharding numerical
        # equality, and the L1 recipe default's sign(d) gradient flips under
        # last-bit reassociation near d=0 (see test_train.tiny_config)
        loss=LossConfig(use_vgg_loss=False, use_l1_loss=False),
        train=TrainConfig(batch_size=batch, lr=1e-3),
    )


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth8")
    write_synthetic_subject(str(d), num_frames=8, img_size=64)
    ds = GazeH5Dataset(str(d), shuffle=False)
    return ds


def test_mesh_shape():
    mesh = make_mesh(data_parallel=4, ray_parallel=2)
    assert mesh.shape == {"data": 4, "ray": 2}
    mesh = make_mesh(ray_parallel=2)
    assert mesh.shape["data"] * 2 == len(jax.devices())


def test_sharded_train_step_runs_and_matches(synth):
    """Same batch: 8-way data-sharded step == single-device step."""
    ds = synth
    cfg = tiny_config(batch=8)
    loader = BatchLoader(ds, batch_size=8, num_workers=1)
    batch = next(iter(loader))

    # single-device result
    tr1 = Trainer(cfg, train_len=len(ds), steps_per_epoch=1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, losses1 = tr1.train_step(tr1.state, jb)

    # sharded: same init, data-sharded batch
    tr2 = Trainer(cfg, train_len=len(ds), steps_per_epoch=1)
    mesh = make_mesh(data_parallel=8, ray_parallel=1)
    state = shard_state(mesh, tr2.state, shard_offsets=True)
    row = NamedSharding(mesh, P("data"))
    jb2 = {k: jax.device_put(np.asarray(v), row) for k, v in batch.items()}
    s2, losses2 = tr2.train_step(state, jb2)

    assert np.isfinite(float(losses2["total_loss"]))
    np.testing.assert_allclose(
        float(losses1["total_loss"]), float(losses2["total_loss"]), rtol=1e-4
    )
    a = np.asarray(s1.offsets["iden"])
    b = np.asarray(s2.offsets["iden"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_ray_sharded_forward(synth):
    """Rays sharded over the 'ray' axis: featmap render matches replicated."""
    from gazenerf_tpu.models.gaze_nerf import GazeNeRF
    from gazenerf_tpu.ops import pixel_grid

    cfg = tiny_config(batch=2).model
    model = GazeNeRF(cfg)
    B, W = 2, cfg.featmap_size
    xy = jnp.broadcast_to(jnp.asarray(np.asarray(pixel_grid(W)))[None], (B, W * W, 2))
    R = jnp.asarray(np.diag([1.0, -1.0, -1.0])[None].repeat(B, 0).astype(np.float32))
    T3 = jnp.asarray(np.tile(np.array([0.0, 0.0, 12.0], np.float32), (B, 1))).reshape(B, 3, 1)
    Kn = np.zeros((B, 3, 3), np.float32)
    Kn[:, 0, 0] = Kn[:, 1, 1] = 0.05
    Kn[:, 0, 2] = Kn[:, 1, 2] = -0.4
    Kn[:, 2, 2] = 1
    K = jnp.asarray(Kn)
    sc, ac, gz = jnp.zeros((B, 179)), jnp.zeros((B, 127)), jnp.zeros((B, 2))
    params = model.init({"params": jax.random.PRNGKey(0)}, xy, sc, ac, gz, R, T3, K)

    ref = model.apply(params, xy, sc, ac, gz, R, T3, K)["coarse_dict"]["merge_img"]

    mesh = make_mesh(data_parallel=2, ray_parallel=4)
    ray_sh = NamedSharding(mesh, P("data", "ray"))
    xy_sharded = jax.device_put(xy, ray_sh)
    fwd = jax.jit(
        lambda p, xy: model.apply(p, xy, sc, ac, gz, R, T3, K)["coarse_dict"]["merge_img"]
    )
    out = fwd(params, xy_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ray_sharded_train_step_matches(synth):
    """The mesh-aware TRAIN step (per-ray tensors constrained to
    P("data","ray"), fwd+bwd) equals the single-device step — the SP/CP
    analogue demonstrated in training, not just a forward (SURVEY.md §2.8)."""
    ds = synth
    cfg = tiny_config(batch=4)
    loader = BatchLoader(ds, batch_size=4, num_workers=1)
    batch = next(iter(loader))

    tr1 = Trainer(cfg, train_len=len(ds), steps_per_epoch=1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, losses1 = tr1.train_step(tr1.state, jb)

    mesh = make_mesh(data_parallel=4, ray_parallel=2)
    tr2 = Trainer(cfg, train_len=len(ds), steps_per_epoch=1, mesh=mesh)
    state = shard_state(mesh, tr2.state, shard_offsets=True)
    row = NamedSharding(mesh, P("data"))
    jb2 = {k: jax.device_put(np.asarray(v), row) for k, v in batch.items()}
    s2, losses2 = tr2.train_step(state, jb2)

    np.testing.assert_allclose(
        float(losses1["total_loss"]), float(losses2["total_loss"]), rtol=1e-4
    )
    # updated params must match too (the backward ran ray-sharded)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(s1.offsets["iden"]), np.asarray(s2.offsets["iden"]), atol=1e-5
    )


def test_make_sharded_train_step_explicit_shardings(synth):
    """make_sharded_train_step declares in_shardings explicitly and its
    results match the plain step; the opt-state classifier row-shards the
    offset Adam moments by tree path (not shape coincidence)."""
    from gazenerf_tpu.train.trainer import make_train_step
    from gazenerf_tpu.parallel.sharding import (
        make_sharded_train_step,
        state_shardings,
    )

    ds = synth
    cfg = tiny_config(batch=8)
    loader = BatchLoader(ds, batch_size=8, num_workers=1)
    batch = next(iter(loader))

    tr = Trainer(cfg, train_len=len(ds), steps_per_epoch=1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, losses1 = tr.train_step(tr.state, jb)

    tr2 = Trainer(cfg, train_len=len(ds), steps_per_epoch=1)
    mesh = make_mesh(data_parallel=8, ray_parallel=1)
    # verify opt-state sharding classification by path
    sh = state_shardings(mesh, tr2.state)
    flat = jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]
    row_count = sum(
        1 for path, s in flat if s.spec == P("data")
    )
    # 5 offset tables x 2 Adam moments = 10 row-sharded leaves
    assert row_count == 10, row_count

    step_body = make_train_step(
        cfg, tr2.model, tr2.optimizer, tr2.frozen, tr2.expr_fix, donate=False
    )
    # unjitted body: make_train_step returns a jitted fn; use its wrapped body
    body = step_body.__wrapped__ if hasattr(step_body, "__wrapped__") else step_body
    state = shard_state(mesh, tr2.state)
    run = make_sharded_train_step(mesh, body, tr2.state, batch)
    s2, losses2 = run(state, batch)
    np.testing.assert_allclose(
        float(losses1["total_loss"]), float(losses2["total_loss"]), rtol=1e-4
    )
