"""Single-image fitting, prediction, and gaze-code optimization.

TPU re-design of the reference's evaluation-time personalization loops
(reference: trainer/gazenerf_trainer.py:946-1026 ``train_single_image``,
:1028-1062 ``predict_single_image``, :1064-1246 ``optimize_gaze_direction``).

The reference replays its Python train loop once per step (one dataloader
pass + one optimizer step per iteration).  Here each loop is a single jitted
``lax.scan`` / ``lax.while_loop`` over the fixed image — hundreds of fitting
steps run on-device with one dispatch, which matters enormously through a
high-latency interconnect.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gazenerf_tpu.config import Config
from gazenerf_tpu.losses.gazenerf_loss import compute_losses
from gazenerf_tpu.models.gaze_nerf import GazeNeRF
from gazenerf_tpu.ops.rays import pixel_grid
from gazenerf_tpu.train import state as state_lib
from gazenerf_tpu.train.state import TrainState
from gazenerf_tpu.train.trainer import FrozenNets, compose_codes_and_cams


def _batch_with_offsets_idx0(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    b = dict(batch)
    B = batch["image"].shape[0]
    b["sample_idx"] = jnp.zeros((B,), jnp.int32)
    return b


def make_fit_single_image(
    cfg: Config,
    model: GazeNeRF,
    frozen: FrozenNets,
    expr_fix: np.ndarray,
    n_steps: int,
    lr: Optional[float] = None,
):
    """Jitted ``n_steps`` of latent-offset fitting on ONE image.

    Fits the per-sample offsets (iden/expr/appea/euler/tvec, all at row 0)
    and keeps the network frozen?  No — the reference fits net + offsets
    together (its param group includes ``net.parameters()``,
    trainer/gazenerf_trainer.py:463-474); we match that.  Returns
    ``(new_state, loss_history)``.
    """
    import dataclasses

    lr = cfg.train.lr if lr is None else lr
    xy_grid = np.asarray(pixel_grid(cfg.model.featmap_size))
    expr_fix_j = jnp.asarray(expr_fix, jnp.float32)
    bg_value = 1.0 if cfg.model.bg_type == "white" else 0.0
    optimizer = state_lib.make_optimizer(
        dataclasses.replace(cfg.train, lr=lr), steps_per_epoch=10**9
    )

    @jax.jit
    def fit(state: TrainState, batch: Dict[str, jnp.ndarray],
            gaze_override: Optional[jnp.ndarray] = None):
        batch = _batch_with_offsets_idx0(batch)
        B = batch["image"].shape[0]
        xy = jnp.broadcast_to(jnp.asarray(xy_grid)[None], (B,) + xy_grid.shape)
        gt = batch["image"]
        hm = batch["head_mask"][..., None]
        lm = batch["left_eye_mask"][..., None]
        rm = batch["right_eye_mask"][..., None]

        trainable0 = state_lib.trainable_tree(state)
        opt_state = optimizer.init(trainable0)

        def loss_fn(trainable, rng):
            sc, ac, gz, R, T, K, opt_code_dict, delta_cam = compose_codes_and_cams(
                cfg, batch, {k: trainable[k] for k in state.offsets}, expr_fix_j
            )
            if gaze_override is not None:
                gz = jnp.broadcast_to(gaze_override.reshape(1, 2), gz.shape)
            pred = model.apply(
                {"params": trainable["net"]}, xy, sc, ac, gz, R, T, K,
                train=True, rngs={"sampling": rng},
            )
            losses = compute_losses(
                cfg.loss, pred, gt, hm, lm, rm, bg_value=bg_value,
                vgg_capture_fn=frozen.vgg_capture_fn(),
                gaze_fn=frozen.gaze_fn(),
                opt_code_dict=opt_code_dict, delta_cam=delta_cam,
            )
            return losses["total_loss"]

        def body(carry, i):
            trainable, opt_state = carry
            rng = jax.random.fold_in(state.rng, i)
            loss, grads = jax.value_and_grad(loss_fn)(trainable, rng)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = jax.tree_util.tree_map(lambda p, u: p + u, trainable, updates)
            return (trainable, opt_state), loss

        (trainable, _), losses = jax.lax.scan(
            body, (trainable0, opt_state), jnp.arange(n_steps)
        )
        return state_lib.apply_trainable(state, trainable), losses

    return fit


def make_predict_single_image(cfg: Config, model: GazeNeRF, expr_fix: np.ndarray):
    """Jitted forward render with composed codes (reference :1028-1062).

    ``gaze_override`` (optional ``[2]``) redirects the gaze — the core
    gaze-redirection primitive of the framework.
    """
    xy_grid = np.asarray(pixel_grid(cfg.model.featmap_size))
    expr_fix_j = jnp.asarray(expr_fix, jnp.float32)

    @jax.jit
    def predict(state: TrainState, batch, gaze_override: Optional[jnp.ndarray] = None):
        batch = _batch_with_offsets_idx0(batch)
        B = batch["image"].shape[0]
        xy = jnp.broadcast_to(jnp.asarray(xy_grid)[None], (B,) + xy_grid.shape)
        sc, ac, gz, R, T, K, _, _ = compose_codes_and_cams(
            cfg, batch, state.offsets, expr_fix_j
        )
        if gaze_override is not None:
            gz = jnp.broadcast_to(gaze_override.reshape(1, 2), gz.shape)
        pred = model.apply({"params": state.params}, xy, sc, ac, gz, R, T, K)
        return pred["coarse_dict"]["merge_img"]

    return predict


def make_optimize_gaze(
    cfg: Config,
    model: GazeNeRF,
    frozen: FrozenNets,
    expr_fix: np.ndarray,
    max_steps: int = 500,
    patience: int = 35,
    lr: float = 0.01,
):
    """Gradient-descent gaze-code recovery with early-stop patience.

    Reference :1064-1246: Adam(0.01) on the 2-vector gaze alone, tracking the
    best loss, stopping after ``patience`` non-improving steps.  Implemented
    as one jitted ``lax.while_loop`` (the early stop is data-dependent, so a
    while_loop — not scan — is the XLA-correct construct).
    Returns ``(best_gaze [2], best_loss, steps_run)``.
    """
    xy_grid = np.asarray(pixel_grid(cfg.model.featmap_size))
    expr_fix_j = jnp.asarray(expr_fix, jnp.float32)
    bg_value = 1.0 if cfg.model.bg_type == "white" else 0.0
    opt = optax.adam(lr, b1=cfg.train.adam_b1, b2=cfg.train.adam_b2)

    @jax.jit
    def optimize(state: TrainState, batch, gaze_init: jnp.ndarray):
        batch = _batch_with_offsets_idx0(batch)
        B = batch["image"].shape[0]
        xy = jnp.broadcast_to(jnp.asarray(xy_grid)[None], (B,) + xy_grid.shape)
        gt = batch["image"]
        hm = batch["head_mask"][..., None]
        lm = batch["left_eye_mask"][..., None]
        rm = batch["right_eye_mask"][..., None]

        def loss_fn(gaze):
            sc, ac, _, R, T, K, opt_code_dict, delta_cam = compose_codes_and_cams(
                cfg, batch, state.offsets, expr_fix_j
            )
            gz = jnp.broadcast_to(gaze.reshape(1, 2), (B, 2))
            pred = model.apply({"params": state.params}, xy, sc, ac, gz, R, T, K)
            losses = compute_losses(
                cfg.loss, pred, gt, hm, lm, rm, bg_value=bg_value,
                vgg_capture_fn=frozen.vgg_capture_fn(),
                opt_code_dict=opt_code_dict, delta_cam=delta_cam,
            )
            return losses["total_loss"]

        gaze0 = gaze_init.reshape(2).astype(jnp.float32)
        carry0 = (
            gaze0, opt.init(gaze0),
            jnp.asarray(jnp.inf, jnp.float32),  # best loss (ref starts at 100.0)
            gaze0,  # best gaze
            jnp.asarray(0, jnp.int32),  # non-improving count
            jnp.asarray(0, jnp.int32),  # step
        )

        def cond(c):
            _, _, _, _, bad, step = c
            return (bad <= patience) & (step < max_steps)

        def body(c):
            gaze, ost, best_loss, best_gaze, bad, step = c
            loss, g = jax.value_and_grad(loss_fn)(gaze)
            upd, ost = opt.update(g, ost, gaze)
            gaze = gaze + upd
            improved = loss < best_loss
            best_loss = jnp.where(improved, loss, best_loss)
            best_gaze = jnp.where(improved, gaze, best_gaze)
            bad = jnp.where(improved, 0, bad + 1)
            return (gaze, ost, best_loss, best_gaze, bad, step + 1)

        _, _, best_loss, best_gaze, _, steps = jax.lax.while_loop(cond, body, carry0)
        return best_gaze, best_loss, steps

    return optimize
