"""The GazeNeRF trainer: jitted train step + host-side epoch loop.

TPU re-design of the reference ``GazeNerfTrainer``
(reference: trainer/gazenerf_trainer.py:40-708, base loop trainer/base.py:133-167).
Everything inside :func:`make_train_step` is one jitted, shardable function:

* code composition ``base + offset[sample_idx]`` (reference
  ``build_code_and_cam`` :338-405) with the offsets gathered from dense
  per-sample tables by global id,
* camera perturbation ``R = dR(euler) @ R_base``, ``T = dR @ T_base + dT``,
* intrinsics rescale 512 -> featmap + analytic inverse (reference :317-328),
* forward render (stratified jitter keyed off the state PRNG),
* full loss stack + optional discriminator update,
* per-group Adam with the reference's per-epoch LR decay.

Host side: :class:`Trainer` drives epochs over a :class:`BatchLoader`,
accumulates CSV summaries, and checkpoints via orbax.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.config import Config
from gazenerf_tpu.losses.gazenerf_loss import compute_losses, discriminator_loss
from gazenerf_tpu.models.discriminator import PatchGAN
from gazenerf_tpu.models.gaze_nerf import GazeNeRF
from gazenerf_tpu.models.vgg import GazeVGG, VGG16Features
from gazenerf_tpu.ops.image import resize_bilinear
from gazenerf_tpu.ops.rays import pixel_grid
from gazenerf_tpu.ops.rotation import euler_to_rotation
from gazenerf_tpu.train import state as state_lib
from gazenerf_tpu.train.state import TrainState


def decode_uint8_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Normalize uint8 image/mask leaves to f32/255 INSIDE the jitted step.

    Pairs with ``GazeH5Dataset(device_decode=True)``: the loader ships
    uint8 pixels (4.2x fewer H2D bytes — the transfer payload is what gates
    loader-fed throughput on a bandwidth-limited link, PERF_NOTES.md round
    4) and the cast+scale fuses into the step's first consumers on device.
    f32(x)/255 reproduces the host-side conversion (same op, on device).

    Decoding is keyed on an explicit image/mask allowlist, NOT on dtype:
    reference-produced h5 files store ``cam_index``/``frame_index`` as uint8
    (reference dataset_pre_processing.py:263-270), and a dtype-keyed decode
    would silently turn those ids into ~0.01-scale floats for any consumer
    (the eval protocols read ``cam_index``)."""
    return {
        k: (
            v.astype(jnp.float32) / 255.0
            if v.dtype == jnp.uint8 and k in _UINT8_IMAGE_KEYS
            else v
        )
        for k, v in batch.items()
    }


_UINT8_IMAGE_KEYS = frozenset(
    k
    for base in ("image", "head_mask", "left_eye_mask", "right_eye_mask")
    for k in (base, "target_" + base)
)


def scale_intrinsics_jnp(inmat: jnp.ndarray, img_size: int, featmap_size: int):
    """jnp twin of data.cameras.scale_intrinsics_to_featmap (reference :317-325)."""
    s = featmap_size / img_size
    t = inmat.at[..., :2, :].multiply(s)
    inv = jnp.zeros_like(t)
    inv = inv.at[..., 0, 0].set(1.0 / t[..., 0, 0])
    inv = inv.at[..., 1, 1].set(1.0 / t[..., 1, 1])
    inv = inv.at[..., 0, 2].set(-(t[..., 0, 2] / t[..., 0, 0]))
    inv = inv.at[..., 1, 2].set(-(t[..., 1, 2] / t[..., 1, 1]))
    inv = inv.at[..., 2, 2].set(1.0)
    return inv


def compose_codes_and_cams(
    cfg: Config,
    batch: Dict[str, jnp.ndarray],
    offsets: Dict[str, jnp.ndarray],
    expr_fix: jnp.ndarray,
):
    """Reference ``prepare_data`` + ``build_code_and_cam`` (:250-405), jit-safe."""
    m = cfg.model
    code = batch["code"]
    idx = batch["sample_idx"]
    iden_off = offsets["iden"][idx]
    expr_off = offsets["expr"][idx]
    appea_off = offsets["appea"][idx]
    euler_off = offsets["euler"][idx]
    tvec_off = offsets["tvec"][idx]

    base_iden = code[:, : m.iden_code_dims]
    base_text = code[:, m.shape_code_dims : m.shape_code_dims + m.text_code_dims]
    base_illu = code[:, m.shape_code_dims + m.text_code_dims :]

    # expression frozen to the shared fix vector (reference :305-310)
    shape_code = jnp.concatenate(
        [base_iden + iden_off, expr_fix[None] + expr_off], axis=-1
    )
    appea_code = jnp.concatenate([base_text, base_illu], axis=-1) + appea_off
    gaze_code = batch["pitchyaw"]

    dR = euler_to_rotation(euler_off)
    Rmats = jnp.einsum("bij,bjk->bik", dR, batch["c2w_Rmat"], precision="highest")
    Tvecs = (
        jnp.einsum(
            "bij,bj->bi", dR, batch["c2w_Tvec"], precision="highest"
        )[..., None]
        + tvec_off
    )
    inv_inmats = scale_intrinsics_jnp(
        batch["inmat"], cfg.model.pred_img_size, cfg.model.featmap_size
    )

    opt_code_dict = {"bg": None, "iden": iden_off, "expr": expr_off, "appea": appea_off}
    delta_cam = {"delta_eulur": euler_off, "delta_tvec": tvec_off}
    return shape_code, appea_code, gaze_code, Rmats, Tvecs, inv_inmats, opt_code_dict, delta_cam


def _warn_random(which: str) -> None:
    import logging

    logging.getLogger(__name__).warning(
        "%s has NO checkpoint: random-initialized, numerically meaningless "
        "for a real training run (cli.train refuses this without "
        "--allow_random_frozen_nets)", which,
    )


def _torch_sd(path: str):
    """Load a torch checkpoint into a numpy state dict (reference stores the
    gaze-VGG under ``model_state`` — losses/gazenerf_loss.py:113-117)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict):
        sd = sd.get("model_state", sd.get("state_dict", sd))
    return {k.replace("module.", ""): v.numpy() for k, v in sd.items()}


class FrozenNets:
    """Frozen perceptual nets (VGG16 blocks, gaze estimator) + their params.

    The reference training loads pretrained torchvision VGG16 and the
    gaze-VGG checkpoint into its loss stack (reference
    losses/gazenerf_loss.py:49-52,110-117); pass ``cfg.loss.vgg_ckpt`` /
    ``cfg.loss.gaze_ckpt`` to transplant the same weights here.  Without
    checkpoints the nets are random-initialized (architecture-faithful but
    numerically meaningless for a real training run — tests only).
    """

    def __init__(self, cfg: Config, rng: jax.Array):
        self.cfg = cfg
        self.vgg = None
        self.vgg_params = None
        self.gaze = None
        self.gaze_params = None
        vgg_dtype = jnp.dtype(getattr(cfg.loss, "vgg_dtype", "float32"))
        if cfg.loss.use_vgg_loss:
            self.vgg = VGG16Features(dtype=vgg_dtype)
            if cfg.loss.vgg_ckpt:
                from gazenerf_tpu.models.vgg import vgg_features_from_torch

                self.vgg_params = {
                    "params": vgg_features_from_torch(_torch_sd(cfg.loss.vgg_ckpt))
                }
            else:
                _warn_random("VGG16 (perceptual loss)")
                k = jax.random.normal(rng, (1, 224, 224, 3))
                self.vgg_params = jax.jit(self.vgg.init)(rng, k)
        if cfg.loss.use_angular_loss:
            self.gaze = GazeVGG(dtype=vgg_dtype)
            if cfg.loss.gaze_ckpt:
                from gazenerf_tpu.models.vgg import gaze_vgg_from_torch

                self.gaze_params = {
                    "params": gaze_vgg_from_torch(_torch_sd(cfg.loss.gaze_ckpt))
                }
            else:
                _warn_random("gaze-VGG (angular loss)")
                k = jax.random.normal(rng, (1, 224, 224, 3))
                self.gaze_params = jax.jit(self.gaze.init)(rng, k)

    def vgg_capture_fn(self):
        if self.vgg is None:
            return None
        params = self.vgg_params
        return lambda x: self.vgg.apply(params, x)[0]

    def gaze_fn(self):
        if self.gaze is None:
            return None
        params = self.gaze_params
        return lambda x: self.gaze.apply(params, x)


def make_train_step(
    cfg: Config,
    model: GazeNeRF,
    optimizer,
    frozen: FrozenNets,
    expr_fix: np.ndarray,
    disc: Optional[PatchGAN] = None,
    disc_optimizer=None,
    donate: Optional[bool] = True,
    mesh=None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the jitted train step (loss + grads + per-group Adam update).

    ``donate=None`` returns the *unjitted* step body (for composition under
    ``lax.scan`` — see :func:`make_multi_step`).

    With ``mesh`` (axes ``("data", "ray")``), per-ray tensors are constrained
    to ``P("data", "ray")`` inside the step so the 4096-ray march shards over
    the ray axis in BOTH the forward and the backward (SURVEY.md §2.8: ray
    sharding is the SP/CP analogue — the per-ray sample scan stays chip-local,
    XLA inserts the featmap gather + gradient psum).
    """
    m = cfg.model
    xy_grid = np.asarray(pixel_grid(m.featmap_size))
    expr_fix = jnp.asarray(expr_fix, jnp.float32)
    bg_value = 1.0 if m.bg_type == "white" else 0.0

    def shard_rays(x):
        if mesh is None or "ray" not in mesh.axis_names:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", "ray"))
        )

    def step_fn(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        eye_imp: Optional[jnp.ndarray] = None,
    ):
        batch = decode_uint8_batch(batch)
        B = batch["image"].shape[0]
        xy = shard_rays(
            jnp.broadcast_to(jnp.asarray(xy_grid)[None], (B,) + xy_grid.shape)
        )
        rng = jax.random.fold_in(state.rng, state.step)

        gt = batch["image"]
        hm = batch["head_mask"][..., None]
        lm = batch["left_eye_mask"][..., None]
        rm = batch["right_eye_mask"][..., None]

        # Render ONCE, saving the vjp.  The reference renders a single
        # pred_dict, detaches it for the discriminator update, then feeds the
        # same (non-detached) render through the *updated* discriminator in
        # the generator loss (reference trainer/gazenerf_trainer.py:487-508).
        # jax.vjp gives the identical structure: the forward render happens
        # here, the disc update consumes the stop-gradded prediction, and the
        # generator gradient is pulled back through the saved vjp afterwards.
        def render_fn(trainable):
            sc, ac, gz, R, T, K, opt_code_dict, delta_cam = compose_codes_and_cams(
                cfg, batch, {k: trainable[k] for k in state.offsets}, expr_fix
            )
            pred = model.apply(
                {"params": trainable["net"]}, xy, sc, ac, gz, R, T, K,
                train=True, rngs={"sampling": rng},
            )
            return pred, opt_code_dict, delta_cam

        trainable = state_lib.trainable_tree(state)
        render_out, render_vjp = jax.vjp(render_fn, trainable)
        pred, _, _ = render_out

        # -- optional discriminator update on the detached prediction -------
        disc_fn = None
        d_loss = None
        new_disc_params = state.disc_params
        new_disc_stats = state.disc_batch_stats
        new_disc_opt = state.disc_opt_state
        if disc is not None and cfg.loss.use_patch_gan_loss:
            fake_img = jax.lax.stop_gradient(
                resize_bilinear(pred["coarse_dict"]["merge_img"], (224, 224))
            )
            nonhead3 = jnp.broadcast_to(hm < 0.5, gt.shape)
            real_img = resize_bilinear(jnp.where(nonhead3, 1.0, gt), (224, 224))

            def disc_loss_fn(dp):
                real_logits, vars1 = disc.apply(
                    {"params": dp, "batch_stats": state.disc_batch_stats},
                    real_img, train=True, mutable=["batch_stats"],
                )
                fake_logits, vars2 = disc.apply(
                    {"params": dp, "batch_stats": vars1["batch_stats"]},
                    fake_img, train=True, mutable=["batch_stats"],
                )
                return (
                    discriminator_loss(real_logits, fake_logits),
                    vars2["batch_stats"],
                )

            (d_loss, new_disc_stats), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(state.disc_params)
            d_updates, new_disc_opt = disc_optimizer.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            new_disc_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.disc_params, d_updates
            )

            dp, ds = new_disc_params, new_disc_stats
            disc_fn = lambda img: disc.apply(  # noqa: E731
                {"params": dp, "batch_stats": ds}, img, train=False
            )

        # -- generator / main update (loss on the saved render) -------------
        def loss_from_render(out):
            pred_, opt_code_dict, delta_cam = out
            losses = compute_losses(
                cfg.loss, pred_, gt, hm, lm, rm,
                bg_value=bg_value,
                eye_loss_importance=eye_imp,
                vgg_capture_fn=frozen.vgg_capture_fn(),
                gaze_fn=frozen.gaze_fn(),
                disc_fn=disc_fn,
                opt_code_dict=opt_code_dict,
                delta_cam=delta_cam,
                step=state.step,
            )
            return losses["total_loss"], losses

        (_, losses), cotangent = jax.value_and_grad(
            loss_from_render, has_aux=True
        )(render_out)
        if d_loss is not None:
            # surfaced for observability parity (the reference logs the
            # discriminator loss per step, trainer/gazenerf_trainer.py:508)
            losses["disc_patch_gan_loss"] = d_loss
        (grads,) = render_vjp(cotangent)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, trainable)
        new_trainable = jax.tree_util.tree_map(lambda p, u: p + u, trainable, updates)

        new_state = state_lib.apply_trainable(state, new_trainable).replace(
            step=state.step + 1,
            opt_state=new_opt_state,
            disc_params=new_disc_params,
            disc_batch_stats=new_disc_stats,
            disc_opt_state=new_disc_opt,
        )
        return new_state, losses

    if donate is None:  # unjitted body (for scan composition / explicit jit)
        return step_fn
    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)


def make_multi_step(step_body, donate: bool = True):
    """K train steps per dispatch: ``lax.scan`` of the step body over a
    stacked batch (leading axis K).

    One dispatch + one H2D transfer drive K optimizer steps, so per-dispatch
    host/link latency is paid once per K batches instead of per batch — the
    loader-fed path then tracks the scan-fed device truth (PERF_NOTES.md
    round 4; the reference pays a host sync every step,
    trainer/gazenerf_trainer.py:578, which a TPU-native trainer must not).
    Returns the final state and the FULL per-step loss dict (every leaf
    stacked to (K,)), kept on device so the epoch loop can accumulate — and
    the wandb observability path can log the per-loss scalars — without a
    host sync per step.
    """

    def multi_fn(state, stacked_batch, eye_imp=None):
        def body(s, b):
            s2, losses = step_body(s, b, eye_imp)
            return s2, losses

        state, losses = jax.lax.scan(body, state, stacked_batch)
        return state, losses

    if donate:
        return jax.jit(multi_fn, donate_argnums=(0,))
    return jax.jit(multi_fn)


def make_eval_step(cfg: Config, model: GazeNeRF, expr_fix: np.ndarray):
    """Jitted forward render + per-region L2 metrics (no update).

    Mirrors the reference's eval loop body (trainer/gazenerf_trainer.py:601-708).
    """
    m = cfg.model
    xy_grid = np.asarray(pixel_grid(m.featmap_size))
    expr_fix_j = jnp.asarray(expr_fix, jnp.float32)

    @jax.jit
    def eval_fn(state: TrainState, batch):
        from gazenerf_tpu.losses.gazenerf_loss import masked_mean, region_masks

        batch = decode_uint8_batch(batch)
        B = batch["image"].shape[0]
        xy = jnp.broadcast_to(jnp.asarray(xy_grid)[None], (B,) + xy_grid.shape)
        sc, ac, gz, R, T, K, _, _ = compose_codes_and_cams(
            cfg, batch, state.offsets, expr_fix_j
        )
        pred = model.apply({"params": state.params}, xy, sc, ac, gz, R, T, K)
        img = pred["coarse_dict"]["merge_img"]
        gt = batch["image"]
        mse = jnp.mean((img - gt) ** 2)
        psnr = -10.0 * jnp.log10(mse + 1e-10)
        # per-region losses, matching the reference eval epoch's breakdown
        # (trainer/gazenerf_trainer.py:601-708)
        masks = region_masks(
            batch["head_mask"][..., None],
            batch["left_eye_mask"][..., None],
            batch["right_eye_mask"][..., None],
        )
        err = (img - gt) ** 2
        out = {"mse": mse, "psnr": psnr}
        for name, m_ in masks.items():
            out[f"{name}_mse"] = masked_mean(err, m_)
        return out, pred["coarse_dict"]

    return eval_fn


class Trainer:
    """Host-side driver: epochs, logging, checkpointing.

    Reference twin: trainer/base.py:133-167 + gazenerf_trainer.py:536-599.
    """

    def __init__(
        self,
        cfg: Config,
        train_len: int,
        steps_per_epoch: int,
        expr_fix: Optional[np.ndarray] = None,
        seed: Optional[int] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        seed = cfg.train.seed if seed is None else seed
        self.model = GazeNeRF(cfg.model)
        rng = jax.random.PRNGKey(seed)
        self.rng, init_rng, frozen_rng = jax.random.split(rng, 3)
        self.expr_fix = (
            np.zeros(cfg.model.expr_code_dims, np.float32)
            if expr_fix is None
            else np.asarray(expr_fix, np.float32)
        )

        m = cfg.model
        B = cfg.train.batch_size
        xy = jnp.zeros((B, m.num_rays, 2))
        dummy = (
            xy,
            jnp.zeros((B, m.shape_code_dims)),
            jnp.zeros((B, m.appea_code_dims)),
            jnp.zeros((B, 2)),
            jnp.zeros((B, 3, 3)),
            jnp.zeros((B, 3, 1)),
            jnp.zeros((B, 3, 3)),
        )
        params = jax.jit(self.model.init)({"params": init_rng}, *dummy)["params"]

        self.frozen = FrozenNets(cfg, frozen_rng)
        self.optimizer = state_lib.make_optimizer(cfg.train, steps_per_epoch)
        offsets = state_lib.make_offsets(train_len)
        trainable = {"net": params, **offsets}
        opt_state = self.optimizer.init(trainable)

        disc = disc_opt = None
        disc_params = disc_stats = disc_opt_state = None
        if cfg.loss.use_patch_gan_loss:
            disc = PatchGAN()
            dvars = jax.jit(disc.init, static_argnames=("train",))(
                {"params": frozen_rng}, jnp.zeros((B, 224, 224, 3)), train=True
            )
            disc_params = dvars["params"]
            disc_stats = dvars["batch_stats"]
            disc_opt = state_lib.make_disc_optimizer(cfg.train)
            disc_opt_state = disc_opt.init(disc_params)
        self.disc = disc

        self.state = TrainState(
            step=jnp.asarray(0),
            params=params,
            offsets=offsets,
            opt_state=opt_state,
            rng=self.rng,
            disc_params=disc_params,
            disc_batch_stats=disc_stats,
            disc_opt_state=disc_opt_state,
        )
        self._step_body = make_train_step(
            cfg, self.model, self.optimizer, self.frozen, self.expr_fix,
            disc=disc, disc_optimizer=disc_opt, mesh=mesh, donate=None,
        )
        self.train_step = jax.jit(self._step_body, donate_argnums=(0,))
        self._multi_step = None  # built on first K>1 epoch
        self.eval_step = make_eval_step(cfg, self.model, self.expr_fix)
        self.history = []

    @property
    def multi_step(self):
        if self._multi_step is None:
            self._multi_step = make_multi_step(self._step_body)
        return self._multi_step

    def _to_device(self, stacked: bool = False):
        """Batch H2D placement: plain transfer single-device, row-sharded
        ``P("data")`` (with a leading dispatch axis when stacked) on a mesh;
        multi-host processes assemble the global batch from their local
        shard via ``make_array_from_process_local_data``."""
        if self.mesh is None:
            return None  # device_prefetch default: jnp.asarray per leaf
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, "data") if stacked else P("data")
        sh = NamedSharding(self.mesh, spec)
        if jax.process_count() > 1:
            return lambda b: {
                k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in b.items()
            }
        return lambda b: {k: jax.device_put(v, sh) for k, v in b.items()}

    def train_epoch(
        self,
        loader,
        epoch: int,
        wandb=None,
        log_images_every: int = 20,
    ) -> Dict[str, float]:
        """One epoch over ``loader``.

        Host-sync discipline (unlike the reference, which syncs every step via
        ``loss.item()`` — trainer/gazenerf_trainer.py:578): per-step losses
        stay on device and are reduced in ONE sync at epoch end, so dispatches
        pipeline freely through the device link.  With
        ``cfg.train.steps_per_dispatch = K > 1``, K loader batches are stacked
        into one transfer and one scan-of-K-steps dispatch
        (:func:`make_multi_step`); wandb logging then syncs once per dispatch,
        not per batch.
        """
        t0 = time.time()
        # gradual-loss schedule: the reference bumps eye_loss_importance by
        # +30 after every epoch (losses/gazenerf_loss.py:255-261, driven from
        # trainer/base.py:150-154); passed as a traced scalar — no recompile
        eye_imp = None
        if self.cfg.loss.is_gradual_loss:
            eye_imp = jnp.float32(
                self.cfg.loss.eye_loss_importance + 30.0 * epoch
            )
        from gazenerf_tpu.data.h5_dataset import device_prefetch, stack_batches

        K = max(1, self.cfg.train.steps_per_dispatch)
        td_one = self._to_device(stacked=False) or (
            lambda b: {k: jnp.asarray(v) for k, v in b.items()}
        )
        td_stack = self._to_device(stacked=True) or (
            lambda b: {k: jnp.asarray(v) for k, v in b.items()}
        )

        def to_dev(item):
            b, n_in = item
            return (td_stack(b) if n_in > 1 else td_one(b)), n_in

        gen = stack_batches(loader, K) if K > 1 else ((b, 1) for b in loader)

        loss_parts = []  # device scalars/vectors: reduced once at epoch end
        n = 0
        log_every = max(1, self.cfg.train.log_every)
        for jb, n_in in device_prefetch(gen, to_device=to_dev):
            if n_in > 1:
                self.state, losses = self.multi_step(self.state, jb, eye_imp)
                tl = losses["total_loss"]  # (K,) device vector
                loss_parts.append(tl)
                batch_loss = tl
                # slice out the last step only when the logging path below
                # actually consumes it (each slice is a device op)
                last_losses = (
                    {k: v[-1] for k, v in losses.items()}
                    if wandb is not None
                    else None
                )
                last_jb = (
                    {k: v[-1] for k, v in jb.items()}
                    if wandb is not None
                    else None
                )
            else:
                if eye_imp is None:
                    self.state, losses = self.train_step(self.state, jb)
                else:
                    self.state, losses = self.train_step(self.state, jb, eye_imp)
                loss_parts.append(losses["total_loss"])
                batch_loss = losses["total_loss"]
                last_losses = losses
                last_jb = jb
            # observability (the reference's main correctness instrument):
            # per-loss scalar dict every ``log_every`` batches (reference
            # trainer/gazenerf_trainer.py:584-591 via utils/logging.py
            # log_losses), the 5-panel image strip every N dispatches
            # (gazenerf_trainer.py:530-531 log_all_images).  Only the
            # logging path pays host syncs.
            if wandb is not None:
                from gazenerf_tpu.utils.logging import (
                    log_all_images,
                    log_losses,
                )

                wandb.log({"batch_loss": float(jnp.mean(batch_loss))})
                if (n // K) % max(1, log_every // K) == 0:
                    log_losses(
                        wandb, last_losses, self.cfg.loss, epoch=epoch
                    )
                if log_images_every and (n // K) % log_images_every == 0:
                    _, cd = self.eval_step(self.state, last_jb)
                    log_all_images(wandb, last_jb["image"], cd)
            n += n_in
        total = (
            float(jnp.concatenate([x.reshape(-1) for x in loss_parts]).sum())
            if loss_parts
            else 0.0
        )  # the epoch's ONE host sync
        if wandb is not None:
            # reference: epoch-mean scalar + the gradual-loss importance
            # (trainer/gazenerf_trainer.py:595-596, trainer/base.py:150-154)
            wandb.log({"Total Loss Epoch": total / max(n, 1)})
            if eye_imp is not None:
                wandb.log({"eye loss importance": float(eye_imp)})
        dt = time.time() - t0
        summary = {
            "epoch": epoch,
            "loss": total / max(n, 1),
            "batches": n,
            "seconds": dt,
        }
        self.history.append(summary)
        return summary

    def eval_epoch(self, loader, wandb=None, prefix: str = "VAL ") -> Dict[str, float]:
        """Validation epoch: per-region reconstruction metrics over a val
        loader, no parameter updates (reference eval epoch,
        trainer/gazenerf_trainer.py:601-708 — dead in the reference's
        default train.py, which passes valid_data_loader=None; live here).

        Metrics stay on device per batch and reduce in one host sync.
        """
        parts: Dict[str, list] = {}
        n = 0
        for b in loader:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            out, _ = self.eval_step(self.state, jb)
            for k, v in out.items():
                parts.setdefault(k, []).append(v)
            n += 1
        if not n:
            return {}
        means = {
            k: float(jnp.mean(jnp.stack(v))) for k, v in parts.items()
        }  # one sync
        if wandb is not None:
            wandb.log({prefix + k: v for k, v in means.items()})
        return means

    def fit(self, loader, num_epochs: int, checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 1):
        from gazenerf_tpu.train.checkpoint import save_checkpoint

        for epoch in range(num_epochs):
            summary = self.train_epoch(loader, epoch)
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_checkpoint(checkpoint_dir, self.state, self.cfg, epoch)
        return self.history

    def save_summary_csv(self, path: str):
        """CSV summaries (reference trainer/base.py:37-58)."""
        import csv

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not self.history:
            return
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(self.history[0]))
            w.writeheader()
            w.writerows(self.history)
