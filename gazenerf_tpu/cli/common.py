"""Shared CLI plumbing: argparse helpers, seeding, config assembly.

TPU twin of the reference's per-script argparse + determinism boilerplate
(reference: train.py:15-64, evaluate_metrics.py:21-55).  Fixes the
reference's ``type=bool`` footgun (any non-empty string parsed True) with a
real boolean parser, and replaces global-RNG seeding with explicit JAX keys.
"""

from __future__ import annotations

import argparse
from typing import Optional

from gazenerf_tpu.config import (
    Config,
    DataConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)


def str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "1"):
        return True
    if v.lower() in ("no", "false", "f", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--img_dir", type=str, default="", help="per-subject h5 dir")
    p.add_argument("--dataset", type=str, default="eth_xgaze",
                   choices=["eth_xgaze", "mpii_face_gaze", "columbia", "gaze_capture"])
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--step_decay", type=int, default=1000)
    p.add_argument("--num_epochs", type=int, default=2000)
    p.add_argument("--seed", type=int, default=45)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--resume", type=str, default="", help="checkpoint path")
    # loss-stack defaults mirror the reference train.py argparse block
    # (reference train.py:28,38-43; audited by tests/test_misc.py's
    # default-recipe table)
    p.add_argument("--use_vgg_loss", type=str2bool, default=True)
    p.add_argument("--use_l1_loss", type=str2bool, default=True)
    p.add_argument("--use_angular_loss", type=str2bool, default=False)
    p.add_argument("--use_patch_gan_loss", type=str2bool, default=False)
    p.add_argument("--is_gradual_loss", type=str2bool, default=False)
    p.add_argument("--eye_loss_importance", type=float, default=10.0)
    p.add_argument("--vgg_importance", type=float, default=1.0)
    p.add_argument("--hier_sampling", type=str2bool, default=False)
    p.add_argument("--include_vd", type=str2bool, default=False)
    # architecture scale (defaults = the flagship shape; small values give
    # smoke-test runs on any host)
    p.add_argument("--featmap_size", type=int, default=64)
    p.add_argument("--pred_img_size", type=int, default=512)
    p.add_argument("--num_sample_coarse", type=int, default=64)
    p.add_argument("--mlp_hidden", type=int, default=384)
    p.add_argument("--use_pallas", type=str2bool, default=True,
                   help="fused Pallas field kernels (TPU only; auto-falls "
                        "back to the XLA path elsewhere)")
    p.add_argument("--vgg_ckpt", type=str, default="",
                   help="torchvision VGG16 checkpoint: transplanted into the "
                        "frozen perceptual loss (training) and exact LPIPS "
                        "(eval) — reference losses/gazenerf_loss.py:49-52")
    p.add_argument("--gaze_ckpt", type=str, default="",
                   help="gaze-VGG checkpoint for the angular loss "
                        "(reference losses/gazenerf_loss.py:110-117)")
    p.add_argument("--allow_random_frozen_nets", type=str2bool, default=False,
                   help="let a perceptual/angular loss run against RANDOM "
                        "frozen nets (no --vgg_ckpt/--gaze_ckpt): numerically "
                        "meaningless for real training — tests/smoke only")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--renderer_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="train steps per device dispatch: K>1 stacks K "
                        "batches into one transfer + one scan-of-K jit, "
                        "hiding per-dispatch host latency (PERF_NOTES.md)")
    p.add_argument("--prefetch", type=int, default=4,
                   help="host-side batches buffered ahead of the device")
    p.add_argument("--log", type=str2bool, default=False, help="wandb logging")
    p.add_argument("--debug_nans", type=str2bool, default=False,
                   help="jax.config.debug_nans — the reference's "
                        "set_detect_anomaly analogue (SURVEY.md §5)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of the first epoch here")
    p.add_argument("--pallas_tuning", type=str, default="auto",
                   choices=["auto", "off"],
                   help="auto (default): apply the measured-best kernel "
                        "knobs for the run's shape (stash-acts backward + "
                        "TR16 at S<=64, recompute + ray-chunked deep march "
                        "at S>64 — the bench.py configs, PERF_NOTES.md); "
                        "off: library defaults (conservative tiles, no "
                        "stash).  All knobs are inert off-TPU.")


def check_frozen_ckpts(cfg: Config, allow_random: bool = False) -> None:
    """Refuse to train/fit against RANDOM frozen perceptual nets.

    The reference always loads pretrained weights into its loss stack
    (torchvision VGG16 at losses/gazenerf_loss.py:49-52, the gaze-VGG ckpt at
    :110-117); a run with ``use_vgg_loss``/``use_angular_loss`` but no
    checkpoint here would silently optimize against random features.  CLIs
    call this right after config assembly; ``--allow_random_frozen_nets``
    (tests/smoke) downgrades the error to a loud warning.
    """
    missing = []
    if cfg.loss.use_vgg_loss and not cfg.loss.vgg_ckpt:
        missing.append("--use_vgg_loss is on but no --vgg_ckpt was given")
    if cfg.loss.use_angular_loss and not cfg.loss.gaze_ckpt:
        missing.append("--use_angular_loss is on but no --gaze_ckpt was given")
    if not missing:
        return
    import logging

    if allow_random:
        for m in missing:
            logging.getLogger(__name__).warning(
                "%s: the frozen net is RANDOM-initialized — losses are "
                "numerically meaningless (allowed by "
                "--allow_random_frozen_nets)", m,
            )
        return
    raise SystemExit(
        "refusing to run with random frozen perceptual nets:\n  "
        + "\n  ".join(missing)
        + "\npass the checkpoint(s), turn the loss off, or (tests only) "
        "--allow_random_frozen_nets true"
    )


def apply_debug_flags(args) -> None:
    """Runtime debug/observability toggles (SURVEY.md §5: the planned
    jit-level NaN sanitizer + profiler wiring)."""
    import jax

    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)


def setup_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (first compile of the
    full-size model is ~20-40 s on TPU; cached reloads are sub-second).

    The reference has no analogue (PyTorch eager); for the CLI drivers this
    is the difference between instant and half-minute startups.
    """
    import os

    import jax

    cache_dir = cache_dir or os.environ.get(
        "GAZENERF_COMPILATION_CACHE", os.path.expanduser("~/.cache/gazenerf_tpu/xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def tuned_kernel_overrides(featmap_size: int, num_sample_coarse: int) -> dict:
    """Measured-best Pallas kernel knobs for a run shape (PERF_NOTES.md).

    These are exactly the configurations bench.py's phases run — without
    them a CLI user trains at the library's conservative defaults
    (~112 ms/step at the flagship shape vs the tuned 95.6).  All returned
    knobs are inert on non-TPU backends (the model falls back to the XLA
    path), so CPU tests/smoke runs are unaffected.

    * S <= 64 (the reference shape): stash-acts backward at bwd TR16 under
      a raised Mosaic VMEM cap, density head on the VPU (rounds 3-4).
    * S > 64 (deep marches): the stash loses (round 4; int8 stash loses
      harder, round 5) — recompute backward at bwd TR16 (round-5 tile
      sweep; TR32 exceeds physical VMEM) with 512-ray checkpointed chunks
      to bound the live footprint (free at S=256, round 4).
    """
    deep = num_sample_coarse > 64
    rays = featmap_size * featmap_size
    over = dict(
        pallas_dens_vpu=True,
        pallas_bwd_tile_rays=16,
        pallas_stash_acts=not deep,
        pallas_vmem_mb=110 if deep else 100,
    )
    if deep and rays > 512 and rays % 512 == 0:
        over["ray_chunk"] = 512
    return over


def config_from_args(args) -> Config:
    setup_compilation_cache()
    featmap_size = getattr(args, "featmap_size", 64)
    num_sample_coarse = getattr(args, "num_sample_coarse", 64)
    tuned = (
        tuned_kernel_overrides(featmap_size, num_sample_coarse)
        if getattr(args, "pallas_tuning", "auto") == "auto"
        else {}
    )
    return Config(
        model=ModelConfig(
            hier_sampling=args.hier_sampling,
            include_vd=args.include_vd,
            compute_dtype=args.compute_dtype,
            renderer_dtype=args.renderer_dtype,
            featmap_size=featmap_size,
            pred_img_size=getattr(args, "pred_img_size", 512),
            num_sample_coarse=num_sample_coarse,
            mlp_hidden=getattr(args, "mlp_hidden", 384),
            use_pallas=getattr(args, "use_pallas", True),
            **tuned,
        ),
        loss=LossConfig(
            eye_loss_importance=args.eye_loss_importance,
            vgg_importance=args.vgg_importance,
            use_vgg_loss=args.use_vgg_loss,
            use_l1_loss=args.use_l1_loss,
            use_angular_loss=args.use_angular_loss,
            use_patch_gan_loss=args.use_patch_gan_loss,
            is_gradual_loss=getattr(args, "is_gradual_loss", False),
            vgg_ckpt=getattr(args, "vgg_ckpt", ""),
            gaze_ckpt=getattr(args, "gaze_ckpt", ""),
        ),
        train=TrainConfig(
            lr=args.lr,
            step_decay=args.step_decay,
            batch_size=args.batch_size,
            num_epochs=args.num_epochs,
            seed=args.seed,
            checkpoint_dir=args.checkpoint_dir,
            steps_per_dispatch=getattr(args, "steps_per_dispatch", 1),
        ),
        data=DataConfig(
            dataset=args.dataset,
            img_dir=args.img_dir,
            num_workers=args.num_workers,
            prefetch=getattr(args, "prefetch", 4),
        ),
    )
