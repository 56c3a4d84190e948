"""``python -m gazenerf_tpu.cli.train`` — the training entry point.

TPU twin of the reference ``train.py`` (reference: train.py:50-131): builds
the data loader, trainer, runs epochs with checkpointing + CSV summaries and
a final throughput report.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

from gazenerf_tpu.cli.common import (
    add_common_args,
    apply_debug_flags,
    config_from_args,
)
from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
from gazenerf_tpu.train.trainer import Trainer
from gazenerf_tpu.utils.logging import configure_logging, maybe_wandb_init

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    from gazenerf_tpu.cli.common import str2bool

    p = argparse.ArgumentParser(description="Train GazeNeRF-TPU")
    add_common_args(p)
    p.add_argument("--subject", type=str, default=None,
                   help="restrict to a single subject file")
    p.add_argument("--val_dir", type=str, default="",
                   help="per-subject h5 dir for a per-epoch validation "
                        "epoch (per-region metrics, no updates — the "
                        "reference's eval epoch, gazenerf_trainer.py:601)")
    p.add_argument("--num_val_images", type=int, default=200,
                   help="val frames per subject (reference train.py:23)")
    # -- multi-chip / multi-host launch (SURVEY.md §2.8; the reference is
    # single-GPU, train.py:86-88 — every flag below is new TPU-first design)
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh axis (0 = all remaining devices); "
                        "dp*rp devices form the ('data','ray') mesh")
    p.add_argument("--rp", type=int, default=1,
                   help="ray-parallel mesh axis (shards the per-image ray "
                        "march; no collectives until the featmap gather)")
    p.add_argument("--coordinator", type=str, default="",
                   help="jax.distributed coordinator address (multi-host)")
    p.add_argument("--num_processes", type=int, default=0,
                   help="total train processes (multi-host); each process "
                        "loads its disjoint row slice of every global batch")
    p.add_argument("--process_id", type=int, default=-1)
    p.add_argument("--shard_offsets", type=str2bool, default=True,
                   help="row-shard the per-sample latent-offset tables over "
                        "the data axis (their grads are row-disjoint)")
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    from gazenerf_tpu.cli.common import check_frozen_ckpts

    check_frozen_ckpts(cfg, args.allow_random_frozen_nets)
    apply_debug_flags(args)

    # multi-host first (must precede any backend use), then the mesh
    from gazenerf_tpu.parallel.mesh import init_distributed, make_mesh

    if args.num_processes and args.num_processes > 1:
        init_distributed(args.coordinator, args.num_processes, args.process_id)
    import jax

    mesh = None
    if args.dp != 1 or args.rp != 1:
        mesh = make_mesh(data_parallel=args.dp, ray_parallel=args.rp)
        from gazenerf_tpu.config import ParallelConfig

        cfg = cfg.replace(parallel=ParallelConfig(
            data_parallel=mesh.shape["data"],
            ray_parallel=mesh.shape["ray"],
            shard_offsets=args.shard_offsets,
        ))
        assert cfg.train.batch_size % mesh.shape["data"] == 0, (
            f"batch_size {cfg.train.batch_size} not divisible by the "
            f"data-parallel axis {mesh.shape['data']}"
        )

    configure_logging(os.path.join(cfg.train.checkpoint_dir, "train.log"))
    wandb = maybe_wandb_init(args.log, config=cfg.to_json())

    ds = GazeH5Dataset(
        cfg.data.img_dir,
        subjects=[args.subject] if args.subject else None,
        dataset=cfg.data.dataset,
        frames_per_subject=cfg.data.frames_per_subject,
        seed=cfg.train.seed,
        # uint8 on the wire, normalized inside the jitted step (4.2x fewer
        # H2D bytes; train/trainer.py decode_uint8_batch)
        device_decode=True,
    )
    shard = None
    if jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    loader = BatchLoader(
        ds, cfg.train.batch_size, num_workers=cfg.data.num_workers,
        prefetch=cfg.data.prefetch, process_shard=shard,
    )
    logger.info("dataset: %d samples, %d batches/epoch", len(ds), len(loader))
    val_loader = None
    if args.val_dir and jax.process_count() > 1:
        logger.warning("--val_dir is single-process only for now; skipping")
    elif args.val_dir:
        val_ds = GazeH5Dataset(
            args.val_dir, dataset=cfg.data.dataset, split="val",
            num_val_images=args.num_val_images, shuffle=False,
            device_decode=True,
        )
        val_loader = BatchLoader(
            val_ds, cfg.train.batch_size, num_workers=cfg.data.num_workers,
            prefetch=cfg.data.prefetch, drop_last=False,
        )
        logger.info("val dataset: %d samples", len(val_ds))
    if mesh is not None:
        logger.info(
            "mesh: data=%d x ray=%d over %d devices (%d processes)",
            mesh.shape["data"], mesh.shape["ray"], mesh.size,
            jax.process_count(),
        )

    trainer = Trainer(cfg, train_len=len(ds), steps_per_epoch=len(loader),
                      mesh=mesh)
    if mesh is not None:
        from gazenerf_tpu.parallel.sharding import shard_state

        shard_offsets = cfg.parallel.shard_offsets
        if shard_offsets and jax.process_count() > 1:
            # row-sharding the offset tables would device_put onto
            # non-addressable devices; replicate them across hosts instead
            # (their grads stay row-disjoint either way)
            logger.info("multi-host run: replicating offset tables")
            shard_offsets = False
        trainer.state = shard_state(
            mesh, trainer.state, shard_offsets=shard_offsets
        )
    if args.resume:
        from gazenerf_tpu.train.checkpoint import load_checkpoint

        trainer.state, _, start_epoch = load_checkpoint(args.resume, trainer.state)
        logger.info("resumed from %s (epoch %d)", args.resume, start_epoch)

    t0 = time.time()
    total_samples = 0
    for epoch in range(cfg.train.num_epochs):
        # profiler trace of the first epoch (SURVEY.md §5 tracing analogue)
        if args.profile_dir and epoch == 0:
            import jax

            jax.profiler.start_trace(args.profile_dir)
        summary = trainer.train_epoch(loader, epoch, wandb=wandb)
        if args.profile_dir and epoch == 0:
            import jax

            jax.profiler.stop_trace()
            logger.info("profiler trace -> %s", args.profile_dir)
        total_samples += summary["batches"] * cfg.train.batch_size
        logger.info(
            "epoch %d: loss %.5f (%d batches, %.1fs)",
            epoch, summary["loss"], summary["batches"], summary["seconds"],
        )
        if wandb is not None:
            wandb.log({"epoch": epoch, "loss": summary["loss"]})
        if val_loader is not None:
            val = trainer.eval_epoch(val_loader, wandb=wandb)
            logger.info(
                "epoch %d val: %s", epoch,
                " ".join(f"{k}={v:.4f}" for k, v in sorted(val.items())),
            )
        if (epoch + 1) % cfg.train.checkpoint_every == 0:
            from gazenerf_tpu.train.checkpoint import save_checkpoint

            path = save_checkpoint(cfg.train.checkpoint_dir, trainer.state, cfg, epoch)
            logger.info("checkpoint -> %s", path)

    dt = time.time() - t0
    trainer.save_summary_csv(
        os.path.join(cfg.train.checkpoint_dir, "summary.csv")
    )
    logger.info(
        "done: %d samples in %.1fs (%.2f samples/s)",
        total_samples, dt, total_samples / max(dt, 1e-9),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
