"""``python -m gazenerf_tpu.cli.evaluate`` — demo GIF generation.

TPU twin of the reference ``evaluate.py`` (reference: evaluate.py:50-107,
158-172): iterate the requested subject keys (the val split by default, like
the reference's ``for subject in val_keys: process(args, subject)``), fit
the latents on ONE chosen frame per subject (``--fixed_index``, the
reference's ``dataloader.dataset.modify_index(index)`` +
``train_single_image`` one_fit flow), then render the three demo GIFs per
subject with the reference's names: ``{key}_{fitted|not_fitted}_{both,gaze,
head}.gif`` (reference trainer/gazenerf_trainer.py:890-943).
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp

from gazenerf_tpu.cli.common import (
    add_common_args,
    check_frozen_ckpts,
    config_from_args,
    str2bool,
)
from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
from gazenerf_tpu.eval.render_loops import RenderLoops, save_gif
from gazenerf_tpu.train.checkpoint import load_checkpoint
from gazenerf_tpu.train.fitting import make_fit_single_image
from gazenerf_tpu.train.trainer import Trainer, compose_codes_and_cams

logger = logging.getLogger(__name__)


def add_eval_args(p: argparse.ArgumentParser, default_split: str) -> None:
    p.add_argument("--subject", type=str, default="",
                   help="one subject file; default = every subject in "
                        "--split (train_test_split.json when present)")
    p.add_argument("--split", type=str, default=default_split,
                   choices=["train", "val"],
                   help="which split's keys to iterate when no --subject "
                        "(reference evaluate.py iterates val_keys, "
                        "visualize.py train_keys)")
    p.add_argument("--fixed_index", type=int, default=0,
                   help="dataset frame to fit + render per subject "
                        "(reference modify_index/train_single_image index)")
    p.add_argument("--fit", type=str2bool, default=True,
                   help="fit the latent offsets before rendering; false = "
                        "the reference's val/'not_fitted' flow "
                        "(evaluate.py:67-69)")
    p.add_argument("--fit_steps", type=int, default=100)
    p.add_argument("--view_num", type=int, default=45,
                   help="orbit cameras per GIF (reference RenderUtils default)")
    p.add_argument("--out_dir", type=str, default="logs")


def process_subject(cfg, trainer, fit, loops, subject: str, args) -> None:
    """Fit one frame of ``subject`` and write the three reference-named GIFs
    (reference evaluate.py:50-107 ``process`` + gazenerf_trainer.py:890-943
    ``evaluate_single_image``)."""
    ds = GazeH5Dataset(
        cfg.data.img_dir, subjects=[subject], dataset=cfg.data.dataset,
        shuffle=False, fixed_index=args.fixed_index,
    )
    loader = BatchLoader(ds, 1, num_workers=1, drop_last=False)
    batch = next(iter(loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    # offsets are indexed per dataset row; pin the fitted row to slot 0
    jb["sample_idx"] = jnp.zeros((1,), jnp.int32)

    state = trainer.state
    fit_name = "not_fitted"
    if args.fit:
        state, losses = fit(state, jb)
        fit_name = "fitted"
        logger.info(
            "%s[%d] fit loss: %.4f -> %.4f",
            subject, args.fixed_index, float(losses[0]), float(losses[-1]),
        )

    sc, ac, gz, _, _, _, _, _ = compose_codes_and_cams(
        cfg, jb, state.offsets, jnp.asarray(trainer.expr_fix)
    )
    params = {"params": state.params}
    key = os.path.splitext(subject)[0]

    frames = loops.render_novel_views(params, sc, ac, move_gaze=True)
    save_gif(os.path.join(args.out_dir, f"{key}_{fit_name}_both.gif"), frames)
    frames = loops.render_gaze_sweep(params, sc, ac)
    save_gif(os.path.join(args.out_dir, f"{key}_{fit_name}_gaze.gif"), frames)
    frames = loops.render_novel_views(params, sc, ac, move_gaze=False)
    save_gif(os.path.join(args.out_dir, f"{key}_{fit_name}_head.gif"), frames)
    logger.info("GIFs for %s -> %s", key, args.out_dir)


def run(args) -> int:
    cfg = config_from_args(args)
    check_frozen_ckpts(cfg, args.allow_random_frozen_nets)
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.subject:
        subjects = [args.subject]
    else:
        probe = GazeH5Dataset(
            cfg.data.img_dir, dataset=cfg.data.dataset, split=args.split,
            shuffle=False,
        )
        subjects = probe.subjects
        probe.close()
    logger.info("%d subject(s) from split %r", len(subjects), args.split)

    trainer = Trainer(cfg, train_len=1, steps_per_epoch=1)
    if args.resume:
        trainer.state, _, _ = load_checkpoint(args.resume, trainer.state)

    fit = make_fit_single_image(
        cfg, trainer.model, trainer.frozen, trainer.expr_fix, args.fit_steps
    )
    # one RenderLoops (one jitted render closure) shared across subjects
    loops = RenderLoops(cfg.model, view_num=args.view_num)
    for subject in subjects:
        process_subject(cfg, trainer, fit, loops, subject, args)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Fit subjects + render demo GIFs")
    add_common_args(p)
    add_eval_args(p, default_split="val")
    return run(p.parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
