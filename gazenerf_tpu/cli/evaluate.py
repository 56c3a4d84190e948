"""``python -m gazenerf_tpu.cli.evaluate`` — demo GIF generation.

TPU twin of the reference ``evaluate.py``/``visualize.py``
(reference: evaluate.py:50-107, visualize.py:50-99): per subject, fit the
latents on one image, then render novel-view / gaze-sweep GIFs.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.cli.common import add_common_args, config_from_args
from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
from gazenerf_tpu.eval.render_loops import RenderLoops, save_gif
from gazenerf_tpu.train.checkpoint import load_checkpoint
from gazenerf_tpu.train.fitting import make_fit_single_image
from gazenerf_tpu.train.trainer import Trainer, compose_codes_and_cams

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Fit one image + render demo GIFs")
    add_common_args(p)
    p.add_argument("--subject", type=str, required=True)
    p.add_argument("--fit_steps", type=int, default=100)
    p.add_argument("--out_dir", type=str, default="logs")
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    logging.basicConfig(level=logging.INFO)

    ds = GazeH5Dataset(
        cfg.data.img_dir, subjects=[args.subject], dataset=cfg.data.dataset,
        shuffle=False,
    )
    loader = BatchLoader(ds, 1, num_workers=1)
    batch = next(iter(loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    trainer = Trainer(cfg, train_len=1, steps_per_epoch=1)
    if args.resume:
        trainer.state, _, _ = load_checkpoint(args.resume, trainer.state)

    fit = make_fit_single_image(
        cfg, trainer.model, trainer.frozen, trainer.expr_fix, args.fit_steps
    )
    state, losses = fit(trainer.state, jb)
    logger.info("fit loss: %.4f -> %.4f", float(losses[0]), float(losses[-1]))

    # compose the fitted codes for the render loops
    sc, ac, gz, _, _, _, _, _ = compose_codes_and_cams(
        cfg, {**jb, "sample_idx": jnp.zeros((1,), jnp.int32)},
        state.offsets, jnp.asarray(trainer.expr_fix),
    )
    loops = RenderLoops(cfg.model)
    params = {"params": state.params}
    os.makedirs(args.out_dir, exist_ok=True)
    key = os.path.splitext(args.subject)[0]

    frames = loops.render_novel_views(params, sc, ac, move_gaze=True)
    save_gif(os.path.join(args.out_dir, f"{key}_fitted_both.gif"), frames)
    frames = loops.render_gaze_sweep(params, sc, ac)
    save_gif(os.path.join(args.out_dir, f"{key}_fitted_gaze.gif"), frames)
    frames = loops.render_novel_views(params, sc, ac, move_gaze=False)
    save_gif(os.path.join(args.out_dir, f"{key}_fitted_head.gif"), frames)
    logger.info("GIFs written to %s", args.out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
