"""``python -m gazenerf_tpu.cli.viewer`` — interactive browser viewer.

TPU twin of the reference's PyQt5 GUI (reference: utils/vis_utils.py:101-535):
sliders for gaze + orbit camera driving a live render, served as a web page
(TPU hosts are headless).  Optionally fits a subject image first
(``--img_dir --subject``) so the view shows a real identity; otherwise
renders the randomly-initialized model.
"""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.cli.common import add_common_args, config_from_args
from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
from gazenerf_tpu.train.checkpoint import load_checkpoint
from gazenerf_tpu.train.fitting import make_fit_single_image
from gazenerf_tpu.train.trainer import Trainer, compose_codes_and_cams
from gazenerf_tpu.viewer import ViewerApp, serve

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Interactive GazeNeRF web viewer")
    add_common_args(p)
    p.add_argument("--subject", type=str, default="")
    p.add_argument("--fit_steps", type=int, default=100)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8631)
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    logging.basicConfig(level=logging.INFO)

    trainer = Trainer(cfg, train_len=1, steps_per_epoch=1)
    if args.resume:
        trainer.state, _, _ = load_checkpoint(args.resume, trainer.state)

    shape_code = appea_code = None
    if args.subject and cfg.data.img_dir:
        ds = GazeH5Dataset(
            cfg.data.img_dir, subjects=[args.subject], dataset=cfg.data.dataset,
            shuffle=False,
        )
        batch = next(iter(BatchLoader(ds, 1, num_workers=1)))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        fit = make_fit_single_image(
            cfg, trainer.model, trainer.frozen, trainer.expr_fix, args.fit_steps
        )
        trainer.state, losses = fit(trainer.state, jb)
        logger.info("fit loss: %.4f -> %.4f", float(losses[0]), float(losses[-1]))
        sc, ac, _, _, _, _, _, _ = compose_codes_and_cams(
            cfg, {**jb, "sample_idx": jnp.zeros((1,), jnp.int32)},
            trainer.state.offsets, jnp.asarray(trainer.expr_fix),
        )
        shape_code, appea_code = np.asarray(sc), np.asarray(ac)

    app = ViewerApp(
        cfg, params={"params": trainer.state.params},
        shape_code=shape_code, appea_code=appea_code,
    )
    serve(app, host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
