"""CLI-level smoke for the metric-protocol dispatcher.

Protects the arg plumbing (`--num_iterations`, `--num_eval_images`,
model-size flags) around the protocol functions, which are unit-tested in
tests/test_eval.py.  Reference twin: evaluate_metrics.py:57-213.
"""

import json
import os

import numpy as np

from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
from gazenerf_tpu.data.synthetic import write_synthetic_subject
from gazenerf_tpu.train.checkpoint import save_checkpoint
from gazenerf_tpu.train.trainer import Trainer

TINY_FLAGS = [
    "--featmap_size", "16", "--pred_img_size", "64",
    "--num_sample_coarse", "8", "--mlp_hidden", "32",
    "--use_pallas", "false", "--use_vgg_loss", "false",
    "--compute_dtype", "float32", "--renderer_dtype", "float32",
]


def _tiny_cfg() -> Config:
    return Config(
        model=ModelConfig(
            num_sample_coarse=8, featmap_size=16, pred_img_size=64,
            mlp_hidden=32, use_pallas=False,
        ),
        loss=LossConfig(use_vgg_loss=False),
        train=TrainConfig(batch_size=1),
    )


def test_cli_personal_calibration_iterations(tmp_path, capsys):
    d = str(tmp_path / "data")
    os.makedirs(d)
    write_synthetic_subject(d, num_frames=6, img_size=64)

    cfg = _tiny_cfg()
    tr = Trainer(cfg, train_len=1, steps_per_epoch=1)
    ckpt = save_checkpoint(str(tmp_path / "ck"), tr.state, cfg, 0)

    from gazenerf_tpu.cli.evaluate_metrics import main

    calib_dir = str(tmp_path / "calib")
    rc = main([
        "--img_dir", d, "--evaluation_type", "personal_calibration",
        "--resume", ckpt, "--batch_size", "1",
        "--num_fit_images", "2", "--num_iterations", "2",
        "--num_eval_images", "4", "--fit_steps", "2",
        "--calib_out_dir", calib_dir,
    ] + TINY_FLAGS)
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    subjects = out["per_subject"]
    assert len(subjects) == 1
    (res,) = subjects.values()
    assert set(res) == {"iter_0", "iter_1"}
    for it in res.values():
        # 4 val frames swept (--num_eval_images), 2 random fit indices
        assert it["num_frames"] == 4
        assert len(it["fit_indices"]) == 2
    files = sorted(os.listdir(calib_dir))
    assert any("_nsample_2_iter_0.h5" in f for f in files)
    assert any("_nsample_2_iter_1.h5" in f for f in files)
