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


def test_cli_evaluate_per_key_gifs(tmp_path):
    """cli.evaluate iterates the split's subject KEYS and fits the CHOSEN
    frame (not frame 0), writing the reference's GIF names per subject
    (reference evaluate.py:152-153 iterates val_keys; gazenerf_trainer.py:
    926-942 names {key}_{fit_name}_{both,gaze,head}.gif)."""
    import json as _json

    d = str(tmp_path / "data")
    os.makedirs(d)
    write_synthetic_subject(d, num_frames=4, img_size=64)
    write_synthetic_subject(d, num_frames=4, img_size=64,
                            subject="subject0001.h5", seed=1)
    with open(os.path.join(d, "train_test_split.json"), "w") as f:
        _json.dump({"train": ["subject0000.h5"],
                    "val": ["subject0001.h5"]}, f)

    from gazenerf_tpu.cli.evaluate import main

    out_dir = str(tmp_path / "gifs")
    rc = main([
        "--img_dir", d, "--fixed_index", "2", "--fit_steps", "2",
        "--view_num", "3", "--out_dir", out_dir,
    ] + TINY_FLAGS)
    assert rc == 0
    # default split is "val" -> exactly subject0001's three fitted GIFs
    files = sorted(os.listdir(out_dir))
    assert files == [
        "subject0001_fitted_both.gif",
        "subject0001_fitted_gaze.gif",
        "subject0001_fitted_head.gif",
    ]

    # visualize = the same flow over the TRAIN keys (reference visualize.py)
    from gazenerf_tpu.cli.visualize import main as vis_main

    out2 = str(tmp_path / "gifs2")
    rc = vis_main([
        "--img_dir", d, "--fixed_index", "1", "--fit_steps", "2",
        "--view_num", "3", "--out_dir", out2,
    ] + TINY_FLAGS)
    assert rc == 0
    assert sorted(os.listdir(out2)) == [
        "subject0000_fitted_both.gif",
        "subject0000_fitted_gaze.gif",
        "subject0000_fitted_head.gif",
    ]

    # --fit false = the reference's not_fitted val flow (evaluate.py:67-69)
    out3 = str(tmp_path / "gifs3")
    rc = main([
        "--img_dir", d, "--subject", "subject0000.h5", "--fit", "false",
        "--view_num", "2", "--out_dir", out3,
    ] + TINY_FLAGS)
    assert rc == 0
    assert "subject0000_not_fitted_both.gif" in os.listdir(out3)
