"""CLI end-to-end: multi-chip training through ``python -m gazenerf_tpu.cli.train``.

The reference trains strictly single-GPU (reference train.py:86-88); here the
SAME CLI command drives a ('data','ray') device mesh via ``--dp/--rp``
(SURVEY.md §2.8).  This test runs the real entry point twice on the fake
8-device CPU mesh — once single-device, once dp=4 x rp=2 — and requires the
identical training result.
"""

import csv
import os

import numpy as np
import pytest

from gazenerf_tpu.data.synthetic import write_synthetic_subject


def _run_cli(img_dir: str, ckpt_dir: str, extra):
    from gazenerf_tpu.cli.train import main

    argv = [
        "--img_dir", img_dir, "--checkpoint_dir", ckpt_dir,
        "--batch_size", "8", "--num_epochs", "1", "--lr", "1e-3",
        "--featmap_size", "16", "--pred_img_size", "64",
        "--num_sample_coarse", "8", "--mlp_hidden", "32",
        "--use_pallas", "false", "--use_vgg_loss", "false",
        "--compute_dtype", "float32", "--renderer_dtype", "float32",
        "--num_workers", "1",
    ] + list(extra)
    assert main(argv) == 0
    with open(os.path.join(ckpt_dir, "summary.csv")) as f:
        return list(csv.DictReader(f))


@pytest.mark.slow
def test_cli_mesh_train_matches_single(tmp_path):
    d = str(tmp_path / "data")
    os.makedirs(d)
    write_synthetic_subject(d, num_frames=16, img_size=64)

    r1 = _run_cli(d, str(tmp_path / "c1"), [])
    r8 = _run_cli(d, str(tmp_path / "c8"), ["--dp", "4", "--rp", "2"])

    assert len(r1) == len(r8) == 1
    assert int(r1[0]["batches"]) == int(r8[0]["batches"]) == 2
    l1, l8 = float(r1[0]["loss"]), float(r8[0]["loss"])
    assert np.isfinite(l1) and np.isfinite(l8)
    np.testing.assert_allclose(l1, l8, rtol=2e-4)
    # both runs checkpointed
    assert os.listdir(str(tmp_path / "c8"))


@pytest.mark.slow
def test_cli_mesh_with_multi_step_dispatch(tmp_path):
    """--dp/--rp composes with --steps_per_dispatch (scan-of-K on the mesh)."""
    d = str(tmp_path / "data")
    os.makedirs(d)
    write_synthetic_subject(d, num_frames=32, img_size=64)

    r = _run_cli(
        d, str(tmp_path / "ck"),
        ["--dp", "4", "--rp", "2", "--steps_per_dispatch", "2"],
    )
    assert int(r[0]["batches"]) == 4
    assert np.isfinite(float(r[0]["loss"]))


def test_cli_val_epoch(tmp_path, capsys):
    """--val_dir runs a per-epoch validation epoch (per-region metrics, no
    updates — the reference eval epoch, trainer/gazenerf_trainer.py:601-708,
    which the reference's own train.py never wires up)."""
    d = str(tmp_path / "data")
    v = str(tmp_path / "val")
    os.makedirs(d)
    os.makedirs(v)
    write_synthetic_subject(d, num_frames=8, img_size=64)
    write_synthetic_subject(v, num_frames=8, img_size=64, seed=3)

    _run_cli(d, str(tmp_path / "ck"), [
        "--val_dir", v, "--num_val_images", "8",
    ])
    # cli.train's configure_logging routes through a stdout handler
    out = capsys.readouterr().out
    val_lines = [ln for ln in out.splitlines() if " val: " in ln]
    assert val_lines, out[-2000:]
    for key in ("mse=", "psnr=", "head_mse=", "eyes_mse=", "nonhead_mse="):
        assert key in val_lines[-1], val_lines[-1]
