"""wandb observability parity (reference utils/logging.py:24-270).

The reference calls its wandb panel "the main correctness instrument": per-
loss scalar dicts every 300 batches (log_losses), a 5-panel image strip every
20 batches (log_all_images), mask overlays, per-subject eval scalars.  These
tests drive the twins through a fake wandb module and assert the exact
logged key sets.
"""

import numpy as np
import pytest

from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
from gazenerf_tpu.utils.logging import (
    log_all_images,
    log_losses,
    log_mask_overlay,
    log_number,
    log_subject_eval_results,
)


class FakeImage:
    def __init__(self, data, caption=None, masks=None):
        self.data = np.asarray(data) if not isinstance(data, FakeImage) else data
        self.caption = caption
        self.masks = masks


class FakeWandb:
    Image = FakeImage

    def __init__(self):
        self.logged = []

    def log(self, d, step=None):
        self.logged.append(dict(d))

    def keys(self):
        return {k for d in self.logged for k in d}


def full_loss_dict():
    keys = [
        "total_loss", "bg_loss", "head_loss", "face_loss", "eyes_loss",
        "nonhead_loss", "vgg_face_loss", "vgg_eyes_loss", "vgg", "angular",
        "gen_patch_gan_loss", "disc_patch_gan_loss", "delta_eular",
        "delta_tvec", "iden_code", "expr_code", "appea_code", "bg_code",
    ]
    return {k: np.float32(i + 1) for i, k in enumerate(keys)}


def test_log_losses_reference_key_set_and_gating():
    """The logged scalar names match the reference's exactly, gated by the
    same loss flags (reference utils/logging.py:201-230)."""
    wandb = FakeWandb()
    cfg = LossConfig(use_vgg_loss=True, use_patch_gan_loss=True,
                     use_angular_loss=True)
    log_losses(wandb, full_loss_dict(), cfg, epoch=0)
    assert wandb.keys() == {
        "TRAIN Total Loss Batch", "TRAIN VGG Face Loss Batch",
        "TRAIN VGG Loss Batch", "TRAIN Generator Patch GAN Loss Batch",
        "TRAIN Discriminator Patch GAN Loss Batch",
        "TRAIN Angular Loss Batch", "TRAIN Eye Region Loss Batch",
        "TRAIN Head Loss Batch", "TRAIN Iden Code Loss Batch",
        "TRAIN Expr Code Loss Batch", "TRAIN Appea Code Loss Batch",
        "TRAIN BG Code Loss Batch", "TRAIN BG Loss Batch",
        "TRAIN Face Loss Batch", "TRAIN Eyes Loss Batch",
        "TRAIN Non Head Loss Batch", "TRAIN Delta Eular Loss Batch",
        "TRAIN Delta Tvec Loss Batch",
    }

    # flags off: the gated keys disappear (even though the dict has them)
    wandb2 = FakeWandb()
    log_losses(wandb2, full_loss_dict(), LossConfig(
        use_vgg_loss=False, use_patch_gan_loss=False, use_angular_loss=False
    ), epoch=0)
    assert not wandb2.keys() & {
        "TRAIN VGG Loss Batch", "TRAIN VGG Face Loss Batch",
        "TRAIN Generator Patch GAN Loss Batch",
        "TRAIN Discriminator Patch GAN Loss Batch",
        "TRAIN Angular Loss Batch", "TRAIN Eye Region Loss Batch",
    }
    assert "TRAIN Total Loss Batch" in wandb2.keys()


def test_log_all_images_panel_and_mask_overlay():
    wandb = FakeWandb()
    H = 16
    gt = np.random.default_rng(0).random((2, H, H, 3)).astype(np.float32)
    cd = {
        "merge_img": gt * 0.5,
        "merge_img_face": gt * 0.25,
        "merge_img_eyes": gt * 0.75,
        "bg_img": np.ones((1, H, H, 3), np.float32),
    }
    log_all_images(wandb, gt, cd)
    assert list(wandb.logged[0]) == ["Prediction"]
    panel = wandb.logged[0]["Prediction"].data
    assert panel.shape == (H, 5 * H, 3) and panel.dtype == np.uint8

    log_mask_overlay(wandb, gt[0], (gt[0, :, :, 0] > 0.5) * 255, "Eye Mask",
                     {0: "background", 255: "eye region"})
    overlay = wandb.logged[-1]["Eye Mask"]
    assert overlay.masks["predictions"]["class_labels"][255] == "eye region"

    log_number(wandb, np.float32(3.5), "Total Loss Epoch")
    assert wandb.logged[-1] == {"Total Loss Epoch": 3.5}

    log_subject_eval_results(wandb, {
        "ssim": 0.9, "psnr": 30.0, "lpips": 0.1, "l1": 0.01, "fid": 12.0,
        "gaze_angular_deg": 4.0, "head_angular_deg": 2.0,
        "identity_similarity": 0.7, "num_pairs": 5,
    })
    assert wandb.logged[-1].keys() == {
        "Subject SSIM", "Subject PSNR", "Subject LPIPS",
        "Subject L1 Distance", "Subject FID", "Subject Angular Error",
        "Subject Angular Head Error", "Subject Similarity",
    }


@pytest.mark.parametrize("steps_per_dispatch", [1, 3])
def test_train_epoch_wandb_stream(tmp_path, steps_per_dispatch):
    """A real train_epoch emits the reference's observability stream: the
    per-loss scalar panel, the 5-panel Prediction strip, and the epoch-end
    scalars — through BOTH dispatch modes (per-batch and scan-of-K)."""
    import jax.numpy as jnp  # noqa: F401  (backend init before h5 threads)

    from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
    from gazenerf_tpu.data.synthetic import write_synthetic_subject
    from gazenerf_tpu.train.trainer import Trainer

    write_synthetic_subject(str(tmp_path), num_frames=6, img_size=64)
    ds = GazeH5Dataset(str(tmp_path), shuffle=False)
    loader = BatchLoader(ds, batch_size=2, num_workers=1)
    cfg = Config(
        model=ModelConfig(num_sample_coarse=8, featmap_size=16,
                          pred_img_size=64, mlp_hidden=32, use_pallas=False),
        loss=LossConfig(use_vgg_loss=False, is_gradual_loss=True),
        train=TrainConfig(batch_size=2, lr=1e-3, log_every=1,
                          steps_per_dispatch=steps_per_dispatch),
    )
    tr = Trainer(cfg, train_len=len(ds), steps_per_epoch=len(loader))
    wandb = FakeWandb()
    tr.train_epoch(loader, epoch=1, wandb=wandb, log_images_every=1)

    keys = wandb.keys()
    assert "TRAIN Total Loss Batch" in keys
    assert "TRAIN Head Loss Batch" in keys
    assert "TRAIN Eyes Loss Batch" in keys
    assert "Prediction" in keys
    assert "Total Loss Epoch" in keys
    assert "eye loss importance" in keys  # gradual schedule, base.py:150-154
    panel = next(d["Prediction"] for d in wandb.logged if "Prediction" in d)
    assert panel.data.shape == (64, 5 * 64, 3)
