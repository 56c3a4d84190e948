"""Full-size loader-fed run on real hardware (VERDICT round-3 item 5).

The flagship configuration end-to-end, OUTSIDE the bench harness: synthetic
subjects at the training shape (B=2, 64x64 rays x 64 samples, 512x512 out),
the real BatchLoader + K-steps-per-dispatch epoch driver, orbax
checkpointing, then checkpoint-restore + the input_target metric protocol —
i.e. the reference workflow ``train.py -> evaluate_metrics.py`` (reference
train.py:80-131, evaluate_metrics.py:57-213) at speed.

Usage: python tools/full_run.py [--frames 32] [--epochs 2] [--k 8]
Prints a JSON summary (steps/s, rays/s, peak HBM, protocol metrics); record
the numbers in PERF_NOTES.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--k", type=int, default=8, help="steps per dispatch")
    ap.add_argument("--pairs", type=int, default=2, help="protocol pairs")
    ap.add_argument("--fit_steps", type=int, default=10)
    ap.add_argument("--vgg", action="store_true",
                    help="train with the reference-default recipe (VGG "
                         "perceptual loss ON, bf16 frozen VGG)")
    ap.add_argument("--out_dir", type=str, default="")
    args = ap.parse_args()

    import jax

    from gazenerf_tpu.cli.common import setup_compilation_cache

    setup_compilation_cache()
    from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
    from gazenerf_tpu.data.synthetic import write_synthetic_subject
    from gazenerf_tpu.eval.protocols import (
        EvalContext,
        evaluate_input_target_images,
        split_target_batch,
    )
    from gazenerf_tpu.train.checkpoint import load_checkpoint
    from gazenerf_tpu.train.trainer import Trainer

    root = args.out_dir or tempfile.mkdtemp(prefix="gazenerf_fullrun_")
    data_dir = os.path.join(root, "data")
    ckpt_dir = os.path.join(root, "ckpt")
    os.makedirs(data_dir, exist_ok=True)

    B = 2
    cfg = Config(
        model=ModelConfig(
            compute_dtype="bfloat16",
            renderer_dtype="bfloat16",
            remat_fields=False,
            pallas_stash_acts=True,
            pallas_bwd_tile_rays=16,
            pallas_vmem_mb=100,
            pallas_dens_vpu=True,
        ),
        loss=(
            LossConfig(use_vgg_loss=True, vgg_dtype="bfloat16")
            if args.vgg
            else LossConfig(use_vgg_loss=False)
        ),
        train=TrainConfig(batch_size=B, lr=1e-4,
                          steps_per_dispatch=args.k),
    )

    t0 = time.time()
    write_synthetic_subject(
        data_dir, num_frames=args.frames, img_size=cfg.model.pred_img_size
    )
    t_data = time.time() - t0

    ds = GazeH5Dataset(data_dir, shuffle=False, device_decode=True)
    loader = BatchLoader(ds, batch_size=B, num_workers=4, prefetch=6)
    tr = Trainer(cfg, train_len=len(ds), steps_per_epoch=len(loader))

    # epoch 0 pays the compile; later epochs are the steady state
    history = tr.fit(loader, num_epochs=args.epochs, checkpoint_dir=ckpt_dir)
    steady = history[-1] if len(history) == 1 else history[1:]
    if isinstance(steady, list):
        sec = sum(h["seconds"] for h in steady)
        nb = sum(h["batches"] for h in steady)
    else:
        sec, nb = steady["seconds"], steady["batches"]
    steps_per_sec = nb / sec
    rays_per_sec = steps_per_sec * B * cfg.model.num_rays

    mem = {}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        mem = {
            "peak_hbm_gb": round(ms.get("peak_bytes_in_use", 0) / 2**30, 3),
            "hbm_limit_gb": round(ms.get("bytes_limit", 0) / 2**30, 3),
        }
    except Exception:
        pass

    # --- restore into a fresh trainer + input_target protocol ---
    tr2 = Trainer(cfg, train_len=1, steps_per_epoch=1)
    state, _, epoch = load_checkpoint(
        os.path.join(ckpt_dir, f"epoch_{args.epochs}"), tr2.state
    )
    tr2.state = state
    ds_t = GazeH5Dataset(data_dir, shuffle=False, evaluate="target")
    loader_t = BatchLoader(ds_t, 1, num_workers=1, skip_invalid=False)
    pairs = [split_target_batch(b) for _, b in zip(range(args.pairs), loader_t)]
    ctx = EvalContext.build(
        cfg, tr2.model, tr2.state, tr2.frozen, tr2.expr_fix,
        fit_steps=args.fit_steps,
    )
    t1 = time.time()
    res = evaluate_input_target_images(ctx, pairs)
    t_proto = time.time() - t1

    out = {
        "frames": args.frames,
        "epochs": args.epochs,
        "steps_per_dispatch": args.k,
        "data_gen_s": round(t_data, 1),
        "train_epoch_history": [
            {k: round(v, 4) if isinstance(v, float) else v for k, v in h.items()}
            for h in history
        ],
        "steady_steps_per_sec": round(steps_per_sec, 3),
        "steady_rays_per_sec": round(rays_per_sec, 1),
        **mem,
        "protocol_seconds": round(t_proto, 1),
        "protocol": {
            k: (
                round(float(v), 4)
                if np.isscalar(v) and not isinstance(v, str)
                else v
            )
            for k, v in res.items()
            if not isinstance(v, np.ndarray)
        },
        "restored_epoch": epoch,
        "root": root,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
