"""Serving throughput sweep: forward-render-only images/s across batch sizes.

The train-side bench (bench.py ``infer`` phase) measures the serving path at
the training batch (B=2).  Serving cares about throughput per chip at the
batch the deployment can afford: this sweeps B and reports ms/image and
images/s for the FULL 512^2 render path (uint8 decode + code compose + dual
field march + neural renderer), no grad, primal Pallas kernels (no stash).

Methodology per PERF_NOTES.md: scan-of-N inside one jit with the carry
threaded into the gaze input (a state-invariant render would be hoisted out
of the scan by XLA), best-of-reps, one host sync per rep.

Usage: python tools/bench_serving.py [B ...]   (default 1 2 4 8 16)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def measure(B: int, n_steps: int = 20, reps: int = 3) -> dict:
    from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from gazenerf_tpu.data.synthetic import write_synthetic_subject
    from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
    from gazenerf_tpu.train.trainer import Trainer

    cfg = Config(
        model=ModelConfig(
            compute_dtype="bfloat16",
            renderer_dtype="bfloat16",
            remat_fields=False,
            pallas_dens_vpu=True,
        ),
        loss=LossConfig(use_vgg_loss=False),
        train=TrainConfig(batch_size=B),
    )
    d = tempfile.mkdtemp()
    write_synthetic_subject(d, num_frames=B, img_size=cfg.model.pred_img_size)
    ds = GazeH5Dataset(d, shuffle=False)
    batch = next(iter(BatchLoader(ds, batch_size=B, num_workers=1)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    tr = Trainer(cfg, train_len=B, steps_per_epoch=100)
    ev = tr.eval_step

    @jax.jit
    def run(state):
        def body(c, _):
            b2 = dict(jb)
            # thread the carry into an input so XLA cannot hoist the render
            b2["pitchyaw"] = jb["pitchyaw"] + c * 1e-9
            out, _cd = ev(state, b2)
            return out["mse"], None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=n_steps)[0]

    s = run(tr.state)
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        s = run(tr.state)
        np.asarray(s)  # host sync through the tunnel
        best = min(best, time.time() - t0)
    ms_batch = best / n_steps * 1e3
    return {
        "B": B,
        "ms_per_batch": ms_batch,
        "ms_per_image": ms_batch / B,
        "images_per_sec": B / (ms_batch / 1e3),
        "rays_per_sec": B * cfg.model.featmap_size**2 / (ms_batch / 1e3),
    }


def main():
    bs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    print(f"{'B':>4} {'ms/batch':>10} {'ms/img':>8} {'img/s':>8} {'Krays/s':>9}")
    for B in bs:
        r = measure(B)
        print(
            f"{r['B']:>4} {r['ms_per_batch']:>10.1f} {r['ms_per_image']:>8.1f}"
            f" {r['images_per_sec']:>8.1f} {r['rays_per_sec']/1e3:>9.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
