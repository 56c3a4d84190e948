"""Interleaved full-step A/B across arbitrary ModelConfig overrides.

Usage: python tools/bench_variants.py '{"name": {...overrides}}' [N] [reps]
Each variant builds the full train step (B=2, real loss stack minus VGG),
compiles an N-step scan, then timed reps ALTERNATE across variants in one
process (PERF_NOTES.md measurement rules: the tunnel warms up per process,
so only interleaved mins are comparable).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

RAYS = None


def make_runner(overrides: dict, N: int):
    from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from gazenerf_tpu.data.synthetic import write_synthetic_subject
    from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
    from gazenerf_tpu.train.trainer import Trainer

    B = 2
    mc = dict(
        compute_dtype="bfloat16",
        renderer_dtype="bfloat16",
        remat_fields=False,
        use_pallas=True,
        pallas_stash_acts=True,
        pallas_bwd_tile_rays=16,
        pallas_vmem_mb=100,
    )
    mc.update(overrides)
    loss_kw = {
        k[5:]: mc.pop(k) for k in list(mc) if k.startswith("loss_")
    }
    loss_kw.setdefault("use_vgg_loss", False)
    cfg = Config(
        model=ModelConfig(**mc),
        loss=LossConfig(**loss_kw),
        train=TrainConfig(batch_size=B),
    )
    global RAYS
    RAYS = B * cfg.model.num_rays

    d = tempfile.mkdtemp()
    write_synthetic_subject(d, num_frames=B, img_size=cfg.model.pred_img_size)
    ds = GazeH5Dataset(d, shuffle=False)
    batch = next(iter(BatchLoader(ds, batch_size=B, num_workers=1)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    tr = Trainer(cfg, train_len=B, steps_per_epoch=100)
    step = tr.train_step

    @jax.jit
    def run(state):
        def body(s, _):
            s2, losses = step(s, jb)
            return s2, losses["total_loss"]

        return jax.lax.scan(body, state, None, length=N)

    state, losses = run(tr.state)
    jax.block_until_ready(losses)

    def timed(st):
        t0 = time.time()
        st, ls = run(st)
        ls.block_until_ready()
        np.asarray(ls[-1])
        return (time.time() - t0) / N * 1000.0, st

    return timed, state


def main():
    variants = json.loads(sys.argv[1])
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    runners = {}
    for name, ov in variants.items():
        print(f"compiling {name} ...", flush=True)
        runners[name] = make_runner(ov, N)
    times = {name: [] for name in variants}
    states = {name: runners[name][1] for name in variants}
    for r in range(reps):
        for name in variants:
            ms, states[name] = runners[name][0](states[name])
            times[name].append(ms)
    for name in variants:
        ts = ", ".join(f"{t:.1f}" for t in times[name])
        best = min(times[name])
        krays = RAYS / best if RAYS else 0
        print(f"{name}: min {best:.1f} ms/step = {krays:.1f} Krays/s (reps: {ts})",
              flush=True)


if __name__ == "__main__":
    main()
