"""A/B microbench: full train step with/without the fused Pallas field path.

Usage: python tools/bench_ab.py [N_STEPS]
Prints ms/step for each variant using the scan-inside-one-jit methodology
(PERF_NOTES.md) that is immune to the TPU tunnel's dispatch latency.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def make_runner(use_pallas: bool, N: int):
    """Build a compiled N-step scan runner; returns (timed_fn, init_state)."""
    from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from gazenerf_tpu.data.synthetic import write_synthetic_subject
    from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
    from gazenerf_tpu.train.trainer import Trainer

    B = 2
    cfg = Config(
        model=ModelConfig(
            compute_dtype="bfloat16",
            renderer_dtype="bfloat16",
            remat_fields=False,
            use_pallas=use_pallas,
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
    step = tr.train_step

    @jax.jit
    def run(state):
        def body(s, _):
            s2, losses = step(s, jb)
            return s2, losses["total_loss"]

        return jax.lax.scan(body, state, None, length=N)

    state, losses = run(tr.state)
    jax.block_until_ready(losses)  # compile + warm

    def timed(st):
        t0 = time.time()
        st, ls = run(st)
        ls.block_until_ready()
        np.asarray(ls[-1])
        return (time.time() - t0) / N * 1000.0, st

    return timed, state


def main():
    """Alternate timed reps of both variants in one process and report the
    min per variant — the TPU tunnel warms up over a process lifetime, so
    single-shot or ordered A/B comparisons are confounded (measured: the
    second variant in a process always looks ~20% faster)."""
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    runners = {v: make_runner(v, N) for v in (False, True)}
    times = {False: [], True: []}
    states = {v: runners[v][1] for v in runners}
    for r in range(reps):
        for v in (False, True):
            ms, states[v] = runners[v][0](states[v])
            times[v].append(ms)
    for v in (False, True):
        ts = ", ".join(f"{t:.1f}" for t in times[v])
        print(f"use_pallas={v}: min {min(times[v]):.1f} ms/step  (reps: {ts})",
              flush=True)


if __name__ == "__main__":
    main()
