"""Benchmark: full-size GazeNeRF training-step throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures rays/sec through the full fwd+bwd train step (two 384-wide field
MLPs over rays x 64 samples, volume integration, 4 neural-renderer passes,
masked loss stack, per-group Adam) at the reference's training shape
(batch 2, 64x64 rays, 512x512 output — reference train.py:20, README.md:29).

Methodology (see PERF_NOTES.md): N steps chained through ``lax.scan`` inside
one jit, one host sync — immune to the per-dispatch latency of this
environment's TPU tunnel.  The baseline constant below is the reference's
PyTorch pipeline measured on its published hardware class (A40-class GPU,
batch 2): the repo publishes no throughput numbers (SURVEY.md §6), so
vs_baseline uses our own measured XLA-f32 day-one number as the anchor.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# Day-one anchor: f32 XLA path, scan-timed, B=2 on 1x TPU v5e (PERF_NOTES.md)
BASELINE_RAYS_PER_SEC = 37_000.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["scan", "loader", "deep"], default=None,
                    help="run a single phase (debugging); default all")
    phase_args = ap.parse_args()
    want = lambda p: phase_args.only in (None, p)  # noqa: E731

    from gazenerf_tpu.cli.common import setup_compilation_cache

    setup_compilation_cache()  # warm reruns skip the ~minutes of compiles
    from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from gazenerf_tpu.data.synthetic import write_synthetic_subject
    from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
    from gazenerf_tpu.train.trainer import Trainer
    import tempfile

    B = 2
    cfg = Config(
        model=ModelConfig(
            compute_dtype="bfloat16",
            renderer_dtype="bfloat16",
            remat_fields=False,
            # round-3 tuned kernel knobs (PERF_NOTES): stash-acts backward
            # at TR=16 under a raised Mosaic VMEM cap
            pallas_stash_acts=True,
            pallas_bwd_tile_rays=16,
            pallas_vmem_mb=100,
            # round-4: density head on the VPU (~0.5 ms, PERF_NOTES round 4)
            pallas_dens_vpu=True,
        ),
        loss=LossConfig(use_vgg_loss=False),
        # K=8 steps per dispatch: the loader-fed phase pays per-dispatch
        # tunnel latency once per 8 batches (round-4 fix for the 25K-vs-85K
        # loader-fed gap, PERF_NOTES.md round 4)
        train=TrainConfig(batch_size=B, steps_per_dispatch=8),
    )

    d = tempfile.mkdtemp()
    write_synthetic_subject(d, num_frames=B, img_size=cfg.model.pred_img_size)
    ds = GazeH5Dataset(d, shuffle=False)
    batch = next(iter(BatchLoader(ds, batch_size=B, num_workers=1)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    tr = Trainer(cfg, train_len=B, steps_per_epoch=100)

    # scanned N-step run: the jitted step inlines fine under scan via closure
    step = tr.train_step

    N = 20

    @jax.jit
    def run(state):
        def body(s, _):
            s2, losses = step(s, jb)
            return s2, losses["total_loss"]

        return jax.lax.scan(body, state, None, length=N)

    rays = B * cfg.model.featmap_size**2
    rays_per_sec = loader_fed = deep_march = 0.0
    if want("scan"):
        state, losses = run(tr.state)
        jax.block_until_ready(losses)  # compile + warm
        # the tunnel warms up over a process lifetime (PERF_NOTES.md): take
        # the best of several reps rather than a single cold measurement
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            state, losses = run(state)
            losses.block_until_ready()
            np.asarray(losses[-1])  # force host sync through the tunnel
            best = min(best, time.time() - t0)
        dt = best / N
        rays_per_sec = rays / dt
        log(f"[bench] scan-fed: {dt*1000:.1f} ms/step = {rays_per_sec:.0f} rays/s")

    # loader-fed phase: fresh batches through BatchLoader -> stacked K=8
    # multi-step dispatches -> real H2D transfers, measured through the REAL
    # epoch driver (Trainer.train_epoch — the exact path `cli.train` runs).
    # Round 3 measured 25K here vs 85K scan-fed; the per-step host sync +
    # one-dispatch-per-batch pattern was the gap (VERDICT round 3 #1).
    if want("loader"):
        # 64 frames = 4 K=8 dispatches/epoch, enough for the prefetched H2D
        # of dispatch i+1 to overlap dispatch i's compute; uint8 on the wire
        # (device_decode) keeps the transfer off the critical path
        write_synthetic_subject(
            d, num_frames=64, img_size=cfg.model.pred_img_size,
            subject="subject0001.h5", seed=1,
        )
        ds2 = GazeH5Dataset(
            d, subjects=["subject0001.h5"], shuffle=False, device_decode=True
        )
        loader = BatchLoader(ds2, batch_size=B, num_workers=4, prefetch=6)
        tr.train_epoch(loader, epoch=0)  # warm: multi-step compile + page cache
        best_lf = float("inf")
        for _ in range(2):
            s = tr.train_epoch(loader, epoch=0)
            best_lf = min(best_lf, s["seconds"] / max(s["batches"], 1))
        loader_fed = rays / best_lf
        log(f"[bench] loader-fed: {best_lf*1000:.1f} ms/batch = {loader_fed:.0f} rays/s")

    # deep-march phase: the BASELINE.json-named workload — fwd+bwd at a
    # 256-sample ray march (ray_chunk bounds the live stash so S=256 fits
    # in HBM; models/gaze_nerf.py:189-242)
    cfg256 = Config(
        model=ModelConfig(
            compute_dtype="bfloat16",
            renderer_dtype="bfloat16",
            remat_fields=False,
            num_sample_coarse=256,
            # deep-march plan (PERF_NOTES round 4): the stash-acts backward
            # LOSES at S=256 (its HBM stash traffic scales with S: 395.7 vs
            # 365.5 ms) — recompute-backward + 512-ray chunks is both faster
            # and memory-bounded; chunking measures FREE vs unchunked here
            ray_chunk=512,
            pallas_stash_acts=False,
            pallas_bwd_tile_rays=8,
            pallas_vmem_mb=110,
            pallas_dens_vpu=True,
        ),
        loss=LossConfig(use_vgg_loss=False),
        train=TrainConfig(batch_size=B),
    )
    if want("deep"):
        tr256 = Trainer(cfg256, train_len=B, steps_per_epoch=100)
        step256 = tr256.train_step
        N256 = 5

        @jax.jit
        def run256(state):
            def body(s, _):
                s2, losses = step256(s, jb)
                return s2, losses["total_loss"]

            return jax.lax.scan(body, state, None, length=N256)

        state256, l256 = run256(tr256.state)
        jax.block_until_ready(l256)
        best256 = float("inf")
        for _ in range(2):
            t0 = time.time()
            state256, l256 = run256(state256)
            np.asarray(l256[-1])
            best256 = min(best256, time.time() - t0)
        deep_march = rays / (best256 / N256)
        log(
            f"[bench] deep-march S=256: {best256/N256*1000:.1f} ms/step"
            f" = {deep_march:.0f} rays/s"
        )

    print(
        json.dumps(
            {
                "metric": "train_step_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s (fwd+bwd, B=2, 64 samples, 1 chip)",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
                "loader_fed_rays_per_sec": round(loader_fed, 1),
                "deep_march_256_rays_per_sec": round(deep_march, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
