"""Benchmark: full-size GazeNeRF training-step throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measures rays/sec through the full fwd+bwd train step (two 384-wide field
MLPs over rays x 64 samples, volume integration, 4 neural-renderer passes,
masked loss stack, per-group Adam) at the reference's training shape
(batch 2, 64x64 rays, 512x512 output — reference README.md:29).

Phases:
* ``scan``   — device-truth scanned N-step run, vgg off (the historical
               headline; every PERF_NOTES A/B since round 1 anchors here)
* ``vgg``    — the REFERENCE-DEFAULT training recipe: VGG perceptual loss ON
               (reference train.py:38 defaults use_vgg_loss=True — 6 VGG16
               224^2 forwards + their backward inside every step)
* ``gan``    — vgg + PatchGAN discriminator update (the heaviest recipe)
* ``loader`` — fresh batches through the real epoch driver (H2D + dispatch)
* ``deep``   — S=256 deep-march (BASELINE.md north star)
* ``infer``  — forward render only (the SERVING path: full 512^2 image out,
               primal Pallas kernels with no activation stash)

Methodology (see PERF_NOTES.md): N steps chained through ``lax.scan`` inside
one jit, one host sync — immune to the per-dispatch latency of this
environment's TPU tunnel.  The repo publishes no throughput numbers
(SURVEY.md §6), so vs_baseline uses our own measured XLA-f32 day-one number
as the anchor.  Phases that were not run are reported as null, never 0.
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

PHASES = ("scan", "vgg", "gan", "loader", "deep", "infer")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _scan_phase(name, cfg, jb, rays, n_steps, reps=3):
    """Compile + warm a scanned-N-step run of cfg's train step; best-of-reps
    rays/s (the tunnel warms up over a process lifetime, PERF_NOTES.md)."""
    from gazenerf_tpu.train.trainer import Trainer

    tr = Trainer(cfg, train_len=jb["image"].shape[0], steps_per_epoch=100)
    step = tr.train_step

    @jax.jit
    def run(state):
        def body(s, _):
            s2, losses = step(s, jb)
            return s2, losses["total_loss"]

        return jax.lax.scan(body, state, None, length=n_steps)

    state, losses = run(tr.state)
    jax.block_until_ready(losses)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        state, losses = run(state)
        losses.block_until_ready()
        np.asarray(losses[-1])  # force host sync through the tunnel
        best = min(best, time.time() - t0)
    dt = best / n_steps
    rps = rays / dt
    log(f"[bench] {name}: {dt*1000:.1f} ms/step = {rps:.0f} rays/s")
    return rps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=PHASES, default=None,
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
    model_cfg = ModelConfig(
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
    )
    cfg = Config(
        model=model_cfg,
        loss=LossConfig(use_vgg_loss=False),
        # K=8 steps per dispatch: the loader-fed phase pays per-dispatch
        # tunnel latency once per 8 batches (round-4 fix for the 25K-vs-85K
        # loader-fed gap, PERF_NOTES.md round 4)
        train=TrainConfig(batch_size=B, steps_per_dispatch=8),
    )
    # the reference-default recipe: VGG perceptual loss ON (train.py:38).
    # bf16 frozen VGG + the 6-rows-in-one-apply batching (PERF_NOTES round 5)
    vgg_loss = LossConfig(
        use_vgg_loss=True, vgg_dtype="bfloat16", vgg_batched=True
    )
    cfg_vgg = Config(model=model_cfg, loss=vgg_loss,
                     train=TrainConfig(batch_size=B))
    cfg_gan = Config(
        model=model_cfg,
        loss=LossConfig(use_vgg_loss=True, vgg_dtype="bfloat16",
                        vgg_batched=True, use_patch_gan_loss=True),
        train=TrainConfig(batch_size=B),
    )

    d = tempfile.mkdtemp()
    write_synthetic_subject(d, num_frames=B, img_size=cfg.model.pred_img_size)
    ds = GazeH5Dataset(d, shuffle=False)
    batch = next(iter(BatchLoader(ds, batch_size=B, num_workers=1)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    rays = B * cfg.model.featmap_size**2
    res = {p: None for p in PHASES}

    # loader-fed phase FIRST: fresh batches through BatchLoader -> stacked
    # K=8 multi-step dispatches -> real H2D transfers, measured through the
    # REAL epoch driver (Trainer.train_epoch — the exact path `cli.train`
    # runs).  Round 3 measured 25K here vs 85K scan-fed; the per-step host
    # sync + one-dispatch-per-batch pattern was the gap (VERDICT round 3
    # #1).  Runs before the scan phases because this phase is the only one
    # sensitive to host-side state: after three compile-heavy scan phases
    # the SAME epoch drive measures ~128 ms/batch vs ~103 in a fresh
    # process (thread-pool/page-cache interference), and the device-only
    # phases are order-insensitive (scan measured 95.4 quiet vs 95.9 under
    # full CPU contention).
    if want("loader"):
        tr = Trainer(cfg, train_len=B, steps_per_epoch=100)
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
        res["loader"] = rays / best_lf
        log(f"[bench] loader-fed: {best_lf*1000:.1f} ms/batch"
            f" = {res['loader']:.0f} rays/s")

    if want("scan"):
        res["scan"] = _scan_phase("scan-fed", cfg, jb, rays, n_steps=20)
    if want("vgg"):
        res["vgg"] = _scan_phase("vgg-on (reference default recipe)",
                                 cfg_vgg, jb, rays, n_steps=10)
    if want("gan"):
        res["gan"] = _scan_phase("vgg+gan", cfg_gan, jb, rays, n_steps=10)

    # deep-march phase: the BASELINE.json-named workload — fwd+bwd at a
    # 256-sample ray march (ray_chunk bounds the live stash so S=256 fits
    # in HBM; models/gaze_nerf.py:189-242)
    if want("deep"):
        cfg256 = Config(
            model=ModelConfig(
                compute_dtype="bfloat16",
                renderer_dtype="bfloat16",
                remat_fields=False,
                num_sample_coarse=256,
                # deep-march plan (PERF_NOTES rounds 4-5): the stash-acts
                # backward LOSES at S=256 (395.7 vs 365.5 ms; int8 stash
                # loses harder) — recompute-backward + 512-ray chunks is
                # both faster and memory-bounded.  bwd TR16 beats the old
                # TR8 by 16.5 ms (348.8 vs 365.3; TR32 OOMs physical VMEM
                # at 214.8M) — round-5 tile sweep.
                ray_chunk=512,
                pallas_stash_acts=False,
                pallas_bwd_tile_rays=16,
                pallas_vmem_mb=110,
                pallas_dens_vpu=True,
            ),
            loss=LossConfig(use_vgg_loss=False),
            train=TrainConfig(batch_size=B),
        )
        res["deep"] = _scan_phase("deep-march S=256", cfg256, jb, rays,
                                  n_steps=5, reps=2)

    if want("infer"):
        tr_i = Trainer(cfg, train_len=B, steps_per_epoch=100)
        ev = tr_i.eval_step  # decode + code compose + FULL 512^2 render
        N_i = 30

        @jax.jit
        def run_infer(state):
            def body(c, _):
                # thread the carry into the gaze input: each iteration
                # depends on the last, so XLA cannot hoist the (otherwise
                # loop-invariant) render out of the scan
                b2 = dict(jb)
                b2["pitchyaw"] = jb["pitchyaw"] + c * 1e-9
                out, _cd = ev(state, b2)
                return out["mse"], None

            return jax.lax.scan(body, jnp.float32(0.0), None, length=N_i)[0]

        s = run_infer(tr_i.state)
        jax.block_until_ready(s)
        best_i = float("inf")
        for _ in range(3):
            t0 = time.time()
            s = run_infer(tr_i.state)
            np.asarray(s)
            best_i = min(best_i, time.time() - t0)
        res["infer"] = rays / (best_i / N_i)
        log(f"[bench] infer (fwd render only): {best_i/N_i*1000:.1f} ms/img-batch"
            f" = {res['infer']:.0f} rays/s")

    rnd = lambda v: None if v is None else round(v, 1)  # noqa: E731
    print(
        json.dumps(
            {
                "metric": "train_step_rays_per_sec",
                "value": rnd(res["scan"]),
                "unit": "rays/s (fwd+bwd, B=2, 64 samples, 1 chip)",
                "vs_baseline": (
                    None if res["scan"] is None
                    else round(res["scan"] / BASELINE_RAYS_PER_SEC, 3)
                ),
                "vgg_on_rays_per_sec": rnd(res["vgg"]),
                "gan_rays_per_sec": rnd(res["gan"]),
                "loader_fed_rays_per_sec": rnd(res["loader"]),
                "deep_march_256_rays_per_sec": rnd(res["deep"]),
                "infer_rays_per_sec": rnd(res["infer"]),
            }
        )
    )


if __name__ == "__main__":
    main()
