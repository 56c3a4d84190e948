"""Capture a jax.profiler trace of the full train step and print an op-level
time decomposition (VERDICT round-2 item: trace-backed decomposition of the
~40 ms constant part of the step).

Usage: python tools/profile_step.py [overrides-json] [outdir]
Parses the xplane proto with tensorboard_plugin_profile into per-op totals,
grouped by a coarse phase heuristic (field kernels / renderer / loss / other).
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    outdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="jaxprof_")

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
    loss_kw = {k[5:]: mc.pop(k) for k in list(mc) if k.startswith("loss_")}
    loss_kw.setdefault("use_vgg_loss", False)
    cfg = Config(
        model=ModelConfig(**mc),
        loss=LossConfig(**loss_kw),
        train=TrainConfig(batch_size=B),
    )

    d = tempfile.mkdtemp()
    write_synthetic_subject(d, num_frames=B, img_size=cfg.model.pred_img_size)
    ds = GazeH5Dataset(d, shuffle=False)
    batch = next(iter(BatchLoader(ds, batch_size=B, num_workers=1)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    tr = Trainer(cfg, train_len=B, steps_per_epoch=100)
    step = tr.train_step
    N = 10

    @jax.jit
    def run(state):
        def body(s, _):
            s2, losses = step(s, jb)
            return s2, losses["total_loss"]

        return jax.lax.scan(body, state, None, length=N)

    state, losses = run(tr.state)
    jax.block_until_ready(losses)
    # warm rep (tunnel warms per process)
    state, losses = run(state)
    np.asarray(losses[-1])

    with jax.profiler.trace(outdir):
        state, losses = run(state)
        np.asarray(losses[-1])

    print("trace dir:", outdir)
    summarize(outdir, N)


def summarize(outdir, n_steps, top=45):
    """Parse the xplane proto directly (tensorboard_plugin_profile's converter
    is protobuf-incompatible in this image) and print per-op device totals."""
    import glob
    import re

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not xs:
        print("no xplane found")
        return
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(xs[-1], "rb").read())
    dev = next(p for p in sp.planes if "/device:TPU" in p.name)
    meta = dev.event_metadata

    per_op = {}
    for line in dev.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            nm = meta[ev.metadata_id].name
            per_op[nm] = per_op.get(nm, 0.0) + ev.duration_ps / 1e9  # ms

    def bucket(nm):
        n = nm.lower()
        if "fused_field_bwd" in n or ("custom-call" in n and "bwd" in n):
            return "field bwd kernel"
        if "fused_field" in n or "field_kernel" in n:
            return "field fwd kernel"
        if "shuffle" in n or "upsample" in n or "blur" in n:
            return "renderer shuffle"
        if re.search(r"conv|dot", n):
            return "matmul/conv"
        if "fusion" in n:
            return "fusion (elementwise)"
        if "copy" in n or "transpose" in n or "bitcast" in n:
            return "copy/transpose"
        if "dynamic" in n or "gather" in n or "scatter" in n:
            return "gather/scatter"
        if "reduce" in n:
            return "reduce"
        if "custom-call" in n:
            return "custom-call (pallas)"
        return "other"

    groups = {}
    for nm, t in per_op.items():
        b = bucket(nm)
        groups[b] = groups.get(b, 0.0) + t / n_steps

    print("\n== by bucket (ms/step, device XLA-op self time) ==")
    for c, t in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {t:8.2f}  {c}")
    print(f"  {sum(groups.values()):8.2f}  TOTAL")
    print(f"\n== top {top} ops (ms/step) ==")
    for nm, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {t / n_steps:8.3f}  {nm[:130]}")


if __name__ == "__main__":
    main()
