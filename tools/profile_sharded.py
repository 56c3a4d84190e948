"""Schedule-verify the ray/data-sharded train step's gradient collectives.

VERDICT round-2 item: "profile-verify whether the gradient psum overlaps the
backward or serializes".  Real pod slices are unavailable here, so this uses
the REAL TPU compiler via AOT topology compilation (jax.experimental.
topologies, v5e:2x4 = 8 chips): lower the full-size sharded train step with
explicit shardings, compile, and analyze the optimized-HLO instruction
schedule — TPU executables are fully scheduled, and XLA's latency-hiding
scheduler splits overlappable collectives into ``*-start``/``*-done`` pairs
with compute placed between them.  The start->done instruction gap is the
overlap evidence (gap 0 = serialized).

Usage: python tools/profile_sharded.py [dp] [rp]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re

import numpy as np


def main():
    dp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rp = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    # everything host-side runs on CPU; the TPU enters only as an AOT
    # compile target (topology client), so no real chips are needed
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gazenerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from gazenerf_tpu.parallel.sharding import state_shardings
    from gazenerf_tpu.train.trainer import Trainer

    n = dp * rp
    topo = topologies.get_topology_desc(topology_name=f"v5e:{dp}x{rp}", platform="tpu")
    mesh = Mesh(np.array(topo.devices).reshape(dp, rp), ("data", "ray"))

    B = dp * 2
    cfg = Config(
        model=ModelConfig(
            compute_dtype="bfloat16", renderer_dtype="bfloat16",
            remat_fields=False,
            # XLA path: the Pallas kernels are single-chip tiles; the
            # collective schedule under test is the XLA-inserted gradient
            # psum + featmap all-gather, identical in either field path
            use_pallas=False,
        ),
        loss=LossConfig(use_vgg_loss=False),
        train=TrainConfig(batch_size=B),
    )
    tr = Trainer(cfg, train_len=B, steps_per_epoch=1, mesh=mesh)

    st_sh = state_shardings(mesh, tr.state, shard_offsets=True)
    row = NamedSharding(mesh, P("data"))

    m = cfg.model
    S = m.pred_img_size
    batch_shapes = {
        "image": ((B, S, S, 3), np.float32),
        "head_mask": ((B, S, S), np.float32),
        "left_eye_mask": ((B, S, S), np.float32),
        "right_eye_mask": ((B, S, S), np.float32),
        "code": ((B, 306), np.float32),
        "pitchyaw": ((B, 2), np.float32),
        "c2w_Rmat": ((B, 3, 3), np.float32),
        "c2w_Tvec": ((B, 3), np.float32),
        "inmat": ((B, 3, 3), np.float32),
        "sample_idx": ((B,), np.int64),
    }
    batch_sds = {
        k: jax.ShapeDtypeStruct(shp, dt, sharding=row)
        for k, (shp, dt) in batch_shapes.items()
    }
    state_sds = jax.tree_util.tree_map(
        lambda x, sh: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x), sharding=sh),
        tr.state, st_sh,
    )

    print(f"lowering full-size sharded step for v5e:{dp}x{rp} ...", flush=True)
    lowered = tr.train_step.lower(state_sds, batch_sds)
    print("compiling (AOT, topology client) ...", flush=True)
    compiled = lowered.compile()
    analyze(compiled.as_text(), n, label="default flags")
    # the latency-hiding scheduler + async collectives may be off in AOT
    # compiles; compare with them forced on (the runtime defaults on real
    # slices) to separate "XLA can't overlap this" from "flag was off"
    print("\ncompiling with latency-hiding scheduler forced on ...", flush=True)
    try:
        compiled2 = lowered.compile(
            compiler_options={
                "xla_tpu_enable_latency_hiding_scheduler": "true",
                "xla_enable_async_all_reduce": "true",
                "xla_enable_async_all_gather": "true",
            }
        )
        analyze(compiled2.as_text(), n, label="LHS forced on")
    except Exception as e:  # pragma: no cover - flag support varies
        print("LHS compile failed:", str(e)[:300])


def _line_bytes(ln: str) -> int:
    """Approximate payload bytes of an HLO op line from its result shapes."""
    lhs = ln.split("=", 1)[0] + "=" + ln.split("=", 1)[1].split("(", 1)[0]
    # shapes appear in the result tuple before the op name; parse all in line
    # up to the first operand paren of the collective itself
    head = ln.split("all-reduce(")[0].split("all-gather(")[0]
    total = 0
    for dt, dims in re.findall(r"(bf16|f32|f64|s32|u32|s8|u8)\[([0-9,]*)\]", head):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * {"bf16": 2, "s8": 1, "u8": 1}.get(dt, 4)
    return total


def analyze(txt: str, n_devices: int, label: str = ""):
    """Parse the scheduled optimized HLO for collective overlap."""
    print(f"\n#### schedule analysis ({label}) ####")
    lines = txt.splitlines()
    # collect (index, kind, name, shape) of collective start/done ops
    starts, dones = {}, {}
    pat = re.compile(
        r"%?([\w.\-]+)\s*=\s*\(?([\w\[\],{}: ()\/#*]*)\)?\s*"
        r"(all-reduce-start|all-reduce-done|all-gather-start|all-gather-done|"
        r"reduce-scatter|collective-permute-start|collective-permute-done|"
        r"all-reduce|all-gather)\(",
    )
    compute_pat = re.compile(r"\b(fusion|convolution|dot|custom-call)\(")
    compute_idx = []
    for i, ln in enumerate(lines):
        mm = pat.search(ln)
        if mm:
            name, _, kind = mm.groups()
            if kind.endswith("-start"):
                starts[name.replace("-start", "")] = (i, kind, ln.strip()[:110])
            elif kind.endswith("-done"):
                dones[ln.split("=")[1].strip()[:40] or name] = (i, kind)
            else:
                starts[name] = (i, kind + " (sync)", ln.strip()[:110])
        if compute_pat.search(ln):
            compute_idx.append(i)
    compute_idx = np.asarray(compute_idx)

    # pair -start with its -done by operand reference
    done_lines = [
        (i, ln) for i, ln in enumerate(lines) if re.search(r"-done\(", ln)
    ]
    print(f"\n== collectives in the scheduled module ({n_devices} chips) ==")
    total, overlapped = 0, 0
    n_lines = max(len(lines), 1)
    sync_bytes = 0
    for name, (i0, kind, snippet) in sorted(starts.items(), key=lambda kv: kv[1][0]):
        if "(sync)" in kind:
            b = _line_bytes(lines[i0])
            sync_bytes += b
            print(
                f"  [SYNC] line {i0} ({100 * i0 // n_lines}% of schedule) "
                f"{b / 1e6:7.2f} MB: {snippet[:80]}"
            )
            total += 1
            continue
        # find the -done consuming this start
        j = None
        for i1, ln in done_lines:
            if name in ln and i1 > i0:
                j = i1
                break
        if j is None:
            continue
        n_compute = int(((compute_idx > i0) & (compute_idx < j)).sum())
        total += 1
        overlapped += n_compute > 0
        print(
            f"  {kind:22s} start@{i0} done@{j} gap={j - i0:5d} lines, "
            f"{n_compute:4d} compute ops in flight | {snippet[:80]}"
        )
    print(
        f"\n{overlapped}/{total} async collectives have compute scheduled "
        f"between start and done (0 in-flight = serialized)."
    )
    # exposed-cost estimate for the synchronous ones: bidirectional-ring
    # all-reduce moves 2*(n-1)/n of the payload over ICI (v5e ~ 180 GB/s
    # effective per link direction)
    ici = 180e9
    est_us = sync_bytes * 2 * (n_devices - 1) / n_devices / ici * 1e6
    print(
        f"sync-collective payload {sync_bytes / 1e6:.1f} MB -> ~{est_us:.0f} us "
        f"exposed per step if fully serialized."
    )


if __name__ == "__main__":
    main()
