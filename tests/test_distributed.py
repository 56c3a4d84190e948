"""Multi-process communication-backend smoke test (SURVEY.md §2.8).

The reference has no distributed story at all; ours is
``parallel.mesh.init_distributed`` -> ``jax.distributed.initialize`` with
XLA collectives.  Real multi-host needs TPU pods; this test runs TWO
separate CPU processes with the gloo collectives backend and checks a
cross-process psum — proving the initialization path and the collective
plumbing work end to end.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from gazenerf_tpu.parallel.mesh import init_distributed

pid = int(sys.argv[1])
init_distributed("localhost:%s" % sys.argv[2], num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.asarray(jax.devices()).reshape(2, -1)[:, :1]
mesh = Mesh(devs.reshape(2), ("data",))
sh = NamedSharding(mesh, P("data"))

# each process contributes its own slice; psum crosses the process boundary
local = jnp.full((1, 4), float(pid + 1))
garr = jax.make_array_from_single_device_arrays(
    (2, 4), sh, [jax.device_put(local, jax.local_devices()[0])]
)

@jax.jit
def total(x):
    return jnp.sum(x)

out = float(total(garr))
assert abs(out - 12.0) < 1e-6, out  # (1+2) * 4
print("dist ok", pid, out)
"""


@pytest.mark.skipif(
    os.environ.get("SKIP_DISTRIBUTED_TEST") == "1",
    reason="explicitly disabled",
)
def test_two_process_cpu_collective(tmp_path):
    port = "12937"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed init timed out in this environment")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "UNIMPLEMENTED" in out or "gloo" in out.lower() and "error" in out.lower()
        ):
            pytest.skip(f"cpu collectives unavailable: {out[-400:]}")
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "dist ok" in out


LOADER_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from gazenerf_tpu.parallel.mesh import init_distributed

pid = int(sys.argv[1])
data_dir = sys.argv[3]
init_distributed("localhost:%s" % sys.argv[2], num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset

# every process enumerates the SAME global schedule but decodes only its
# contiguous row slice of each batch (cli/train.py's multi-host loader)
ds = GazeH5Dataset(data_dir, shuffle=False)
sharded = BatchLoader(ds, batch_size=4, num_workers=1,
                      process_shard=(pid, 2))
full = BatchLoader(ds, batch_size=4, num_workers=1)

devs = np.asarray(jax.devices()).reshape(2, -1)[:, :1]
mesh = Mesh(devs.reshape(2), ("data",))
sh = NamedSharding(mesh, P("data"))

for local_b, full_b in zip(sharded, full):
    assert local_b["image"].shape[0] == 2  # 4 global rows / 2 processes
    # local slice must equal this process's rows of the global batch
    np.testing.assert_array_equal(
        local_b["image"], full_b["image"][pid * 2 : (pid + 1) * 2]
    )
    g = jax.make_array_from_process_local_data(
        sh, np.asarray(local_b["image"]))
    assert g.shape == full_b["image"].shape
    got = float(jax.jit(jnp.sum)(g))
    want = float(np.sum(full_b["image"], dtype=np.float64))
    assert abs(got - want) < 1e-4 * abs(want), (got, want)
print("loader dist ok", pid)
"""


CKPT_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

pid = int(sys.argv[1])
port = sys.argv[2]
data_dir = sys.argv[3]
ckpt_dir = sys.argv[4]

# drive the REAL multi-host launch path twice in-process: train 1 epoch with
# checkpointing, then RESUME from the sharded orbax checkpoint and train one
# more epoch (cli.train --coordinator/--num_processes/--process_id --dp 2)
from gazenerf_tpu.cli.train import main as train_main

TINY = [
    "--featmap_size", "16", "--pred_img_size", "64",
    "--num_sample_coarse", "8", "--mlp_hidden", "32",
    "--use_pallas", "false", "--use_vgg_loss", "false",
    "--compute_dtype", "float32", "--renderer_dtype", "float32",
    "--num_workers", "1", "--lr", "1e-3",
]
COMMON = [
    "--img_dir", data_dir, "--checkpoint_dir", ckpt_dir,
    "--coordinator", "localhost:%s" % port,
    "--num_processes", "2", "--process_id", str(pid),
    "--dp", "2", "--batch_size", "4", "--num_epochs", "1",
] + TINY

rc = train_main(COMMON)
assert rc == 0, rc
assert jax.process_count() == 2, jax.process_count()

ckpt = os.path.join(ckpt_dir, "epoch_1")
assert os.path.isdir(ckpt), os.listdir(ckpt_dir)

# restart: fresh trainer in the same processes, restore the SHARDED
# checkpoint, continue training (this is where multi-host classically breaks)
rc = train_main(COMMON + ["--resume", ckpt])
assert rc == 0, rc
assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1")), "resume ckpt kept"

# the resumed run must CONTINUE, not restart: its restored step counter
# already covers epoch 1's batches, so the summary CSV written by run 2
# reflects a second epoch of finite losses
import csv
with open(os.path.join(ckpt_dir, "summary.csv")) as f:
    rows = list(csv.DictReader(f))
assert rows and all(float(r["loss"]) == float(r["loss"]) for r in rows)
print("ckpt dist ok", pid)
"""


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SKIP_DISTRIBUTED_TEST") == "1",
    reason="explicitly disabled",
)
def test_two_process_checkpoint_save_restore_continue(tmp_path):
    """2-process run: train -> sharded orbax save -> restart -> restore ->
    continue training (VERDICT r4 #4: orbax across processes is a classic
    failure point; reference checkpoint semantics
    trainer/gazenerf_trainer.py:156-227)."""
    from gazenerf_tpu.data.synthetic import write_synthetic_subject

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_synthetic_subject(str(data_dir), num_frames=8, img_size=64)
    ckpt_dir = tmp_path / "ckpt"
    port = "12947"
    script = tmp_path / "worker.py"
    script.write_text(CKPT_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port, str(data_dir),
             str(ckpt_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed init timed out in this environment")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNIMPLEMENTED" in out:
            pytest.skip(f"cpu collectives unavailable: {out[-400:]}")
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "ckpt dist ok" in out


@pytest.mark.skipif(
    os.environ.get("SKIP_DISTRIBUTED_TEST") == "1",
    reason="explicitly disabled",
)
def test_two_process_loader_shard_assembles_global_batch(tmp_path):
    from gazenerf_tpu.data.synthetic import write_synthetic_subject

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_synthetic_subject(str(data_dir), num_frames=8, img_size=64)
    port = "12941"
    script = tmp_path / "worker.py"
    script.write_text(LOADER_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port, str(data_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed init timed out in this environment")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNIMPLEMENTED" in out:
            pytest.skip(f"cpu collectives unavailable: {out[-400:]}")
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "loader dist ok" in out
