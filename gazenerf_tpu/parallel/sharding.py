"""Sharded training: pjit layouts for the GazeNeRF train step.

The scaling design (SURVEY.md §2.8, BASELINE.json): batch + ray tiles sharded
over chips, parameters replicated, gradient ``psum`` inserted by XLA and
overlapped with the backward ray-march.  The per-sample offset tables are
row-sharded along ``data`` when ``shard_offsets`` is set (their gradients are
batch-row-disjoint, so updates need no collective at all).

This module only *annotates*: the step function itself is the ordinary
single-device step from :mod:`gazenerf_tpu.train.trainer`; under ``jit`` with
input/output shardings XLA partitions it SPMD-style (the scaling-book recipe:
pick a mesh, annotate, let XLA insert collectives).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gazenerf_tpu.train.state import TrainState


def state_shardings(mesh: Mesh, state: TrainState, shard_offsets: bool = True):
    """Sharding pytree for a TrainState: params replicated, offsets row-sharded."""
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("data"))
    offset_keys = set(state.offsets)

    def offset_shard(x):
        if not shard_offsets:
            return rep
        # rows divisible across the data axis -> shard; else replicate
        if x.ndim >= 1 and x.shape[0] % mesh.shape["data"] == 0:
            return row
        return rep

    offsets = {k: offset_shard(v) for k, v in state.offsets.items()}

    def opt_shard_with_path(path, x):
        """Adam moments of the offset tables live under the SAME dict keys
        inside the optax state tree (the trainable tree is
        ``{"net": ..., "iden": ..., ...}``), so classify by tree path, not
        by shape coincidence."""
        if not (hasattr(x, "ndim") and x.ndim >= 1):
            return rep
        for p in path:
            key = getattr(p, "key", None)
            if key in offset_keys and tuple(x.shape) == tuple(
                state.offsets[key].shape
            ):
                return offset_shard(x)
        return rep

    like = lambda tree, s: jax.tree_util.tree_map(lambda _: s, tree)  # noqa: E731
    return TrainState(
        step=rep,
        params=like(state.params, rep),
        offsets=offsets,
        opt_state=jax.tree_util.tree_map_with_path(
            opt_shard_with_path, state.opt_state
        ),
        rng=rep,
        disc_params=like(state.disc_params, rep),
        disc_batch_stats=like(state.disc_batch_stats, rep),
        disc_opt_state=like(state.disc_opt_state, rep),
    )


def batch_shardings(mesh: Mesh, batch: Dict[str, Any]):
    row = NamedSharding(mesh, P("data"))
    return {k: row for k in batch}


def shard_state(mesh: Mesh, state: TrainState, shard_offsets: bool = True) -> TrainState:
    sh = state_shardings(mesh, state, shard_offsets)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh
    )


def make_sharded_train_step(
    mesh: Mesh,
    step_fn,
    state: TrainState,
    example_batch,
    shard_offsets=True,
):
    """jit the (already-built) step with EXPLICIT in/out shardings.

    ``step_fn`` must be the *unjitted* step body; ``example_batch`` fixes the
    batch keys so every input carries a declared layout (state per
    :func:`state_shardings`, batch rows over ``data``) instead of relying on
    placement inference.
    """
    st_sh = state_shardings(mesh, state, shard_offsets)
    row = NamedSharding(mesh, P("data"))
    batch_sh = {k: row for k in example_batch}

    jitted = jax.jit(
        step_fn,
        in_shardings=(st_sh, batch_sh),
        donate_argnums=(0,),
    )

    def run(state, batch):
        batch = {
            k: jax.device_put(np.asarray(v), row) for k, v in batch.items()
        }
        return jitted(state, batch)

    return run
