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

    def offset_shard(x):
        if not shard_offsets:
            return rep
        # rows divisible across the data axis -> shard; else replicate
        if x.ndim >= 1 and x.shape[0] % mesh.shape["data"] == 0:
            return row
        return rep

    offsets = {k: offset_shard(v) for k, v in state.offsets.items()}
    like = lambda tree, s: jax.tree_util.tree_map(lambda _: s, tree)  # noqa: E731
    return TrainState(
        step=rep,
        params=like(state.params, rep),
        offsets=offsets,
        opt_state=jax.tree_util.tree_map(
            lambda x: (
                offset_shard(x)
                if hasattr(x, "ndim") and x.ndim >= 1 and _is_offset_moment(x, state)
                else rep
            ),
            state.opt_state,
        ),
        rng=rep,
        disc_params=like(state.disc_params, rep),
        disc_batch_stats=like(state.disc_batch_stats, rep),
        disc_opt_state=like(state.disc_opt_state, rep),
    )


def _is_offset_moment(x, state: TrainState) -> bool:
    """Adam moments of the offset tables share their [train_len, D] shapes."""
    shapes = {tuple(v.shape) for v in state.offsets.values()}
    return tuple(x.shape) in shapes


def batch_shardings(mesh: Mesh, batch: Dict[str, Any]):
    row = NamedSharding(mesh, P("data"))
    return {k: row for k in batch}


def shard_state(mesh: Mesh, state: TrainState, shard_offsets: bool = True) -> TrainState:
    sh = state_shardings(mesh, state, shard_offsets)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh
    )


def make_sharded_train_step(mesh: Mesh, step_fn, state: TrainState, shard_offsets=True):
    """jit the (already-built) step with explicit in/out shardings.

    ``step_fn`` must be the *unjitted* step body; we re-jit with shardings.
    """
    st_sh = state_shardings(mesh, state, shard_offsets)
    row = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def batch_sh_for(batch):
        return {k: row for k in batch}

    def wrapped(state, batch):
        return step_fn(state, batch)

    # in_shardings for batch resolved per-call via device_put; jit infers the
    # rest from input placements.
    jitted = jax.jit(wrapped, donate_argnums=(0,), out_shardings=None)

    def run(state, batch):
        batch = {
            k: jax.device_put(np.asarray(v), row) for k, v in batch.items()
        }
        return jitted(state, batch)

    return run
