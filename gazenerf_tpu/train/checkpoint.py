"""Checkpoint / resume via orbax: params, optimizer, offsets, PRNG, config.

TPU twin of the reference's torch-pickle checkpoints
(reference: trainer/gazenerf_trainer.py:156-227 — which include the model,
optimizer, the five per-sample offset tables and all RNG states, enabling
bitwise resume).  Here the whole :class:`TrainState` pytree (step, params,
offsets, optimizer moments, PRNG key, discriminator state) is saved with
orbax's sharding-aware checkpointer, plus the serialized ``Config`` so a run
restores from the checkpoint alone.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from gazenerf_tpu.config import Config
from gazenerf_tpu.train.state import TrainState

_STATE_DIR = "state"
_CONFIG_FILE = "config.json"


def save_checkpoint(directory: str, state: TrainState, cfg: Config, epoch: int) -> str:
    """Write ``<dir>/epoch_<n>/{state/, config.json}``; returns the path."""
    path = os.path.abspath(os.path.join(directory, f"epoch_{epoch + 1}"))
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, _STATE_DIR), state, force=True)
    meta = {"config": json.loads(cfg.to_json()), "epoch": epoch}
    with open(os.path.join(path, _CONFIG_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    epochs = []
    for name in os.listdir(directory):
        if name.startswith("epoch_"):
            try:
                epochs.append((int(name.split("_")[1]), name))
            except ValueError:
                continue
    if not epochs:
        return None
    return os.path.join(directory, max(epochs)[1])


def load_checkpoint(path: str, template: TrainState) -> Tuple[TrainState, Config, int]:
    """Restore a checkpoint written by :func:`save_checkpoint`.

    ``template`` is an abstract/concrete TrainState with the target structure
    (shapes + shardings); restored arrays adopt its shardings.

    Leading-dimension mismatches against the stored arrays (the per-sample
    offset tables and their optimizer moments are sized by the TRAINING run's
    ``train_len`` — reference trainer/gazenerf_trainer.py:407-423 — while
    eval entry points build a ``train_len=1`` trainer) are resolved in favor
    of the stored shape, so any checkpoint restores into any template.
    """
    with open(os.path.join(path, _CONFIG_FILE)) as f:
        meta = json.load(f)
    cfg = Config.from_json(json.dumps(meta["config"]))
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    state_path = os.path.join(path, _STATE_DIR)
    try:
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(state_path, abstract)
    except ValueError:
        # template shapes disagree with the stored arrays: restore the
        # raw tree (stored shapes win) and graft it back onto the
        # template's pytree structure by key path
        with ocp.StandardCheckpointer() as ckptr:
            raw = ckptr.restore(state_path)
        state = _graft_raw(raw, template)
    return state, cfg, meta["epoch"]


def _graft_raw(raw, template):
    """Map a raw (nested-dict) orbax restore onto ``template``'s structure."""
    kp = jax.tree_util

    def fetch(path):
        node = raw
        for p in path:
            if isinstance(p, kp.GetAttrKey):
                node = node[p.name]
            elif isinstance(p, kp.DictKey):
                node = node[p.key]
            elif isinstance(p, kp.SequenceKey):
                node = node[p.idx]
            else:  # FlattenedIndexKey
                node = node[p.key]
        return node

    flat, treedef = kp.tree_flatten_with_path(template)
    return kp.tree_unflatten(treedef, [fetch(p) for p, _ in flat])
