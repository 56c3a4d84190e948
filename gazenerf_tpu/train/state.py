"""Train state: network params, per-sample offset tables, optimizer states.

TPU re-design of the reference trainer's mutable-attribute soup
(reference: trainer/gazenerf_trainer.py:407-476): one immutable pytree that
jitted steps thread through, containing

* the GazeNeRF params,
* the five **per-sample latent offset tables** (iden 100 / expr 79 /
  appea 127 / delta-Euler 3 / delta-Tvec 3 per training image — reference
  :425-440), stored dense and gathered by global sample id inside the step,
* optax states for the per-group optimizer (per-group LRs: net x1, iden x1,
  expr x0.1, appea x1, euler x0.1, tvec x0.1 — reference :463-474),
* optional PatchGAN discriminator params/stats/opt state,
* the PRNG key for stratified jitter.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gazenerf_tpu.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    offsets: Dict[str, jnp.ndarray]
    opt_state: Any
    rng: jax.Array
    disc_params: Optional[Any] = None
    disc_batch_stats: Optional[Any] = None
    disc_opt_state: Optional[Any] = None


def make_offsets(train_len: int) -> Dict[str, jnp.ndarray]:
    """Zero-initialized per-sample offset tables (reference :425-440)."""
    z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
    return {
        "iden": z(train_len, 100),
        "expr": z(train_len, 79),
        "appea": z(train_len, 127),
        "euler": z(train_len, 3),
        "tvec": z(train_len, 3, 1),
    }


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int, mult: float):
    """Per-step schedule reproducing the reference's per-epoch LambdaLR decay
    ``lr = lr0 * 0.1 ** (epoch / step_decay)`` (reference :236-239)."""

    def fn(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.lr * mult * 0.1 ** (epoch / cfg.step_decay)

    return fn


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Per-group Adam over the trainable tree ``{"net", "iden", "expr",
    "appea", "euler", "tvec"}``."""
    mults = {
        "net": 1.0,
        "iden": cfg.lr_mult_iden,
        "expr": cfg.lr_mult_expr,
        "appea": cfg.lr_mult_appea,
        "euler": cfg.lr_mult_euler,
        "tvec": cfg.lr_mult_tvec,
    }

    def group_tx(mult):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2),
            optax.scale_by_schedule(
                lambda s: -lr_schedule(cfg, steps_per_epoch, mult)(s)
            ),
        )

    def label_fn(tree):
        return {k: jax.tree_util.tree_map(lambda _: k, v) for k, v in tree.items()}

    return optax.multi_transform(
        {k: group_tx(m) for k, m in mults.items()}, label_fn
    )


def make_disc_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam(lr, weight_decay=1e-4) for the PatchGAN (reference :242)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.disc_lr_weight_decay),
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2),
        optax.scale(-cfg.lr),
    )


def trainable_tree(state: TrainState) -> Dict[str, Any]:
    return {"net": state.params, **state.offsets}


def apply_trainable(state: TrainState, tree: Dict[str, Any]) -> TrainState:
    offsets = {k: tree[k] for k in state.offsets}
    return state.replace(params=tree["net"], offsets=offsets)
