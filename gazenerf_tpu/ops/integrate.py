"""Alpha-compositing volume integration.

TPU-native re-design of the reference ``CalcRayColor``
(reference: utils/model_utils.py:493-534), channels-last.

``alpha = 1 - exp(-sigma * dist)``; transmittance is the *exclusive* running
product of ``(1 - alpha + 1e-10)`` along the sample axis; per-sample weight is
``alpha * T``; outputs are weight-summed features, depth, and the residual
background alpha.

Two transmittance implementations are provided:

* ``cumprod`` — bit-matches the reference (used for parity tests).
* ``associative_scan`` — ``jax.lax.associative_scan`` over the sample axis;
  mathematically identical, O(log S) depth, and splittable across cores when
  samples are sharded (our analogue of blockwise/ring attention — see
  SURVEY.md §2.8 "SP/CP" row).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-10


class Integrated(NamedTuple):
    features: jnp.ndarray  # [B, R, C]  weight-summed features
    bg_alpha: jnp.ndarray  # [B, R]     1 - sum(weights)
    depth: jnp.ndarray  # [B, R]
    weights: jnp.ndarray  # [B, R, S]


def exclusive_transmittance(
    alpha: jnp.ndarray, use_scan: bool = False
) -> jnp.ndarray:
    """Exclusive cumulative product of ``(1 - alpha + eps)`` along last axis.

    ``T[..., i] = prod_{j < i} (1 - alpha[..., j] + 1e-10)`` with ``T[..., 0] = 1``
    (reference utils/model_utils.py:504-514 pads a leading 1 then cumprods).
    """
    x = 1.0 - alpha + _EPS
    if use_scan:
        prod_inc = jax.lax.associative_scan(jnp.multiply, x, axis=-1)
    else:
        prod_inc = jnp.cumprod(x, axis=-1)
    ones = jnp.ones_like(prod_inc[..., :1])
    return jnp.concatenate([ones, prod_inc[..., :-1]], axis=-1)


def integrate_rays(
    features: jnp.ndarray,
    density: jnp.ndarray,
    z_dists: jnp.ndarray,
    zvals: jnp.ndarray,
    use_scan: bool = False,
) -> Integrated:
    """Volume-render features along rays.

    Args:
      features: ``[B, R, S, C]`` per-sample features (the reference's 258-ch
        "rgb" output).
      density: ``[B, R, S]`` non-negative densities.
      z_dists: ``[B, R, S]`` world-space segment lengths.
      zvals: ``[B, R, S]`` plane-relative depths (for the depth output).
    """
    alpha = 1.0 - jnp.exp(-density * z_dists)  # [B, R, S]
    trans = exclusive_transmittance(alpha, use_scan=use_scan)
    weights = alpha * trans  # [B, R, S]

    feat = jnp.einsum("brs,brsc->brc", weights, features, precision="highest")
    depth = jnp.sum(weights * zvals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    return Integrated(features=feat, bg_alpha=1.0 - acc, depth=depth, weights=weights)
