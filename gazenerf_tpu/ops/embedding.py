"""NeRF positional (frequency) encoding.

TPU-native, channels-last re-design of the reference ``Embedder``
(reference: utils/model_utils.py:240-280).  The reference concatenates
``[x, sin(f0*x), cos(f0*x), sin(f1*x), ...]`` along the channel dim of an
NCHW tensor; we do the same along the trailing dim of a ``[..., D]`` array so
the feature order is transplant-compatible (channel block k of size D matches
the reference's block k).

The whole encoding is a single broadcasted multiply + sin/cos + reshape —
purely VPU work that XLA fuses into neighbouring ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(
    x: jnp.ndarray, n_freqs: int, include_input: bool = True
) -> jnp.ndarray:
    """Frequency-encode the trailing dimension of ``x``.

    Args:
      x: ``[..., D]`` coordinates.
      n_freqs: number of octaves; frequencies are ``2**arange(n_freqs)``
        (log-sampled, reference utils/model_utils.py:261).
      include_input: prepend the raw coordinates (reference ``include_input``).

    Returns:
      ``[..., D * (2 * n_freqs) (+ D)]`` with channel order
      ``[x, sin(1x), cos(1x), sin(2x), cos(2x), ...]`` matching the
      reference's concat order (utils/model_utils.py:255-270).
    """
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)  # [F]
    # [..., F, D]: broadcast multiply; keep D fastest so that reshape yields
    # per-frequency D-blocks like the reference's channel concat.
    xb = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave sin/cos per frequency: [..., F, 2, D] -> [..., F*2*D]
    sc = jnp.stack([sin, cos], axis=-2)
    sc = sc.reshape(*x.shape[:-1], n_freqs * 2 * x.shape[-1])
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc


def embed_dim(input_dim: int, n_freqs: int, include_input: bool = True) -> int:
    d = input_dim * 2 * n_freqs
    return d + input_dim if include_input else d
