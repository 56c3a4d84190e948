"""PatchGAN discriminator, NHWC flax.

TPU port of the reference ``PatchGAN`` (reference: models/discriminator.py:4-43):
5 convs, kernel 6, BatchNorm on the middle three, LeakyReLU(0.2), applied to
224x224-resized images.  BatchNorm uses torch defaults (momentum 0.1 ==
flax momentum 0.9, eps 1e-5); batch stats are mutable under the
``batch_stats`` collection.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PatchGAN(nn.Module):
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        conv = lambda f, s, name, bias: nn.Conv(  # noqa: E731
            f, (6, 6), strides=(s, s), padding=((1, 1), (1, 1)),
            use_bias=bias, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731

        x = act(conv(self.ndf, 2, "conv1", True)(x))
        x = act(bn("norm1")(conv(self.ndf * 2, 2, "conv2", False)(x)))
        x = act(bn("norm2")(conv(self.ndf * 4, 2, "conv3", False)(x)))
        x = act(bn("norm3")(conv(self.ndf * 8, 1, "conv4", False)(x)))
        return conv(1, 1, "conv5", True)(x)
