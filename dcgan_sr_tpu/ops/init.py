"""Weight init with the reference's `weights_init` semantics (train.lua:42-51):

  - any Convolution: weight ~ N(0, 0.02), bias removed (`m:noBias()`)
  - any BatchNormalization: weight ~ N(1, 0.02), bias = 0
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_conv(key, shape, dtype=jnp.float32):
    """Conv / conv-transpose weight ~ N(0, 0.02); no bias exists anywhere."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def init_bn(key, num_features, dtype=jnp.float32):
    """BN scale ~ N(1, 0.02), bias 0; running stats start at (0, 1)."""
    scale = 1.0 + 0.02 * jax.random.normal(key, (num_features,), dtype)
    bias = jnp.zeros((num_features,), dtype)
    state = {
        "mean": jnp.zeros((num_features,), dtype),
        "var": jnp.ones((num_features,), dtype),
    }
    return scale, bias, state
