"""PyTorch-parity parameter initializers.

``nn.Linear`` default init (used everywhere in the reference) is
kaiming-uniform(a=√5) on the weight and uniform(±1/√fan_in) on the bias —
both reduce to U(-1/√fan_in, 1/√fan_in). Flax's defaults (lecun_normal /
zeros-bias) differ; activation-level parity runs need the torch scheme
(SURVEY.md §7.3 item 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Flax kernel shape is [fan_in, fan_out]; bound = 1/sqrt(fan_in)."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def make_torch_bias_init(fan_in):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
