"""Parameter initialization matching torch.nn.Linear defaults exactly.

The reference model uses torch Linear layers throughout.  torch's
``nn.Linear.reset_parameters`` draws the kernel from
kaiming_uniform(a=sqrt(5)) — which reduces to U(-1/sqrt(fan_in),
1/sqrt(fan_in)) — and the bias from the SAME fan_in-dependent bound.
flax's ``bias_init`` signature does not expose fan_in, so instead of an
approximate fixed bound (the round-1 compromise) we provide ``TorchDense``,
a Dense layer that computes fan_in from its input at trace time and draws
both kernel and bias from the exact torch bound.  Param names ("kernel",
"bias") and dtype-promotion semantics match ``nn.Dense``, so checkpoints
and param pytrees are unchanged.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear's kernel AND bias
    distribution (``nn.Linear.reset_parameters``)."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchDense(nn.Module):
    """``nn.Dense`` with torch.nn.Linear's exact default init for both
    kernel and bias (fan_in known at trace time from the input shape)."""

    features: int
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = torch_uniform_init(x.shape[-1])
        kernel = self.param("kernel", init, (x.shape[-1], self.features),
                            self.param_dtype)
        bias = self.param("bias", init, (self.features,), self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        return jnp.dot(x, kernel) + bias
