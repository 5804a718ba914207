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


def fanout_concat(params, names):
    """Fan-out fusion: concatenate the kernels/biases of sibling
    TorchDense heads that share one input, so a single matmul replaces N
    MXU-lane-padded small-N matmuls and N-1 extra reads of the shared
    activation.  `params` is the PARENT module's param dict (read from
    scope at apply time — the tensors are the same objects, so pytree,
    checkpoints, and init are unchanged); call sites slice the fused
    output columns back apart in `names` order."""
    kcat = jnp.concatenate([params[n]["kernel"] for n in names], axis=1)
    bcat = jnp.concatenate([params[n]["bias"] for n in names], axis=0)
    return kcat, bcat


class TorchDense(nn.Module):
    """``nn.Dense`` with torch.nn.Linear's exact default init for both
    kernel and bias (fan_in known at trace time from the input shape).

    Accepts a TUPLE of inputs as the split form of a concatenation:
    ``TorchDense(f)((a, b))`` computes ``concat([a, b]) @ K`` as
    ``a @ K[:da] + b @ K[da:]`` with the SAME parameter (so checkpoints and
    init are unchanged).  On TPU this avoids materializing the concat and
    the MXU padding of its odd width — measured 18% faster for the NeRF
    skip layer's 575-wide concat (63+512 vs pad-to-640)."""

    features: int
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        fan_in = sum(p.shape[-1] for p in parts)
        init = torch_uniform_init(fan_in)
        kernel = self.param("kernel", init, (fan_in, self.features),
                            self.param_dtype)
        bias = self.param("bias", init, (self.features,), self.param_dtype)
        promoted = nn.dtypes.promote_dtype(*parts, kernel, bias, dtype=self.dtype)
        *parts, kernel, bias = promoted
        y = bias
        off = 0
        for p in parts:
            y = y + jnp.dot(p, kernel[off : off + p.shape[-1]])
            off += p.shape[-1]
        return y
