"""Parameter initializers matching the reference's PyTorch init scheme.

The reference orthogonalizes *some* weights (model.py:33-35, 45, 53, 57, 64, 69;
transformer.py:207) and leaves the rest at torch defaults:

* ``nn.Linear`` default: weight ~ kaiming_uniform(a=sqrt(5)) which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
* ``nn.Conv2d`` default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with
  fan_in = in_channels * kh * kw.
* GRUGate weights: xavier_uniform (transformer.py:280-285).

Learning-curve parity depends on matching these distributions, so they are
reimplemented here for Flax (kernel layout (in, out) / (kh, kw, in, out)).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.nn.initializers import orthogonal, xavier_uniform


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for a Dense kernel (in, out)."""
    fan_in = np.prod(shape[:-1])
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    """torch Linear/Conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


__all__ = [
    "torch_linear_kernel", "torch_linear_bias", "orthogonal", "xavier_uniform",
]
