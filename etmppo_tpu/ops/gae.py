"""Generalized Advantage Estimation as a reverse ``lax.scan`` on device.

Reference semantics (buffer.py:95-113): iterate t = T-1 .. 0 with
``mask = ~done``::

    last_value     = last_value * mask[t]
    last_advantage = last_advantage * mask[t]
    delta          = reward[t] + gamma * last_value - value[t]
    last_advantage = delta + gamma * lamda * last_advantage
    advantage[t]   = last_advantage
    last_value     = value[t]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def calc_advantages(
    rewards: jax.Array,     # (W, T) float32
    values: jax.Array,      # (W, T) float32
    dones: jax.Array,       # (W, T) bool
    last_value: jax.Array,  # (W,)   float32 — bootstrap V(s_T)
    gamma: float,
    lamda: float,
) -> jax.Array:
    """Returns advantages of shape (W, T)."""
    mask = (~dones).astype(values.dtype)

    def body(carry, xs):
        last_v, last_adv = carry
        reward, value, m = xs
        last_v = last_v * m
        last_adv = last_adv * m
        delta = reward + gamma * last_v - value
        last_adv = delta + gamma * lamda * last_adv
        return (value, last_adv), last_adv

    xs = (rewards.T, values.T, mask.T)  # scan over time axis
    (_, _), advantages_t = jax.lax.scan(
        body, (last_value, jnp.zeros_like(last_value)), xs, reverse=True)
    return advantages_t.T
