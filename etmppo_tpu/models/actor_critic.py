"""Actor-critic policy with an episodic-memory transformer core (Flax).

Behavioral spec (reference: model.py — studied, not translated):

* Obs encoder: 3-layer Atari-style CNN (32x8s4 -> 64x4s2 -> 64x3s1, orthogonal
  init gain sqrt(2), VALID padding) for image observations, identity for
  vectors (model.py:27-41).  TPU-native divergence: observations are NHWC
  (channels-last), the layout XLA tiles best on TPU; the reference uses NCHW.
* ``lin_hidden`` projects encoder features to embed_dim (model.py:44-45), then
  the Transformer core, then decoupled policy/value hidden layers
  (model.py:52-57), a multi-discrete policy head list (orthogonal gain
  sqrt(0.01)) and a value head (gain 1) (model.py:61-69).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import TrainConfig
from .initializers import torch_linear_kernel, torch_linear_bias, orthogonal
from .transformer import Transformer


class ActorCriticModel(nn.Module):
    """``__call__(obs, memory, memory_mask, memory_indices)`` ->
    (branch_logits: tuple, value: (B,), new_memory: (B, num_blocks, D))."""
    config: TrainConfig
    obs_shape: Tuple[int, ...]            # (V,) vector or (H, W, C) image
    action_branches: Tuple[int, ...]      # arity per multi-discrete branch
    max_episode_steps: int

    @nn.compact
    def __call__(self, obs: jax.Array, memory: jax.Array, memory_mask: jax.Array,
                 memory_indices: jax.Array):
        cfg = self.config
        D = cfg.transformer.embed_dim
        compute_dtype = jnp.dtype(cfg.compute_dtype)

        h = obs.astype(compute_dtype)
        if len(self.obs_shape) > 1:
            conv = lambda feat, kern, stride, name: nn.Conv(
                feat, (kern, kern), strides=(stride, stride), padding="VALID",
                kernel_init=orthogonal(np.sqrt(2)),
                bias_init=torch_linear_bias(
                    kern * kern * (self.obs_shape[-1] if name == "conv1" else
                                   (32 if name == "conv2" else 64))),
                dtype=compute_dtype, name=name)
            h = nn.relu(conv(32, 8, 4, "conv1")(h))
            h = nn.relu(conv(64, 4, 2, "conv2")(h))
            h = nn.relu(conv(64, 3, 1, "conv3")(h))
            h = h.reshape((h.shape[0], -1))

        h = nn.relu(nn.Dense(
            D, kernel_init=orthogonal(np.sqrt(2)),
            bias_init=torch_linear_bias(h.shape[-1]),
            dtype=compute_dtype, name="lin_hidden")(h))

        h, new_memory = Transformer(
            cfg.transformer, self.max_episode_steps, name="transformer")(
                h, memory.astype(compute_dtype), memory_mask, memory_indices)

        h_policy = nn.relu(nn.Dense(
            cfg.hidden_layer_size, kernel_init=orthogonal(np.sqrt(2)),
            bias_init=torch_linear_bias(D), dtype=compute_dtype,
            name="lin_policy")(h))
        h_value = nn.relu(nn.Dense(
            cfg.hidden_layer_size, kernel_init=orthogonal(np.sqrt(2)),
            bias_init=torch_linear_bias(D), dtype=compute_dtype,
            name="lin_value")(h))

        value = nn.Dense(
            1, kernel_init=orthogonal(1.0),
            bias_init=torch_linear_bias(cfg.hidden_layer_size),
            name="value")(h_value.astype(jnp.float32)).reshape(-1)

        branch_logits = tuple(
            nn.Dense(
                n, kernel_init=orthogonal(np.sqrt(0.01)),
                bias_init=torch_linear_bias(cfg.hidden_layer_size),
                name=f"policy_branch_{i}")(h_policy.astype(jnp.float32))
            for i, n in enumerate(self.action_branches))

        return branch_logits, value, new_memory.astype(jnp.float32)

    def init_params(self, rng: jax.Array):
        """Initializes parameters with dummy inputs of the right shapes."""
        L = self.config.transformer.memory_length
        blocks = self.config.transformer.num_blocks
        D = self.config.transformer.embed_dim
        obs = jnp.zeros((1,) + tuple(self.obs_shape), jnp.float32)
        memory = jnp.zeros((1, L, blocks, D), jnp.float32)
        mask = jnp.zeros((1, L), bool)
        indices = jnp.zeros((1, L), jnp.int32)
        return self.init(rng, obs, memory, mask, indices)
