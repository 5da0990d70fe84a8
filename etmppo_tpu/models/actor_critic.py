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

Entry points:
* ``__call__(obs, memory, mask, indices)`` — reference-semantics forward on a
  raw memory window (projections inside); used by parity tests and enjoy.
* ``forward_with_kv(obs, k_win, v_win, mask)`` — fast path on pre-projected
  K/V windows (see models/transformer.py docstring).
* ``project_memory`` / ``pe_kv`` — memory-source K/V projection passthroughs.
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


def _conv_out_hw(hw: int) -> int:
    """Spatial size after the 8s4 / 4s2 / 3s1 VALID conv stack."""
    hw = (hw - 8) // 4 + 1
    hw = (hw - 4) // 2 + 1
    hw = (hw - 3) // 1 + 1
    return hw


class ActorCriticModel(nn.Module):
    """Returns (branch_logits: tuple, value: (B,), new_memory: (B, blocks, D))."""
    config: TrainConfig
    obs_shape: Tuple[int, ...]            # (V,) vector or (H, W, C) image
    action_branches: Tuple[int, ...]      # arity per multi-discrete branch
    max_episode_steps: int

    def setup(self):
        cfg = self.config
        D = cfg.transformer.embed_dim
        self.is_visual = len(self.obs_shape) > 1
        if self.is_visual:
            H, W, C = self.obs_shape
            dt = jnp.dtype(cfg.compute_dtype)
            conv = lambda feat, kern, stride, fan_in, name: nn.Conv(
                feat, (kern, kern), strides=(stride, stride), padding="VALID",
                kernel_init=orthogonal(np.sqrt(2)),
                bias_init=torch_linear_bias(fan_in), dtype=dt, name=name)
            self.conv1 = conv(32, 8, 4, 8 * 8 * C, "conv1")
            self.conv2 = conv(64, 4, 2, 4 * 4 * 32, "conv2")
            self.conv3 = conv(64, 3, 1, 3 * 3 * 64, "conv3")
            feat_in = _conv_out_hw(H) * _conv_out_hw(W) * 64
        else:
            feat_in = self.obs_shape[0]
        dt = jnp.dtype(cfg.compute_dtype)
        self.lin_hidden = nn.Dense(
            D, kernel_init=orthogonal(np.sqrt(2)),
            bias_init=torch_linear_bias(feat_in), dtype=dt, name="lin_hidden")
        self.transformer = Transformer(
            cfg.transformer, self.max_episode_steps, dtype=dt,
            name="transformer")
        self.lin_policy = nn.Dense(
            cfg.hidden_layer_size, kernel_init=orthogonal(np.sqrt(2)),
            bias_init=torch_linear_bias(D), dtype=dt, name="lin_policy")
        self.lin_value = nn.Dense(
            cfg.hidden_layer_size, kernel_init=orthogonal(np.sqrt(2)),
            bias_init=torch_linear_bias(D), dtype=dt, name="lin_value")
        self.value = nn.Dense(
            1, kernel_init=orthogonal(1.0),
            bias_init=torch_linear_bias(cfg.hidden_layer_size), name="value")
        self.policy_branches = [
            nn.Dense(n, kernel_init=orthogonal(np.sqrt(0.01)),
                     bias_init=torch_linear_bias(cfg.hidden_layer_size),
                     name=f"policy_branch_{i}")
            for i, n in enumerate(self.action_branches)]

    # --- pieces ----------------------------------------------------------

    def encode(self, obs: jax.Array) -> jax.Array:
        """Obs encoder + lin_hidden (model.py:87-97)."""
        compute_dtype = jnp.dtype(self.config.compute_dtype)
        h = obs.astype(compute_dtype)
        if self.is_visual:
            h = nn.relu(self.conv1(h))
            h = nn.relu(self.conv2(h))
            h = nn.relu(self.conv3(h))
            h = h.reshape((h.shape[0], -1))
        return nn.relu(self.lin_hidden(h))

    def heads(self, h: jax.Array):
        """Decoupled policy/value heads (model.py:104-110)."""
        h_policy = nn.relu(self.lin_policy(h))
        h_value = nn.relu(self.lin_value(h))
        value = self.value(h_value.astype(jnp.float32)).reshape(-1)
        branch_logits = tuple(
            branch(h_policy.astype(jnp.float32))
            for branch in self.policy_branches)
        return branch_logits, value

    # --- entry points ----------------------------------------------------

    def __call__(self, obs: jax.Array, memory: jax.Array,
                 memory_mask: jax.Array, memory_indices: jax.Array):
        h = self.encode(obs)
        h, new_memory = self.transformer(
            h, memory.astype(h.dtype), memory_mask, memory_indices)
        branch_logits, value = self.heads(h)
        return branch_logits, value, new_memory.astype(jnp.float32)

    def forward_with_kv(self, obs: jax.Array, k_win: jax.Array,
                        v_win: jax.Array, memory_mask: jax.Array):
        h = self.encode(obs)
        h, new_memory = self.transformer.forward_with_kv(
            h, k_win, v_win, memory_mask)
        branch_logits, value = self.heads(h)
        return branch_logits, value, new_memory.astype(jnp.float32)

    def forward_with_ops(self, obs: jax.Array, ops):
        """Pallas fused window-attention path (ops: per-block attention)."""
        h = self.encode(obs)
        h, new_memory = self.transformer.forward_with_ops(h, ops)
        branch_logits, value = self.heads(h)
        return branch_logits, value, new_memory.astype(jnp.float32)

    def project_memory(self, memory: jax.Array, slots: jax.Array):
        return self.transformer.project_memory(memory, slots)

    def pe_kv(self):
        return self.transformer.pe_kv()

    # --- init ------------------------------------------------------------

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
