"""TransformerXL / GTrXL episodic-memory core, TPU-native (Flax).

Behavioral spec (reference: transformer.py — studied, not translated):

* ``MultiHeadAttention``: bias-free Q/K/V projections + biased output
  projection; attention energy masked with -1e20 where the key-padding mask is
  False (so an all-masked row yields a *uniform* distribution instead of NaN);
  softmax scale is ``sqrt(embed_dim)``, NOT ``sqrt(head_dim)`` — a reference
  quirk kept for parity (transformer.py:66-69).
* ``TransformerBlock``: "pre" / "post" / no LayerNorm variants with
  identity-map reordering for "pre" (query normed, K==V normed with a shared
  LayerNorm); residuals optionally replaced by GRU gates (GTrXL)
  (transformer.py:117-172).
* ``Transformer``: length-1 query attending over a window of cached block
  inputs.  Each block's *input* (stop-gradient) becomes its memory item, so
  gradients flow only through the query path; K/V are frozen rollout
  activations (transformer.py:246-253).  Positional encodings ("relative"
  sinusoid with reverse-enumerated positions, or "learned") are added to every
  block's memory, selected by absolute episode-slot indices
  (transformer.py:174-186, 236-243).

The forward pass supports an arbitrary query batch shape with a window of L
keys per sample; both the rollout (B = n_workers) and the training minibatch
(B = minibatch size) call the same code.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import TransformerConfig
from .initializers import torch_linear_kernel, torch_linear_bias, orthogonal, \
    xavier_uniform

MASK_FILL = -1e20


def sinusoidal_position_table(max_steps: int, dim: int,
                              min_timescale: float = 2.0,
                              max_timescale: float = 1e4) -> np.ndarray:
    """(max_steps, dim) sinusoid table with positions enumerated in REVERSE
    (reference: transformer.py:174-186, esp. line 183) — slot i encodes
    position ``max_steps - 1 - i``."""
    freqs = np.arange(0, dim, min_timescale, dtype=np.float32)
    inv_freqs = max_timescale ** (-freqs / dim)
    seq = np.arange(max_steps - 1, -1, -1.0, dtype=np.float32)
    sinusoid = seq[:, None] * inv_freqs[None, :]
    return np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)


class MultiHeadAttention(nn.Module):
    """Masked multi-head attention with the reference's sqrt(embed_dim) scale."""
    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, values: jax.Array, keys: jax.Array, queries: jax.Array,
                 mask: Optional[jax.Array]) -> jax.Array:
        """values/keys: (B, L, D); queries: (B, Q, D); mask: (B, L) bool or None.
        Returns (B, Q, D)."""
        D, H = self.embed_dim, self.num_heads
        head = D // H
        B, L = keys.shape[0], keys.shape[1]
        Q = queries.shape[1]

        dense = lambda name: nn.Dense(
            D, use_bias=False, kernel_init=torch_linear_kernel, name=name)
        v = dense("values")(values).reshape(B, L, H, head)
        k = dense("keys")(keys).reshape(B, L, H, head)
        q = dense("queries")(queries).reshape(B, Q, H, head)

        energy = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            energy = jnp.where(mask[:, None, None, :], energy, MASK_FILL)
        # Reference quirk: scale by sqrt(embed_dim), not sqrt(head_dim).
        attention = jax.nn.softmax(energy / np.sqrt(D), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attention, v).reshape(B, Q, D)
        return nn.Dense(D, kernel_init=torch_linear_kernel,
                        bias_init=torch_linear_bias(D), name="fc_out")(out)


class GRUGate(nn.Module):
    """GRU gating unit replacing residual connections in GTrXL
    (reference: transformer.py:255-298).  ``bias`` > 0 initializes the gate
    near the identity map (Markovian policy at init)."""
    dim: int
    bias: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        dense = lambda name: nn.Dense(
            self.dim, use_bias=False, kernel_init=xavier_uniform(), name=name)
        bg = self.param("bg", nn.initializers.constant(self.bias), (self.dim,))
        r = jax.nn.sigmoid(dense("Wr")(y) + dense("Ur")(x))
        z = jax.nn.sigmoid(dense("Wz")(y) + dense("Uz")(x) - bg)
        h = jnp.tanh(dense("Wg")(y) + dense("Ug")(r * x))
        return (1.0 - z) * x + z * h


class TransformerBlock(nn.Module):
    """One TrXL/GTrXL block (reference: transformer.py:88-172)."""
    config: TransformerConfig

    @nn.compact
    def __call__(self, value: jax.Array, key: jax.Array, query: jax.Array,
                 mask: Optional[jax.Array]) -> jax.Array:
        cfg = self.config
        D = cfg.embed_dim
        ln = cfg.layer_norm

        if ln == "pre":
            query_ = nn.LayerNorm(epsilon=1e-5, name="norm1")(query)
            value = nn.LayerNorm(epsilon=1e-5, name="norm_kv")(value)
            key = value
        else:
            query_ = query

        attention = MultiHeadAttention(D, cfg.num_heads, name="attention")(
            value, key, query_, mask)

        if cfg.gtrxl:
            h = GRUGate(D, cfg.gtrxl_bias, name="gate1")(query, attention)
        else:
            h = attention + query

        if ln == "post":
            h = nn.LayerNorm(epsilon=1e-5, name="norm1")(h)
        h_ = nn.LayerNorm(epsilon=1e-5, name="norm2")(h) if ln == "pre" else h

        forward = nn.relu(nn.Dense(
            D, kernel_init=torch_linear_kernel, bias_init=torch_linear_bias(D),
            name="fc")(h_))

        if cfg.gtrxl:
            out = GRUGate(D, cfg.gtrxl_bias, name="gate2")(h, forward)
        else:
            out = forward + h

        if ln == "post":
            out = nn.LayerNorm(epsilon=1e-5, name="norm2")(out)
        return out


class Transformer(nn.Module):
    """Episodic-memory transformer encoder (reference: transformer.py:188-253).

    ``__call__(h, memories, mask, memory_indices)``:
      h:              (B, input_dim) current-step features (the length-1 query)
      memories:       (B, L, num_blocks, D) cached block inputs (stop-gradient)
      mask:           (B, L) bool key-padding mask
      memory_indices: (B, L) absolute episode-slot indices for pos. encoding
    Returns (h_out (B, D), new_memory (B, num_blocks, D)).
    """
    config: TransformerConfig
    max_episode_steps: int

    @nn.compact
    def __call__(self, h: jax.Array, memories: jax.Array, mask: jax.Array,
                 memory_indices: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        D = cfg.embed_dim

        h = nn.relu(nn.Dense(
            D, kernel_init=orthogonal(np.sqrt(2)),
            bias_init=torch_linear_bias(h.shape[-1]),
            name="linear_embedding")(h))

        pos = self.positional_table()
        if pos is not None:
            # Same absolute-slot encoding added to every block's memory
            # (reference: transformer.py:236-243).
            memories = memories + pos[memory_indices][:, :, None, :]

        out_memories = []
        for i in range(cfg.num_blocks):
            out_memories.append(jax.lax.stop_gradient(h))
            mem_i = memories[:, :, i]
            h = TransformerBlock(cfg, name=f"block_{i}")(
                mem_i, mem_i, h[:, None, :], mask)[:, 0, :]
        return h, jnp.stack(out_memories, axis=1)

    def positional_table(self) -> Optional[jax.Array]:
        cfg = self.config
        if cfg.positional_encoding == "relative":
            return jnp.asarray(
                sinusoidal_position_table(self.max_episode_steps, cfg.embed_dim))
        if cfg.positional_encoding == "learned":
            return self.param(
                "pos_embedding", nn.initializers.normal(1.0),
                (self.max_episode_steps, cfg.embed_dim))
        return None
