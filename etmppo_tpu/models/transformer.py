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

TPU-native fast paths (no reference equivalent — the reference recomputes
PE-add + LayerNorm + K/V projections of every window slot at every forward):

* ``project_memory`` applies PE + (pre-LN) norm_kv + K/V projections to memory
  *source* entries once; because PE/LN/projection depend only on the entry and
  its absolute slot (never on which window views it), windows of **projected**
  K/V can then be gathered by index.  The rollout uses this as an append-only
  KV cache (LLM-decoder style: project each new memory item once); training
  projects the (snapshot, tape) source array once per minibatch instead of
  once per window slot — an O(memory_length) FLOP reduction of the dominant
  term in both phases.
* ``forward_with_kv`` runs the block stack on pre-projected K/V windows.
* Unwritten memory slots hold zero content, so their projected K/V equal the
  projection of the positional encoding alone — ``pe_kv`` supplies those
  values for masked/invalid slots (preserving the episode-step-0
  uniform-attention quirk exactly).
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
    """Masked multi-head attention with the reference's sqrt(embed_dim) scale.
    K/V projection and the attention contraction are separate methods so K/V
    can be precomputed per memory-source entry (see module docstring)."""
    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        D = self.embed_dim
        dense = lambda name, bias: nn.Dense(
            D, use_bias=bias, kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(D), dtype=self.dtype, name=name)
        self.values = dense("values", False)
        self.keys = dense("keys", False)
        self.queries = dense("queries", False)
        self.fc_out = dense("fc_out", True)

    def project_kv(self, values: jax.Array, keys: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
        return self.keys(keys), self.values(values)

    def attend_with_op(self, queries: jax.Array, op) -> jax.Array:
        """Attention where the QK/softmax/PV contraction is delegated to
        ``op`` (e.g. the Pallas fused window-attention kernel).  ``op`` maps
        projected queries (B, D) -> attention output (B, D); masking happens
        inside the op."""
        q = self.queries(queries)           # (B, Q=1, D)
        out = op(q[:, 0, :])[:, None, :]
        return self.fc_out(out)

    def attend(self, k: jax.Array, v: jax.Array, queries: jax.Array,
               mask: Optional[jax.Array]) -> jax.Array:
        """k/v: (B, L, D) pre-projected; queries: (B, Q, D) unprojected."""
        D, H = self.embed_dim, self.num_heads
        head = D // H
        B, L = k.shape[0], k.shape[1]
        Q = queries.shape[1]
        q = self.queries(queries).reshape(B, Q, H, head)
        k = k.reshape(B, L, H, head)
        v = v.reshape(B, L, H, head)
        energy = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            energy = jnp.where(mask[:, None, None, :], energy, MASK_FILL)
        # Reference quirk: scale by sqrt(embed_dim), not sqrt(head_dim).
        attention = jax.nn.softmax(energy / np.sqrt(D), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attention, v).reshape(B, Q, D)
        return self.fc_out(out)

    def __call__(self, values: jax.Array, keys: jax.Array, queries: jax.Array,
                 mask: Optional[jax.Array]) -> jax.Array:
        k, v = self.project_kv(values, keys)
        return self.attend(k, v, queries, mask)


class GRUGate(nn.Module):
    """GRU gating unit replacing residual connections in GTrXL
    (reference: transformer.py:255-298).  ``bias`` > 0 initializes the gate
    near the identity map (Markovian policy at init)."""
    dim: int
    bias: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        D = self.dim
        kernel = lambda name: self.param(
            name, xavier_uniform(), (D, D)).astype(self.dtype)
        Wr, Wz, Wg = kernel("Wr"), kernel("Wz"), kernel("Wg")
        Ur, Uz, Ug = kernel("Ur"), kernel("Uz"), kernel("Ug")
        bg = self.param(
            "bg", nn.initializers.constant(self.bias), (D,)).astype(self.dtype)
        x = x.astype(self.dtype)
        y = y.astype(self.dtype)
        # Concatenated kernels: 3 matmuls instead of 6 (identical math; the
        # rollout scan is op-count bound at small model sizes).
        yW = y @ jnp.concatenate([Wr, Wz, Wg], axis=1)
        xU = x @ jnp.concatenate([Ur, Uz], axis=1)
        r = jax.nn.sigmoid(yW[..., :D] + xU[..., :D])
        z = jax.nn.sigmoid(yW[..., D:2 * D] + xU[..., D:] - bg)
        h = jnp.tanh(yW[..., 2 * D:] + (r * x) @ Ug)
        return (1.0 - z) * x + z * h


class TransformerBlock(nn.Module):
    """One TrXL/GTrXL block (reference: transformer.py:88-172)."""
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        D = cfg.embed_dim
        self.attention = MultiHeadAttention(
            D, cfg.num_heads, dtype=self.dtype, name="attention")
        ln = cfg.layer_norm
        if ln in ("pre", "post"):
            self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                      name="norm1")
            self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                      name="norm2")
        if ln == "pre":
            self.norm_kv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                        name="norm_kv")
        if cfg.gtrxl:
            self.gate1 = GRUGate(D, cfg.gtrxl_bias, dtype=self.dtype,
                                 name="gate1")
            self.gate2 = GRUGate(D, cfg.gtrxl_bias, dtype=self.dtype,
                                 name="gate2")
        self.fc = nn.Dense(D, kernel_init=torch_linear_kernel,
                           bias_init=torch_linear_bias(D), dtype=self.dtype,
                           name="fc")

    def project_kv(self, memory: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """PE-added memory entries -> projected (k, v). Applies the shared
        pre-LN norm_kv first when configured (transformer.py:129-132)."""
        if self.config.layer_norm == "pre":
            memory = self.norm_kv(memory)
        return self.attention.project_kv(memory, memory)

    def attend_with_op_and_project(self, op, query: jax.Array) -> jax.Array:
        """Block forward where the attention contraction is delegated to
        ``op`` (Pallas kernel path); mask lives inside the op."""
        cfg = self.config
        query_ = self.norm1(query) if cfg.layer_norm == "pre" else query
        attention = self.attention.attend_with_op(query_, op)
        return self._post_attention(attention, query)

    def attend_and_project(self, k: jax.Array, v: jax.Array, query: jax.Array,
                           mask: Optional[jax.Array]) -> jax.Array:
        """Block forward given pre-projected K/V (query: (B, Q, D))."""
        cfg = self.config
        ln = cfg.layer_norm
        query_ = self.norm1(query) if ln == "pre" else query
        attention = self.attention.attend(k, v, query_, mask)
        return self._post_attention(attention, query)

    def _post_attention(self, attention: jax.Array, query: jax.Array
                        ) -> jax.Array:
        cfg = self.config
        ln = cfg.layer_norm
        if cfg.gtrxl:
            h = self.gate1(query, attention)
        else:
            h = attention + query
        if ln == "post":
            h = self.norm1(h)
        h_ = self.norm2(h) if ln == "pre" else h
        forward = nn.relu(self.fc(h_))
        if cfg.gtrxl:
            out = self.gate2(h, forward)
        else:
            out = forward + h
        if ln == "post":
            out = self.norm2(out)
        return out

    def __call__(self, value: jax.Array, key: jax.Array, query: jax.Array,
                 mask: Optional[jax.Array]) -> jax.Array:
        del key  # K == V always (transformer.py:249)
        k, v = self.project_kv(value)
        return self.attend_and_project(k, v, query, mask)


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
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        # Transformer input comes from lin_hidden whose width == embed_dim
        # (reference: model.py:44-48), so fan_in == embed_dim.
        self.linear_embedding = nn.Dense(
            cfg.embed_dim, kernel_init=orthogonal(np.sqrt(2)),
            bias_init=torch_linear_bias(cfg.embed_dim), dtype=self.dtype,
            name="linear_embedding")
        self.blocks = [TransformerBlock(cfg, dtype=self.dtype,
                                        name=f"block_{i}")
                       for i in range(cfg.num_blocks)]
        if cfg.positional_encoding == "learned":
            self.pos_embedding = self.param(
                "pos_embedding", nn.initializers.normal(1.0),
                (self.max_episode_steps, cfg.embed_dim))

    def positional_table(self) -> Optional[jax.Array]:
        cfg = self.config
        if cfg.positional_encoding == "relative":
            return jnp.asarray(
                sinusoidal_position_table(self.max_episode_steps, cfg.embed_dim))
        if cfg.positional_encoding == "learned":
            return self.pos_embedding
        return None

    def embed(self, h: jax.Array) -> jax.Array:
        return nn.relu(self.linear_embedding(h))

    def __call__(self, h: jax.Array, memories: jax.Array, mask: jax.Array,
                 memory_indices: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Reference-semantics path: raw memory windows, projections inside."""
        cfg = self.config
        h = self.embed(h)
        pos = self.positional_table()
        if pos is not None:
            # Same absolute-slot encoding added to every block's memory
            # (reference: transformer.py:236-243).
            memories = memories + pos[memory_indices][:, :, None, :]

        out_memories = []
        for i, block in enumerate(self.blocks):
            out_memories.append(jax.lax.stop_gradient(h))
            mem_i = memories[:, :, i]
            h = block(mem_i, mem_i, h[:, None, :], mask)[:, 0, :]
        return h, jnp.stack(out_memories, axis=1)

    # --- projected-KV fast path -----------------------------------------

    def project_memory(self, memory: jax.Array, slots: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
        """Projects memory source entries to (k, v) once per entry.

        memory: (..., num_blocks, D) raw memory items (zero if unwritten)
        slots:  (...) int32 absolute episode-slot index per entry
        Returns (k, v), each (..., num_blocks, D).
        """
        pos = self.positional_table()
        if pos is not None:
            memory = memory + pos[slots][..., None, :]
        ks, vs = [], []
        for i, block in enumerate(self.blocks):
            k, v = block.project_kv(memory[..., i, :])
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks, axis=-2), jnp.stack(vs, axis=-2)

    def pe_kv(self) -> Tuple[jax.Array, jax.Array]:
        """Projected K/V of *unwritten* slots (zero content + PE):
        (max_episode_steps, num_blocks, D) each."""
        zeros = jnp.zeros(
            (self.max_episode_steps, self.config.num_blocks,
             self.config.embed_dim), jnp.float32)
        slots = jnp.arange(self.max_episode_steps, dtype=jnp.int32)
        return self.project_memory(zeros, slots)

    def forward_with_kv(self, h: jax.Array, k_win: jax.Array, v_win: jax.Array,
                        mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Block stack on pre-projected K/V windows.

        h: (B, input_dim); k_win/v_win: (B, L, num_blocks, D); mask: (B, L).
        Returns (h_out (B, D), new_memory (B, num_blocks, D)).
        """
        h = self.embed(h)
        out_memories = []
        for i, block in enumerate(self.blocks):
            out_memories.append(jax.lax.stop_gradient(h))
            h = block.attend_and_project(
                k_win[:, :, i], v_win[:, :, i], h[:, None, :], mask)[:, 0, :]
        return h, jnp.stack(out_memories, axis=1)

    def forward_with_ops(self, h: jax.Array, ops) -> Tuple[jax.Array, jax.Array]:
        """Block stack where each block's attention contraction is delegated
        to ``ops[i]`` (projected q (B, D) -> attention out (B, D)); used by
        the Pallas fused window-attention path."""
        h = self.embed(h)
        out_memories = []
        for i, block in enumerate(self.blocks):
            out_memories.append(jax.lax.stop_gradient(h))
            h = block.attend_with_op_and_project(ops[i], h[:, None, :])[:, 0, :]
        return h, jnp.stack(out_memories, axis=1)
