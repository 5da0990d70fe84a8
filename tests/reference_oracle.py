"""NumPy oracle implementing the reference's mathematical semantics.

Pure-NumPy re-derivations of the formulas documented in SURVEY.md §2/#5-6 and
§3.2 (attention with sqrt(embed_dim) scaling, -1e20 key-padding fill, GRU
gates, pre/post layer norm, GAE recursion, the episodic-memory list/indirection
bookkeeping).  Written from the spec, used as golden references in tests — NOT
imported by the framework.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def multi_head_attention(values, keys, queries, mask, p, embed_dim, num_heads):
    """p: dict with Wv, Wk, Wq (D, D) kernels (in, out), Wo, bo."""
    N, L, D = values.shape
    Q = queries.shape[1]
    head = embed_dim // num_heads
    v = (values @ p["Wv"]).reshape(N, L, num_heads, head)
    k = (keys @ p["Wk"]).reshape(N, L, num_heads, head)
    q = (queries @ p["Wq"]).reshape(N, Q, num_heads, head)
    energy = np.einsum("nqhd,nkhd->nhqk", q, k)
    if mask is not None:
        energy = np.where(mask[:, None, None, :], energy, -1e20)
    attention = softmax(energy / np.sqrt(embed_dim), axis=3)
    out = np.einsum("nhqk,nkhd->nqhd", attention, v).reshape(N, Q, embed_dim)
    return out @ p["Wo"] + p["bo"]


def gru_gate(x, y, p):
    """p: Wr, Ur, Wz, Uz, Wg, Ug kernels (in, out); bg (D,)."""
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    r = sig(y @ p["Wr"] + x @ p["Ur"])
    z = sig(y @ p["Wz"] + x @ p["Uz"] - p["bg"])
    h = np.tanh(y @ p["Wg"] + (r * x) @ p["Ug"])
    return (1 - z) * x + z * h


def transformer_block(value, key, query, mask, p, cfg):
    """cfg: dict(embed_dim, num_heads, layer_norm, gtrxl)."""
    if cfg["layer_norm"] == "pre":
        query_ = layer_norm(query, p["norm1_scale"], p["norm1_bias"])
        value = layer_norm(value, p["norm_kv_scale"], p["norm_kv_bias"])
        key = value
    else:
        query_ = query
    attention = multi_head_attention(
        value, key, query_, mask, p["attention"], cfg["embed_dim"],
        cfg["num_heads"])
    if cfg["gtrxl"]:
        h = gru_gate(query, attention, p["gate1"])
    else:
        h = attention + query
    if cfg["layer_norm"] == "post":
        h = layer_norm(h, p["norm1_scale"], p["norm1_bias"])
    h_ = layer_norm(h, p["norm2_scale"], p["norm2_bias"]) \
        if cfg["layer_norm"] == "pre" else h
    forward = np.maximum(h_ @ p["fc_kernel"] + p["fc_bias"], 0.0)
    if cfg["gtrxl"]:
        out = gru_gate(h, forward, p["gate2"])
    else:
        out = forward + h
    if cfg["layer_norm"] == "post":
        out = layer_norm(out, p["norm2_scale"], p["norm2_bias"])
    return out


def sinusoidal_position_table(max_steps, dim, min_timescale=2.0,
                              max_timescale=1e4):
    freqs = np.arange(0, dim, min_timescale)
    inv_freqs = max_timescale ** (-freqs / dim)
    seq = np.arange(max_steps - 1, -1, -1.0)
    s = seq[:, None] * inv_freqs[None, :]
    return np.concatenate([np.sin(s), np.cos(s)], axis=-1)


def transformer_forward(h, memories, mask, memory_indices, p, cfg,
                        max_episode_steps):
    """Full transformer encoder: embed, add PE to all block memories, then
    length-1-query blocks collecting stop-gradient inputs as new memory."""
    h = np.maximum(h @ p["embed_kernel"] + p["embed_bias"], 0.0)
    if cfg["positional_encoding"] == "relative":
        pos = sinusoidal_position_table(max_episode_steps, cfg["embed_dim"])
        memories = memories + pos[memory_indices][:, :, None, :]
    elif cfg["positional_encoding"] == "learned":
        memories = memories + p["pos_embedding"][memory_indices][:, :, None, :]
    out_memories = []
    for i in range(cfg["num_blocks"]):
        out_memories.append(h.copy())
        mem = memories[:, :, i]
        h = transformer_block(mem, mem, h[:, None, :], mask, p[f"block_{i}"],
                              cfg)[:, 0, :]
    return h, np.stack(out_memories, axis=1)


def gae(rewards, values, dones, last_value, gamma, lamda):
    """Reference GAE recursion (buffer.py:107-113)."""
    W, T = rewards.shape
    advantages = np.zeros((W, T), np.float64)
    mask = ~dones
    last_adv = np.zeros(W)
    lv = last_value.astype(np.float64).copy()
    for t in reversed(range(T)):
        lv = lv * mask[:, t]
        last_adv = last_adv * mask[:, t]
        delta = rewards[:, t] + gamma * lv - values[:, t]
        last_adv = delta + gamma * lamda * last_adv
        advantages[:, t] = last_adv
        lv = values[:, t].astype(np.float64)
    return advantages


def build_memory_mask(L):
    return np.tril(np.ones((L, L), dtype=bool), k=-1)


def build_memory_indices(max_ep, L):
    reps = np.repeat(np.arange(L)[None, :], L - 1, axis=0)
    slide = np.stack([np.arange(i, i + L) for i in range(max_ep - L + 1)])
    return np.concatenate([reps, slide]).astype(np.int64)


class ReferenceMemorySim:
    """Host-side simulation of the reference's episodic-memory bookkeeping
    (trainer.py:145-225 + buffer.py:41-93): list of per-episode memories with
    live views, clone-on-done, memory_index indirection.  Drives on recorded
    (episode_steps, dones, tape items) from a rollout and reproduces the
    training-time window contents the reference would gather."""

    def __init__(self, n_workers, worker_steps, max_ep, num_blocks, embed_dim,
                 memory_length, initial_memory):
        self.W, self.T = n_workers, worker_steps
        self.max_ep, self.L = max_ep, memory_length
        self.blocks, self.D = num_blocks, embed_dim
        self.live = initial_memory.copy()          # (W, max_ep, blocks, D)
        self.memories: List[np.ndarray] = [self.live[w] for w in range(self.W)]
        self.memory_index = np.zeros((self.W, self.T), np.int64)
        for w in range(self.W):
            self.memory_index[w, :] = w
        self.index_table = build_memory_indices(max_ep, memory_length)

    def run(self, episode_steps, dones, tape):
        """episode_steps/dones: (W, T); tape: (W, T, blocks, D) new memory
        item written at each step."""
        for t in range(self.T):
            for w in range(self.W):
                e = episode_steps[w, t]
                self.memories[self.memory_index[w, t]][e] = tape[w, t]
                if dones[w, t]:
                    mi = self.memory_index[w, t]
                    self.memories[mi] = self.memories[mi].copy()  # clone
                    # live view for w is replaced by fresh zeros
                    fresh = np.zeros((self.max_ep, self.blocks, self.D),
                                     np.float32)
                    if t < self.T - 1:
                        self.memories.append(fresh)
                        self.memory_index[w, t + 1:] = len(self.memories) - 1
                    # note: `fresh` must also be the target of later writes
                    # for this worker — handled because memory_index now
                    # points at it.

    def window(self, w, t, episode_steps):
        """Training-time gathered window for sample (w, t):
        memories[memory_index[w,t]][index_table[e]] (buffer.py:90 +
        trainer.py:271)."""
        e = episode_steps[w, t]
        mem = self.memories[self.memory_index[w, t]]
        return mem[self.index_table[e]]
