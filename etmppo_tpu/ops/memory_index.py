"""Episodic-memory window index / mask tables and the rollout-tape index math.

The reference builds two small host tensors once (trainer.py:76-99):

* ``memory_mask`` — a ``tril(ones(L, L), diagonal=-1)`` boolean table whose row
  ``min(episode_step, L-1)`` is the key-padding mask for the current step.  Row 0
  is all-False: at episode step 0 every key is masked, and the reference's
  ``masked_fill(-1e20)`` + softmax yields a *uniform* attention over the (zero)
  memory slots — a quirk we reproduce bit-for-bit (transformer.py:66-69).
* ``memory_indices`` — per episode step, the absolute episode-slot indices of
  the sliding memory window: ``[0..L-1]`` for the first ``L-1`` steps, then
  ``[e-L+1 .. e]`` (trainer.py:88-99).

The TPU-native redesign replaces the reference's per-episode Python list of
memory tensors + clone-on-done (buffer.py:41-47, trainer.py:195-213) with a
**rollout tape**: every new memory item produced at rollout step ``t`` is
written once to ``tape[w, t]``; training-time windows are reconstructed from
(tape, pre-rollout snapshot) via pure index arithmetic — see
``compute_window_sources``.  This stores each memory item exactly once (the
reference duplicates whole episodes via ``clone``) and makes the entire rollout
a single ``lax.scan``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def build_memory_mask(memory_length: int) -> np.ndarray:
    """Boolean (L, L) mask table; True = attendable (reference: trainer.py:78)."""
    return np.tril(np.ones((memory_length, memory_length), dtype=bool), k=-1)


def build_memory_indices(max_episode_steps: int, memory_length: int) -> np.ndarray:
    """(max_episode_steps, L) int32 table of absolute episode-slot indices for the
    sliding window at each episode step (reference: trainer.py:88-99)."""
    L = memory_length
    T = max_episode_steps
    if T < L:
        raise ValueError(f"max_episode_steps ({T}) must be >= memory_length ({L})")
    repetitions = np.repeat(np.arange(L, dtype=np.int32)[None, :], L - 1, axis=0)
    sliding = np.stack(
        [np.arange(i, i + L, dtype=np.int32) for i in range(T - L + 1)])
    return np.concatenate([repetitions, sliding], axis=0)


class WindowSources(NamedTuple):
    """Per-sample window source locations for training-time reconstruction.

    For each flattened sample ``(w, t)`` and window position ``j``:

    * ``flat_index[w, t, j]`` — index into the per-worker combined source array
      ``concat([snapshot[w], tape[w], pe_region], axis=0)`` of length
      ``max_ep + T + max_ep``.  The trailing *PE region* holds zero content at
      slot ``s`` (so after positional-encoding addition it is PE-only):
      never-written episode slots resolve there, reproducing the reference's
      zeros-plus-PE contents (transformer.py:236-243) with a plain gather —
      no per-slot validity select needed.
    * ``valid[w, t, j]`` — True where the slot holds real memory content
      (kept for tests/diagnostics; the gather itself no longer needs it).
    * ``slot[w, t, j]`` — the absolute episode-slot index (for positional
      encoding selection), identical to the reference's ``memory_indices``.

    Because window slots are ascending and consecutive, ``flat_index`` rows
    always consist of at most THREE contiguous ascending runs (snapshot run,
    tape run, PE run) — the property the Pallas fused window-attention kernel
    exploits for bulk DMA.
    """
    flat_index: jax.Array  # (W, T, L) int32
    valid: jax.Array       # (W, T, L) bool
    slot: jax.Array        # (W, T, L) int32


def compute_window_sources(
    episode_steps: jax.Array,   # (W, T) int32 — episode step e at each rollout step
    dones: jax.Array,           # (W, T) bool  — episode terminated at this step
    index_table: jax.Array,     # (max_ep, L) int32 — build_memory_indices output
    max_episode_steps: int,
) -> WindowSources:
    """Derives training-time memory-window gather indices from rollout metadata.

    Semantics proven equivalent to the reference's episode-memory indirection
    (buffer.py:41-47, 90; trainer.py:195-213) in tests/test_rollout_semantics.py:

    * A window slot ``s`` of sample ``(w, t)`` at episode step ``e`` was (or will
      be) written at rollout step ``t_s = t + (s - e)`` of the same episode.
    * ``t_s < 0``  → written before this rollout: read ``snapshot[w, s]``
      (only possible for the worker's first, carried-in episode).
    * ``0 <= t_s`` → read ``tape[w, t_s]``; valid iff ``t_s <= next_end[w, t]``
      where ``next_end`` is the rollout step at which the sample's episode ends
      (its last memory write), or ``T-1`` if it outlives the rollout.  This
      exactly reproduces which slots the reference's stored episode memory had
      filled at ``prepare_batch_dict`` time — including "future" slots that are
      masked out but still participate in the episode-step-0 uniform-attention
      quirk.
    """
    W, T = episode_steps.shape
    slot = index_table[episode_steps]                     # (W, T, L)
    e = episode_steps[:, :, None]                         # (W, T, 1)
    t = jnp.arange(T, dtype=jnp.int32)[None, :, None]     # (1, T, 1)
    t_s = t + (slot - e)                                  # (W, T, L)

    # next_end[w, t] = min over t' >= t of (t' if done[w, t'] else T-1)
    done_step = jnp.where(dones, jnp.arange(T, dtype=jnp.int32)[None, :], T - 1)
    next_end = jnp.flip(
        jax.lax.cummin(jnp.flip(done_step, axis=1), axis=1), axis=1)  # (W, T)
    next_end = next_end[:, :, None]

    from_snapshot = t_s < 0
    valid = from_snapshot | (t_s <= next_end)
    flat_index = jnp.where(from_snapshot, slot, max_episode_steps + t_s)
    # Invalid (never-written) slots -> the PE region at their episode slot.
    flat_index = jnp.where(valid, flat_index, max_episode_steps + T + slot)
    return WindowSources(flat_index.astype(jnp.int32), valid, slot.astype(jnp.int32))


class TimelineSources(NamedTuple):
    """Contiguous-run window addressing over the per-worker memory *timeline*.

    ``timeline[w] = [snapshot[w, :e0] rows at their slot | tape[w] rows]`` —
    i.e. all memory writes of worker w in chronological order (the carried
    episode's pre-rollout slots land at rows ``0..e0-1``, tape step t at row
    ``e0 + t``).  For any sample (w, t) at episode step e with window slots
    ``s in [s_lo, s_lo+L)``, the VALID slots map to timeline rows
    ``base + s`` with ``base = e0[w] + t - e`` — one contiguous ascending run
    of ``n_valid`` rows starting at ``start = base + s_lo`` — and the invalid
    suffix maps to the PE table rows ``s_lo + n_valid .. s_lo + L - 1``, also
    contiguous.  This 2-contiguous-segment property is what the Pallas fused
    window-attention kernel exploits: 2 bulk DMAs per sample instead of an
    L-row gather.
    """
    start: jax.Array    # (W, T) int32 — first timeline row of the window
    n_valid: jax.Array  # (W, T) int32 — number of valid (timeline) slots
    s_lo: jax.Array     # (W, T) int32 — first absolute window slot (PE offset)


def compute_timeline_sources(
    episode_steps: jax.Array,   # (W, T) int32
    dones: jax.Array,           # (W, T) bool
    index_table: jax.Array,     # (max_ep, L) int32
    memory_length: int,
) -> TimelineSources:
    W, T = episode_steps.shape
    L = memory_length
    e = episode_steps
    e0 = e[:, :1]                                          # (W, 1)
    t = jnp.arange(T, dtype=jnp.int32)[None, :]
    s_lo = index_table[e][:, :, 0]                          # (W, T)
    base = e0 + t - e
    start = base + s_lo

    done_step = jnp.where(dones, jnp.arange(T, dtype=jnp.int32)[None, :], T - 1)
    next_end = jnp.flip(
        jax.lax.cummin(jnp.flip(done_step, axis=1), axis=1), axis=1)
    # valid slots: s <= e + (next_end - t); window covers [s_lo, s_lo + L - 1]
    s_valid_hi = jnp.minimum(s_lo + L - 1, e + (next_end - t))
    n_valid = jnp.clip(s_valid_hi - s_lo + 1, 1, L)
    return TimelineSources(start.astype(jnp.int32), n_valid.astype(jnp.int32),
                           s_lo.astype(jnp.int32))


def build_timeline_slots(episode_steps: jax.Array, max_episode_steps: int,
                         pad: int) -> jax.Array:
    """(W, max_ep + T + pad) int32 absolute episode-slot of each timeline row
    (snapshot rows sit at their slot; tape rows at the episode step they were
    written; padding rows are 0 — never selected)."""
    W, T = episode_steps.shape
    S = max_episode_steps + T + pad
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (W, S))
    e0 = episode_steps[:, :1].astype(jnp.int32)
    tape_idx = jnp.clip(rows - e0, 0, T - 1)
    tape_slot = jnp.take_along_axis(
        episode_steps.astype(jnp.int32), tape_idx, axis=1)
    return jnp.where(rows < e0, rows, tape_slot)


def build_timeline(snapshot: jax.Array, tape: jax.Array, e0: jax.Array,
                   pad: int) -> jax.Array:
    """(W, max_ep + T + pad, ...) chronological memory timeline: row i holds
    ``snapshot[w, i]`` for i < e0[w], else ``tape[w, i - e0[w]]`` (zeros past
    the written range; ``pad`` extra rows let fixed-length window reads run
    off the end safely)."""
    W, max_ep = snapshot.shape[:2]
    T = tape.shape[1]
    S = max_ep + T + pad
    rows = jnp.arange(S, dtype=jnp.int32)[None, :]          # (1, S)
    e0 = e0.astype(jnp.int32)[:, None]                      # (W, 1)
    from_snap = rows < e0
    snap_idx = jnp.clip(rows, 0, max_ep - 1)
    tape_idx = jnp.clip(rows - e0, 0, T - 1)
    extra = (1,) * (snapshot.ndim - 2)
    take = lambda src, idx, cap: jnp.where(
        (from_snap if src is snapshot else ~from_snap & (rows - e0 < T)
         ).reshape((W, S) + extra),
        jnp.take_along_axis(
            src, idx.reshape((W, S) + extra).astype(jnp.int32), axis=1),
        0.0)
    return take(snapshot, jnp.broadcast_to(snap_idx, (W, S)), max_ep) + \
        take(tape, jnp.broadcast_to(tape_idx, (W, S)), T)
