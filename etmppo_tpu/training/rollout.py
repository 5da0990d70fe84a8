"""Device-resident rollout: the reference's per-step pipe-RPC sampling loop
(trainer.py:145-225) compiled into a single ``lax.scan``.

Design (SURVEY.md §7 step 3): environments are vmapped pure functions, the
per-worker episodic memory is a preallocated device array updated functionally,
and every new memory item is also written once to a **rollout tape** — the
TPU-native replacement for the reference's per-episode memory list + clone
dance (buffer.py:41-47, trainer.py:195-213).  Training-time windows are later
reconstructed from (pre-rollout snapshot, tape) by pure index arithmetic
(ops/memory_index.py), so no memory item is ever duplicated.

Step order matches the reference exactly (trainer.py:159-218):
store obs / mask / indices -> model forward -> write memory item at
``(w, episode_step)`` -> sample actions -> env step -> on done: reset env,
zero the worker's live memory, reset the episode-step counter.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..envs.core import JaxEnv
from ..models.actor_critic import ActorCriticModel
from ..ops import distributions
from ..ops.gae import calc_advantages
from ..ops.memory_index import build_memory_indices, build_memory_mask


class RolloutState(NamedTuple):
    """Persistent cross-update sampler state (device-resident)."""
    env_state: Any              # vmapped env-state pytree, leading axis W
    obs: jax.Array              # (W, *obs_shape)
    episode_step: jax.Array     # (W,) int32 — current episode step per worker
    memory: jax.Array           # (W, max_ep, blocks, D) live episodic memory
    rng: jax.Array


class RolloutBatch(NamedTuple):
    """One update's worth of training data (device-resident)."""
    obs: jax.Array              # (W, T, *obs_shape)
    actions: jax.Array          # (W, T, n_branches) int32
    log_probs: jax.Array        # (W, T, n_branches)
    values: jax.Array           # (W, T)
    advantages: jax.Array       # (W, T)
    episode_steps: jax.Array    # (W, T) int32 — pre-step episode step
    dones: jax.Array            # (W, T) bool
    tape: jax.Array             # (W, T, blocks, D) — new memory item per step
    snapshot: jax.Array         # (W, max_ep, blocks, D) — pre-rollout memory
    episode_infos: Dict[str, jax.Array]  # each (W, T); valid where dones


class RolloutFn:
    """Builds the jitted rollout for (env, model, config)."""

    def __init__(self, config: TrainConfig, env: JaxEnv, model: ActorCriticModel):
        self.config = config
        self.env = env
        self.model = model
        trx = config.transformer
        self.max_ep = env.max_episode_steps
        self.mask_table = jnp.asarray(build_memory_mask(trx.memory_length))
        self.index_table = jnp.asarray(
            build_memory_indices(self.max_ep, trx.memory_length))
        self._jitted = jax.jit(self._rollout, donate_argnums=(1,))

    def init_state(self, rng: jax.Array) -> RolloutState:
        cfg = self.config
        trx = cfg.transformer
        W = cfg.n_workers
        rng, reset_rng = jax.random.split(rng)
        env_state, obs = jax.vmap(self.env.reset)(
            jax.random.split(reset_rng, W))
        return RolloutState(
            env_state=env_state, obs=obs,
            episode_step=jnp.zeros((W,), jnp.int32),
            memory=jnp.zeros(
                (W, self.max_ep, trx.num_blocks, trx.embed_dim), jnp.float32),
            rng=rng)

    def __call__(self, params, state: RolloutState
                 ) -> Tuple[RolloutState, RolloutBatch]:
        return self._jitted(params, state)

    # --- internals -------------------------------------------------------

    def _step(self, params, pe_kv, carry, _):
        """One rollout step on the KV-cache fast path: the memory window's
        K/V are *gathered* from append-only per-worker caches instead of
        re-projected every step (models/transformer.py docstring); only the
        new memory item is projected (LLM-decoder style)."""
        state, k_cache, v_cache = carry
        W = self.config.n_workers
        L = self.config.transformer.memory_length
        pe_k, pe_v = pe_kv
        rng, action_rng, step_rng, reset_rng = jax.random.split(state.rng, 4)

        e = state.episode_step
        mask = self.mask_table[jnp.clip(e, 0, L - 1)]                # (W, L)
        # Window rows are always contiguous [s_lo, s_lo + L): a dynamic slice
        # per worker beats a general gather.
        s_lo = jnp.maximum(e - (L - 1), 0)
        slice_window = jax.vmap(
            lambda cache, start: jax.lax.dynamic_slice_in_dim(
                cache, start, L, axis=0))
        k_win = slice_window(k_cache, s_lo)                           # (W, L, b, D)
        v_win = slice_window(v_cache, s_lo)
        logits, value, mem_item = self.model.apply(
            params, state.obs, k_win, v_win, mask,
            method=type(self.model).forward_with_kv)
        memory = state.memory.at[jnp.arange(W), e].set(mem_item)
        k_item, v_item = self.model.apply(
            params, mem_item, e, method=type(self.model).project_memory)
        k_cache = k_cache.at[jnp.arange(W), e].set(k_item)
        v_cache = v_cache.at[jnp.arange(W), e].set(v_item)
        actions, log_probs = distributions.sample_multi(action_rng, logits)

        env_state, obs_next, reward, done, info = jax.vmap(self.env.step)(
            state.env_state, actions, jax.random.split(step_rng, W))

        # Auto-reset (reference: trainer.py:195-213).  Resetting a worker's KV
        # caches to the PE-only projections mirrors zeroing its raw memory
        # (unwritten slots == zero content + positional encoding).
        reset_state, reset_obs = jax.vmap(self.env.reset)(
            jax.random.split(reset_rng, W))
        env_state = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape((W,) + (1,) * (old.ndim - 1)), new, old),
            reset_state, env_state)
        obs_next = jnp.where(
            done.reshape((W,) + (1,) * (obs_next.ndim - 1)), reset_obs, obs_next)
        done4 = done[:, None, None, None]
        memory = jnp.where(done4, 0.0, memory)
        k_cache = jnp.where(done4, pe_k[None], k_cache)
        v_cache = jnp.where(done4, pe_v[None], v_cache)
        episode_step = jnp.where(done, 0, e + 1)

        new_state = RolloutState(env_state, obs_next, episode_step, memory, rng)
        stored_obs = state.obs
        if self.config.obs_uint8:
            stored_obs = jnp.round(stored_obs * 255.0).astype(jnp.uint8)
        outputs = dict(
            obs=stored_obs, actions=actions, log_probs=log_probs, values=value,
            rewards=reward, dones=done, episode_steps=e, tape=mem_item,
            infos=info)
        return (new_state, k_cache, v_cache), outputs

    def _last_value(self, params, state: RolloutState, last_indices):
        """Bootstrap V(s_T) with the reference's shifted window + last-step
        positional indices quirks (trainer.py:227-237)."""
        L = self.config.transformer.memory_length
        e = state.episode_step
        start = jnp.maximum(e - L, 0)
        indices = start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
        window = jnp.take_along_axis(
            state.memory, indices[:, :, None, None], axis=1)
        mask = self.mask_table[jnp.clip(e, 0, L - 1)]
        _, last_value, _ = self.model.apply(
            params, state.obs, window, mask, last_indices)
        return last_value

    def _rollout(self, params, state: RolloutState
                 ) -> Tuple[RolloutState, RolloutBatch]:
        cfg = self.config
        W = cfg.n_workers
        snapshot = state.memory

        # Project the carried-in memory into KV caches once per rollout
        # (params are fixed within a rollout).  Unwritten slots are zero, so
        # their projections equal the PE-only values automatically.
        slots = jnp.tile(jnp.arange(self.max_ep, dtype=jnp.int32)[None], (W, 1))
        k_cache, v_cache = self.model.apply(
            params, state.memory, slots,
            method=type(self.model).project_memory)
        pe_kv = self.model.apply(params, method=type(self.model).pe_kv)

        step = functools.partial(self._step, params, pe_kv)
        (final_state, _, _), out = jax.lax.scan(
            step, (state, k_cache, v_cache), None, length=cfg.worker_steps)

        # scan stacks along time => (T, W, ...); rollout batch layout is (W, T).
        swap = lambda x: jnp.swapaxes(x, 0, 1)
        out = jax.tree.map(swap, out)

        # Reference passes the LAST step's memory_indices for the bootstrap
        # forward (trainer.py:236) — a quirk kept for parity.
        last_indices = self.index_table[out["episode_steps"][:, -1]]
        last_value = self._last_value(params, final_state, last_indices)
        advantages = calc_advantages(
            out["rewards"], out["values"], out["dones"], last_value,
            cfg.gamma, cfg.lamda)

        batch = RolloutBatch(
            obs=out["obs"], actions=out["actions"], log_probs=out["log_probs"],
            values=out["values"], advantages=advantages,
            episode_steps=out["episode_steps"], dones=out["dones"],
            tape=out["tape"], snapshot=snapshot,
            episode_infos=out["infos"])
        return final_state, batch
