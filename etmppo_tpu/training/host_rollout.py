"""Rollout driver for host (Python) environments.

Same contract as training/rollout.py's RolloutFn — returns an identical
``RolloutBatch`` so the jitted PPO update is shared — but environments step on
the host (envs/host.py process pool) while the policy, episodic memory, KV
caches, bootstrap value and GAE all stay on device.  Exactly ONE device
dispatch per env step (done-handling from step t is folded into the forward of
step t+1), vs the reference's eager per-step graph plus per-worker pipe RPC
(trainer.py:159-218).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..envs.host import HostEnvBatch
from ..models.actor_critic import ActorCriticModel
from ..ops import distributions
from ..ops.gae import calc_advantages
from ..ops.memory_index import build_memory_indices, build_memory_mask
from .rollout import RolloutBatch


class HostRolloutState(NamedTuple):
    obs: np.ndarray             # (W, *obs_shape) host-side current obs
    episode_step: jax.Array     # (W,) int32 (device)
    memory: jax.Array           # (W, max_ep, blocks, D) (device)
    rng: jax.Array


class HostRolloutFn:
    def __init__(self, config: TrainConfig, env: HostEnvBatch,
                 model: ActorCriticModel):
        self.config = config
        self.env = env
        self.model = model
        trx = config.transformer
        self.max_ep = env.max_episode_steps
        self.mask_table = jnp.asarray(build_memory_mask(trx.memory_length))
        self.index_table = jnp.asarray(
            build_memory_indices(self.max_ep, trx.memory_length))
        self._project = jax.jit(self._project_memory)
        self._policy_step = jax.jit(self._policy_step_impl)
        self._finish = jax.jit(self._finish_impl)

    def init_state(self, rng: jax.Array) -> HostRolloutState:
        cfg = self.config
        trx = cfg.transformer
        W = cfg.n_workers
        self.env.start(W)
        obs = self.env.reset_all()
        return HostRolloutState(
            obs=obs, episode_step=jnp.zeros((W,), jnp.int32),
            memory=jnp.zeros(
                (W, self.max_ep, trx.num_blocks, trx.embed_dim), jnp.float32),
            rng=rng)

    # --- jitted pieces ---------------------------------------------------

    def _project_memory(self, params, memory):
        W = self.config.n_workers
        slots = jnp.tile(jnp.arange(self.max_ep, dtype=jnp.int32)[None], (W, 1))
        k_cache, v_cache = self.model.apply(
            params, memory, slots, method=type(self.model).project_memory)
        pe_kv = self.model.apply(params, method=type(self.model).pe_kv)
        return k_cache, v_cache, pe_kv

    def _policy_step_impl(self, params, carry, obs, prev_dones):
        """Applies pending done-resets, then forwards the policy (KV-cached)."""
        episode_step, memory, k_cache, v_cache, pe_k, pe_v, rng = carry
        W = self.config.n_workers
        L = self.config.transformer.memory_length

        done4 = prev_dones[:, None, None, None]
        memory = jnp.where(done4, 0.0, memory)
        k_cache = jnp.where(done4, pe_k[None], k_cache)
        v_cache = jnp.where(done4, pe_v[None], v_cache)
        e = jnp.where(prev_dones, 0, episode_step)

        rng, action_rng = jax.random.split(rng)
        mask = self.mask_table[jnp.clip(e, 0, L - 1)]
        indices = self.index_table[e]
        idx = indices[:, :, None, None]
        k_win = jnp.take_along_axis(k_cache, idx, axis=1)
        v_win = jnp.take_along_axis(v_cache, idx, axis=1)
        logits, value, mem_item = self.model.apply(
            params, obs, k_win, v_win, mask,
            method=type(self.model).forward_with_kv)
        memory = memory.at[jnp.arange(W), e].set(mem_item)
        k_item, v_item = self.model.apply(
            params, mem_item, e, method=type(self.model).project_memory)
        k_cache = k_cache.at[jnp.arange(W), e].set(k_item)
        v_cache = v_cache.at[jnp.arange(W), e].set(v_item)
        actions, log_probs = distributions.sample_multi(action_rng, logits)

        carry = (e + 1, memory, k_cache, v_cache, pe_k, pe_v, rng)
        return carry, (actions, log_probs, value, mem_item, e)

    def _finish_impl(self, params, memory, episode_step, last_obs, last_dones,
                     last_indices, values, rewards, dones):
        """Pending resets -> reference-quirk bootstrap value -> GAE."""
        cfg = self.config
        L = cfg.transformer.memory_length
        memory = jnp.where(last_dones[:, None, None, None], 0.0, memory)
        e = jnp.where(last_dones, 0, episode_step)

        start = jnp.maximum(e - L, 0)
        indices = start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
        window = jnp.take_along_axis(memory, indices[:, :, None, None], axis=1)
        mask = self.mask_table[jnp.clip(e, 0, L - 1)]
        _, last_value, _ = self.model.apply(
            params, last_obs, window, mask, last_indices)
        advantages = calc_advantages(
            rewards, values, dones, last_value, cfg.gamma, cfg.lamda)
        return memory, e, advantages

    # --- host loop -------------------------------------------------------

    def __call__(self, params, state: HostRolloutState
                 ) -> Tuple[HostRolloutState, RolloutBatch]:
        cfg = self.config
        W, T = cfg.n_workers, cfg.worker_steps
        snapshot = state.memory

        k_cache, v_cache, (pe_k, pe_v) = self._project(params, state.memory)
        carry = (state.episode_step, state.memory, k_cache, v_cache,
                 pe_k, pe_v, state.rng)

        obs_host = np.empty((T, W) + self.env.observation_shape, np.float32)
        rewards = np.empty((T, W), np.float32)
        dones_host = np.empty((T, W), bool)
        info_lists: List[List[Optional[Dict]]] = []
        actions_l, log_probs_l, values_l, tape_l, e_l = [], [], [], [], []

        obs = state.obs
        prev_dones = jnp.zeros((W,), bool)
        for t in range(T):
            obs_host[t] = obs
            carry, (actions, log_probs, value, mem_item, e) = \
                self._policy_step(params, carry, jnp.asarray(obs), prev_dones)
            actions_l.append(actions)
            log_probs_l.append(log_probs)
            values_l.append(value)
            tape_l.append(mem_item)
            e_l.append(e)
            actions_np = np.asarray(actions)
            obs, rewards[t], dones_host[t], infos = self.env.step(actions_np)
            info_lists.append(infos)
            prev_dones = jnp.asarray(dones_host[t])

        episode_step, memory = carry[0], carry[1]
        e_arr = jnp.stack(e_l, axis=1)                     # (W, T)
        values = jnp.stack(values_l, axis=1)
        dones = jnp.asarray(dones_host.T)                  # (W, T)
        rewards_dev = jnp.asarray(rewards.T)
        last_indices = self.index_table[e_arr[:, -1]]
        memory, e_final, advantages = self._finish(
            params, memory, episode_step, jnp.asarray(obs), prev_dones,
            last_indices, values, rewards_dev, dones)

        # Episode infos -> dense (W, T) arrays keyed like the JAX envs.
        keys = set(self.env.info_keys)
        for infos in info_lists:
            for info in infos:
                if info:
                    keys.update(k for k, v in info.items()
                                if np.isscalar(v) or isinstance(v, (bool,)))
        info_arrays = {k: np.zeros((W, T), np.float32) for k in sorted(keys)}
        for t, infos in enumerate(info_lists):
            for w, info in enumerate(infos):
                if info:
                    for k in info_arrays:
                        info_arrays[k][w, t] = float(info.get(k, 0.0))

        batch = RolloutBatch(
            obs=jnp.asarray(obs_host.transpose((1, 0) + tuple(
                range(2, obs_host.ndim)))),
            actions=jnp.stack(actions_l, axis=1),
            log_probs=jnp.stack(log_probs_l, axis=1),
            values=values, advantages=advantages,
            episode_steps=e_arr, dones=dones,
            tape=jnp.stack(tape_l, axis=1), snapshot=snapshot,
            episode_infos={k: jnp.asarray(v) for k, v in info_arrays.items()})
        new_state = HostRolloutState(
            obs=obs, episode_step=e_final, memory=memory, rng=carry[6])
        return new_state, batch
