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
    """``pipeline=True`` (default) splits workers into
    ``config.host_pipeline_groups`` groups and overlaps each group's host env
    stepping with the other groups' device policy compute (JAX async dispatch
    is the future mechanism) — the device never waits for Python envs unless
    they are the bottleneck.  More groups buy each device dispatch G-1 host
    env steps of overlap at the cost of smaller per-dispatch batches."""

    def __init__(self, config: TrainConfig, env: HostEnvBatch,
                 model: ActorCriticModel, pipeline: bool = True):
        self.config = config
        self.env = env
        self.model = model
        trx = config.transformer
        self.max_ep = env.max_episode_steps
        self.mask_table = jnp.asarray(build_memory_mask(trx.memory_length))
        self.index_table = jnp.asarray(
            build_memory_indices(self.max_ep, trx.memory_length))
        groups = max(1, config.host_pipeline_groups) if pipeline else 1
        while groups > 1 and config.n_workers % groups != 0:
            groups -= 1
        self.n_groups = groups if (groups > 1
                                   and hasattr(env, "step_group")) else 1
        self._project = jax.jit(self._project_memory)
        self._policy_step = jax.jit(self._policy_step_impl)
        self._finish = jax.jit(self._finish_impl)

    def init_state(self, rng: jax.Array) -> HostRolloutState:
        cfg = self.config
        trx = cfg.transformer
        W = cfg.n_workers
        try:
            self.env.start(W, n_groups=self.n_groups)
        except TypeError:  # engines without group support
            self.n_groups = 1
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
        """Applies pending done-resets, then forwards the policy (KV-cached).
        Batch-size agnostic: runs on the full worker set or a pipeline group."""
        episode_step, memory, k_cache, v_cache, pe_k, pe_v, rng = carry
        W = obs.shape[0]
        L = self.config.transformer.memory_length

        done4 = prev_dones[:, None, None, None]
        memory = jnp.where(done4, 0.0, memory)
        k_cache = jnp.where(done4, pe_k[None], k_cache)
        v_cache = jnp.where(done4, pe_v[None], v_cache)
        e = jnp.where(prev_dones, 0, episode_step)

        rng, action_rng = jax.random.split(rng)
        mask = self.mask_table[jnp.clip(e, 0, L - 1)]
        s_lo = jnp.maximum(e - (L - 1), 0)
        slice_window = jax.vmap(
            lambda cache, start: jax.lax.dynamic_slice_in_dim(
                cache, start, L, axis=0))
        k_win = slice_window(k_cache, s_lo)
        v_win = slice_window(v_cache, s_lo)
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

        obs_host = np.empty((T, W) + self.env.observation_shape, np.float32)
        rewards = np.empty((T, W), np.float32)
        dones_host = np.empty((T, W), bool)
        info_lists: List[List[Optional[Dict]]] = [
            [None] * W for _ in range(T)]
        actions_l, log_probs_l, values_l, tape_l, e_l = (
            [[] for _ in range(self.n_groups)] for _ in range(5))

        # Per-group device carries (group g owns workers [g*Wg, (g+1)*Wg)).
        G = self.n_groups
        Wg = W // G
        sl = lambda g: slice(g * Wg, (g + 1) * Wg)
        rngs = jax.random.split(state.rng, G + 1)
        carries = [
            (state.episode_step[sl(g)], state.memory[sl(g)],
             k_cache[sl(g)], v_cache[sl(g)], pe_k, pe_v, rngs[g])
            for g in range(G)]
        obs_g = [np.asarray(state.obs[sl(g)]) for g in range(G)]
        prev_dones = [jnp.zeros((Wg,), bool) for g in range(G)]

        def launch(g, t):
            """Async device dispatch of group g's policy for step t."""
            obs_host[t, sl(g)] = obs_g[g]
            carries[g], outs = self._policy_step(
                params, carries[g], jnp.asarray(obs_g[g]), prev_dones[g])
            return outs

        def env_step(g, t, outs):
            """Fetches actions (sync point) and steps group g's host envs —
            by then the OTHER group's device work is already in flight."""
            actions, log_probs, value, mem_item, e = outs
            actions_l[g].append(actions)
            log_probs_l[g].append(log_probs)
            values_l[g].append(value)
            tape_l[g].append(mem_item)
            e_l[g].append(e)
            actions_np = np.asarray(actions)
            if G == 1:
                obs, r, d, infos = self.env.step(actions_np)
            else:
                obs, r, d, infos = self.env.step_group(g, actions_np)
            obs_g[g] = obs
            rewards[t, sl(g)] = r
            dones_host[t, sl(g)] = d
            info_lists[t][sl(g)] = infos
            prev_dones[g] = jnp.asarray(d)

        if G == 1:
            for t in range(T):
                env_step(0, t, launch(0, t))
        else:
            # Software pipeline (G-stage rotation): group g's device dispatch
            # for step t happens right after its host env step at t-1, so by
            # the time env_step(g, t) syncs on the actions, the other G-1
            # groups' host env stepping has covered the device latency.
            pending = [launch(g, 0) for g in range(G)]
            for t in range(T):
                for g in range(G):
                    outs = pending[g]
                    env_step(g, t, outs)
                    if t + 1 < T:
                        pending[g] = launch(g, t + 1)

        # merge group carries back into full-worker arrays
        episode_step = jnp.concatenate([c[0] for c in carries])
        memory = jnp.concatenate([c[1] for c in carries])
        merge_t = lambda lists: jnp.concatenate(
            [jnp.stack(lists[g], axis=1) for g in range(G)], axis=0)
        actions_l = [merge_t(actions_l)]
        log_probs_l = [merge_t(log_probs_l)]
        values_merged = merge_t(values_l)
        tape_l = [merge_t(tape_l)]
        e_merged = merge_t(e_l)
        obs = np.concatenate(obs_g)
        prev_dones = jnp.concatenate(prev_dones)
        final_rng = rngs[G]
        e_arr = e_merged                                   # (W, T)
        values = values_merged
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
            actions=actions_l[0],
            log_probs=log_probs_l[0],
            values=values, advantages=advantages,
            episode_steps=e_arr, dones=dones,
            tape=tape_l[0], snapshot=snapshot,
            episode_infos={k: jnp.asarray(v) for k, v in info_arrays.items()})
        new_state = HostRolloutState(
            obs=obs, episode_step=e_final, memory=memory, rng=final_rng)
        return new_state, batch
