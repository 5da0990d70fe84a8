"""Batched policy evaluation (the reference's evaluation protocol lives in the
external neroRL framework: 5 training seeds x 50 env seeds x 5 repeats, IQM +
bootstrapped CI, reference README.md:230 — here it is a built-in).

Runs N episodes as ONE vmapped, jitted scan: N environments reset with
distinct seeds, stepped for max_episode_steps with done-latching; returns
per-episode statistics and aggregates (mean, std, IQM).

CLI: python -m etmppo_tpu.evaluate --model=./models/run.nn --episodes=50
"""
from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import TrainConfig
from .envs.factory import create_env
from .models.actor_critic import ActorCriticModel
from .ops import distributions
from .ops.memory_index import build_memory_indices, build_memory_mask
from .training.checkpoint import load_model


def interquartile_mean(values: np.ndarray) -> float:
    """IQM: mean of the middle 50% (rliable's headline statistic)."""
    v = np.sort(np.asarray(values).ravel())
    n = len(v)
    lo, hi = n // 4, n - n // 4
    return float(v[lo:hi].mean()) if hi > lo else float(v.mean())


def evaluate_params(params, config: TrainConfig, episodes: int = 50,
                    seed: int = 0) -> Dict[str, np.ndarray]:
    """Returns per-episode arrays for each env info key (reward/length/...)."""
    env = create_env(config.environment)
    model = ActorCriticModel(
        config=config, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    trx = config.transformer
    L = trx.memory_length
    max_ep = env.max_episode_steps
    mask_table = jnp.asarray(build_memory_mask(L))
    index_table = jnp.asarray(build_memory_indices(max_ep, L))

    @jax.jit
    def run(params, rng):
        reset_rng, rng = jax.random.split(rng)
        env_state, obs = jax.vmap(env.reset)(
            jax.random.split(reset_rng, episodes))
        memory = jnp.zeros((episodes, max_ep, trx.num_blocks, trx.embed_dim))
        slots = jnp.tile(jnp.arange(max_ep, dtype=jnp.int32)[None],
                         (episodes, 1))
        k_cache, v_cache = model.apply(
            params, memory, slots, method=type(model).project_memory)

        def step(carry, _):
            env_state, obs, t, finished, k_cache, v_cache, rng, infos = carry
            rng, a_rng, s_rng = jax.random.split(rng, 3)
            mask = mask_table[jnp.clip(t, 0, L - 1)]
            s_lo = jnp.maximum(t - (L - 1), 0)
            slice_window = jax.vmap(
                lambda cache, start: jax.lax.dynamic_slice_in_dim(
                    cache, start, L, axis=0))
            k_win = slice_window(k_cache, s_lo)
            v_win = slice_window(v_cache, s_lo)
            logits, _, mem_item = model.apply(
                params, obs, k_win, v_win, mask,
                method=type(model).forward_with_kv)
            k_item, v_item = model.apply(
                params, mem_item, t, method=type(model).project_memory)
            ar = jnp.arange(episodes)
            k_cache = k_cache.at[ar, t].set(k_item)
            v_cache = v_cache.at[ar, t].set(v_item)
            actions, _ = distributions.sample_multi(a_rng, logits)
            env_state, obs, reward, done, info = jax.vmap(env.step)(
                env_state, actions, jax.random.split(s_rng, episodes))
            ended_now = done & ~finished
            infos = {k: jnp.where(ended_now, info[k], infos[k])
                     for k in infos}
            finished = finished | done
            t = jnp.where(finished, t, t + 1)
            return (env_state, obs, t, finished, k_cache, v_cache, rng,
                    infos), None

        infos0 = {k: jnp.zeros((episodes,), jnp.float32)
                  for k in env.info_keys}
        carry = (env_state, obs, jnp.zeros((episodes,), jnp.int32),
                 jnp.zeros((episodes,), bool), k_cache, v_cache, rng, infos0)
        carry, _ = jax.lax.scan(step, carry, None, length=max_ep)
        return carry[7], carry[3]

    infos, finished = run(params, jax.random.PRNGKey(seed))
    assert bool(np.asarray(finished).all()), "episodes must terminate"
    return {k: np.asarray(v) for k, v in infos.items()}


def evaluate_model(model_path: str, episodes: int = 50, seed: int = 0
                   ) -> Dict[str, float]:
    params, config = load_model(model_path)
    infos = evaluate_params(params, config, episodes, seed)
    summary: Dict[str, float] = {}
    for key, values in infos.items():
        summary[key + "_mean"] = float(values.mean())
        summary[key + "_std"] = float(values.std())
        summary[key + "_iqm"] = interquartile_mean(values)
    return summary


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a trained model")
    parser.add_argument("--model", default="./models/run.nn")
    parser.add_argument("--episodes", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    summary = evaluate_model(args.model, args.episodes, args.seed)
    for key, value in sorted(summary.items()):
        print(f"{key}: {value:.4f}")


if __name__ == "__main__":
    main()
