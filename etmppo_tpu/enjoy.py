"""Single-episode inference (reference: enjoy.py — studied, not translated).

Loads a saved model (+ its travelling config), rebuilds env and model, and
runs episodes with the incremental memory write ``memory[t] = new_memory`` and
per-step window/mask/index bookkeeping (enjoy.py:60-93).  The policy-step is
jitted; the env also steps on-device (pure JAX).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import TrainConfig
from .envs.factory import create_env
from .models.actor_critic import ActorCriticModel
from .ops import distributions
from .ops.memory_index import build_memory_indices, build_memory_mask
from .training.checkpoint import load_model


def run_episodes(model_path: str, episodes: int = 1, render: bool = True,
                 seed: int = 0, render_dir: Optional[str] = None):
    """``render`` prints ASCII for envs that support it; image-observation
    envs save one animated GIF per episode (reference enjoy.py:51 renders to
    a window — headless equivalent) under ``render_dir`` (default:
    ``renders/<model-stem>/``)."""
    params, config = load_model(model_path)
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
    def policy_step(params, obs, memory, t, key):
        indices = index_table[t][None, :]
        mask = mask_table[jnp.clip(t, 0, L - 1)][None, :]
        window = memory[indices[0]][None]          # (1, L, blocks, D)
        logits, value, new_memory = model.apply(
            params, obs[None], window, mask, indices)
        memory = memory.at[t].set(new_memory[0])
        actions, _ = distributions.sample_multi(key, logits)
        return actions[0], value[0], memory

    is_image_env = len(env.observation_shape) == 3
    if render and is_image_env and render_dir is None:
        import os
        stem = os.path.splitext(os.path.basename(model_path))[0]
        render_dir = os.path.join("renders", stem)

    rng = jax.random.PRNGKey(seed)
    returns = []
    for ep in range(episodes):
        rng, reset_key = jax.random.split(rng)
        state, obs = env.reset(reset_key)
        memory = jnp.zeros((max_ep, trx.num_blocks, trx.embed_dim), jnp.float32)
        done = False
        t = 0
        info = {}
        frames = []
        while not done:
            rng, act_key, step_key = jax.random.split(rng, 3)
            if render and hasattr(env, "render_ascii"):
                print(env.render_ascii(state))
            if render and is_image_env:
                frames.append(np.asarray(obs))
            action, value, memory = policy_step(
                params, jnp.asarray(obs), memory, jnp.int32(t), act_key)
            state, obs, reward, done, info = env.step(state, action, step_key)
            done = bool(done)
            t += 1
        ep_return = float(info["reward"])
        returns.append(ep_return)
        print(f"Episode length: {int(info['length'])}")
        print(f"Episode reward: {ep_return}")
        if "success" in info:
            print(f"Episode success: {bool(info['success'])}")
        if render and is_image_env and frames:
            import os
            from .utils.render import save_episode_gif
            frames.append(np.asarray(obs))  # terminal observation
            path = save_episode_gif(
                frames, os.path.join(render_dir, f"episode_{ep:03d}.gif"))
            print(f"Episode rendered to {path}")
    return returns
