"""Proof-of-concept memory environment, pure JAX.

Behavioral spec (reference: environments/poc_memory_env.py — studied, not
translated): a 1-D grid where goals (+1/-1) at both ends are visible only for
the first two steps; the agent (optionally frozen during the show phase) must
remember which end rewards.  Terminal reward is +/-(1 + min_steps * 0.1), time
penalty 0.1/step, ``success`` reported in the episode info.

TPU-native design: positions are integer ticks (1 tick = step_size), making the
``position == +/-1.0`` goal checks exact without the reference's float
rounding; the env is a pure function so it vmaps over workers and compiles into
the rollout scan.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core import JaxEnv


class PocMemoryState(NamedTuple):
    ticks: jax.Array       # int32 — position in units of step_size
    goals: jax.Array       # (2,) float32, each +/-1
    step_count: jax.Array  # int32
    reward_sum: jax.Array  # float32 — running episode return
    length: jax.Array      # int32  — number of env steps taken


class PocMemoryEnv(JaxEnv):
    info_keys = ("reward", "length", "success")

    def __init__(self, step_size: float = 0.2, glob: bool = False,
                 freeze: bool = False, max_episode_steps: int = -1):
        self.step_size = step_size
        self.glob = glob
        self.freeze = freeze
        self.max_episode_steps = max_episode_steps
        self.min_steps = int(1.0 / step_size) + 1
        self.time_penalty = 0.1
        self.num_show_steps = 2
        self.goal_ticks = int(round(1.0 / step_size))

        # Possible start positions (reference: poc_memory_env.py:39-44).
        num_steps = int(0.4 / step_size)
        if not glob:
            lower = min(-2.0 * step_size, -num_steps * step_size)
            upper = max(3.0 * step_size, step_size, (num_steps + 1) * step_size)
        else:
            lower = -1 + step_size
            upper = 1
        positions = np.arange(lower, upper, step_size).clip(
            -1 + step_size, 1 - step_size)
        self.start_ticks = np.unique(
            np.round(positions / step_size).astype(np.int32))

        self.observation_shape: Tuple[int, ...] = (3,)
        self.action_branches: Tuple[int, ...] = (2,)

    def _obs(self, state: PocMemoryState, show_goals) -> jax.Array:
        pos = state.ticks.astype(jnp.float32) * self.step_size
        g = jnp.where(show_goals, state.goals, jnp.zeros(2, jnp.float32))
        return jnp.stack([g[0], pos, g[1]])

    def reset(self, key: jax.Array):
        k_pos, k_goal = jax.random.split(key)
        ticks = jax.random.choice(k_pos, jnp.asarray(self.start_ticks))
        goals = jax.random.permutation(
            k_goal, jnp.asarray([-1.0, 1.0], jnp.float32))
        state = PocMemoryState(
            ticks=ticks.astype(jnp.int32), goals=goals,
            step_count=jnp.int32(0), reward_sum=jnp.float32(0.0),
            length=jnp.int32(0))
        return state, self._obs(state, show_goals=True)

    def render_ascii(self, state: PocMemoryState) -> str:
        """Console render in the spirit of the reference's reprint view
        (poc_memory_env.py:148-180): the 1-D track with agent and goals."""
        s = jax.device_get(state)
        n = self.goal_ticks
        cells = []
        for tick in range(-n, n + 1):
            if int(s.ticks) == tick:
                cells.append("a")
            elif tick == -n:
                cells.append("+" if float(s.goals[0]) > 0 else "-")
            elif tick == n:
                cells.append("+" if float(s.goals[1]) > 0 else "-")
            else:
                cells.append(" ")
        shown = int(s.step_count) < self.num_show_steps
        return ("|" + "|".join(cells) + "|  goals shown: " + str(shown))

    def step(self, state: PocMemoryState, action: jax.Array, key: jax.Array):
        del key  # deterministic dynamics
        a = action[0]
        time_done = (self.max_episode_steps > 0) & (
            state.step_count >= self.max_episode_steps - 1)
        in_show = state.step_count < self.num_show_steps

        move = jnp.where(a == 1, 1, -1).astype(jnp.int32)
        frozen = in_show & self.freeze
        ticks = state.ticks + jnp.where(frozen, 0, move)

        at_neg = ticks == -self.goal_ticks
        at_pos = ticks == self.goal_ticks
        terminal_bonus = 1.0 + self.min_steps * self.time_penalty
        goal_reward = jnp.where(
            at_neg,
            jnp.where(state.goals[0] == 1.0, terminal_bonus, -terminal_bonus),
            jnp.where(state.goals[1] == 1.0, terminal_bonus, -terminal_bonus))
        reward = jnp.where(
            at_neg | at_pos, goal_reward, -self.time_penalty)
        # Frozen show-phase steps yield no reward and no goal check
        # (reference: poc_memory_env.py:106-109).
        reward = jnp.where(frozen, 0.0, reward)
        success = ~frozen & (
            (at_neg & (state.goals[0] == 1.0)) | (at_pos & (state.goals[1] == 1.0)))
        done = time_done | (~frozen & (at_neg | at_pos))

        new_state = PocMemoryState(
            ticks=ticks, goals=state.goals,
            step_count=state.step_count + 1,
            reward_sum=state.reward_sum + reward,
            length=state.length + 1)
        obs = self._obs(new_state, show_goals=in_show)
        info = {
            "reward": new_state.reward_sum,
            "length": new_state.length.astype(jnp.float32),
            "success": success.astype(jnp.float32),
        }
        return new_state, obs, reward, done, info
