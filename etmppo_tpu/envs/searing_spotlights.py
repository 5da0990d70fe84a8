"""Searing Spotlights, pure JAX.

Task-equivalent reimplementation of memory-gym's ``SearingSpotlights-v0``
(reference wrapper: environments/memory_gym_env.py; task per the Memory Gym
paper): the arena is fully lit for a brief initial phase, then goes dark —
the agent is only visible (to itself!) inside roaming spotlights, which also
damage it.  It must dead-reckon from its remembered position, collect the
coin, then reach the exit.  Rewards: coin pickup, exit success, per-hit
damage penalty; episode ends on exit, health depletion, or the step limit.

NOTE: behaviorally equivalent, not pixel/parameter-identical to memory-gym
(available through the host bridge as ``SearingSpotlights-host`` when the
package is installed).  The memory challenge is preserved: position must be
tracked in memory across dark steps.

This env exercises the framework's MULTI-DISCRETE action path: two branches
of 3 actions each (dx, dy in {-1, 0, +1}), like the original's MultiDiscrete
movement.

Observation: 84x84x3 float32 in [0,1] (HWC).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core import JaxEnv

N_SPOTS = 4
SHOW_STEPS = 6          # fully-lit initial phase
AGENT_SPEED = 0.035
SPOT_SPEED = 0.02
SPOT_RADIUS = 0.16
AGENT_RADIUS = 0.035
COIN_RADIUS = 0.04
EXIT_RADIUS = 0.05


class SearingSpotlightsState(NamedTuple):
    pos: jax.Array          # (2,) float32 agent position in [0,1]^2
    health: jax.Array       # float32
    coin_pos: jax.Array     # (2,) float32
    coin_collected: jax.Array  # bool
    exit_pos: jax.Array     # (2,) float32
    spot_pos: jax.Array     # (N, 2)
    spot_target: jax.Array  # (N, 2)
    t: jax.Array            # int32
    reward_sum: jax.Array   # float32
    length: jax.Array       # int32


class SearingSpotlightsEnv(JaxEnv):
    info_keys = ("reward", "length", "success")
    max_episode_steps = 256

    def __init__(self, reset_params: Dict):
        p = dict(reset_params or {})
        self.initial_health = float(p.get("agent_health", 100.0))
        self.damage = float(p.get("spot_damage", 2.5))
        self.r_coin = float(p.get("reward_coin", 0.25))
        self.r_exit = float(p.get("reward_exit", 1.0))
        self.r_damage = float(p.get("reward_damage", 0.0))
        self.r_death = float(p.get("reward_death", 0.0))
        self.observation_shape: Tuple[int, ...] = (84, 84, 3)
        # multi-discrete movement: (dx, dy), each in {-1, 0, +1}
        self.action_branches: Tuple[int, ...] = (3, 3)

    def _observe(self, state: SearingSpotlightsState) -> jax.Array:
        yy, xx = jnp.mgrid[0:84, 0:84]
        px = (xx.astype(jnp.float32) + 0.5) / 84.0
        py = (yy.astype(jnp.float32) + 0.5) / 84.0

        def disk(center, radius):
            return ((px - center[0]) ** 2 + (py - center[1]) ** 2
                    < radius ** 2)

        floor = jnp.full((84, 84, 3), 0.25, jnp.float32)
        scene = floor
        scene = jnp.where(disk(state.exit_pos, EXIT_RADIUS)[:, :, None],
                          jnp.asarray([0.1, 0.8, 0.2]), scene)
        show_coin = ~state.coin_collected
        coin = disk(state.coin_pos, COIN_RADIUS) & show_coin
        scene = jnp.where(coin[:, :, None], jnp.asarray([0.95, 0.85, 0.1]),
                          scene)
        scene = jnp.where(disk(state.pos, AGENT_RADIUS)[:, :, None],
                          jnp.asarray([0.9, 0.15, 0.1]), scene)

        lit = state.t < SHOW_STEPS
        spot_mask = jnp.zeros((84, 84), bool)
        for i in range(N_SPOTS):
            spot_mask = spot_mask | disk(state.spot_pos[i], SPOT_RADIUS)
        visible = jnp.where(lit, True, spot_mask)
        return jnp.where(visible[:, :, None], scene, 0.0)

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, 5)
        pos = jax.random.uniform(keys[0], (2,), minval=0.15, maxval=0.85)
        coin = jax.random.uniform(keys[1], (2,), minval=0.1, maxval=0.9)
        exit_pos = jax.random.uniform(keys[2], (2,), minval=0.1, maxval=0.9)
        spots = jax.random.uniform(keys[3], (N_SPOTS, 2))
        targets = jax.random.uniform(keys[4], (N_SPOTS, 2))
        state = SearingSpotlightsState(
            pos=pos, health=jnp.float32(self.initial_health),
            coin_pos=coin, coin_collected=jnp.asarray(False),
            exit_pos=exit_pos, spot_pos=spots, spot_target=targets,
            t=jnp.int32(0), reward_sum=jnp.float32(0.0), length=jnp.int32(0))
        return state, self._observe(state)

    def step(self, state: SearingSpotlightsState, action: jax.Array,
             key: jax.Array):
        move = (action.astype(jnp.float32) - 1.0) * AGENT_SPEED  # (2,)
        pos = jnp.clip(state.pos + move, 0.0 + AGENT_RADIUS,
                       1.0 - AGENT_RADIUS)

        # spotlights drift toward their targets; retarget on arrival
        delta = state.spot_target - state.spot_pos
        dist = jnp.linalg.norm(delta, axis=1, keepdims=True)
        step_vec = jnp.where(dist > 1e-6, delta / (dist + 1e-9), 0.0)
        spot_pos = state.spot_pos + step_vec * SPOT_SPEED
        arrived = (dist[:, 0] < SPOT_SPEED * 1.5)
        new_targets = jax.random.uniform(key, (N_SPOTS, 2))
        spot_target = jnp.where(arrived[:, None], new_targets,
                                state.spot_target)

        in_spot = jnp.any(
            jnp.linalg.norm(spot_pos - pos[None, :], axis=1)
            < SPOT_RADIUS + AGENT_RADIUS)
        dark = state.t >= SHOW_STEPS
        hit = in_spot & dark
        health = state.health - jnp.where(hit, self.damage, 0.0)

        got_coin = (~state.coin_collected) & (
            jnp.linalg.norm(pos - state.coin_pos) < COIN_RADIUS + AGENT_RADIUS)
        coin_collected = state.coin_collected | got_coin
        at_exit = coin_collected & (
            jnp.linalg.norm(pos - state.exit_pos) < EXIT_RADIUS + AGENT_RADIUS)
        dead = health <= 0.0

        t = state.t + 1
        reward = (jnp.where(got_coin, self.r_coin, 0.0)
                  + jnp.where(at_exit, self.r_exit, 0.0)
                  + jnp.where(hit, self.r_damage, 0.0)
                  + jnp.where(dead, self.r_death, 0.0))
        done = at_exit | dead | (t >= self.max_episode_steps)

        new_state = SearingSpotlightsState(
            pos=pos, health=health, coin_pos=state.coin_pos,
            coin_collected=coin_collected, exit_pos=state.exit_pos,
            spot_pos=spot_pos, spot_target=spot_target, t=t,
            reward_sum=state.reward_sum + reward, length=state.length + 1)
        info = {
            "reward": new_state.reward_sum,
            "length": new_state.length.astype(jnp.float32),
            "success": at_exit.astype(jnp.float32),
        }
        return new_state, self._observe(new_state), reward, done, info
