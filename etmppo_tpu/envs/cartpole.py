"""CartPole-v0 with optional velocity masking, pure JAX.

Behavioral spec (reference: environments/cartpole_env.py wrapping gym
``CartPole-v0``): classic cart-pole dynamics (Euler integration, tau=0.02),
200-step time limit, optional masking of the two velocity components (indices
1, 3) to force a memory-dependent policy, training reward scaled by 1/100
while the episode info reports the raw return.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core import JaxEnv

GRAVITY = 9.8
MASS_CART = 1.0
MASS_POLE = 0.1
TOTAL_MASS = MASS_CART + MASS_POLE
LENGTH = 0.5  # half pole length
POLE_MASS_LENGTH = MASS_POLE * LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_THRESHOLD = 12 * 2 * np.pi / 360
X_THRESHOLD = 2.4


class CartPoleState(NamedTuple):
    physics: jax.Array     # (4,) float32: x, x_dot, theta, theta_dot
    step_count: jax.Array  # int32
    reward_sum: jax.Array  # float32 — raw (unscaled) episode return
    length: jax.Array      # int32


class CartPole(JaxEnv):
    info_keys = ("reward", "length")
    max_episode_steps = 200  # CartPole-v0 time limit

    def __init__(self, mask_velocity: bool = False):
        self.mask_velocity = mask_velocity
        self.obs_mask = np.array(
            [1, 0, 1, 0] if mask_velocity else [1, 1, 1, 1], np.float32)
        self.observation_shape: Tuple[int, ...] = (4,)
        self.action_branches: Tuple[int, ...] = (2,)

    def _obs(self, state: CartPoleState) -> jax.Array:
        return state.physics * jnp.asarray(self.obs_mask)

    def reset(self, key: jax.Array):
        physics = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        state = CartPoleState(
            physics=physics, step_count=jnp.int32(0),
            reward_sum=jnp.float32(0.0), length=jnp.int32(0))
        return state, self._obs(state)

    def step(self, state: CartPoleState, action: jax.Array, key: jax.Array):
        del key
        x, x_dot, theta, theta_dot = (
            state.physics[0], state.physics[1], state.physics[2],
            state.physics[3])
        force = jnp.where(action[0] == 1, FORCE_MAG, -FORCE_MAG)
        costheta = jnp.cos(theta)
        sintheta = jnp.sin(theta)
        temp = (force + POLE_MASS_LENGTH * theta_dot ** 2 * sintheta) / TOTAL_MASS
        thetaacc = (GRAVITY * sintheta - costheta * temp) / (
            LENGTH * (4.0 / 3.0 - MASS_POLE * costheta ** 2 / TOTAL_MASS))
        xacc = temp - POLE_MASS_LENGTH * thetaacc * costheta / TOTAL_MASS
        # Euler integration (gym kinematics_integrator == "euler").
        x = x + TAU * x_dot
        x_dot = x_dot + TAU * xacc
        theta = theta + TAU * theta_dot
        theta_dot = theta_dot + TAU * thetaacc
        physics = jnp.stack([x, x_dot, theta, theta_dot])

        terminated = (jnp.abs(x) > X_THRESHOLD) | (jnp.abs(theta) > THETA_THRESHOLD)
        step_count = state.step_count + 1
        done = terminated | (step_count >= self.max_episode_steps)

        raw_reward = jnp.float32(1.0)
        new_state = CartPoleState(
            physics=physics, step_count=step_count,
            reward_sum=state.reward_sum + raw_reward,
            length=state.length + 1)
        info = {
            "reward": new_state.reward_sum,
            "length": new_state.length.astype(jnp.float32),
        }
        # Training reward scaled by 1/100 (reference: cartpole_env.py:36).
        return new_state, self._obs(new_state), raw_reward / 100.0, done, info
