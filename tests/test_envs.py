"""Pure-JAX environment behavior vs the reference wrappers' semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.envs.cartpole import CartPole
from etmppo_tpu.envs.poc_memory import PocMemoryEnv
from etmppo_tpu.envs.factory import create_env
from etmppo_tpu.config import EnvConfig


def _step(env, state, action):
    return env.step(state, jnp.asarray([action], jnp.int32),
                    jax.random.PRNGKey(0))


class TestPocMemory:
    def make(self):
        # Factory settings (reference utils.py:22): glob=False, freeze=True,
        # max_episode_steps=32.
        return PocMemoryEnv(glob=False, freeze=True, max_episode_steps=32)

    def test_start_positions(self):
        env = self.make()
        # reference possible positions: [-0.4, -0.2, 0.0, 0.2, 0.4]
        np.testing.assert_array_equal(env.start_ticks, [-2, -1, 0, 1, 2])
        assert env.min_steps == 6

    def test_reset_shows_goals(self, rng):
        env = self.make()
        state, obs = env.reset(rng)
        obs = np.asarray(obs)
        assert sorted([obs[0], obs[2]]) == [-1.0, 1.0]
        assert -0.4 - 1e-6 <= obs[1] <= 0.4 + 1e-6

    def test_freeze_phase_no_movement_no_reward(self, rng):
        env = self.make()
        state, obs0 = env.reset(rng)
        for i in range(2):  # num_show_steps = 2
            state, obs, reward, done, info = _step(env, state, 1)
            assert float(reward) == 0.0
            assert not bool(done)
            # goals stay visible during show phase; position frozen
            assert float(obs[1]) == pytest.approx(float(obs0[1]))
        # after the show phase goals are masked and movement happens
        state, obs, reward, done, info = _step(env, state, 1)
        assert float(obs[0]) == 0.0 and float(obs[2]) == 0.0
        assert float(obs[1]) == pytest.approx(float(obs0[1]) + 0.2)

    def test_reaching_goal_reward_and_success(self, rng):
        env = self.make()
        state, obs = env.reset(rng)
        goals = np.asarray(state.goals)
        # walk right to +1 (frozen first two steps don't move)
        done = False
        steps = 0
        while not done:
            state, obs, reward, done, info = _step(env, state, 1)
            steps += 1
            assert steps < 40
        expected = (1.0 + 6 * 0.1) if goals[1] == 1.0 else -(1.0 + 6 * 0.1)
        assert float(reward) == pytest.approx(expected)
        assert float(info["success"]) == (1.0 if goals[1] == 1.0 else 0.0)
        assert float(info["length"]) == steps
        # episode return: show steps contribute 0, time-penalty steps -0.1
        expected_return = expected - 0.1 * (steps - 1 - 2)
        assert float(info["reward"]) == pytest.approx(expected_return, abs=1e-5)

    def test_time_limit(self, rng):
        env = self.make()
        state, obs = env.reset(rng)
        done = False
        count = 0
        # oscillate so we never reach a goal
        while not done and count < 100:
            state, obs, reward, done, info = _step(env, state, count % 2)
            count += 1
        assert count == 32  # max_episode_steps


class TestCartPole:
    def test_dynamics_match_closed_form(self, rng):
        env = CartPole(mask_velocity=False)
        state, obs = env.reset(rng)
        x, x_dot, theta, theta_dot = map(float, np.asarray(state.physics))
        state2, obs2, reward, done, info = _step(env, state, 1)
        # manual Euler step (gym CartPole closed form)
        force = 10.0
        temp = (force + 0.05 * theta_dot ** 2 * np.sin(theta)) / 1.1
        thetaacc = (9.8 * np.sin(theta) - np.cos(theta) * temp) / (
            0.5 * (4.0 / 3.0 - 0.1 * np.cos(theta) ** 2 / 1.1))
        xacc = temp - 0.05 * thetaacc * np.cos(theta) / 1.1
        expected = [x + 0.02 * x_dot, x_dot + 0.02 * xacc,
                    theta + 0.02 * theta_dot, theta_dot + 0.02 * thetaacc]
        np.testing.assert_allclose(
            np.asarray(state2.physics), expected, rtol=1e-5, atol=1e-6)
        assert float(reward) == pytest.approx(0.01)  # scaled 1/100
        assert float(info["reward"]) == 1.0          # raw return

    def test_velocity_masking(self, rng):
        env = CartPole(mask_velocity=True)
        state, obs = env.reset(rng)
        state, obs, *_ = _step(env, state, 0)
        obs = np.asarray(obs)
        assert obs[1] == 0.0 and obs[3] == 0.0

    def test_time_limit_200(self, rng):
        env = CartPole(mask_velocity=False)
        state, obs = env.reset(rng)
        # force termination check: pole will fall long before 200 with
        # constant action, so instead verify the step-count bound directly
        state = state._replace(step_count=jnp.int32(199),
                               physics=jnp.zeros(4))
        state, obs, reward, done, info = _step(env, state, 1)
        assert bool(done)


def test_factory_dispatch():
    assert isinstance(create_env(EnvConfig(type="PocMemoryEnv")), PocMemoryEnv)
    assert create_env(EnvConfig(type="CartPole")).mask_velocity is False
    assert create_env(EnvConfig(type="CartPoleMasked")).mask_velocity is True
    with pytest.raises(ValueError):
        create_env(EnvConfig(type="NoSuchEnv"))


def test_envs_are_vmappable(rng):
    for env in (PocMemoryEnv(freeze=True, max_episode_steps=32),
                CartPole(mask_velocity=True)):
        keys = jax.random.split(rng, 5)
        state, obs = jax.vmap(env.reset)(keys)
        assert obs.shape == (5,) + env.observation_shape
        actions = jnp.ones((5, 1), jnp.int32)
        state2, obs2, reward, done, info = jax.vmap(env.step)(
            state, actions, keys)
        assert obs2.shape == (5,) + env.observation_shape
        assert reward.shape == (5,)
        assert done.shape == (5,)
        for k in env.info_keys:
            assert info[k].shape == (5,)
