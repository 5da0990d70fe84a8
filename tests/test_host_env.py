"""Host-environment bridge + host rollout driver.

Parity strategy: a deterministic, action-independent mock environment
implemented twice — as a pure-JAX env and as a reference-protocol Python env —
must produce identical rollout batches (obs, rewards, dones, episode steps,
memory tape, values, advantages) through the device scan path and the host
bridge path respectively.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.config import load_config
from etmppo_tpu.envs.core import JaxEnv
from etmppo_tpu.envs.host import HostEnvBatch
from etmppo_tpu.models.actor_critic import ActorCriticModel
from etmppo_tpu.training.host_rollout import HostRolloutFn
from etmppo_tpu.training.rollout import RolloutFn

EP_LEN = 5
MAX_EP = 6


def _mock_obs(t):
    return np.asarray([np.sin(t), np.cos(t), t / 10.0], np.float32)


class MockJaxEnv(JaxEnv):
    observation_shape = (3,)
    action_branches = (2,)
    max_episode_steps = MAX_EP
    info_keys = ("reward", "length")

    def reset(self, key):
        del key
        return jnp.int32(0), jnp.asarray(_mock_obs(0.0))

    def step(self, state, action, key):
        t = state + 1
        tf = t.astype(jnp.float32)
        obs = jnp.stack([jnp.sin(tf), jnp.cos(tf), tf / 10.0])
        reward = 0.1 * tf
        done = t >= EP_LEN
        info = {"reward": reward * 2, "length": tf}
        return t, obs, reward, done, info


class MockPyEnv:
    """Same dynamics behind the reference's duck-typed protocol."""

    class _Space:
        def __init__(self, shape=None, n=None):
            self.shape = shape
            self.n = n

    observation_space = _Space(shape=(3,))
    action_space = _Space(n=2)
    max_episode_steps = MAX_EP

    def reset(self):
        self.t = 0
        return _mock_obs(0.0)

    def step(self, action):
        self.t += 1
        obs = _mock_obs(float(self.t))
        reward = 0.1 * self.t
        done = self.t >= EP_LEN
        info = {"reward": reward * 2, "length": float(self.t)} if done else None
        return obs, np.float32(reward), done, info

    def close(self):
        pass


def _cfg():
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    return dataclasses.replace(
        cfg, n_workers=4, worker_steps=12, n_mini_batch=2, epochs=1,
        hidden_layer_size=16,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=4))


def test_host_env_batch_api():
    batch = HostEnvBatch(make_env=MockPyEnv, n_procs=2)
    assert batch.observation_shape == (3,)
    assert batch.action_branches == (2,)
    assert batch.max_episode_steps == MAX_EP
    batch.start(4)
    obs = batch.reset_all()
    assert obs.shape == (4, 3)
    actions = np.zeros((4, 1), np.int64)
    for t in range(1, EP_LEN + 1):
        obs, rewards, dones, infos = batch.step(actions)
        np.testing.assert_allclose(rewards, 0.1 * t, rtol=1e-6)
        if t == EP_LEN:
            assert dones.all()
            assert all(i is not None and i["length"] == EP_LEN for i in infos)
            # auto-reset: obs is the next episode's first observation
            np.testing.assert_allclose(obs, np.tile(_mock_obs(0), (4, 1)),
                                       rtol=1e-6)
        else:
            assert not dones.any()
            assert all(i is None for i in infos)
    batch.close()


def test_host_worker_exception_propagates():
    class BadEnv(MockPyEnv):
        def step(self, action):
            raise RuntimeError("boom in env")

    batch = HostEnvBatch(make_env=BadEnv, n_procs=1)
    batch.start(2)
    batch.reset_all()
    with pytest.raises(RuntimeError, match="boom in env"):
        batch.step(np.zeros((2, 1), np.int64), restart_on_failure=False)
    batch.close()


def test_host_worker_crash_recovery():
    """A crashing worker is respawned; its envs report truncated episodes."""
    class FlakyEnv(MockPyEnv):
        crashed = False

        def step(self, action):
            if self.t == 2 and not FlakyEnv.crashed:
                FlakyEnv.crashed = True
                raise RuntimeError("transient env crash")
            return super().step(action)

    batch = HostEnvBatch(make_env=FlakyEnv, n_procs=1)
    batch.start(2)
    batch.reset_all()
    actions = np.zeros((2, 1), np.int64)
    crashed_step = None
    for t in range(1, 8):
        obs, rewards, dones, infos = batch.step(actions)
        if dones.all() and t < EP_LEN and crashed_step is None:
            crashed_step = t  # truncation from the restart
            np.testing.assert_allclose(obs, np.tile(_mock_obs(0), (2, 1)),
                                       rtol=1e-6)
    assert crashed_step is not None
    # envs keep working after the restart
    obs, rewards, dones, infos = batch.step(actions)
    assert np.isfinite(rewards).all()
    batch.close()


def test_host_rollout_matches_device_rollout():
    cfg = _cfg()
    jax_env = MockJaxEnv()
    model = ActorCriticModel(
        config=cfg, obs_shape=jax_env.observation_shape,
        action_branches=jax_env.action_branches,
        max_episode_steps=jax_env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))

    dev_fn = RolloutFn(cfg, jax_env, model)
    dev_state = dev_fn.init_state(jax.random.PRNGKey(1))
    dev_state, dev_batch = dev_fn(params, dev_state)

    host_env = HostEnvBatch(make_env=MockPyEnv, n_procs=2)
    host_fn = HostRolloutFn(cfg, host_env, model)
    host_state = host_fn.init_state(jax.random.PRNGKey(1))
    host_state, host_batch = host_fn(params, host_state)
    host_env.close()

    np.testing.assert_allclose(np.asarray(dev_batch.obs),
                               np.asarray(host_batch.obs), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev_batch.dones),
                                  np.asarray(host_batch.dones))
    np.testing.assert_array_equal(np.asarray(dev_batch.episode_steps),
                                  np.asarray(host_batch.episode_steps))
    np.testing.assert_allclose(np.asarray(dev_batch.values),
                               np.asarray(host_batch.values),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dev_batch.tape),
                               np.asarray(host_batch.tape),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dev_batch.advantages),
                               np.asarray(host_batch.advantages),
                               rtol=1e-4, atol=1e-4)
    # persistent state also agrees
    np.testing.assert_array_equal(np.asarray(dev_state.episode_step),
                                  np.asarray(host_state.episode_step))
    np.testing.assert_allclose(np.asarray(dev_state.memory),
                               np.asarray(host_state.memory),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("groups", [2, 4])
def test_pipelined_matches_serial_host_rollout(groups):
    """G-group pipelined scheduling must produce identical batches to the
    serial host path on deterministic (action-independent) dynamics."""
    cfg = dataclasses.replace(_cfg(), host_pipeline_groups=groups)
    model_env = HostEnvBatch(make_env=MockPyEnv, n_procs=2)
    from etmppo_tpu.models.actor_critic import ActorCriticModel
    model = ActorCriticModel(
        config=cfg, obs_shape=model_env.observation_shape,
        action_branches=model_env.action_branches,
        max_episode_steps=model_env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))

    serial_env = model_env
    serial_fn = HostRolloutFn(cfg, serial_env, model, pipeline=False)
    assert serial_fn.n_groups == 1
    s_state = serial_fn.init_state(jax.random.PRNGKey(1))
    s_state, s_batch = serial_fn(params, s_state)
    serial_env.close()

    pipe_env = HostEnvBatch(make_env=MockPyEnv, n_procs=2)
    pipe_fn = HostRolloutFn(cfg, pipe_env, model, pipeline=True)
    assert pipe_fn.n_groups == groups
    p_state = pipe_fn.init_state(jax.random.PRNGKey(1))
    p_state, p_batch = pipe_fn(params, p_state)
    pipe_env.close()

    np.testing.assert_allclose(np.asarray(s_batch.obs),
                               np.asarray(p_batch.obs), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_batch.dones),
                                  np.asarray(p_batch.dones))
    np.testing.assert_array_equal(np.asarray(s_batch.episode_steps),
                                  np.asarray(p_batch.episode_steps))
    np.testing.assert_allclose(np.asarray(s_batch.values),
                               np.asarray(p_batch.values), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_batch.advantages),
                               np.asarray(p_batch.advantages), rtol=1e-4,
                               atol=1e-4)
