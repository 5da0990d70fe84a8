"""PolicyServer (etmppo_tpu/serve.py) must serve the exact policy: its
KV-cache incremental steps must match the raw-memory reference formulation
(enjoy.py:60-93 semantics) step for step."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.config import load_config
from etmppo_tpu.envs.factory import create_env
from etmppo_tpu.ops import distributions
from etmppo_tpu.models.actor_critic import ActorCriticModel
from etmppo_tpu.ops.memory_index import build_memory_indices, build_memory_mask
from etmppo_tpu.serve import PolicyServer
from etmppo_tpu.training.checkpoint import save_model


@pytest.fixture(scope="module", params=["", "relative"],
                ids=["pe-none", "pe-relative"])
def tiny_model_path(request, tmp_path_factory):
    # Parametrized over positional_encoding so the KV-cache alignment is
    # parity-tested end-to-end in PolicyServer for the PE-dependent path too
    # (not only in test_fastpath's forward_with_kv unit tests).
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(
        cfg, hidden_layer_size=16,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=6, positional_encoding=request.param))
    env = create_env(cfg.environment)
    model = ActorCriticModel(
        config=cfg, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("serve") / "tiny.nn")
    save_model(path, params, cfg)
    return path, cfg, model, params, env


def test_serve_matches_raw_memory_path(tiny_model_path):
    path, cfg, model, params, env = tiny_model_path
    M, T = 3, 9
    trx = cfg.transformer
    L = trx.memory_length
    max_ep = env.max_episode_steps
    server = PolicyServer(path, max_streams=M, greedy=True, seed=0)
    server.reset(range(M))

    mask_table = np.asarray(build_memory_mask(L))
    index_table = np.asarray(build_memory_indices(max_ep, L))

    np_rng = np.random.default_rng(7)
    memory = np.zeros((M, max_ep, trx.num_blocks, trx.embed_dim), np.float32)
    for t in range(T):
        obs = np_rng.normal(size=(M,) + tuple(env.observation_shape)
                            ).astype(np.float32)
        # Raw-memory reference formulation (enjoy.py incremental loop).
        indices = np.tile(index_table[t][None], (M, 1))
        mask = np.tile(mask_table[min(t, L - 1)][None], (M, 1))
        window = np.take_along_axis(
            memory, indices[:, :, None, None], axis=1)
        logits, value_ref, mem_item = model.apply(
            params, jnp.asarray(obs), jnp.asarray(window), jnp.asarray(mask),
            jnp.asarray(indices))
        memory[:, t] = np.asarray(mem_item)
        actions_ref = np.stack(
            [np.argmax(np.asarray(l), axis=-1) for l in logits], axis=-1)

        actions, values = server.step(obs)
        np.testing.assert_allclose(values, np.asarray(value_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(actions, actions_ref)
    assert list(server.steps) == [T] * M


def test_serve_sampling_matches_raw_logits(tiny_model_path):
    """Sampling mode (greedy=False) must draw from the exact same logits as
    the raw-memory path, with the server's documented rng stream (PRNGKey(seed)
    split once per step)."""
    path, cfg, model, params, env = tiny_model_path
    M, T, seed = 3, 5, 123
    trx = cfg.transformer
    L = trx.memory_length
    max_ep = env.max_episode_steps
    server = PolicyServer(path, max_streams=M, greedy=False, seed=seed)
    server.reset(range(M))

    mask_table = np.asarray(build_memory_mask(L))
    index_table = np.asarray(build_memory_indices(max_ep, L))
    rng = jax.random.PRNGKey(seed)

    np_rng = np.random.default_rng(11)
    memory = np.zeros((M, max_ep, trx.num_blocks, trx.embed_dim), np.float32)
    for t in range(T):
        obs = np_rng.normal(size=(M,) + tuple(env.observation_shape)
                            ).astype(np.float32)
        indices = np.tile(index_table[t][None], (M, 1))
        mask = np.tile(mask_table[min(t, L - 1)][None], (M, 1))
        window = np.take_along_axis(
            memory, indices[:, :, None, None], axis=1)
        logits, value_ref, mem_item = model.apply(
            params, jnp.asarray(obs), jnp.asarray(window), jnp.asarray(mask),
            jnp.asarray(indices))
        memory[:, t] = np.asarray(mem_item)
        rng, step_rng = jax.random.split(rng)
        actions_ref, _ = distributions.sample_multi(step_rng, logits)

        actions, values = server.step(obs)
        np.testing.assert_allclose(values, np.asarray(value_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(actions, np.asarray(actions_ref))


def test_serve_reset_and_inactive_masking(tiny_model_path):
    path, _, _, _, env = tiny_model_path
    M = 4
    server = PolicyServer(path, max_streams=M, greedy=True, seed=1)
    server.reset(range(M))
    obs = np.random.default_rng(0).normal(
        size=(M,) + tuple(env.observation_shape)).astype(np.float32)

    a_fresh, v_fresh = server.step(obs)
    assert list(server.steps) == [1] * M

    # Inactive streams neither advance nor mutate their memory.
    active = np.array([True, False, True, False])
    server.step(obs, active=active)
    assert list(server.steps) == [2, 1, 2, 1]

    # Reset returns a stream to the fresh-episode policy output exactly.
    server.reset([0])
    assert server.steps[0] == 0
    a_again, v_again = server.step(obs, active=np.array([True, False, False,
                                                         False]))
    np.testing.assert_allclose(v_again[0], v_fresh[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(a_again[0], a_fresh[0])


def test_serve_rejects_bad_obs_shape(tiny_model_path):
    path, _, _, _, env = tiny_model_path
    server = PolicyServer(path, max_streams=2)
    with pytest.raises(ValueError):
        server.step(np.zeros((3,) + tuple(env.observation_shape), np.float32))


def test_serve_input_validation(tiny_model_path):
    path, _, _, _, env = tiny_model_path
    server = PolicyServer(path, max_streams=4, greedy=True)
    obs = np.zeros((4,) + tuple(env.observation_shape), np.float32)

    # A short active mask must not silently broadcast.
    with pytest.raises(ValueError, match="active"):
        server.step(obs, active=[False])

    # Out-of-range reset ids must not be silently dropped.
    with pytest.raises(ValueError, match="out of range"):
        server.reset([4])
    with pytest.raises(ValueError, match="out of range"):
        server.reset([-1])


def test_step_device_matches_step(tiny_model_path):
    """step_device (throughput path) must advance the exact same policy/state
    as step: same rng stream, same caches, same outputs."""
    path, _, _, _, env = tiny_model_path
    M = 3
    obs_rng = np.random.default_rng(2)
    s_ref = PolicyServer(path, max_streams=M, greedy=False, seed=9)
    s_dev = PolicyServer(path, max_streams=M, greedy=False, seed=9)
    s_ref.reset(range(M))
    s_dev.reset(range(M))
    for _ in range(4):
        obs = obs_rng.normal(size=(M,) + tuple(env.observation_shape)
                             ).astype(np.float32)
        a_ref, v_ref = s_ref.step(obs)
        a_dev, v_dev = s_dev.step_device(obs)
        np.testing.assert_array_equal(a_ref, np.asarray(a_dev))
        np.testing.assert_allclose(v_ref, np.asarray(v_dev), rtol=1e-6)
    assert list(s_dev.steps) == [4] * M


def test_step_device_freezes_exhausted_streams(tiny_model_path):
    path, _, _, _, env = tiny_model_path
    server = PolicyServer(path, max_streams=2, greedy=True)
    server.reset(range(2))
    obs = np.zeros((2,) + tuple(env.observation_shape), np.float32)
    for _ in range(env.max_episode_steps + 3):  # overrun must not raise
        server.step_device(obs)
    assert list(server.steps) == [env.max_episode_steps] * 2
    server.reset([0, 1])
    server.step_device(obs)
    assert list(server.steps) == [1, 1]


def test_serve_refuses_exhausted_streams(tiny_model_path):
    path, _, _, _, env = tiny_model_path
    server = PolicyServer(path, max_streams=2, greedy=True)
    server.reset(range(2))
    obs = np.zeros((2,) + tuple(env.observation_shape), np.float32)
    for _ in range(env.max_episode_steps):
        server.step(obs)
    assert list(server.steps) == [env.max_episode_steps] * 2
    with pytest.raises(ValueError, match="max_episode_steps"):
        server.step(obs)
    # Inactive exhausted streams are fine; reset makes them steppable again.
    server.step(obs, active=np.array([False, False]))
    server.reset([0, 1])
    server.step(obs)
    assert list(server.steps) == [1, 1]


def test_step_many_matches_step_device(tiny_model_path):
    """step_many (fused lax.scan, one dispatch for T steps) must advance
    state and produce actions/values identical to T step_device calls."""
    path, _, _, _, env = tiny_model_path
    T, M = 7, 3
    obs_seq = np.random.default_rng(3).normal(
        size=(T, M) + tuple(env.observation_shape)).astype(np.float32)

    ref = PolicyServer(path, max_streams=M, greedy=True, seed=0)
    ref.reset(range(M))
    acts_ref, vals_ref = [], []
    for t in range(T):
        a, v = ref.step_device(obs_seq[t])
        acts_ref.append(np.asarray(a))
        vals_ref.append(np.asarray(v))

    fused = PolicyServer(path, max_streams=M, greedy=True, seed=0)
    fused.reset(range(M))
    a_many, v_many = fused.step_many(obs_seq)
    np.testing.assert_array_equal(np.asarray(a_many), np.stack(acts_ref))
    np.testing.assert_allclose(np.asarray(v_many), np.stack(vals_ref),
                               atol=1e-5)
    assert list(fused.steps) == [T] * M
    # State continues correctly: one more step matches on both paths.
    obs = obs_seq[0]
    a1, v1 = ref.step_device(obs)
    a2, v2 = fused.step_device(obs)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_step_many_freezes_exhausted_streams(tiny_model_path):
    path, _, _, _, env = tiny_model_path
    server = PolicyServer(path, max_streams=2, greedy=True)
    server.reset(range(2))
    T = env.max_episode_steps + 4  # overrun inside the scan must not raise
    obs_seq = np.zeros((T, 2) + tuple(env.observation_shape), np.float32)
    server.step_many(obs_seq)
    assert list(server.steps) == [env.max_episode_steps] * 2
