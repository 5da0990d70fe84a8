"""Rollout-scan semantics: episode bookkeeping, memory tape, GAE wiring."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.config import load_config
from etmppo_tpu.envs.factory import create_env
from etmppo_tpu.models.actor_critic import ActorCriticModel
from etmppo_tpu.ops.memory_index import build_memory_indices, \
    compute_window_sources
from etmppo_tpu.training.rollout import RolloutFn
import reference_oracle as oracle


@pytest.fixture(scope="module")
def setup():
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(cfg, n_workers=4, worker_steps=48,
                              n_mini_batch=2, epochs=1)
    env = create_env(cfg.environment)
    model = ActorCriticModel(
        config=cfg, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    rollout_fn = RolloutFn(cfg, env, model)
    state = rollout_fn.init_state(jax.random.PRNGKey(1))
    state2, batch = rollout_fn(params, state)
    return cfg, env, model, params, rollout_fn, state2, batch


def test_shapes(setup):
    cfg, env, model, params, rollout_fn, state, batch = setup
    W, T = cfg.n_workers, cfg.worker_steps
    trx = cfg.transformer
    assert batch.obs.shape == (W, T, 3)
    assert batch.actions.shape == (W, T, 1)
    assert batch.log_probs.shape == (W, T, 1)
    assert batch.values.shape == (W, T)
    assert batch.advantages.shape == (W, T)
    assert batch.tape.shape == (W, T, trx.num_blocks, trx.embed_dim)
    assert batch.snapshot.shape == (
        W, env.max_episode_steps, trx.num_blocks, trx.embed_dim)
    assert np.isfinite(np.asarray(batch.values)).all()
    assert np.isfinite(np.asarray(batch.advantages)).all()


def test_episode_step_bookkeeping(setup):
    cfg, env, model, params, rollout_fn, state, batch = setup
    e = np.asarray(batch.episode_steps)
    dones = np.asarray(batch.dones)
    W, T = e.shape
    for w in range(W):
        for t in range(T - 1):
            if dones[w, t]:
                assert e[w, t + 1] == 0, "episode step must reset after done"
            else:
                assert e[w, t + 1] == e[w, t] + 1
    # PocMemory episodes are at most 32 steps
    assert (e < env.max_episode_steps).all()
    assert dones.any(), "48-step rollout on PocMemory must finish episodes"


def test_episode_infos_report_done_episodes(setup):
    cfg, env, model, params, rollout_fn, state, batch = setup
    dones = np.asarray(batch.dones)
    lengths = np.asarray(batch.episode_infos["length"])
    e = np.asarray(batch.episode_steps)
    ws, ts = np.nonzero(dones)
    for w, t in zip(ws, ts):
        # length of a completed episode == episode step at done + 1
        assert lengths[w, t] == e[w, t] + 1


def test_training_windows_match_reference_simulation(setup):
    """End-to-end invariant: windows reconstructed from (snapshot, tape) at
    training time equal the reference's per-episode-memory gather."""
    cfg, env, model, params, rollout_fn, state, batch = setup
    trx = cfg.transformer
    W, T = cfg.n_workers, cfg.worker_steps
    max_ep = env.max_episode_steps

    e = np.asarray(batch.episode_steps).astype(np.int64)
    dones = np.asarray(batch.dones)
    tape = np.asarray(batch.tape)
    snapshot = np.asarray(batch.snapshot)

    sim = oracle.ReferenceMemorySim(
        W, T, max_ep, trx.num_blocks, trx.embed_dim, trx.memory_length,
        snapshot)
    sim.run(e, dones, tape)

    table = jnp.asarray(build_memory_indices(max_ep, trx.memory_length))
    src = compute_window_sources(batch.episode_steps, batch.dones, table,
                                 max_ep)
    combined = np.concatenate([snapshot, tape, np.zeros_like(snapshot)],
                              axis=1)
    flat_index = np.asarray(src.flat_index)

    for w in range(W):
        for t in range(T):
            window = combined[w, flat_index[w, t]]
            np.testing.assert_allclose(
                window, sim.window(w, t, e), atol=0,
                err_msg=f"w={w} t={t} e={e[w, t]}")


def test_rollout_memory_persists_across_updates(setup):
    """Unfinished episodes keep their (stale) memory across update boundaries
    (SURVEY.md §3.2 item 3)."""
    cfg, env, model, params, rollout_fn, state, batch = setup
    e = np.asarray(state.episode_step)
    mem = np.asarray(state.memory)
    for w in range(cfg.n_workers):
        if e[w] > 0:
            # slots < e must be populated (non-zero with prob ~1)
            assert np.abs(mem[w, :e[w]]).sum() > 0
        # slots >= e must be zero (zeroed at reset)
        assert np.abs(mem[w, e[w]:]).sum() == 0


def test_rollout_determinism(setup):
    cfg, env, model, params, rollout_fn, state, batch = setup
    s0 = rollout_fn.init_state(jax.random.PRNGKey(7))
    _, b1 = rollout_fn(params, s0)
    s0b = rollout_fn.init_state(jax.random.PRNGKey(7))
    _, b2 = rollout_fn(params, s0b)
    np.testing.assert_array_equal(np.asarray(b1.actions), np.asarray(b2.actions))
    np.testing.assert_allclose(np.asarray(b1.values), np.asarray(b2.values))
