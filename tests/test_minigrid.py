"""MiniGrid-Memory pure-JAX env: geometry, task logic, rendering, occlusion."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.envs.minigrid_memory import (
    BALL, FLOOR, KEY, UNSEEN, WALL, MinigridMemoryEnv, _build_static_grid,
    _process_vis_3x3)


def _step(env, state, action):
    return env.step(state, jnp.asarray([action], jnp.int32),
                    jax.random.PRNGKey(0))


def test_static_grid_s9_matches_memory_env_layout():
    g, cue, top, bottom, hallway_end = _build_static_grid(9)
    assert hallway_end == 6
    assert cue == (1, 3) and top == (7, 2) and bottom == (7, 6)
    # outer walls
    assert (g[0] == WALL).all() and (g[:, 0] == WALL).all()
    # hallway row is clear from x=1..7
    assert (g[4, 1:8] == FLOOR).all()
    # vertical wall at x=6 except the hallway opening
    assert (g[[1, 2, 3, 5, 6, 7], 6] == WALL).all() and g[4, 6] == FLOOR
    # start room walls
    assert g[2, 1:5].tolist() == [WALL] * 4
    assert g[3, 4] == WALL and g[5, 4] == WALL


def test_reset_objects_and_success_pos():
    env = MinigridMemoryEnv("MiniGrid-MemoryS9-v0")
    seen = set()
    for seed in range(20):
        state, obs = env.reset(jax.random.PRNGKey(seed))
        cue = int(state.grid[3, 1])
        top = int(state.grid[2, 7])
        bottom = int(state.grid[6, 7])
        assert cue in (KEY, BALL)
        assert {top, bottom} == {KEY, BALL}
        # success must neighbor the object matching the cue
        if top == cue:
            assert state.success_pos.tolist() == [7, 3]
            assert state.failure_pos.tolist() == [7, 5]
        else:
            assert state.success_pos.tolist() == [7, 5]
            assert state.failure_pos.tolist() == [7, 3]
        seen.add((cue, top))
    assert len(seen) == 4  # all cue x placement combinations appear


def _navigate(env, state, to_top: bool):
    """Walks from start to the junction then to the top or bottom choice."""
    s = state
    total = 0.0
    for _ in range(10):  # east until blocked at x=7
        s, obs, r, d, info = _step(env, s, 2)
        total += float(r)
        if bool(d):
            return s, total, d, info
    s, obs, r, d, info = _step(env, s, 0 if to_top else 1)  # turn
    for _ in range(2):
        if bool(d):
            break
        s, obs, r, d, info = _step(env, s, 2)
        total += float(r)
    return s, total, d, info


def test_success_and_failure_rewards():
    env = MinigridMemoryEnv("MiniGrid-MemoryS9-v0")
    state, _ = env.reset(jax.random.PRNGKey(3))
    success_is_top = state.success_pos.tolist() == [7, 3]
    s, total, done, info = _navigate(env, state, to_top=success_is_top)
    assert bool(done)
    assert total > 0  # 1 - 0.9 * t / 405
    assert float(info["success"]) == 1.0

    state, _ = env.reset(jax.random.PRNGKey(3))
    s, total, done, info = _navigate(env, state, to_top=not success_is_top)
    assert bool(done)
    assert total == 0.0
    assert float(info["success"]) == 0.0


def test_time_limit_96():
    env = MinigridMemoryEnv("MiniGrid-MemoryS9-v0")
    state, _ = env.reset(jax.random.PRNGKey(0))
    done = False
    n = 0
    while not done and n < 200:
        state, obs, r, done, info = _step(env, state, 0)  # spin in place
        n += 1
    assert n == 96
    assert float(info["length"]) == 96


def test_walls_block_movement():
    env = MinigridMemoryEnv("MiniGrid-MemoryS9-v0")
    state, _ = env.reset(jax.random.PRNGKey(1))
    # face north (wall above hallway): left turn from east
    s, *_ = _step(env, state, 0)
    pos_before = s.pos.tolist()
    s, obs, r, d, info = _step(env, s, 2)
    # either moved into open start-room/junction cell or blocked by wall;
    # at hallway interior x in [5, 6] the north cell is a wall
    if pos_before[0] in (5, 6):
        assert s.pos.tolist() == pos_before


def test_observation_rendering_and_occlusion():
    env = MinigridMemoryEnv("MiniGrid-MemoryS9-v0")
    state, obs = env.reset(jax.random.PRNGKey(0))
    obs = np.asarray(obs)
    assert obs.shape == (84, 84, 3)
    assert obs.min() >= 0.0 and obs.max() <= 1.0
    # agent tile at bottom-center contains red pixels
    agent_tile = obs[56:84, 28:56]
    assert (agent_tile[..., 0] > 0.5).any()
    # a wall two cells behind another wall must be occluded:
    view = jnp.asarray([[FLOOR, FLOOR, FLOOR],
                        [WALL, WALL, WALL],
                        [FLOOR, FLOOR, FLOOR]], jnp.int32)
    masked = np.asarray(_process_vis_3x3(view))
    assert (masked[0] == UNSEEN).all()      # far row hidden behind wall row
    assert (masked[1] == WALL).all()        # the wall row itself is visible


def test_rollout_integration_cnn_path():
    """Tiny rollout through the full scan machinery with image observations."""
    import dataclasses
    from etmppo_tpu.config import load_config
    from etmppo_tpu.models.actor_critic import ActorCriticModel
    from etmppo_tpu.training.rollout import RolloutFn

    cfg = load_config("etmppo_tpu/configs/minigrid.yaml")
    cfg = dataclasses.replace(
        cfg, n_workers=2, worker_steps=4, n_mini_batch=1, epochs=1,
        hidden_layer_size=32,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=32, num_heads=2,
            memory_length=8))
    env = MinigridMemoryEnv(cfg.environment.name)
    model = ActorCriticModel(
        config=cfg, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    rollout_fn = RolloutFn(cfg, env, model)
    state = rollout_fn.init_state(jax.random.PRNGKey(1))
    state, batch = rollout_fn(params, state)
    assert batch.obs.shape == (2, 4, 84, 84, 3)
    assert np.isfinite(np.asarray(batch.values)).all()
