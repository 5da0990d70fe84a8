"""Pure-JAX MemoryGym-Grid environments: task logic and protocol."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.config import EnvConfig, load_config
from etmppo_tpu.envs.factory import create_env
from etmppo_tpu.envs.mortar_mayhem import (COMMAND_OFFSETS,
                                           MortarMayhemGridEnv, SHOW_DELAY,
                                           SHOW_DURATION)
from etmppo_tpu.envs.mystery_path import MOVE_OFFSETS, MysteryPathGridEnv

MM_PARAMS = {
    "arena_size": 5, "allowed_commands": 5, "command_count": [3],
    "explosion_duration": [2], "explosion_delay": [3],
    "reward_command_failure": 0.0, "reward_command_success": 0.1,
    "reward_episode_success": 0.5,
}
MP_PARAMS = {
    "cardinal_origin_choice": [0, 1, 2, 3], "show_origin": False,
    "show_goal": False, "visual_feedback": True, "reward_goal": 1.0,
    "reward_fall_off": 0.0, "reward_path_progress": 0.0,
}


def _step(env, state, action):
    return env.step(state, jnp.asarray([action], jnp.int32),
                    jax.random.PRNGKey(0))


class TestMortarMayhem:
    def test_phases_and_budget(self):
        env = MortarMayhemGridEnv(MM_PARAMS)
        assert env.announce_steps == 3 * (SHOW_DURATION + SHOW_DELAY)
        assert env.max_episode_steps == env.announce_steps + 3 * (3 + 2)
        assert env.observation_shape == (84, 84, 3)
        assert env.action_branches == (5,)

    def test_command_targets_stay_in_arena(self):
        env = MortarMayhemGridEnv(MM_PARAMS)
        for seed in range(10):
            state, obs = env.reset(jax.random.PRNGKey(seed))
            targets = np.asarray(state.targets)
            assert (targets >= 0).all() and (targets < 5).all()
            # targets chain from the center by command offsets
            pos = np.array([2, 2])
            for c, tgt in zip(np.asarray(state.commands), targets):
                pos = pos + COMMAND_OFFSETS[c]
                np.testing.assert_array_equal(pos, tgt)

    def test_perfect_execution_succeeds(self):
        env = MortarMayhemGridEnv(MM_PARAMS)
        state, obs = env.reset(jax.random.PRNGKey(1))
        commands = np.asarray(state.commands)
        total = 0.0
        done = False
        # announcement: frozen; any action
        for _ in range(env.announce_steps):
            state, obs, r, done, info = _step(env, state, 0)
            total += float(r)
            np.testing.assert_array_equal(np.asarray(state.pos), [2, 2])
        # execute each command on its first delay step, then wait
        for i, cmd in enumerate(commands):
            state, obs, r, done, info = _step(env, state, int(cmd))
            total += float(r)
            for _ in range(env.exec_steps_per_cmd - 1):
                state, obs, r, done, info = _step(env, state, 0)  # stay
                total += float(r)
                if done:
                    break
        assert bool(done)
        assert float(info["success"]) == 1.0
        assert total == pytest.approx(3 * 0.1 + 0.5)

    def test_wrong_position_fails(self):
        env = MortarMayhemGridEnv(MM_PARAMS)
        state, obs = env.reset(jax.random.PRNGKey(2))
        done = False
        steps = 0
        while not done:
            # never move: fails at the first explosion check unless the first
            # command is "stay"
            state, obs, r, done, info = _step(env, state, 0)
            steps += 1
        first_cmd = int(np.asarray(state.commands)[0])
        if first_cmd != 0:
            assert float(info["success"]) == 0.0
            assert steps <= env.announce_steps + env.exec_steps_per_cmd

    def test_observation_announcement_glyph_visible(self):
        env = MortarMayhemGridEnv(MM_PARAMS)
        state, obs = env.reset(jax.random.PRNGKey(3))
        # glyph strip at the top is bright during announcement
        assert float(np.asarray(obs)[:22].max()) > 0.9
        # ...and differs between different commands
        state2, obs2 = env.reset(jax.random.PRNGKey(7))
        if int(state.commands[0]) != int(state2.commands[0]):
            assert np.abs(np.asarray(obs[:22]) - np.asarray(obs2[:22])).max() > 0.1


class TestMysteryPath:
    def test_path_is_connected_and_crosses(self):
        env = MysteryPathGridEnv(MP_PARAMS)
        for seed in range(10):
            state, obs = env.reset(jax.random.PRNGKey(seed))
            on_path = np.asarray(state.on_path)
            origin = np.asarray(state.origin)
            goal = np.asarray(state.goal)
            assert on_path[origin[1], origin[0]]
            assert on_path[goal[1], goal[0]]
            # origin and goal on opposite edges
            assert (origin[0] in (0, 6)) or (origin[1] in (0, 6))
            # connectivity: BFS over path cells from origin reaches goal
            from collections import deque
            seen = {tuple(origin)}
            queue = deque([tuple(origin)])
            while queue:
                x, y = queue.popleft()
                for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nx, ny = x + dx, y + dy
                    if (0 <= nx < 7 and 0 <= ny < 7 and on_path[ny, nx]
                            and (nx, ny) not in seen):
                        seen.add((nx, ny))
                        queue.append((nx, ny))
            assert tuple(goal) in seen, f"seed {seed}: goal unreachable"

    def test_falling_teleports_to_origin(self):
        env = MysteryPathGridEnv(MP_PARAMS)
        state, obs = env.reset(jax.random.PRNGKey(0))
        on_path = np.asarray(state.on_path)
        origin = np.asarray(state.origin)
        # find a move off the path
        for a in range(4):
            nxt = np.clip(origin + MOVE_OFFSETS[a], 0, 6)
            if not on_path[nxt[1], nxt[0]] and not (nxt == origin).all():
                state2, obs2, r, done, info = _step(env, state, a)
                np.testing.assert_array_equal(np.asarray(state2.pos), origin)
                assert not bool(done)
                assert int(state2.fall_timer) == 1
                return
        pytest.skip("origin fully surrounded by path (rare)")

    def test_walking_the_path_reaches_goal(self):
        env = MysteryPathGridEnv(MP_PARAMS)
        state, obs = env.reset(jax.random.PRNGKey(4))
        on_path = np.asarray(state.on_path)
        goal = tuple(np.asarray(state.goal))
        # BFS shortest path over path cells, then execute it
        from collections import deque
        start = tuple(np.asarray(state.origin))
        prev = {start: None}
        queue = deque([start])
        while queue:
            cur = queue.popleft()
            if cur == goal:
                break
            for a in range(4):
                nxt = (np.clip(cur[0] + MOVE_OFFSETS[a][0], 0, 6),
                       np.clip(cur[1] + MOVE_OFFSETS[a][1], 0, 6))
                if on_path[nxt[1], nxt[0]] and nxt not in prev:
                    prev[nxt] = (cur, a)
                    queue.append(nxt)
        actions = []
        node = goal
        while prev[node] is not None:
            node, a = prev[node]
            actions.append(a)
        total = 0.0
        done = False
        for a in reversed(actions):
            assert not done
            state, obs, r, done, info = _step(env, state, a)
            total += float(r)
        assert bool(done)
        assert float(info["success"]) == 1.0
        assert total == pytest.approx(1.0)

    def test_time_limit(self):
        env = MysteryPathGridEnv(MP_PARAMS)
        state, obs = env.reset(jax.random.PRNGKey(5))
        done = False
        n = 0
        while not done and n < 200:
            state, obs, r, done, info = _step(env, state, 0)
            state, obs, r, done, info = (state, obs, r, done, info)
            n += 1
            if done:
                break
        assert n <= env.max_episode_steps


def test_factory_and_configs():
    cfg = load_config("etmppo_tpu/configs/mortar_mayhem_grid.yaml")
    env = create_env(cfg.environment)
    assert isinstance(env, MortarMayhemGridEnv)
    assert env.command_count == 10
    assert env.max_episode_steps >= cfg.transformer.memory_length

    cfg = load_config("etmppo_tpu/configs/mystery_path_grid.yaml")
    env = create_env(cfg.environment)
    assert isinstance(env, MysteryPathGridEnv)
    assert env.max_episode_steps >= cfg.transformer.memory_length


def test_envs_vmappable_and_trainable():
    """Tiny rollout+update through both envs (vmapped, jitted)."""
    import dataclasses
    from etmppo_tpu.models.actor_critic import ActorCriticModel
    from etmppo_tpu.training.rollout import RolloutFn

    for name in ("mortar_mayhem_grid", "mystery_path_grid"):
        cfg = load_config(f"etmppo_tpu/configs/{name}.yaml")
        cfg = dataclasses.replace(
            cfg, n_workers=2, worker_steps=4, n_mini_batch=1, epochs=1,
            hidden_layer_size=32,
            transformer=dataclasses.replace(
                cfg.transformer, num_blocks=2, embed_dim=32, num_heads=2,
                memory_length=16))
        env = create_env(cfg.environment)
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


class TestSearingSpotlights:
    def make(self):
        from etmppo_tpu.envs.searing_spotlights import SearingSpotlightsEnv
        return SearingSpotlightsEnv({})

    def test_multi_discrete_protocol(self):
        env = self.make()
        assert env.action_branches == (3, 3)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (84, 84, 3)
        state, obs, r, d, info = env.step(
            state, jnp.asarray([2, 1], jnp.int32), jax.random.PRNGKey(1))
        assert float(state.pos[0]) > 0.0

    def test_show_phase_then_darkness(self):
        env = self.make()
        state, obs = env.reset(jax.random.PRNGKey(3))
        lit_fraction = float((np.asarray(obs) > 0).mean())
        for _ in range(10):
            state, obs, r, d, info = env.step(
                state, jnp.asarray([1, 1], jnp.int32), jax.random.PRNGKey(0))
        dark_fraction = float((np.asarray(obs) > 0).mean())
        assert lit_fraction > 0.9          # initial phase: fully visible
        assert dark_fraction < lit_fraction * 0.6   # later: mostly dark

    def test_coin_then_exit_success(self):
        env = self.make()
        state, obs = env.reset(jax.random.PRNGKey(1))

        def walk_to(state, target, max_steps=120):
            done, info, r = False, {}, 0.0
            total = 0.0
            for _ in range(max_steps):
                d = np.asarray(target) - np.asarray(state.pos)
                a = jnp.asarray([int(np.sign(d[0])) + 1,
                                 int(np.sign(d[1])) + 1], jnp.int32)
                state, obs, r, done, info = env.step(
                    state, a, jax.random.PRNGKey(0))
                total += float(r)
                if done or np.linalg.norm(
                        np.asarray(state.pos) - np.asarray(target)) < 0.02:
                    break
            return state, total, done, info

        coin = np.asarray(state.coin_pos)
        state, r1, done, info = walk_to(state, coin)
        assert bool(state.coin_collected)
        if not done:
            exit_pos = np.asarray(state.exit_pos)
            state, r2, done, info = walk_to(state, exit_pos)
            if bool(done) and float(info["success"]) == 1.0:
                assert r1 + r2 >= 1.0  # coin + exit rewards (minus damage 0)

    def test_health_depletes_in_spotlights(self):
        env = self.make()
        state, obs = env.reset(jax.random.PRNGKey(2))
        # teleport a spotlight onto the agent and stay put in darkness
        state = state._replace(
            t=jnp.int32(20),
            spot_pos=state.spot_pos.at[0].set(state.pos))
        state, obs, r, d, info = env.step(
            state, jnp.asarray([1, 1], jnp.int32), jax.random.PRNGKey(0))
        assert float(state.health) < env.initial_health

    def test_factory(self):
        from etmppo_tpu.config import EnvConfig
        from etmppo_tpu.envs.searing_spotlights import SearingSpotlightsEnv
        env = create_env(EnvConfig(type="SearingSpotlights"))
        assert isinstance(env, SearingSpotlightsEnv)
