"""Mortar Mayhem Grid, pure JAX.

Task-equivalent reimplementation of memory-gym's ``MortarMayhem-Grid-v0``
(reference wrapper: environments/memory_gym_env.py; task per the Memory Gym
paper): a sequence of ``command_count`` movement commands is announced one at
a time; afterwards the agent must execute them in order — within
``explosion_delay`` steps it must stand on the commanded adjacent tile, then
survive ``explosion_duration`` verification steps during which every other
tile "explodes".  Each verified command yields ``reward_command_success``;
failure ends the episode.

NOTE: behaviorally equivalent, not pixel/timing-identical to memory-gym
(which, when installed, remains available through the host bridge as
environment type ``MortarMayhem-Grid-host``).  The memory challenge is
preserved: commands are only visible during the announcement phase.

Observation: 84x84x3 float32 in [0,1] (HWC): top-down arena, blue agent tile,
announced command rendered as a white arrow glyph strip at the top, exploding
tiles red during verification.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core import JaxEnv

# command ids: 0 stay, 1 up(-y), 2 right(+x), 3 down(+y), 4 left(-x),
# 5..8 diagonals (allowed_commands: 5 => cardinal+stay, 9 => + diagonals)
COMMAND_OFFSETS = np.array(
    [[0, 0], [0, -1], [1, 0], [0, 1], [-1, 0],
     [1, -1], [1, 1], [-1, 1], [-1, -1]], np.int32)
SHOW_DURATION = 3
SHOW_DELAY = 1


def _glyphs(tile: int) -> np.ndarray:
    """(9, tile, tile) arrow/stay glyph masks for command display."""
    yy, xx = np.mgrid[0:tile, 0:tile].astype(np.float32) / (tile - 1)
    g = np.zeros((9, tile, tile), np.float32)
    g[0] = ((np.abs(xx - 0.5) < 0.22) & (np.abs(yy - 0.5) < 0.22)).astype(
        np.float32)                              # stay: square
    down = ((np.abs(xx - 0.5) < (yy - 0.1) * 0.6)
            & (yy > 0.1) & (yy < 0.9)).astype(np.float32)
    g[1] = np.rot90(down, k=2)                   # up (apex top)
    g[2] = np.rot90(down, k=1)                   # right (apex right)
    g[3] = down                                  # down
    g[4] = np.rot90(down, k=3)                   # left
    # diagonals: distinct corner-triangle glyphs
    g[5] = ((xx - yy > 0.25)).astype(np.float32)           # up-right
    g[6] = ((xx + yy > 1.25)).astype(np.float32)           # down-right
    g[7] = ((yy - xx > 0.25)).astype(np.float32)           # down-left
    g[8] = ((xx + yy < 0.75)).astype(np.float32)           # up-left
    return g


class MortarMayhemState(NamedTuple):
    pos: jax.Array           # (2,) int32 (x, y)
    commands: jax.Array      # (C,) int32
    targets: jax.Array       # (C, 2) int32 — tile to stand on per command
    t: jax.Array             # int32 global step
    commands_done: jax.Array  # int32
    failed: jax.Array        # bool
    reward_sum: jax.Array    # float32
    length: jax.Array        # int32


class MortarMayhemGridEnv(JaxEnv):
    info_keys = ("reward", "length", "success")

    def __init__(self, reset_params: Dict):
        p = dict(reset_params or {})
        self.arena = int(p.get("arena_size", 5))
        self.allowed_commands = int(p.get("allowed_commands", 5))
        self.command_count = int(np.max(p.get("command_count", [10])))
        self.explosion_duration = int(np.max(p.get("explosion_duration", [2])))
        self.explosion_delay = int(np.max(p.get("explosion_delay", [6])))
        self.r_fail = float(p.get("reward_command_failure", 0.0))
        self.r_success = float(p.get("reward_command_success", 0.1))
        self.r_episode = float(p.get("reward_episode_success", 0.0))

        C = self.command_count
        self.announce_steps = C * (SHOW_DURATION + SHOW_DELAY)
        self.exec_steps_per_cmd = self.explosion_delay + self.explosion_duration
        self.max_episode_steps = (
            self.announce_steps + C * self.exec_steps_per_cmd)

        self.tile = 84 // self.arena
        self.offset = (84 - self.tile * self.arena) // 2
        self._glyphs = _glyphs(20)
        self.observation_shape: Tuple[int, ...] = (84, 84, 3)
        self.action_branches: Tuple[int, ...] = (self.allowed_commands,)
        self.info_keys = ("reward", "length", "success")

    # --- helpers ---------------------------------------------------------

    def _sample_commands(self, key):
        """Commands sampled so the nominal target path stays inside the
        arena (memory-gym samples valid command sequences)."""
        C = self.arena  # placeholder to appease linters; real value below
        C = self.command_count
        start = jnp.asarray([self.arena // 2, self.arena // 2], jnp.int32)
        offsets = jnp.asarray(COMMAND_OFFSETS[:self.allowed_commands])

        def body(carry, k):
            pos = carry
            cand = pos[None, :] + offsets                     # (A, 2)
            ok = jnp.all((cand >= 0) & (cand < self.arena), axis=1)
            logits = jnp.where(ok, 0.0, -1e9)
            cmd = jax.random.categorical(k, logits)
            new_pos = cand[cmd]
            return new_pos, (cmd.astype(jnp.int32), new_pos)

        _, (commands, targets) = jax.lax.scan(
            body, start, jax.random.split(key, C))
        return commands, targets, start

    def _phase(self, t):
        """Returns (announcing, shown_cmd_idx, show_active, exec_idx,
        in_explosion) for global step t."""
        announcing = t < self.announce_steps
        show_slot = jnp.clip(t // (SHOW_DURATION + SHOW_DELAY), 0,
                             self.command_count - 1)
        show_active = (t % (SHOW_DURATION + SHOW_DELAY)) < SHOW_DURATION
        te = t - self.announce_steps
        exec_idx = jnp.clip(te // self.exec_steps_per_cmd, 0,
                            self.command_count - 1)
        in_explosion = (te % self.exec_steps_per_cmd) >= self.explosion_delay
        return announcing, show_slot, show_active, exec_idx, in_explosion

    def _observe(self, state: MortarMayhemState) -> jax.Array:
        arena, tile, off = self.arena, self.tile, self.offset
        img = jnp.zeros((84, 84, 3), jnp.float32)
        # arena background
        yy, xx = jnp.mgrid[0:84, 0:84]
        in_arena = ((xx >= off) & (xx < off + arena * tile)
                    & (yy >= off) & (yy < off + arena * tile))
        cell_x = jnp.clip((xx - off) // tile, 0, arena - 1)
        cell_y = jnp.clip((yy - off) // tile, 0, arena - 1)
        base = jnp.where(in_arena & (((cell_x + cell_y) % 2) == 0), 0.18, 0.24)
        img = img + base[:, :, None]

        announcing, show_slot, show_active, exec_idx, in_explosion = \
            self._phase(state.t)

        # explosion overlay: all tiles except the current target turn red
        target = state.targets[exec_idx]
        is_target = (cell_x == target[0]) & (cell_y == target[1])
        explode = (~announcing) & in_explosion
        red = jnp.where(explode & in_arena & ~is_target, 0.7, 0.0)
        img = img.at[:, :, 0].add(red)

        # agent tile (blue)
        on_agent = (cell_x == state.pos[0]) & (cell_y == state.pos[1]) & in_arena
        img = jnp.where(on_agent[:, :, None],
                        jnp.asarray([0.1, 0.3, 0.95]), img)

        # command glyph strip (top), only while announcing + visible
        glyph = jnp.asarray(self._glyphs)[state.commands[show_slot]]
        gh, gw = glyph.shape
        show = announcing & show_active
        patch = jnp.where(show, glyph, 0.0)[:, :, None] * jnp.ones(3)
        img = jax.lax.dynamic_update_slice(
            img, jnp.maximum(
                jax.lax.dynamic_slice(img, (1, 42 - gw // 2, 0), (gh, gw, 3)),
                patch),
            (1, 42 - gw // 2, 0))
        return jnp.clip(img, 0.0, 1.0)

    # --- protocol --------------------------------------------------------

    def reset(self, key: jax.Array):
        commands, targets, start = self._sample_commands(key)
        state = MortarMayhemState(
            pos=start, commands=commands, targets=targets,
            t=jnp.int32(0), commands_done=jnp.int32(0),
            failed=jnp.asarray(False),
            reward_sum=jnp.float32(0.0), length=jnp.int32(0))
        return state, self._observe(state)

    def step(self, state: MortarMayhemState, action: jax.Array,
             key: jax.Array):
        del key
        a = action[0]
        offsets = jnp.asarray(COMMAND_OFFSETS[:self.allowed_commands])
        new_pos = jnp.clip(state.pos + offsets[a], 0, self.arena - 1)

        t = state.t + 1  # phase AFTER this move
        announcing, _, _, exec_idx, in_explosion = self._phase(state.t)
        # frozen during announcement (commands must be memorized, not acted on)
        pos = jnp.where(announcing, state.pos, new_pos)

        # verification: during explosion steps the agent must be on target
        target = state.targets[exec_idx]
        checking = (~announcing) & in_explosion
        on_target = jnp.all(pos == target)
        failed_now = checking & ~on_target

        # command completed at the LAST explosion step of its window
        te = state.t - self.announce_steps
        last_explosion_step = (
            (~announcing)
            & ((te % self.exec_steps_per_cmd) == self.exec_steps_per_cmd - 1))
        cmd_success = last_explosion_step & on_target & ~failed_now
        commands_done = state.commands_done + jnp.where(cmd_success, 1, 0)
        all_done = commands_done >= self.command_count

        reward = jnp.where(cmd_success, self.r_success, 0.0)
        reward = jnp.where(failed_now, self.r_fail, reward)
        reward = reward + jnp.where(
            all_done & cmd_success, self.r_episode, 0.0)
        done = failed_now | all_done | (t >= self.max_episode_steps)

        new_state = MortarMayhemState(
            pos=pos, commands=state.commands, targets=state.targets,
            t=t, commands_done=commands_done, failed=state.failed | failed_now,
            reward_sum=state.reward_sum + reward,
            length=state.length + 1)
        info = {
            "reward": new_state.reward_sum,
            "length": new_state.length.astype(jnp.float32),
            "success": all_done.astype(jnp.float32),
        }
        return new_state, self._observe(new_state), reward, done, info
