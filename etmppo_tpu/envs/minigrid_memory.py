"""MiniGrid-Memory (S7/S9/S11/S13), pure JAX.

Behavioral re-implementation of gym-minigrid's MemoryEnv as seen through the
reference's wrapper (environments/minigrid_env.py): 3x3 egocentric view
rendered to 84x84 RGB (tile size 28), 96-step limit, 3 actions
(turn-left / turn-right / forward), observations scaled to [0, 1].

Task: a cue object (key or ball) sits in the start room; at the end of the
hallway a T-junction holds both object types.  Stepping onto the cell next to
the object matching the cue rewards ``1 - 0.9 * step_count / (5 * size^2)``
and ends the episode; the wrong side ends it with 0.

TPU-native divergences (documented, behavior-preserving):
* Observations are HWC (84, 84, 3) — TPU layout — vs the reference's CHW.
* Tiles are procedurally drawn sprites with the same semantics (grey walls,
  green key/ball glyphs, red agent triangle, black unseen cells) but not
  pixel-identical to minigrid's renderer.
* The whole env (grid state, occlusion masking, sprite assembly via gather)
  is a pure function that vmaps and compiles into the rollout scan.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core import JaxEnv

# Cell types
FLOOR, WALL, KEY, BALL, UNSEEN = 0, 1, 2, 3, 4
NUM_CELL_TYPES = 5
TILE = 28
VIEW = 3

# dir: 0 = east(+x), 1 = south(+y), 2 = west, 3 = north  (minigrid order)
DIR_VEC = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], np.int32)


def _build_static_grid(size: int) -> Tuple[np.ndarray, tuple, tuple, tuple, int]:
    """Static wall layout of MemoryEnv (gym-minigrid memory.py _gen_grid).
    Returns (grid[y][x], cue_pos, obj_top_pos, obj_bottom_pos, hallway_end)."""
    assert size % 2 == 1
    g = np.zeros((size, size), np.int8)
    g[0, :] = WALL
    g[-1, :] = WALL
    g[:, 0] = WALL
    g[:, -1] = WALL
    upper = size // 2 - 2
    lower = size // 2 + 2
    hallway_end = size - 3
    for i in range(1, 5):
        g[upper, i] = WALL
        g[lower, i] = WALL
    g[upper + 1, 4] = WALL
    g[lower - 1, 4] = WALL
    for i in range(5, hallway_end):
        g[upper + 1, i] = WALL
        g[lower - 1, i] = WALL
    for j in range(size):
        if j != size // 2:
            g[j, hallway_end] = WALL
    cue_pos = (1, size // 2 - 1)                    # (x, y)
    obj_top = (hallway_end + 1, size // 2 - 2)
    obj_bottom = (hallway_end + 1, size // 2 + 2)
    return g, cue_pos, obj_top, obj_bottom, hallway_end


def _make_sprites() -> np.ndarray:
    """(NUM_CELL_TYPES + 1, TILE, TILE, 3) float32 sprites in [0, 1]; the last
    entry is the agent-on-floor tile (red triangle pointing view-forward/up)."""
    yy, xx = np.mgrid[0:TILE, 0:TILE].astype(np.float32) / (TILE - 1)
    sprites = np.zeros((NUM_CELL_TYPES + 1, TILE, TILE, 3), np.float32)

    floor = np.zeros((TILE, TILE, 3), np.float32)
    floor[0, :, :] = 0.15   # grid lines
    floor[:, 0, :] = 0.15
    sprites[FLOOR] = floor

    sprites[WALL] = 0.4     # uniform grey

    key = floor.copy()
    ring = ((xx - 0.5) ** 2 + (yy - 0.3) ** 2 < 0.04) & \
           ((xx - 0.5) ** 2 + (yy - 0.3) ** 2 > 0.012)
    shaft = (np.abs(xx - 0.5) < 0.06) & (yy > 0.3) & (yy < 0.85)
    tooth = (np.abs(yy - 0.7) < 0.045) & (xx > 0.5) & (xx < 0.7)
    tooth2 = (np.abs(yy - 0.82) < 0.045) & (xx > 0.5) & (xx < 0.65)
    key[ring | shaft | tooth | tooth2] = np.array([0.0, 0.88, 0.0])
    sprites[KEY] = key

    ball = floor.copy()
    circle = (xx - 0.5) ** 2 + (yy - 0.5) ** 2 < 0.11
    ball[circle] = np.array([0.0, 0.88, 0.0])
    sprites[BALL] = ball

    sprites[UNSEEN] = 0.0   # black

    agent = floor.copy()
    # upward triangle: apex at top-center
    tri = (yy > 0.2) & (yy < 0.85) & (np.abs(xx - 0.5) < 0.45 * (yy - 0.2) / 0.65)
    agent[tri] = np.array([0.9, 0.1, 0.1])
    sprites[NUM_CELL_TYPES] = agent
    return sprites


def _process_vis_3x3(view: jax.Array) -> jax.Array:
    """Occlusion masking per minigrid Grid.process_vis on the 3x3 egocentric
    view (agent at col 1, row 2).  Cells not visible become UNSEEN."""
    opaque = view == WALL  # only walls block sight
    vis = jnp.zeros((3, 3), bool).at[2, 1].set(True)
    see = lambda v, y, x: v & ~opaque[y, x]

    def row_pass(vis, j):
        # left-to-right
        for i in range(0, 2):
            ok = see(vis[j, i], j, i)
            vis = vis.at[j, i + 1].set(vis[j, i + 1] | ok)
            if j > 0:
                vis = vis.at[j - 1, i + 1].set(vis[j - 1, i + 1] | ok)
                vis = vis.at[j - 1, i].set(vis[j - 1, i] | ok)
        # right-to-left
        for i in range(2, 0, -1):
            ok = see(vis[j, i], j, i)
            vis = vis.at[j, i - 1].set(vis[j, i - 1] | ok)
            if j > 0:
                vis = vis.at[j - 1, i - 1].set(vis[j - 1, i - 1] | ok)
                vis = vis.at[j - 1, i].set(vis[j - 1, i] | ok)
        return vis

    for j in (2, 1, 0):
        vis = row_pass(vis, j)
    return jnp.where(vis, view, UNSEEN)


class MinigridMemoryState(NamedTuple):
    grid: jax.Array         # (S, S) int8  [y][x]
    pos: jax.Array          # (2,) int32   (x, y)
    dir: jax.Array          # int32
    success_pos: jax.Array  # (2,) int32
    failure_pos: jax.Array  # (2,) int32
    step_count: jax.Array   # int32
    reward_sum: jax.Array   # float32
    length: jax.Array       # int32


class MinigridMemoryEnv(JaxEnv):
    info_keys = ("reward", "length", "success")
    max_episode_steps = 96  # reference wrapper cap (minigrid_env.py:17)

    def __init__(self, name: str = "MiniGrid-MemoryS9-v0"):
        size = 9
        for s in (7, 9, 11, 13, 17):
            if f"S{s}" in name:
                size = s
        self.name = name
        self.size = size
        self.internal_max_steps = 5 * size * size  # reward normalization
        grid, cue, obj_top, obj_bottom, hallway_end = _build_static_grid(size)
        self._base_grid = grid
        self._cue = cue
        self._obj_top = obj_top
        self._obj_bottom = obj_bottom
        self._hallway_end = hallway_end
        self._sprites = _make_sprites()
        self.observation_shape: Tuple[int, ...] = (TILE * VIEW, TILE * VIEW, 3)
        self.action_branches: Tuple[int, ...] = (3,)

    # --- observation ------------------------------------------------------

    def _observe(self, state: MinigridMemoryState) -> jax.Array:
        d = state.dir
        fwd = jnp.asarray(DIR_VEC)[d]
        right = jnp.asarray(DIR_VEC)[(d + 1) % 4]
        # view[row, col]: row 0 = farthest (depth 2), agent at (row 2, col 1)
        depth = jnp.asarray([2, 1, 0], jnp.int32)[:, None]       # per row
        lateral = jnp.asarray([-1, 0, 1], jnp.int32)[None, :]    # per col
        world = (state.pos[None, None, :]
                 + depth[:, :, None] * fwd[None, None, :]
                 + lateral[:, :, None] * right[None, None, :])   # (3,3,2) x,y
        x = jnp.clip(world[..., 0], 0, self.size - 1)
        y = jnp.clip(world[..., 1], 0, self.size - 1)
        in_bounds = ((world[..., 0] >= 0) & (world[..., 0] < self.size)
                     & (world[..., 1] >= 0) & (world[..., 1] < self.size))
        view = jnp.where(in_bounds, state.grid[y, x], WALL).astype(jnp.int32)
        view = _process_vis_3x3(view)
        view = view.at[2, 1].set(NUM_CELL_TYPES)  # agent tile
        tiles = jnp.asarray(self._sprites)[view]  # (3, 3, TILE, TILE, 3)
        img = tiles.transpose(0, 2, 1, 3, 4).reshape(
            VIEW * TILE, VIEW * TILE, 3)
        return img

    # --- protocol ---------------------------------------------------------

    def reset(self, key: jax.Array):
        k_pos, k_cue, k_objs = jax.random.split(key, 3)
        grid = jnp.asarray(self._base_grid)
        cue_is_key = jax.random.bernoulli(k_cue)
        top_is_key = jax.random.bernoulli(k_objs)
        cue_obj = jnp.where(cue_is_key, KEY, BALL).astype(jnp.int8)
        top_obj = jnp.where(top_is_key, KEY, BALL).astype(jnp.int8)
        bottom_obj = jnp.where(top_is_key, BALL, KEY).astype(jnp.int8)
        grid = grid.at[self._cue[1], self._cue[0]].set(cue_obj)
        grid = grid.at[self._obj_top[1], self._obj_top[0]].set(top_obj)
        grid = grid.at[self._obj_bottom[1], self._obj_bottom[0]].set(bottom_obj)

        # success next to the object matching the cue (memory.py logic)
        top_matches = cue_is_key == top_is_key
        succ_top = jnp.asarray([self._obj_top[0], self._obj_top[1] + 1],
                               jnp.int32)
        succ_bottom = jnp.asarray([self._obj_bottom[0], self._obj_bottom[1] - 1],
                                  jnp.int32)
        success_pos = jnp.where(top_matches, succ_top, succ_bottom)
        failure_pos = jnp.where(top_matches, succ_bottom, succ_top)

        start_x = jax.random.randint(k_pos, (), 1, self._hallway_end + 1)
        pos = jnp.asarray([start_x, self.size // 2], jnp.int32)
        state = MinigridMemoryState(
            grid=grid, pos=pos, dir=jnp.int32(0),
            success_pos=success_pos, failure_pos=failure_pos,
            step_count=jnp.int32(0), reward_sum=jnp.float32(0.0),
            length=jnp.int32(0))
        return state, self._observe(state)

    def step(self, state: MinigridMemoryState, action: jax.Array,
             key: jax.Array):
        del key
        a = action[0]
        d = jnp.where(a == 0, (state.dir - 1) % 4,
                      jnp.where(a == 1, (state.dir + 1) % 4, state.dir))
        fwd_pos = state.pos + jnp.asarray(DIR_VEC)[d]
        cell = state.grid[fwd_pos[1], fwd_pos[0]]
        can_move = (a == 2) & (cell == FLOOR)
        pos = jnp.where(can_move, fwd_pos, state.pos)

        step_count = state.step_count + 1
        at_success = jnp.all(pos == state.success_pos)
        at_failure = jnp.all(pos == state.failure_pos)
        reward = jnp.where(
            at_success,
            1.0 - 0.9 * step_count.astype(jnp.float32) / self.internal_max_steps,
            0.0)
        # Reference wrapper: hard done at 96 steps (minigrid_env.py:65-66).
        done = at_success | at_failure | (step_count >= self.max_episode_steps)

        new_state = MinigridMemoryState(
            grid=state.grid, pos=pos, dir=d,
            success_pos=state.success_pos, failure_pos=state.failure_pos,
            step_count=step_count,
            reward_sum=state.reward_sum + reward,
            length=state.length + 1)
        info = {
            "reward": new_state.reward_sum,
            "length": new_state.length.astype(jnp.float32),
            "success": at_success.astype(jnp.float32),
        }
        return new_state, self._observe(new_state), reward, done, info
