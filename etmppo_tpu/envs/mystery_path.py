"""Mystery Path Grid, pure JAX.

Task-equivalent reimplementation of memory-gym's ``MysteryPath-Grid-v0``
(reference wrapper: environments/memory_gym_env.py; task per the Memory Gym
paper): an invisible path leads from an origin on one arena edge
(``cardinal_origin_choice``) to a goal on the opposite edge; stepping off the
path teleports the agent back to the origin (optionally with one step of
visual feedback marking the fall position).  Reaching the goal rewards
``reward_goal`` and ends the episode; first-time progress along the path can
be rewarded with ``reward_path_progress``.  Origin and goal markers are only
rendered when ``show_origin`` / ``show_goal`` are set.

NOTE: behaviorally equivalent, not pixel/path-distribution-identical to
memory-gym (available via the host bridge as ``MysteryPath-Grid-host`` when
installed).  The memory challenge is preserved: the agent must remember which
cells were safe across falls.

Observation: 84x84x3 float32 in [0,1] (HWC) top-down view.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core import JaxEnv

# actions: 0 up(-y), 1 right(+x), 2 down(+y), 3 left(-x)
MOVE_OFFSETS = np.array([[0, -1], [1, 0], [0, 1], [-1, 0]], np.int32)


class MysteryPathState(NamedTuple):
    on_path: jax.Array        # (S, S) bool — hidden path cells
    progress_idx: jax.Array   # (S, S) int32 — order along the path (-1 off)
    origin: jax.Array         # (2,) int32
    goal: jax.Array           # (2,) int32
    pos: jax.Array            # (2,) int32
    best_progress: jax.Array  # int32 — farthest path index reached
    fall_pos: jax.Array       # (2,) int32 — last fall cell (feedback)
    fall_timer: jax.Array     # int32 — steps of feedback remaining
    t: jax.Array              # int32
    reward_sum: jax.Array     # float32
    length: jax.Array         # int32


class MysteryPathGridEnv(JaxEnv):
    info_keys = ("reward", "length", "success")
    max_episode_steps = 128

    def __init__(self, reset_params: Dict):
        p = dict(reset_params or {})
        self.size = int(p.get("arena_size", 7))
        self.origin_choices = tuple(p.get("cardinal_origin_choice",
                                          [0, 1, 2, 3]))
        self.show_origin = bool(p.get("show_origin", False))
        self.show_goal = bool(p.get("show_goal", False))
        self.visual_feedback = bool(p.get("visual_feedback", True))
        self.r_goal = float(p.get("reward_goal", 1.0))
        self.r_fall = float(p.get("reward_fall_off", 0.0))
        self.r_progress = float(p.get("reward_path_progress", 0.0))

        self.tile = 84 // self.size
        self.offset = (84 - self.tile * self.size) // 2
        # generous bound on path length (biased walk crosses in <= ~3S steps)
        self.max_path_len = 3 * self.size
        self.observation_shape: Tuple[int, ...] = (84, 84, 3)
        self.action_branches: Tuple[int, ...] = (4,)

    # --- path generation -------------------------------------------------

    def _generate_path(self, key):
        """Biased random walk from a random cell on the chosen edge to the
        opposite edge: forward with p=1/2, lateral +/- with p=1/4 each (never
        backward), so the goal edge is reached within the step bound w.h.p.;
        a final forced-forward sweep guarantees termination."""
        S = self.size
        k_edge, k_start, k_walk = jax.random.split(key, 3)
        edge = jax.random.choice(
            k_edge, jnp.asarray(self.origin_choices, jnp.int32))
        lateral0 = jax.random.randint(k_start, (), 0, S)

        # walk in (fwd, lat) coordinates: fwd 0 -> S-1.  When the remaining
        # step budget equals the remaining forward distance, forward moves are
        # forced, so the goal edge is always reached and the path stays
        # connected.
        n_steps = self.max_path_len - 1

        def body(carry, xs):
            fwd, lat, done = carry
            k, i = xs
            steps_left = n_steps - i
            force_fwd = steps_left <= (S - 1) - fwd
            move = jax.random.choice(
                k, jnp.asarray([0, 1, 2]), p=jnp.asarray([0.5, 0.25, 0.25]))
            move = jnp.where(force_fwd, 0, move)
            d_lat = jnp.where(move == 1, 1, jnp.where(move == 2, -1, 0))
            new_lat = jnp.where(done, lat, jnp.clip(lat + d_lat, 0, S - 1))
            new_fwd = jnp.where(done, fwd,
                                jnp.where(move == 0, fwd + 1, fwd))
            new_done = done | (new_fwd >= S - 1)
            return (new_fwd, new_lat, new_done), (new_fwd, new_lat)

        keys = jax.random.split(k_walk, n_steps)
        (_, _, _), (fwds, lats) = jax.lax.scan(
            body, (jnp.int32(0), lateral0, jnp.asarray(False)),
            (keys, jnp.arange(n_steps, dtype=jnp.int32)))
        fwds = jnp.concatenate([jnp.zeros((1,), jnp.int32), fwds])
        lats = jnp.concatenate([lateral0[None], lats])

        # map (fwd, lat) -> (x, y) per edge: 0: left->right, 1: top->bottom,
        # 2: right->left, 3: bottom->top
        def to_xy(fwd, lat):
            x = jnp.select(
                [edge == 0, edge == 1, edge == 2, edge == 3],
                [fwd, lat, S - 1 - fwd, lat])
            y = jnp.select(
                [edge == 0, edge == 1, edge == 2, edge == 3],
                [lat, fwd, lat, S - 1 - fwd])
            return x, y

        xs, ys = to_xy(fwds, lats)
        order = jnp.arange(self.max_path_len, dtype=jnp.int32)
        on_path = jnp.zeros((S, S), bool).at[ys, xs].set(True)
        # progress index: FIRST time a cell appears along the walk
        progress = jnp.full((S, S), jnp.iinfo(jnp.int32).max, jnp.int32)
        progress = progress.at[ys, xs].min(order)
        progress = jnp.where(on_path, progress, -1)
        origin_x, origin_y = to_xy(jnp.int32(0), lateral0)
        origin = jnp.stack([origin_x, origin_y])
        goal = jnp.stack([xs[-1], ys[-1]])
        return on_path, progress, origin, goal

    # --- rendering -------------------------------------------------------

    def _observe(self, state: MysteryPathState) -> jax.Array:
        S, tile, off = self.size, self.tile, self.offset
        yy, xx = jnp.mgrid[0:84, 0:84]
        in_arena = ((xx >= off) & (xx < off + S * tile)
                    & (yy >= off) & (yy < off + S * tile))
        cell_x = jnp.clip((xx - off) // tile, 0, S - 1)
        cell_y = jnp.clip((yy - off) // tile, 0, S - 1)
        base = jnp.where(in_arena & (((cell_x + cell_y) % 2) == 0), 0.18, 0.24)
        img = jnp.zeros((84, 84, 3), jnp.float32) + base[:, :, None]

        def mark(img, pos, color, cond=True):
            on = (cell_x == pos[0]) & (cell_y == pos[1]) & in_arena & cond
            return jnp.where(on[:, :, None], jnp.asarray(color), img)

        if self.show_origin:
            img = mark(img, state.origin, [0.2, 0.8, 0.2])
        if self.show_goal:
            img = mark(img, state.goal, [0.9, 0.8, 0.1])
        if self.visual_feedback:
            img = mark(img, state.fall_pos, [0.85, 0.1, 0.1],
                       cond=state.fall_timer > 0)
        img = mark(img, state.pos, [0.1, 0.3, 0.95])
        return jnp.clip(img, 0.0, 1.0)

    # --- protocol --------------------------------------------------------

    def reset(self, key: jax.Array):
        on_path, progress, origin, goal = self._generate_path(key)
        state = MysteryPathState(
            on_path=on_path, progress_idx=progress, origin=origin, goal=goal,
            pos=origin + 0,  # copy: aliased fields break buffer donation
            best_progress=jnp.int32(0),
            fall_pos=jnp.asarray([-1, -1], jnp.int32),
            fall_timer=jnp.int32(0), t=jnp.int32(0),
            reward_sum=jnp.float32(0.0), length=jnp.int32(0))
        return state, self._observe(state)

    def step(self, state: MysteryPathState, action: jax.Array,
             key: jax.Array):
        del key
        a = action[0]
        new_pos = jnp.clip(state.pos + jnp.asarray(MOVE_OFFSETS)[a], 0,
                           self.size - 1)
        on = state.on_path[new_pos[1], new_pos[0]]
        at_goal = jnp.all(new_pos == state.goal)

        fell = ~on
        pos = jnp.where(fell, state.origin, new_pos)
        prog = jnp.where(on, state.progress_idx[new_pos[1], new_pos[0]], 0)
        new_best = jnp.maximum(state.best_progress, prog)
        progressed = on & (prog > state.best_progress)

        reward = jnp.where(at_goal, self.r_goal, 0.0)
        reward = reward + jnp.where(fell, self.r_fall, 0.0)
        reward = reward + jnp.where(progressed, self.r_progress, 0.0)

        t = state.t + 1
        done = at_goal | (t >= self.max_episode_steps)
        new_state = MysteryPathState(
            on_path=state.on_path, progress_idx=state.progress_idx,
            origin=state.origin, goal=state.goal, pos=pos,
            best_progress=new_best,
            fall_pos=jnp.where(fell, new_pos, state.fall_pos),
            fall_timer=jnp.where(fell, 1, jnp.maximum(
                state.fall_timer - 1, 0)),
            t=t, reward_sum=state.reward_sum + reward,
            length=state.length + 1)
        info = {
            "reward": new_state.reward_sum,
            "length": new_state.length.astype(jnp.float32),
            "success": at_goal.astype(jnp.float32),
        }
        return new_state, self._observe(new_state), reward, done, info
