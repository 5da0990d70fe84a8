"""Fused multi-update training: ``lax.scan`` over whole PPO updates.

The reference (and our unfused path) launches work per update and syncs small
arrays to the host in between; on TPU — especially behind a remote dispatch
tunnel — that per-update latency dominates small-model configs.  Here a chunk
of K updates (rollout scan + GAE + PPO epochs each) compiles into ONE device
program; the host only supplies per-update schedule values (computed ahead,
reference: trainer.py:109-111 steps schedules per update) and drains stacked
per-update metrics at chunk boundaries.  Semantics are identical to running
``train_one_update`` K times.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .ppo import PPOUpdateFn
from .rollout import RolloutFn, RolloutState


class ChunkOutputs(NamedTuple):
    stats: jax.Array                 # (K, 6)
    grad_info: Dict[str, jax.Array]  # each (K,)
    dones: jax.Array                 # (K, W, T)
    episode_infos: Dict[str, jax.Array]  # each (K, W, T)
    value_mean: jax.Array            # (K,)
    advantage_mean: jax.Array        # (K,)


class FusedTrainLoop:
    def __init__(self, rollout_fn: RolloutFn, update_fn: PPOUpdateFn):
        self.rollout_fn = rollout_fn
        self.update_fn = update_fn
        self._jitted = jax.jit(self._run_chunk, donate_argnums=(0, 1, 2, 3))

    def __call__(self, params, opt_state, rollout_state: RolloutState, rng,
                 lrs, clip_ranges, betas):
        """lrs/clip_ranges/betas: (K,) float32 per-update schedule values."""
        return self._jitted(params, opt_state, rollout_state, rng,
                            jnp.asarray(lrs, jnp.float32),
                            jnp.asarray(clip_ranges, jnp.float32),
                            jnp.asarray(betas, jnp.float32))

    def _run_chunk(self, params, opt_state, rollout_state, rng,
                   lrs, clip_ranges, betas):
        def body(carry, xs):
            params, opt_state, rstate, rng = carry
            lr, clip_range, beta = xs
            rstate, batch = self.rollout_fn._rollout(params, rstate)
            rng, update_rng = jax.random.split(rng)
            params, opt_state, stats, grad_info = self.update_fn._update(
                params, opt_state, batch, update_rng, lr, clip_range, beta)
            out = ChunkOutputs(
                stats=stats, grad_info=grad_info, dones=batch.dones,
                episode_infos=batch.episode_infos,
                value_mean=batch.values.mean(),
                advantage_mean=batch.advantages.mean())
            return (params, opt_state, rstate, rng), out

        (params, opt_state, rollout_state, rng), outs = jax.lax.scan(
            body, (params, opt_state, rollout_state, rng),
            (lrs, clip_ranges, betas))
        return params, opt_state, rollout_state, rng, outs
