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
    """Per-update outputs of a fused chunk, PACKED into two arrays so a chunk
    costs two device->host transfers instead of ~16 (each transfer is a full
    round trip; over remote-dispatch TPU tunnels that latency dominated).

    scalars[k] = [stats(6) | grad norms (sorted keys) | value_mean | adv_mean]
    per_step[k] = [dones | episode info values (sorted keys)] as (1+I, W, T)
    """
    scalars: jax.Array   # (K, 6 + G + 2)
    per_step: jax.Array  # (K, 1 + I, W, T)
    grad_keys: Tuple[str, ...]
    info_keys: Tuple[str, ...]


class FusedTrainLoop:
    def __init__(self, rollout_fn: RolloutFn, update_fn: PPOUpdateFn):
        self.rollout_fn = rollout_fn
        self.update_fn = update_fn
        self._grad_keys: Tuple[str, ...] = ()
        self._info_keys: Tuple[str, ...] = ()
        self._jitted = jax.jit(self._run_chunk, donate_argnums=(0, 1, 2, 3))

    def __call__(self, params, opt_state, rollout_state: RolloutState, rng,
                 lrs, clip_ranges, betas):
        """lrs/clip_ranges/betas: (K,) float32 per-update schedule values."""
        params, opt_state, rollout_state, rng, (scalars, per_step) = \
            self._jitted(params, opt_state, rollout_state, rng,
                         jnp.asarray(lrs, jnp.float32),
                         jnp.asarray(clip_ranges, jnp.float32),
                         jnp.asarray(betas, jnp.float32))
        outs = ChunkOutputs(scalars, per_step, self._grad_keys, self._info_keys)
        return params, opt_state, rollout_state, rng, outs

    def _run_chunk(self, params, opt_state, rollout_state, rng,
                   lrs, clip_ranges, betas):
        def body(carry, xs):
            params, opt_state, rstate, rng = carry
            lr, clip_range, beta = xs
            rstate, batch = self.rollout_fn._rollout(params, rstate)
            rng, update_rng = jax.random.split(rng)
            params, opt_state, stats, grad_info = self.update_fn._update(
                params, opt_state, batch, update_rng, lr, clip_range, beta)
            # Key orders are static; recorded at trace time for unpacking.
            self._grad_keys = tuple(sorted(grad_info))
            self._info_keys = tuple(sorted(batch.episode_infos))
            scalars = jnp.concatenate([
                stats,
                jnp.stack([grad_info[k] for k in self._grad_keys]),
                batch.values.mean()[None],
                batch.advantages.mean()[None]])
            per_step = jnp.stack(
                [batch.dones.astype(jnp.float32)]
                + [batch.episode_infos[k] for k in self._info_keys])
            return (params, opt_state, rstate, rng), (scalars, per_step)

        (params, opt_state, rollout_state, rng), (scalars, per_step) = \
            jax.lax.scan(
                body, (params, opt_state, rollout_state, rng),
                (lrs, clip_ranges, betas))
        return params, opt_state, rollout_state, rng, (scalars, per_step)
