"""Batched policy serving: production inference for trained agents.

No reference equivalent — the reference's only inference surface is the
single-env ``enjoy.py`` loop (enjoy.py:60-93).  ``PolicyServer`` serves the
same incremental-episodic-memory policy to **M concurrent streams** (player
sessions, evaluation episodes, sim instances) with one jitted device program
per step:

* Per-stream episodic memory lives on device as **projected KV caches**
  (models/transformer.py ``project_memory`` — each memory item is projected
  once when written, the LLM-decoder pattern), so a serve step costs
  O(memory_length) gather + attention instead of the reference's full
  re-projection of every window slot (enjoy.py:69-76).
* Static shapes: every step processes all M slots (TPU-friendly); inactive
  slots compute but their state does not advance.  Batch M amortizes dispatch
  latency across streams.
* Streams are reset (episode boundaries / new sessions) with ``reset``; the
  caches return to the PE-only projections, exactly like the trainer's
  auto-reset (training/rollout.py).

Typical use::

    server = PolicyServer("models/run.nn", max_streams=64)
    server.reset(range(64))
    actions, values = server.step(obs_batch)            # (64, branches), (64,)
    ...
    server.reset(finished_ids)                          # episode boundaries
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .envs.factory import create_env
from .models.actor_critic import ActorCriticModel
from .ops import distributions
from .ops.memory_index import build_memory_mask
from .training.checkpoint import load_model, read_model_config


class PolicyServer:
    """Serves a trained policy to up to ``max_streams`` concurrent episode
    streams.  ``greedy=True`` takes the mode of each action branch instead of
    sampling (deterministic serving)."""

    def __init__(self, model_path: str, max_streams: int = 64,
                 greedy: bool = False, seed: int = 0):
        # Read the config first so env/model/params-template are built exactly
        # once (load_model would otherwise reconstruct all three itself).
        config = read_model_config(model_path)
        # Probe env for spaces only (reference dummy-env probe,
        # trainer.py:44-49); pure-JAX envs construct without side effects.
        env = create_env(config.environment)
        self.config = config
        self.max_streams = int(max_streams)
        self.greedy = bool(greedy)
        self.action_branches = env.action_branches
        self.observation_shape = env.observation_shape
        self.max_episode_steps = env.max_episode_steps

        self.model = ActorCriticModel(
            config=config, obs_shape=env.observation_shape,
            action_branches=env.action_branches,
            max_episode_steps=env.max_episode_steps)
        template = self.model.init_params(jax.random.PRNGKey(0))
        self.params, _ = load_model(model_path, params_template=template)
        trx = config.transformer
        self._L = trx.memory_length
        self._mask_table = jnp.asarray(build_memory_mask(self._L))

        # PE-only projections = the projected value of unwritten slots; the
        # reset state of every stream's cache (training/rollout.py:126-139).
        self._pe_k, self._pe_v = self.model.apply(
            self.params, method=type(self.model).pe_kv)
        M = self.max_streams
        self._k_cache = jnp.tile(self._pe_k[None], (M, 1, 1, 1))
        self._v_cache = jnp.tile(self._pe_v[None], (M, 1, 1, 1))
        self._t = jnp.zeros((M,), jnp.int32)
        self._rng = jax.random.PRNGKey(seed)
        self._step_fn = jax.jit(self._step_impl, donate_argnums=(1, 2, 3, 6),
                                static_argnums=(7,))
        self._scan_fn = None  # built lazily by step_many

    # ------------------------------------------------------------------

    def _step_impl(self, params, k_cache, v_cache, t, obs, active, rng,
                   greedy: bool):
        # Same KV-cache step math as training/rollout.py:_step (window slice
        # at s_lo, mask-row lookup, forward_with_kv, project-once write) —
        # kept provably identical by tests/test_serve.py's step-for-step
        # comparison against the raw-memory reference formulation.
        # The rng split and the exhausted-stream freeze live INSIDE the jit so
        # step_device() costs exactly one device dispatch per step.
        rng, step_rng = jax.random.split(rng)
        active = jnp.logical_and(active, t < self.max_episode_steps)
        M, L = self.max_streams, self._L
        mask = self._mask_table[jnp.clip(t, 0, L - 1)]            # (M, L)
        s_lo = jnp.maximum(t - (L - 1), 0)
        slice_window = jax.vmap(
            lambda cache, start: jax.lax.dynamic_slice_in_dim(
                cache, start, L, axis=0))
        k_win = slice_window(k_cache, s_lo)
        v_win = slice_window(v_cache, s_lo)
        logits, value, mem_item = self.model.apply(
            params, obs, k_win, v_win, mask,
            method=type(self.model).forward_with_kv)
        k_item, v_item = self.model.apply(
            params, mem_item, t, method=type(self.model).project_memory)
        # Inactive slots keep their caches/counters (the write is masked).
        # Inactive streams may sit at t == max_episode_steps (one past the
        # cache); clamp so the masked read/write is in range by construction
        # rather than via implicit OOB gather-clamp/scatter-drop semantics.
        act4 = active[:, None, None]
        rows = jnp.arange(M)
        t_w = jnp.minimum(t, self.max_episode_steps - 1)
        k_cache = k_cache.at[rows, t_w].set(
            jnp.where(act4, k_item, k_cache[rows, t_w]))
        v_cache = v_cache.at[rows, t_w].set(
            jnp.where(act4, v_item, v_cache[rows, t_w]))
        # Active streams never reach t == max_episode_steps here: step()
        # refuses active streams whose episode budget is exhausted.
        t_next = jnp.where(active, t + 1, t)
        if greedy:
            actions = jnp.stack([jnp.argmax(l, axis=-1) for l in logits],
                                axis=-1).astype(jnp.int32)
        else:
            actions, _ = distributions.sample_multi(step_rng, logits)
        return k_cache, v_cache, t_next, rng, actions, value

    # ------------------------------------------------------------------

    def reset(self, stream_ids: Iterable[int]) -> None:
        """Marks streams as fresh episodes: zero episodic memory (= PE-only
        projected caches) and step counter 0."""
        ids = np.fromiter(stream_ids, dtype=np.int32)
        if ids.size == 0:
            return
        if np.any((ids < 0) | (ids >= self.max_streams)):
            bad = ids[(ids < 0) | (ids >= self.max_streams)]
            raise ValueError(
                f"stream ids {bad.tolist()} out of range [0, "
                f"{self.max_streams}) — JAX would silently drop the scatter")
        ids_j = jnp.asarray(ids)
        self._k_cache = self._k_cache.at[ids_j].set(self._pe_k)
        self._v_cache = self._v_cache.at[ids_j].set(self._pe_v)
        self._t = self._t.at[ids_j].set(0)

    def step(self, obs, active: Optional[Sequence[bool]] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
        """One policy step for all streams.

        obs: (max_streams, *observation_shape); rows of inactive streams may
        hold anything (they are computed but not committed).
        active: optional bool mask (default: all active).
        Returns (actions (M, n_branches) int32, values (M,) float32) as numpy.
        """
        obs = jnp.asarray(obs, jnp.float32)
        if obs.shape != (self.max_streams,) + tuple(self.observation_shape):
            raise ValueError(
                f"obs must be {(self.max_streams,) + tuple(self.observation_shape)}, "
                f"got {obs.shape}")
        if active is None:
            active_np = np.ones((self.max_streams,), bool)
        else:
            active_np = np.asarray(active, dtype=bool)
            if active_np.shape != (self.max_streams,):
                raise ValueError(
                    f"active must have shape ({self.max_streams},), got "
                    f"{active_np.shape} — a shorter mask would silently "
                    f"broadcast")
        # An active stream whose episode budget is spent must be reset first;
        # stepping it would rewrite its last memory slot (corrupted window).
        t_now = np.asarray(self._t)
        exhausted = active_np & (t_now >= self.max_episode_steps)
        if np.any(exhausted):
            raise ValueError(
                f"streams {np.nonzero(exhausted)[0].tolist()} have reached "
                f"max_episode_steps={self.max_episode_steps}; call reset() "
                f"on them before stepping (the server has no done signal — "
                f"episode boundaries are caller-driven)")
        active_j = jnp.asarray(active_np)
        (self._k_cache, self._v_cache, self._t, self._rng, actions, values
         ) = self._step_fn(self.params, self._k_cache, self._v_cache,
                           self._t, obs, active_j, self._rng, self.greedy)
        return np.asarray(actions), np.asarray(values)

    def step_device(self, obs, active: Optional[jax.Array] = None
                    ) -> Tuple[jax.Array, jax.Array]:
        """Throughput path: identical policy step but returns DEVICE arrays
        and performs no host-side validation or transfer, so callers can
        enqueue many steps back-to-back (async dispatch) and sync once.

        The caller owns episode bookkeeping: streams at t == max_episode_steps
        silently stop advancing (the cache write and counter are clamped /
        frozen), unlike ``step`` which raises.  Use ``step`` unless per-step
        host latency is the bottleneck (e.g. over a remote device tunnel).
        """
        obs = jnp.asarray(obs, jnp.float32)
        if active is None:
            active = jnp.ones((self.max_streams,), bool)
        (self._k_cache, self._v_cache, self._t, self._rng, actions, values
         ) = self._step_fn(self.params, self._k_cache, self._v_cache,
                           self._t, obs, active, self._rng, self.greedy)
        return actions, values

    def step_many(self, obs_seq, active: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, jax.Array]:
        """T policy steps for all streams in ONE device program.

        obs_seq: (T, max_streams, *observation_shape).  The T steps run as a
        ``lax.scan`` inside a single jit dispatch, so per-step dispatch /
        host-link latency is amortized T-fold — the serving analogue of the
        trainer's fused update chunks (training/fused.py).  Use for offline
        batch inference (pre-collected obs sequences, large-scale evaluation)
        or whenever the device link has high per-dispatch latency.

        Same per-step semantics as ``step_device`` (exhausted streams
        freeze).  Returns device arrays: actions (T, M, n_branches) int32,
        values (T, M) float32.
        """
        obs_seq = jnp.asarray(obs_seq, jnp.float32)
        # Cheap host-side metadata checks (no device sync): a wrong shape
        # would otherwise surface as an opaque scan/vmap trace error after
        # the donated buffers are already consumed.
        expected_tail = (self.max_streams,) + tuple(self.observation_shape)
        if obs_seq.ndim != 1 + len(expected_tail) \
                or obs_seq.shape[1:] != expected_tail:
            raise ValueError(
                f"obs_seq must be (T, {', '.join(map(str, expected_tail))}), "
                f"got {obs_seq.shape}")
        if active is None:
            active = jnp.ones((self.max_streams,), bool)
        elif tuple(np.shape(active)) != (self.max_streams,):
            raise ValueError(
                f"active must have shape ({self.max_streams},), got "
                f"{tuple(np.shape(active))}")
        if self._scan_fn is None:
            def scan_impl(params, k_cache, v_cache, t, obs_seq, active, rng,
                          greedy: bool):
                def body(carry, obs):
                    k, v, t_, rng_ = carry
                    k, v, t_, rng_, actions, values = self._step_impl(
                        params, k, v, t_, obs, active, rng_, greedy)
                    return (k, v, t_, rng_), (actions, values)
                (k_cache, v_cache, t, rng), (actions, values) = jax.lax.scan(
                    body, (k_cache, v_cache, t, rng), obs_seq)
                return k_cache, v_cache, t, rng, actions, values
            self._scan_fn = jax.jit(scan_impl, donate_argnums=(1, 2, 3, 6),
                                    static_argnums=(7,))
        (self._k_cache, self._v_cache, self._t, self._rng, actions, values
         ) = self._scan_fn(self.params, self._k_cache, self._v_cache,
                           self._t, obs_seq, active, self._rng, self.greedy)
        return actions, values

    @property
    def steps(self) -> np.ndarray:
        """Current episode-step counter per stream (host copy)."""
        return np.asarray(self._t)
