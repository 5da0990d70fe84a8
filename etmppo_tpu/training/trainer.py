"""Training orchestration (reference: trainer.py's PPOTrainer, redesigned).

The reference interleaves host-side Python with per-step device<->host traffic;
here the host loop only (a) launches the jitted rollout, (b) launches the
jitted PPO update, (c) drains small episode-statistic arrays for logging.  All
tensors stay on device between the two jits.

Public surface mirrors the reference: ``PPOTrainer(config, run_id)``,
``.run_training()``, ``.close()`` (trainer.py:16-17, 101, 364).
"""
from __future__ import annotations

import time
from collections import deque
from typing import Dict, List, Optional

import jax
import numpy as np

from ..config import TrainConfig
from ..envs.factory import create_env
from ..models.actor_critic import ActorCriticModel
from . import metrics as metrics_lib
from .checkpoint import Checkpointer, save_model
from .ppo import PPOUpdateFn, STAT_NAMES
from .rollout import RolloutFn


class PPOTrainer:
    def __init__(self, config: TrainConfig, run_id: str = "run",
                 enable_metrics: bool = True):
        from ..utils.runtime import enable_compilation_cache
        enable_compilation_cache()
        self.config = config
        self.run_id = run_id

        # Module-level switch read at trace time by the custom VJP.  Set it
        # explicitly on EVERY init (not just when enabling) so a later trainer
        # in the same process with pallas_backward=False doesn't inherit a
        # previous trainer's "pallas" mode.
        from ..ops import pallas_window_attention as pwa
        if config.pallas_backward and not config.use_pallas_attention:
            import warnings
            warnings.warn(
                "pallas_backward=True has no effect without "
                "use_pallas_attention=True; the XLA attention path is used.")
        pwa.BACKWARD_MODE = (
            "pallas" if (config.pallas_backward and config.use_pallas_attention)
            else "xla")

        # Environment (vmapped pure-JAX env — replaces the reference's dummy
        # probe env + N worker processes, trainer.py:44-49, 63).
        self.env = create_env(config.environment)
        self.max_episode_steps = self.env.max_episode_steps

        # Model + params.
        self.model = ActorCriticModel(
            config=config, obs_shape=self.env.observation_shape,
            action_branches=self.env.action_branches,
            max_episode_steps=self.max_episode_steps)
        rng = jax.random.PRNGKey(config.seed)
        rng, init_rng, state_rng, self._update_rng = jax.random.split(rng, 4)
        self.params = self.model.init_params(init_rng)

        # Jitted rollout + update (+ fused multi-update loop).  Host (Python)
        # environments use the host rollout driver; fusing updates into one
        # device program is only possible for pure-JAX envs.
        # Host-driven envs (Python process pool or the native C++ engine)
        # expose the vectorized reset_all/step API instead of the functional
        # JAX protocol.
        self.is_host_env = hasattr(self.env, "reset_all")
        if self.is_host_env:
            from .host_rollout import HostRolloutFn
            self.rollout_fn = HostRolloutFn(config, self.env, self.model)
        else:
            self.rollout_fn = RolloutFn(config, self.env, self.model)
        self.update_fn = PPOUpdateFn(config, self.model, self.max_episode_steps)
        self.opt_state = self.update_fn.init_opt_state(self.params)
        self.rollout_state = self.rollout_fn.init_state(state_rng)
        self.fused_loop = None
        if not self.is_host_env:
            from .fused import FusedTrainLoop
            self.fused_loop = FusedTrainLoop(self.rollout_fn, self.update_fn)

        # Multi-device data parallelism (GSPMD over a ("data",) mesh).
        self.mesh = None
        if config.num_devices > 1:
            from ..parallel.mesh import (make_mesh, replicate_tree,
                                         shard_worker_tree)
            self.mesh = make_mesh(config.num_devices)
            self.params = replicate_tree(self.params, self.mesh)
            self.opt_state = replicate_tree(self.opt_state, self.mesh)
            self.rollout_state = shard_worker_tree(
                self.rollout_state, self.mesh, config.n_workers)

        self.update = 0
        self.writer = (metrics_lib.MetricsWriter(config.summary_dir, run_id)
                       if enable_metrics else None)
        self.checkpointer: Optional[Checkpointer] = None
        if config.checkpoint_interval > 0:
            self.checkpointer = Checkpointer(config.checkpoint_dir, run_id)

        self.episode_infos: deque = deque(maxlen=100)
        self.env_steps_per_update = config.n_workers * config.worker_steps

    # ------------------------------------------------------------------

    def _extract_episode_infos(self, dones, infos) -> List[Dict[str, float]]:
        """Pulls completed-episode statistics to host (reference worker-info
        dicts, trainer.py:195-199), preserving (t, w) completion order."""
        dones = np.asarray(dones)                 # (W, T)
        infos = {k: np.asarray(v) for k, v in infos.items()}
        episode_list = []
        ws, ts = np.nonzero(dones)
        order = np.argsort(ts * dones.shape[0] + ws, kind="stable")
        for i in order:
            w, t = ws[i], ts[i]
            episode_list.append({k: float(v[w, t]) for k, v in infos.items()})
        return episode_list

    def _record_update(self, stat_vec, grad_info, episode_dones, episode_infos,
                       value_mean: float, advantage_mean: float
                       ) -> Dict[str, float]:
        """Logging/metrics for one completed update (host side)."""
        self.episode_infos.extend(
            self._extract_episode_infos(episode_dones, episode_infos))
        episode_result = metrics_lib.process_episode_info(
            list(self.episode_infos))
        stats_np = np.asarray(stat_vec)
        stat_dict = {name: float(stats_np[i]) for i, name in enumerate(STAT_NAMES)}

        if self.writer is not None:
            scalars = metrics_lib.training_scalars(
                stat_dict, episode_result, value_mean, advantage_mean)
            for key, value in grad_info.items():
                scalars["gradients/" + key] = float(np.asarray(value))
            self.writer.write(self.update, scalars)

        result = dict(stat_dict)
        result.update(episode_result)
        result["value_mean"] = value_mean
        result["advantage_mean"] = advantage_mean
        self.update += 1
        return result

    def _schedule_values(self, k: int):
        cfg = self.config
        steps = range(self.update, self.update + k)
        return (np.array([cfg.learning_rate_schedule.value(s) for s in steps],
                         np.float32),
                np.array([cfg.clip_range_schedule.value(s) for s in steps],
                         np.float32),
                np.array([cfg.beta_schedule.value(s) for s in steps],
                         np.float32))

    def train_chunk(self, k: int) -> List[Dict[str, float]]:
        """Runs k updates as ONE fused device program (training/fused.py)."""
        lrs, clips, betas = self._schedule_values(k)
        # RNG is split inside the scan exactly as train_one_update splits it,
        # so fused and unfused paths are bit-identical.
        (self.params, self.opt_state, self.rollout_state, self._update_rng,
         outs) = self.fused_loop(self.params, self.opt_state,
                                 self.rollout_state, self._update_rng,
                                 lrs, clips, betas)
        # Two transfers per chunk (see ChunkOutputs docstring).
        scalars = np.asarray(outs.scalars)              # (k, 6 + G + 2)
        per_step = np.asarray(outs.per_step)            # (k, 1 + I, W, T)
        n_stats = len(STAT_NAMES)
        G = len(outs.grad_keys)
        results = []
        for i in range(k):
            grad_info = {key: scalars[i, n_stats + j]
                         for j, key in enumerate(outs.grad_keys)}
            dones = per_step[i, 0].astype(bool)
            infos = {key: per_step[i, 1 + j]
                     for j, key in enumerate(outs.info_keys)}
            results.append(self._record_update(
                scalars[i, :n_stats], grad_info, dones, infos,
                float(scalars[i, n_stats + G]),
                float(scalars[i, n_stats + G + 1])))
        return results

    def train_one_update(self) -> Dict[str, float]:
        cfg = self.config
        lr = cfg.learning_rate_schedule.value(self.update)
        beta = cfg.beta_schedule.value(self.update)
        clip_range = cfg.clip_range_schedule.value(self.update)

        self.rollout_state, batch = self.rollout_fn(
            self.params, self.rollout_state)

        self._update_rng, epoch_rng = jax.random.split(self._update_rng)
        self.params, self.opt_state, stats, grad_info = self.update_fn(
            self.params, self.opt_state, batch, epoch_rng, lr, clip_range, beta)

        return self._record_update(
            stats, grad_info, batch.dones, batch.episode_infos,
            float(np.asarray(batch.values).mean()),
            float(np.asarray(batch.advantages).mean()))

    def run_training(self, print_every: int = 1) -> Dict[str, float]:
        cfg = self.config
        result: Dict[str, float] = {}
        start = time.perf_counter()
        start_update = self.update  # may be > 0 after a checkpoint resume
        # The first launch includes XLA compilation; track it separately so a
        # steady-state env-steps/s (what long-budget wall-clock follows) can
        # be reported alongside the all-inclusive number.
        first_launch_end = 0.0
        first_launch_updates = 0
        while self.update < cfg.updates:
            remaining = cfg.updates - self.update
            if cfg.updates_per_launch > 1 and self.fused_loop is not None:
                k = min(cfg.updates_per_launch, remaining)
                if cfg.checkpoint_interval > 0:
                    to_ckpt = cfg.checkpoint_interval - (
                        self.update % cfg.checkpoint_interval)
                    k = min(k, to_ckpt)
                results = self.train_chunk(k)
            else:
                results = [self.train_one_update()]
            if first_launch_updates == 0:
                first_launch_end = time.perf_counter()
                first_launch_updates = self.update - start_update
            for i, result in enumerate(results):
                update = self.update - len(results) + i
                if print_every and update % print_every == 0:
                    self._print_update_at(update, result)
            if (self.checkpointer is not None
                    and self.update % cfg.checkpoint_interval == 0):
                self._save_checkpoint()
        elapsed = time.perf_counter() - start
        total_updates = cfg.updates - start_update
        total_steps = total_updates * self.env_steps_per_update
        result["env_steps_per_second"] = total_steps / max(elapsed, 1e-9)
        if total_updates > first_launch_updates > 0:
            steady_steps = ((total_updates - first_launch_updates)
                            * self.env_steps_per_update)
            steady_elapsed = elapsed - (first_launch_end - start)
            result["env_steps_per_second_steady"] = (
                steady_steps / max(steady_elapsed, 1e-9))
        self._save_model()
        return result

    def _print_update(self, r: Dict[str, float]) -> None:
        self._print_update_at(self.update - 1, r)

    def _print_update_at(self, update: int, r: Dict[str, float]) -> None:
        """Stdout line in the reference's format (trainer.py:127-136)."""
        base = (
            f"{update:4} reward={r.get('reward_mean', 0.0):.2f} "
            f"std={r.get('reward_std', 0.0):.2f} "
            f"length={r.get('length_mean', 0.0):.1f} "
            f"std={r.get('length_std', 0.0):.2f} ")
        if "success" in r:
            base += f"success={r['success']:.2f} "
        base += (
            f"pi_loss={r['policy_loss']:3f} v_loss={r['value_loss']:3f} "
            f"entropy={r['entropy']:.3f} loss={r['loss']:3f} "
            f"value={r['value_mean']:.3f} advantage={r['advantage_mean']:.3f}")
        print(base)

    # ------------------------------------------------------------------

    def _training_state(self) -> Dict:
        return dict(
            params=self.params, opt_state=self.opt_state,
            rollout_state=self.rollout_state, update_rng=self._update_rng,
            update=self.update)

    def _save_checkpoint(self) -> None:
        assert self.checkpointer is not None
        self.checkpointer.save(self.update, self._training_state())

    def resume_from_checkpoint(self) -> bool:
        """Restores the latest checkpoint if one exists (no reference
        equivalent — the reference cannot resume at all)."""
        if self.checkpointer is None or self.checkpointer.latest_update() is None:
            return False
        state = self.checkpointer.restore(self._training_state())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.rollout_state = state["rollout_state"]
        self._update_rng = state["update_rng"]
        self.update = int(state["update"])
        return True

    def _save_model(self) -> None:
        import os
        path = os.path.join(self.config.checkpoint_dir, self.run_id + ".nn")
        save_model(path, self.params, self.config)
        print("Model saved to " + path)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
        if self.checkpointer is not None:
            self.checkpointer.close()
        if self.is_host_env:
            self.env.close()
