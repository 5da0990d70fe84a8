"""Batched policy evaluation (the reference's evaluation protocol lives in the
external neroRL framework: 5 training seeds x 50 env seeds x 5 repeats, IQM +
bootstrapped CI, reference README.md:230 — here it is a built-in).

Runs N episodes as ONE vmapped, jitted scan: N environments reset with
distinct seeds, stepped for max_episode_steps with done-latching; returns
per-episode statistics and aggregates (mean, std, IQM).

CLI: python -m etmppo_tpu.evaluate --model=./models/run.nn --episodes=50
"""
from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import TrainConfig
from .envs.factory import create_env
from .models.actor_critic import ActorCriticModel
from .ops import distributions
from .ops.memory_index import build_memory_indices, build_memory_mask
from .training.checkpoint import load_model


def interquartile_mean(values: np.ndarray) -> float:
    """IQM: mean of the middle 50% (rliable's headline statistic)."""
    v = np.sort(np.asarray(values).ravel())
    n = len(v)
    lo, hi = n // 4, n - n // 4
    return float(v[lo:hi].mean()) if hi > lo else float(v.mean())


def stratified_bootstrap_ci(per_seed: list, n_boot: int = 2000,
                            alpha: float = 0.05, seed: int = 0
                            ) -> Tuple[float, float]:
    """Bootstrapped CI for the cross-seed IQM (reference protocol: IQM +
    bootstrapped CI over 5 training seeds, README.md:230 / rliable).

    Stratified over training seeds, rliable-style: each replicate resamples
    the seeds with replacement, then the episodes within each chosen seed,
    and takes the IQM of the pooled episode scores.
    """
    rng = np.random.default_rng(seed)
    arrays = [np.asarray(a).ravel() for a in per_seed]
    n_seeds = len(arrays)
    stats = np.empty(n_boot)
    for b in range(n_boot):
        picked = rng.integers(0, n_seeds, size=n_seeds)
        pooled = np.concatenate([
            arrays[i][rng.integers(0, len(arrays[i]), size=len(arrays[i]))]
            for i in picked])
        stats[b] = interquartile_mean(pooled)
    lo, hi = np.quantile(stats, [alpha / 2, 1 - alpha / 2])
    return float(lo), float(hi)


def evaluate_params(params, config: TrainConfig, episodes: int = 50,
                    seed: int = 0, env_seed: int = None
                    ) -> Dict[str, np.ndarray]:
    """Returns per-episode arrays for each env info key (reward/length/...).

    ``env_seed`` controls the environment reset seeds separately from the
    policy-sampling rng, so the reference's "50 novel env seeds x 5 repeats"
    protocol (README.md:230) maps to: fixed ``env_seed``, varying ``seed``
    per repeat.  Defaults to ``seed`` (one-shot evaluation unchanged).
    """
    if env_seed is None:
        env_seed = seed
    env = create_env(config.environment)
    model = ActorCriticModel(
        config=config, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    trx = config.transformer
    L = trx.memory_length
    max_ep = env.max_episode_steps
    mask_table = jnp.asarray(build_memory_mask(L))
    index_table = jnp.asarray(build_memory_indices(max_ep, L))

    @jax.jit
    def run(params, reset_rng, rng):
        env_state, obs = jax.vmap(env.reset)(
            jax.random.split(reset_rng, episodes))
        memory = jnp.zeros((episodes, max_ep, trx.num_blocks, trx.embed_dim))
        slots = jnp.tile(jnp.arange(max_ep, dtype=jnp.int32)[None],
                         (episodes, 1))
        k_cache, v_cache = model.apply(
            params, memory, slots, method=type(model).project_memory)

        def step(carry, _):
            env_state, obs, t, finished, k_cache, v_cache, rng, infos = carry
            rng, a_rng, s_rng = jax.random.split(rng, 3)
            mask = mask_table[jnp.clip(t, 0, L - 1)]
            s_lo = jnp.maximum(t - (L - 1), 0)
            slice_window = jax.vmap(
                lambda cache, start: jax.lax.dynamic_slice_in_dim(
                    cache, start, L, axis=0))
            k_win = slice_window(k_cache, s_lo)
            v_win = slice_window(v_cache, s_lo)
            logits, _, mem_item = model.apply(
                params, obs, k_win, v_win, mask,
                method=type(model).forward_with_kv)
            k_item, v_item = model.apply(
                params, mem_item, t, method=type(model).project_memory)
            ar = jnp.arange(episodes)
            k_cache = k_cache.at[ar, t].set(k_item)
            v_cache = v_cache.at[ar, t].set(v_item)
            actions, _ = distributions.sample_multi(a_rng, logits)
            env_state, obs, reward, done, info = jax.vmap(env.step)(
                env_state, actions, jax.random.split(s_rng, episodes))
            ended_now = done & ~finished
            infos = {k: jnp.where(ended_now, info[k], infos[k])
                     for k in infos}
            finished = finished | done
            t = jnp.where(finished, t, t + 1)
            return (env_state, obs, t, finished, k_cache, v_cache, rng,
                    infos), None

        infos0 = {k: jnp.zeros((episodes,), jnp.float32)
                  for k in env.info_keys}
        carry = (env_state, obs, jnp.zeros((episodes,), jnp.int32),
                 jnp.zeros((episodes,), bool), k_cache, v_cache, rng, infos0)
        carry, _ = jax.lax.scan(step, carry, None, length=max_ep)
        return carry[7], carry[3]

    infos, finished = run(params, jax.random.PRNGKey(env_seed),
                          jax.random.PRNGKey(seed))
    assert bool(np.asarray(finished).all()), "episodes must terminate"
    return {k: np.asarray(v) for k, v in infos.items()}


def evaluate_model(model_path: str, episodes: int = 50, seed: int = 0,
                   repeats: int = 1) -> Dict[str, float]:
    """Single-model summary.  ``repeats`` > 1 re-runs the same ``episodes``
    env seeds with fresh policy-sampling rng per repeat (reference's
    "50 env seeds x 5 repeats")."""
    params, config = load_model(model_path)
    per_key: Dict[str, list] = {}
    for r in range(repeats):
        infos = evaluate_params(params, config, episodes,
                                seed=seed + 1000 * r, env_seed=seed)
        for k, v in infos.items():
            per_key.setdefault(k, []).append(v)
    summary: Dict[str, float] = {}
    for key, chunks in per_key.items():
        values = np.concatenate(chunks)
        summary[key + "_mean"] = float(values.mean())
        summary[key + "_std"] = float(values.std())
        summary[key + "_iqm"] = interquartile_mean(values)
    return summary


def evaluate_protocol(model_paths, episodes: int = 50, repeats: int = 5,
                      seed: int = 0, n_boot: int = 2000):
    """Reference evaluation protocol (README.md:230): N training seeds
    (one trained model each) x ``episodes`` env seeds x ``repeats``
    policy-sampling repeats; cross-seed IQM with stratified bootstrap CI.

    Returns ``(per_seed, aggregate)``: per_seed maps model path ->
    {key: per-episode array}; aggregate maps key -> (iqm, ci_lo, ci_hi).
    """
    per_seed: Dict[str, Dict[str, np.ndarray]] = {}
    for path in model_paths:
        params, config = load_model(path)
        chunks: Dict[str, list] = {}
        for r in range(repeats):
            infos = evaluate_params(params, config, episodes,
                                    seed=seed + 1000 * r, env_seed=seed)
            for k, v in infos.items():
                chunks.setdefault(k, []).append(v)
        per_seed[path] = {k: np.concatenate(v) for k, v in chunks.items()}
    keys = next(iter(per_seed.values())).keys()
    aggregate = {}
    for key in keys:
        arrays = [per_seed[p][key] for p in model_paths]
        pooled = np.concatenate(arrays)
        ci_lo, ci_hi = stratified_bootstrap_ci(arrays, n_boot=n_boot)
        aggregate[key] = (interquartile_mean(pooled), ci_lo, ci_hi)
    return per_seed, aggregate


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate trained model(s)")
    parser.add_argument(
        "--model", default="./models/run.nn",
        help="model path, or comma-separated paths (one per training seed) "
             "to run the cross-seed protocol: IQM + bootstrapped CI")
    parser.add_argument("--episodes", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0,
                        help="env-seed base (fixed across repeats)")
    parser.add_argument("--repeats", type=int, default=1,
                        help="policy-sampling repeats per env seed "
                             "(reference protocol: 5)")
    args = parser.parse_args(argv)
    paths = [p for p in args.model.split(",") if p]
    if len(paths) == 1:
        summary = evaluate_model(paths[0], args.episodes, args.seed,
                                 repeats=args.repeats)
        for key, value in sorted(summary.items()):
            print(f"{key}: {value:.4f}")
        return
    per_seed, aggregate = evaluate_protocol(
        paths, episodes=args.episodes, repeats=args.repeats, seed=args.seed)
    print(f"# {len(paths)} training seeds x {args.episodes} env seeds x "
          f"{args.repeats} repeats")
    for path in paths:
        row = "  ".join(f"{k}_iqm={interquartile_mean(v):.4f}"
                        for k, v in sorted(per_seed[path].items()))
        print(f"{path}: {row}")
    print("# cross-seed aggregate (IQM [95% bootstrap CI])")
    for key, (iqm, lo, hi) in sorted(aggregate.items()):
        print(f"{key}: {iqm:.4f} [{lo:.4f}, {hi:.4f}]")


if __name__ == "__main__":
    main()
