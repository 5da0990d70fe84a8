"""Projected-KV fast paths must match the reference-semantics naive paths."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.config import load_config, TransformerConfig, TrainConfig
from etmppo_tpu.envs.factory import create_env
from etmppo_tpu.models.actor_critic import ActorCriticModel
from etmppo_tpu.ops.memory_index import (build_memory_indices,
                                         build_memory_mask,
                                         compute_window_sources)
from etmppo_tpu.training.ppo import PPOUpdateFn
from etmppo_tpu.training.rollout import RolloutFn


@pytest.mark.parametrize("layer_norm,gtrxl,pe", [
    ("pre", True, ""), ("post", False, "relative"), ("", False, "learned")])
def test_forward_with_kv_matches_naive_forward(layer_norm, gtrxl, pe):
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(
        cfg, hidden_layer_size=24,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=6, layer_norm=layer_norm, gtrxl=gtrxl,
            positional_encoding=pe))
    max_ep = 12
    model = ActorCriticModel(config=cfg, obs_shape=(3,), action_branches=(2,),
                             max_episode_steps=max_ep)
    params = model.init_params(jax.random.PRNGKey(0))

    np_rng = np.random.default_rng(1)
    B, L = 5, 6
    obs = jnp.asarray(np_rng.normal(size=(B, 3)).astype(np.float32))
    window = jnp.asarray(
        np_rng.normal(size=(B, L, 2, 16)).astype(np.float32))
    mask = jnp.asarray(np_rng.random((B, L)) < 0.6)
    slots = jnp.asarray(np_rng.integers(0, max_ep, (B, L)), jnp.int32)

    logits1, value1, mem1 = model.apply(params, obs, window, mask, slots)
    k, v = model.apply(params, window, slots,
                       method=ActorCriticModel.project_memory)
    logits2, value2, mem2 = model.apply(
        params, obs, k, v, mask, method=ActorCriticModel.forward_with_kv)

    np.testing.assert_allclose(np.asarray(value1), np.asarray(value2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits1[0]), np.asarray(logits2[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mem1), np.asarray(mem2),
                               rtol=1e-4, atol=1e-5)


def test_pe_kv_equals_projection_of_zero_memory():
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(
        cfg, transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=6, positional_encoding="relative"))
    model = ActorCriticModel(config=cfg, obs_shape=(3,), action_branches=(2,),
                             max_episode_steps=10)
    params = model.init_params(jax.random.PRNGKey(0))
    pe_k, pe_v = model.apply(params, method=ActorCriticModel.pe_kv)
    zeros = jnp.zeros((10, 2, 16))
    slots = jnp.arange(10, dtype=jnp.int32)
    k, v = model.apply(params, zeros, slots,
                       method=ActorCriticModel.project_memory)
    np.testing.assert_allclose(np.asarray(pe_k), np.asarray(k), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pe_v), np.asarray(v), rtol=1e-6)


def test_fast_loss_matches_naive_loss():
    """On a real rollout batch the projected-KV loss must equal the naive
    raw-window loss (same minibatch indices)."""
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(
        cfg, n_workers=4, worker_steps=24, n_mini_batch=2, epochs=1,
        hidden_layer_size=24,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=8, positional_encoding="learned"))
    env = create_env(cfg.environment)
    model = ActorCriticModel(
        config=cfg, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    rollout_fn = RolloutFn(cfg, env, model)
    state, batch = rollout_fn(params, rollout_fn.init_state(jax.random.PRNGKey(1)))
    update_fn = PPOUpdateFn(cfg, model, env.max_episode_steps)

    W, T = cfg.n_workers, cfg.worker_steps
    B = W * T
    L = cfg.transformer.memory_length
    max_ep = env.max_episode_steps
    sources = compute_window_sources(
        batch.episode_steps, batch.dones, update_fn.index_table, max_ep)
    src = jnp.concatenate([batch.snapshot, batch.tape,
                           jnp.zeros_like(batch.snapshot)], axis=1)
    slot_range = jnp.tile(jnp.arange(max_ep, dtype=jnp.int32)[None], (W, 1))
    src_slots = jnp.concatenate([
        slot_range, batch.episode_steps.astype(jnp.int32), slot_range], axis=1)

    flat = lambda x: x.reshape((B,) + x.shape[2:])
    idx = jnp.arange(0, B, 3)
    mask = update_fn.mask_table[
        jnp.clip(flat(batch.episode_steps)[idx], 0, L - 1)]
    common = dict(
        obs=flat(batch.obs)[idx], actions=flat(batch.actions)[idx],
        log_probs=flat(batch.log_probs)[idx], values=flat(batch.values)[idx],
        advantages=flat(batch.advantages)[idx], memory_mask=mask,
        memory_indices=flat(sources.slot)[idx])

    # naive: gather raw windows (the zero PE region supplies invalid slots)
    window = src[(idx // T)[:, None], flat(sources.flat_index)[idx]]
    valid = flat(sources.valid)[idx]
    naive_mb = dict(common, memory_window=window)
    loss1, stats1 = update_fn._loss(params, naive_mb, 0.2, 0.001)

    fast_mb = dict(common, w_idx=idx // T,
                   flat_index=flat(sources.flat_index)[idx], valid=valid)
    loss2, stats2 = update_fn._loss_fast(
        params, fast_mb, src, src_slots, 0.2, 0.001)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-4, abs=1e-6)
    np.testing.assert_allclose(np.asarray(stats1), np.asarray(stats2),
                               rtol=1e-3, atol=1e-5)
