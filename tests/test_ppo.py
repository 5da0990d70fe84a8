"""PPO update: loss math vs NumPy, clipping, optimizer semantics."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.config import load_config
from etmppo_tpu.envs.factory import create_env
from etmppo_tpu.models.actor_critic import ActorCriticModel
from etmppo_tpu.training.ppo import PPOUpdateFn, clip_grads_torch, \
    grad_norm_groups, STAT_NAMES
from etmppo_tpu.training.rollout import RolloutFn
import reference_oracle as oracle


@pytest.fixture(scope="module")
def setup():
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(cfg, n_workers=4, worker_steps=32,
                              n_mini_batch=2, epochs=2)
    env = create_env(cfg.environment)
    model = ActorCriticModel(
        config=cfg, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    rollout_fn = RolloutFn(cfg, env, model)
    state = rollout_fn.init_state(jax.random.PRNGKey(1))
    state, batch = rollout_fn(params, state)
    update_fn = PPOUpdateFn(cfg, model, env.max_episode_steps)
    return cfg, env, model, params, batch, update_fn


def test_loss_matches_numpy(setup):
    cfg, env, model, params, batch, update_fn = setup
    L = cfg.transformer.memory_length
    # Build one deterministic "minibatch" straight from the rollout data.
    W, T = cfg.n_workers, cfg.worker_steps
    n = 16
    np_rng = np.random.default_rng(0)
    obs = np.asarray(batch.obs).reshape(W * T, -1)[:n]
    actions = np.asarray(batch.actions).reshape(W * T, -1)[:n]
    old_lp = np.asarray(batch.log_probs).reshape(W * T, -1)[:n]
    values = np.asarray(batch.values).reshape(W * T)[:n]
    adv = np.asarray(batch.advantages).reshape(W * T)[:n]
    window = np_rng.normal(size=(
        n, L, cfg.transformer.num_blocks,
        cfg.transformer.embed_dim)).astype(np.float32)
    mask = np.ones((n, L), bool)
    indices = np.zeros((n, L), np.int32)

    mb = dict(obs=jnp.asarray(obs), actions=jnp.asarray(actions),
              log_probs=jnp.asarray(old_lp), values=jnp.asarray(values),
              advantages=jnp.asarray(adv), memory_window=jnp.asarray(window),
              memory_mask=jnp.asarray(mask), memory_indices=jnp.asarray(indices))
    clip_range, beta = 0.2, 0.001
    loss, stats = update_fn._loss(params, mb, jnp.float32(clip_range),
                                  jnp.float32(beta))

    # NumPy recomputation from the model's own forward outputs.
    logits, value, _ = model.apply(
        params, mb["obs"], mb["memory_window"], mb["memory_mask"],
        mb["memory_indices"])
    logits = np.asarray(logits[0])
    value = np.asarray(value)
    probs = oracle.softmax(logits)
    lp = np.log(probs[np.arange(n), actions[:, 0]])[:, None]
    ent = -(probs * np.log(probs)).sum(-1)

    norm_adv = (adv - adv.mean()) / (adv.std(ddof=1) + 1e-8)
    ratio = np.exp(lp - old_lp)
    surr1 = ratio * norm_adv[:, None]
    surr2 = np.clip(ratio, 1 - clip_range, 1 + clip_range) * norm_adv[:, None]
    policy_loss = np.minimum(surr1, surr2).mean()
    ret = values + adv
    clipped_v = values + np.clip(value - values, -clip_range, clip_range)
    vf_loss = np.maximum((value - ret) ** 2, (clipped_v - ret) ** 2).mean()
    expected_loss = -(policy_loss - cfg.value_loss_coefficient * vf_loss
                      + beta * ent.mean())

    assert float(loss) == pytest.approx(expected_loss, rel=1e-4)
    got = {name: float(stats[i]) for i, name in enumerate(STAT_NAMES)}
    assert got["policy_loss"] == pytest.approx(policy_loss, rel=1e-4, abs=1e-6)
    assert got["value_loss"] == pytest.approx(vf_loss, rel=1e-4)
    assert got["entropy"] == pytest.approx(ent.mean(), rel=1e-4)
    kl = ((ratio - 1) - (lp - old_lp)).mean()
    assert got["kl"] == pytest.approx(kl, rel=1e-3, abs=1e-6)


def test_clip_grads_torch_semantics():
    grads = {"a": jnp.asarray([3.0, 4.0])}  # norm 5
    clipped, norm = clip_grads_torch(grads, 1.0)
    assert float(norm) == pytest.approx(5.0)
    np.testing.assert_allclose(
        np.asarray(clipped["a"]), [3.0 / (5 + 1e-6), 4.0 / (5 + 1e-6)],
        rtol=1e-6)
    # under the max norm: unchanged
    clipped, _ = clip_grads_torch(grads, 10.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [3.0, 4.0], rtol=1e-6)


def test_grad_norm_groups_structure(setup):
    cfg, env, model, params, batch, update_fn = setup
    groups = grad_norm_groups(params, has_encoder=False,
                              num_blocks=cfg.transformer.num_blocks,
                              n_branches=1)
    assert set(groups) == {
        "linear_layer", "transformer_block_0", "transformer_block_1",
        "transformer_block_2", "transformer_block_3", "policy_head_0",
        "lin_policy", "value", "model"}
    # "model" includes the value head twice (reference quirk, model.py:149)
    for v in groups.values():
        assert np.isfinite(float(v))


def test_full_update_changes_params_and_reports_stats(setup):
    cfg, env, model, params, batch, update_fn = setup
    # Copy: the update donates its params/opt_state arguments.
    params_in = jax.tree.map(jnp.copy, params)
    opt_state = update_fn.init_opt_state(params_in)
    new_params, new_opt_state, stats, grad_info = update_fn(
        params_in, opt_state, batch, jax.random.PRNGKey(3), 3e-4, 0.2, 0.001)
    stats = np.asarray(stats)
    assert stats.shape == (len(STAT_NAMES),)
    assert np.isfinite(stats).all()
    # params changed
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params, new_params)
    assert max(jax.tree.leaves(diffs)) > 0
    # KL should be small on the first update (policy barely moved)
    kl = stats[STAT_NAMES.index("kl")]
    assert abs(kl) < 0.05
    for key, value in grad_info.items():
        assert np.isfinite(float(value)), key


def test_update_determinism(setup):
    cfg, env, model, params, batch, update_fn = setup
    import copy
    p1 = jax.tree.map(jnp.copy, params)
    p2 = jax.tree.map(jnp.copy, params)
    o1 = update_fn.init_opt_state(p1)
    o2 = update_fn.init_opt_state(p2)
    r1 = update_fn(p1, o1, batch, jax.random.PRNGKey(9), 3e-4, 0.2, 0.001)
    r2 = update_fn(p2, o2, batch, jax.random.PRNGKey(9), 3e-4, 0.2, 0.001)
    for a, b in zip(jax.tree.leaves(r1[0]), jax.tree.leaves(r2[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
