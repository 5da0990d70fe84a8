"""Pallas fused window attention vs the XLA reference formulation.

On CPU the kernel runs in interpreter mode — semantics are validated here;
performance is exercised on TPU via the training configs with
``use_pallas_attention: true``.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.ops.pallas_window_attention import (
    fused_window_attention, xla_window_attention)


def _case(B=16, W=4, S=40, P=12, L=8, D=32, H=4, seed=0):
    np_rng = np.random.default_rng(seed)
    q = np_rng.normal(size=(B, D)).astype(np.float32)
    tk = np_rng.normal(size=(W, S, D)).astype(np.float32)
    tv = np_rng.normal(size=(W, S, D)).astype(np.float32)
    pe_k = np_rng.normal(size=(P, D)).astype(np.float32)
    pe_v = np_rng.normal(size=(P, D)).astype(np.float32)
    w_idx = np_rng.integers(0, W, B).astype(np.int32)
    start = np_rng.integers(0, S - L, B).astype(np.int32)
    n_valid = np_rng.integers(1, L + 1, B).astype(np.int32)
    s_lo = np_rng.integers(0, P - L + 1, B).astype(np.int32)
    mask = np_rng.random((B, L)) < 0.7
    mask[0, :] = False  # all-masked row -> uniform attention quirk
    args = tuple(map(jnp.asarray, (q, tk, tv, pe_k, pe_v, w_idx, start,
                                   n_valid, s_lo, mask)))
    return args


def test_forward_matches_xla():
    args = _case()
    out_pallas = fused_window_attention(*args, 4)
    out_xla = xla_window_attention(*args, num_heads=4)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)


def test_forward_single_head_and_odd_batch_tile():
    args = _case(B=12, H=1, D=16)   # B=12 forces tile fallback (12 % 8 != 0)
    out_pallas = fused_window_attention(*args, 1)
    out_xla = xla_window_attention(*args, num_heads=1)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    args = _case(B=8)

    def loss_pallas(q, tk, tv, pk, pv):
        out = fused_window_attention(q, tk, tv, pk, pv, *args[5:], 4)
        return jnp.sum(out ** 2)

    def loss_xla(q, tk, tv, pk, pv):
        out = xla_window_attention(q, tk, tv, pk, pv, *args[5:], num_heads=4)
        return jnp.sum(out ** 2)

    grads_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args[:5])
    grads_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args[:5])
    for gp, gx in zip(grads_p, grads_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)


def test_all_masked_row_is_uniform():
    """Episode-step-0 quirk: all keys masked -> softmax uniform over L."""
    args = list(_case(B=8))
    mask = np.zeros((8, args[9].shape[1]), bool)
    args[9] = jnp.asarray(mask)
    out = fused_window_attention(*args, 4)
    # uniform attention = mean over the assembled V rows; compare with XLA
    out_xla = xla_window_attention(*args, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_update_matches_xla_update():
    """Full PPO update with use_pallas_attention must match the XLA fast path
    (same batch, same rng)."""
    import dataclasses
    from etmppo_tpu.config import load_config
    from etmppo_tpu.envs.factory import create_env
    from etmppo_tpu.models.actor_critic import ActorCriticModel
    from etmppo_tpu.training.ppo import PPOUpdateFn, STAT_NAMES
    from etmppo_tpu.training.rollout import RolloutFn

    base = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    base = dataclasses.replace(
        base, n_workers=4, worker_steps=16, n_mini_batch=2, epochs=1,
        hidden_layer_size=16,
        transformer=dataclasses.replace(
            base.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=8, positional_encoding="learned"))
    env = create_env(base.environment)
    model = ActorCriticModel(
        config=base, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    rollout_fn = RolloutFn(base, env, model)
    _, batch = rollout_fn(params, rollout_fn.init_state(jax.random.PRNGKey(1)))

    results = {}
    for use_pallas in (False, True):
        cfg = dataclasses.replace(base, use_pallas_attention=use_pallas)
        m = ActorCriticModel(
            config=cfg, obs_shape=env.observation_shape,
            action_branches=env.action_branches,
            max_episode_steps=env.max_episode_steps)
        update_fn = PPOUpdateFn(cfg, m, env.max_episode_steps)
        p = jax.tree.map(jnp.copy, params)
        opt_state = update_fn.init_opt_state(p)
        new_p, _, stats, _ = update_fn(
            p, opt_state, batch, jax.random.PRNGKey(3), 3e-4, 0.2, 0.001)
        results[use_pallas] = (new_p, np.asarray(stats))

    np.testing.assert_allclose(results[False][1], results[True][1],
                               rtol=1e-3, atol=1e-5)
    for a, b in zip(jax.tree.leaves(results[False][0]),
                    jax.tree.leaves(results[True][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_pallas_backward_matches_xla_backward():
    """The fully-fused Pallas backward must produce the same gradients as the
    XLA VJP (accumulation across overlapping windows included)."""
    from etmppo_tpu.ops import pallas_window_attention as pwa

    args = _case(B=16, W=3, S=30, P=12, L=8, D=32, seed=7)

    def loss(q, tk, tv, pk, pv):
        out = pwa.fused_window_attention(q, tk, tv, pk, pv, *args[5:], 4)
        return jnp.sum(jnp.sin(out))

    grads_xla = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])
    old = pwa.BACKWARD_MODE
    try:
        pwa.BACKWARD_MODE = "pallas"
        grads_pallas = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])
    finally:
        pwa.BACKWARD_MODE = old
    names = ("dq", "dtk", "dtv", "dpk", "dpv")
    for name, gx, gp in zip(names, grads_xla, grads_pallas):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_backward_all_masked_row():
    from etmppo_tpu.ops import pallas_window_attention as pwa
    args = list(_case(B=8))
    mask = np.ones((8, args[9].shape[1]), bool)
    mask[0, :] = False   # uniform-attention row: dq/dK must be zero there
    args[9] = jnp.asarray(mask)
    args = tuple(args)

    def loss(q, tk, tv, pk, pv):
        out = pwa.fused_window_attention(q, tk, tv, pk, pv, *args[5:], 4)
        return jnp.sum(out ** 2)

    grads_xla = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])
    old = pwa.BACKWARD_MODE
    try:
        pwa.BACKWARD_MODE = "pallas"
        grads_pallas = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])
    finally:
        pwa.BACKWARD_MODE = old
    for gx, gp in zip(grads_xla, grads_pallas):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)


def test_trainer_resets_backward_mode(tmp_path):
    """A trainer with pallas_backward=False must force BACKWARD_MODE back to
    'xla' even if a previous trainer in the same process set 'pallas'
    (advisor finding r1)."""
    import dataclasses
    import warnings
    from etmppo_tpu.config import load_config
    from etmppo_tpu.ops import pallas_window_attention as pwa
    from etmppo_tpu.training.trainer import PPOTrainer

    base = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    base = dataclasses.replace(
        base, n_workers=2, worker_steps=4, n_mini_batch=1, epochs=1,
        hidden_layer_size=8, updates=1, checkpoint_dir=str(tmp_path),
        summary_dir=str(tmp_path),
        transformer=dataclasses.replace(
            base.transformer, num_blocks=1, embed_dim=8, num_heads=1,
            memory_length=4))

    old = pwa.BACKWARD_MODE
    try:
        cfg_on = dataclasses.replace(
            base, use_pallas_attention=True, pallas_backward=True)
        PPOTrainer(cfg_on, run_id="t1", enable_metrics=False)
        assert pwa.BACKWARD_MODE == "pallas"
        PPOTrainer(base, run_id="t2", enable_metrics=False)
        assert pwa.BACKWARD_MODE == "xla"
        # pallas_backward without use_pallas_attention: warns, stays xla.
        cfg_warn = dataclasses.replace(base, pallas_backward=True)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            PPOTrainer(cfg_warn, run_id="t3", enable_metrics=False)
        assert pwa.BACKWARD_MODE == "xla"
        assert any("pallas_backward" in str(x.message) for x in w)
    finally:
        pwa.BACKWARD_MODE = old


def test_grouped_forward_matches_xla():
    """Grouped (sorted-by-worker VMEM-timeline) forward == XLA formulation."""
    from etmppo_tpu.ops import pallas_window_attention as pwa
    args = _case(B=32, W=4, S=40, P=12, L=8, D=32, seed=11)
    out_grouped = pwa._pallas_forward_grouped(*args, 4)
    out_xla = pwa.xla_window_attention(*args, num_heads=4)
    np.testing.assert_allclose(np.asarray(out_grouped), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)


def test_grouped_backward_matches_xla():
    from etmppo_tpu.ops import pallas_window_attention as pwa
    args = _case(B=24, W=3, S=30, P=12, L=8, D=32, seed=13)

    def loss(q, tk, tv, pk, pv):
        out = pwa.xla_window_attention(q, tk, tv, pk, pv, *args[5:],
                                       num_heads=4)
        return jnp.sum(jnp.sin(out))

    grads_xla = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])
    g_out = jax.grad(lambda o: jnp.sum(jnp.sin(o)))(
        pwa.xla_window_attention(*args, num_heads=4))
    dq, dtk, dtv, dpk, dpv = pwa._pallas_backward_grouped(
        *args, g_out, 4)
    names = ("dq", "dtk", "dtv", "dpk", "dpv")
    for name, gx, gp in zip(names, grads_xla, (dq, dtk, dtv, dpk, dpv)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_grouped_mode_end_to_end_gradients():
    """GROUPED_MODE=True through the public custom-vjp entry (fwd + bwd)."""
    from etmppo_tpu.ops import pallas_window_attention as pwa
    args = _case(B=16, W=3, S=30, P=12, L=8, D=32, seed=17)

    def loss(q, tk, tv, pk, pv):
        out = pwa.fused_window_attention(q, tk, tv, pk, pv, *args[5:], 4)
        return jnp.sum(jnp.sin(out))

    grads_ref = jax.grad(
        lambda q, tk, tv, pk, pv: jnp.sum(jnp.sin(pwa.xla_window_attention(
            q, tk, tv, pk, pv, *args[5:], num_heads=4))),
        argnums=(0, 1, 2, 3, 4))(*args[:5])

    old_g, old_b = pwa.GROUPED_MODE, pwa.BACKWARD_MODE
    try:
        pwa.GROUPED_MODE = True
        pwa.BACKWARD_MODE = "pallas"
        out = pwa.fused_window_attention(*args, 4)
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])
    finally:
        pwa.GROUPED_MODE, pwa.BACKWARD_MODE = old_g, old_b
    out_xla = pwa.xla_window_attention(*args, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)
    for gx, gp in zip(grads_ref, grads):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)


def test_grouped_all_masked_row():
    from etmppo_tpu.ops import pallas_window_attention as pwa
    args = list(_case(B=16, W=3, S=30, P=12, L=8, D=32, seed=19))
    mask = np.ones((16, args[9].shape[1]), bool)
    mask[0, :] = False
    mask[7, :] = False
    args[9] = jnp.asarray(mask)
    args = tuple(args)
    out = pwa._pallas_forward_grouped(*args, 4)
    out_xla = pwa.xla_window_attention(*args, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()
