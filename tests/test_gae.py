"""GAE reverse-scan vs the reference recursion (buffer.py:95-113)."""
import numpy as np

import jax.numpy as jnp

from etmppo_tpu.ops.gae import calc_advantages
import reference_oracle as oracle


def test_gae_matches_reference_recursion():
    np_rng = np.random.default_rng(7)
    W, T = 4, 50
    rewards = np_rng.normal(size=(W, T)).astype(np.float32)
    values = np_rng.normal(size=(W, T)).astype(np.float32)
    dones = np_rng.random((W, T)) < 0.15
    last_value = np_rng.normal(size=(W,)).astype(np.float32)

    expected = oracle.gae(rewards, values, dones, last_value, 0.99, 0.95)
    got = calc_advantages(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value), 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


def test_gae_terminal_masks_bootstrap():
    # A done at the final step must zero the bootstrap value's contribution.
    rewards = jnp.asarray([[1.0]])
    values = jnp.asarray([[0.5]])
    dones = jnp.asarray([[True]])
    adv = calc_advantages(rewards, values, dones, jnp.asarray([100.0]),
                          0.9, 0.9)
    np.testing.assert_allclose(np.asarray(adv), [[0.5]], atol=1e-6)


def test_gae_no_done_uses_bootstrap():
    rewards = jnp.asarray([[0.0]])
    values = jnp.asarray([[0.0]])
    dones = jnp.asarray([[False]])
    adv = calc_advantages(rewards, values, dones, jnp.asarray([2.0]), 0.5, 1.0)
    np.testing.assert_allclose(np.asarray(adv), [[1.0]], atol=1e-6)
