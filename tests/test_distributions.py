"""Multi-discrete categorical ops vs torch.distributions semantics."""
import numpy as np

import jax
import jax.numpy as jnp

from etmppo_tpu.ops import distributions
import reference_oracle as oracle


def test_log_prob_and_entropy_match_softmax_math():
    np_rng = np.random.default_rng(3)
    logits = np_rng.normal(size=(16, 5)).astype(np.float32)
    actions = np_rng.integers(0, 5, size=(16,))

    probs = oracle.softmax(logits)
    expected_lp = np.log(probs[np.arange(16), actions])
    expected_ent = -(probs * np.log(probs)).sum(-1)

    lp = distributions.log_prob(jnp.asarray(logits), jnp.asarray(actions))
    ent = distributions.entropy(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(lp), expected_lp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ent), expected_ent, rtol=1e-5, atol=1e-6)


def test_sample_multi_shapes_and_consistency(rng):
    logits = (jnp.asarray(np.random.default_rng(0).normal(size=(8, 3))),
              jnp.asarray(np.random.default_rng(1).normal(size=(8, 5))))
    actions, log_probs = distributions.sample_multi(rng, logits)
    assert actions.shape == (8, 2)
    assert log_probs.shape == (8, 2)
    # log_probs consistent with branch log_prob of the sampled action
    for i, l in enumerate(logits):
        np.testing.assert_allclose(
            np.asarray(log_probs[:, i]),
            np.asarray(distributions.log_prob(l, actions[:, i])), rtol=1e-6)


def test_sample_distribution_statistics(rng):
    # Strongly-peaked logits must sample the argmax almost always.
    logits = (jnp.asarray([[10.0, 0.0, 0.0]] * 1000),)
    actions, _ = distributions.sample_multi(rng, logits)
    assert (np.asarray(actions) == 0).mean() > 0.99


def test_log_probs_and_entropies_sums_branches():
    logits = (jnp.asarray([[0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 0.0]]))
    actions = jnp.asarray([[0, 2]])
    lps, ent = distributions.log_probs_and_entropies(logits, actions)
    np.testing.assert_allclose(np.asarray(lps[0]),
                               [np.log(0.5), np.log(1 / 3)], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ent[0]), np.log(2) + np.log(3), rtol=1e-6)
