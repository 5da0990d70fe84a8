"""Multi-discrete categorical policy head utilities.

The reference wraps per-branch logits in ``torch.distributions.Categorical``
(model.py:110) and stacks per-branch samples / log-probs / entropies
(trainer.py:177-186, 277-282).  Here the same operations are pure functions of
stacked logits so they trace cleanly under jit/vmap/scan.

Branches may have different arities in general; within this framework each
policy head is its own Linear, and per-branch logits are carried as a tuple.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def log_prob(logits: jax.Array, actions: jax.Array) -> jax.Array:
    """log P(action) for one branch. logits: (..., A), actions: (...) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]


def entropy(logits: jax.Array) -> jax.Array:
    """Entropy of one branch (matches torch.distributions.Categorical.entropy)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def sample(key: jax.Array, logits: jax.Array) -> jax.Array:
    """Samples actions from one branch of logits (..., A) -> (...) int32."""
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_multi(
    key: jax.Array, branch_logits: Sequence[jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Samples all branches; returns (actions, log_probs) each (..., n_branches)."""
    keys = jax.random.split(key, len(branch_logits))
    actions = []
    log_probs = []
    for k, logits in zip(keys, branch_logits):
        a = sample(k, logits)
        actions.append(a)
        log_probs.append(log_prob(logits, a))
    return jnp.stack(actions, axis=-1), jnp.stack(log_probs, axis=-1)


def log_probs_and_entropies(
    branch_logits: Sequence[jax.Array], actions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-branch log-probs for given actions (..., n_branches) and the summed
    entropy (...,) (reference: trainer.py:277-282)."""
    lps = [log_prob(logits, actions[..., i])
           for i, logits in enumerate(branch_logits)]
    ents = [entropy(logits) for logits in branch_logits]
    return jnp.stack(lps, axis=-1), jnp.sum(jnp.stack(ents, axis=-1), axis=-1)
