"""PPO update: epochs x shuffled minibatches compiled into one jitted scan.

Loss semantics match the reference exactly (trainer.py:258-323):
per-minibatch advantage normalization (unbiased std + 1e-8), clipped surrogate,
clipped value loss (max of squared errors), summed branch entropies, total loss
``-(policy - c_v * value + beta * entropy)``, torch-style global-norm gradient
clipping (scale = max_norm / (norm + 1e-6), capped at 1) and AdamW
(betas 0.9/0.999, eps 1e-8, decoupled weight decay 0.01 — torch defaults).

Gradient-norm telemetry is computed on the *clipped* gradients, matching the
reference where ``get_grad_norm`` reads ``.grad`` after in-place
``clip_grad_norm_`` (trainer.py:254, 311).

Memory windows are reconstructed per minibatch from (snapshot, tape) via the
index math in ops/memory_index.py — the TPU-native replacement for the
reference's per-sample full-episode gather (buffer.py:90, trainer.py:271),
which materialized (minibatch, max_episode_len, blocks, D); here only
(minibatch, memory_length, blocks, D) is ever formed.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..models.actor_critic import ActorCriticModel
from ..ops import distributions
from ..ops.memory_index import (build_memory_indices, build_memory_mask,
                                compute_window_sources)
from .rollout import RolloutBatch

STAT_NAMES = ("policy_loss", "value_loss", "loss", "entropy", "kl",
              "clip_fraction")


def make_optimizer() -> optax.GradientTransformation:
    """scale_by_adam + decoupled weight decay; the learning rate is applied
    manually each update so it can be a traced per-update scalar."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(0.01))


def clip_grads_torch(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics (trainer.py:311)."""
    total_norm = optax.global_norm(grads)
    clip_coef = jnp.minimum(max_norm / (total_norm + 1e-6), 1.0)
    return jax.tree.map(lambda g: g * clip_coef, grads), total_norm


def grad_norm_groups(grads, has_encoder: bool, num_blocks: int,
                     n_branches: int) -> Dict[str, jax.Array]:
    """Per-module gradient norms mirroring model.py:128-151's groups
    (computed on clipped grads, like the reference)."""
    p = grads["params"]

    def sumsq(*subtrees):
        return sum(
            jnp.sum(jnp.square(leaf))
            for t in subtrees for leaf in jax.tree.leaves(t))

    groups = {}
    if has_encoder:
        groups["encoder"] = jnp.sqrt(
            sumsq(p["conv1"], p["conv2"], p["conv3"]))
    groups["linear_layer"] = jnp.sqrt(sumsq(p["lin_hidden"]))
    for i in range(num_blocks):
        groups[f"transformer_block_{i}"] = jnp.sqrt(
            sumsq(p["transformer"][f"block_{i}"]))
    for i in range(n_branches):
        groups[f"policy_head_{i}"] = jnp.sqrt(sumsq(p[f"policy_branch_{i}"]))
    groups["lin_policy"] = jnp.sqrt(sumsq(p["lin_policy"]))
    groups["value"] = jnp.sqrt(sumsq(p["lin_value"], p["value"]))
    # Reference quirk: the "model" group concatenates ALL grads plus the value
    # head's a second time (model.py:149).
    groups["model"] = jnp.sqrt(sumsq(p) + sumsq(p["value"]))
    return groups


class PPOUpdateFn:
    """Builds the jitted PPO update for (model, config)."""

    def __init__(self, config: TrainConfig, model: ActorCriticModel,
                 max_episode_steps: int):
        self.config = config
        self.model = model
        self.max_ep = max_episode_steps
        trx = config.transformer
        self.mask_table = jnp.asarray(build_memory_mask(trx.memory_length))
        self.index_table = jnp.asarray(
            build_memory_indices(max_episode_steps, trx.memory_length))
        self.optimizer = make_optimizer()
        self._jitted = jax.jit(self._update, donate_argnums=(0, 1))

    def init_opt_state(self, params):
        return self.optimizer.init(params)

    def __call__(self, params, opt_state, batch: RolloutBatch, rng,
                 learning_rate, clip_range, beta):
        return self._jitted(
            params, opt_state, batch, rng,
            jnp.float32(learning_rate), jnp.float32(clip_range),
            jnp.float32(beta))

    # --- internals -------------------------------------------------------

    def _loss(self, params, mb, clip_range, beta):
        """Reference-semantics loss on a raw memory window (projections inside
        the model).  Used by tests; the update path uses ``_loss_fast``."""
        logits, value, _ = self.model.apply(
            params, mb["obs"], mb["memory_window"], mb["memory_mask"],
            mb["memory_indices"])
        return self._loss_from_outputs(logits, value, mb, clip_range, beta)

    def _loss_fast(self, params, mb, src, src_slots, clip_range, beta):
        """Projected-KV loss: project memory *sources* once, gather projected
        windows (models/transformer.py docstring).  Mathematically identical
        to ``_loss`` (projection/LN/PE are per-entry), ~memory_length x fewer
        projection FLOPs."""
        model = type(self.model)
        k_src, v_src = self.model.apply(
            params, src, src_slots, method=model.project_memory)
        w_idx = mb["w_idx"]
        flat_idx = mb["flat_index"]
        k_win = k_src[w_idx[:, None], flat_idx]
        v_win = v_src[w_idx[:, None], flat_idx]
        logits, value, _ = self.model.apply(
            params, mb["obs"], k_win, v_win, mb["memory_mask"],
            method=model.forward_with_kv)
        return self._loss_from_outputs(logits, value, mb, clip_range, beta)

    def _loss_pallas(self, params, mb, timeline, timeline_slots, clip_range,
                     beta):
        """Pallas fused window-attention loss: project the memory timeline
        once, then each block's attention streams contiguous K/V runs from
        HBM inside the kernel (ops/pallas_window_attention.py) — gathered
        windows are never materialized."""
        from ..ops.pallas_window_attention import fused_window_attention
        model = type(self.model)
        trx = self.config.transformer
        tk, tv = self.model.apply(
            params, timeline, timeline_slots, method=model.project_memory)
        pe_k, pe_v = self.model.apply(params, method=model.pe_kv)

        def make_op(i):
            def op(q):
                # The Pallas kernels compute in fp32 (VMEM scratch + MXU
                # accumulation); under compute_dtype=bfloat16 the projections
                # arrive bf16 — cast at the kernel boundary and cast the
                # result back so the surrounding network stays bf16.  The
                # casts are free next to the kernel's own HBM traffic, and
                # autodiff converts the cotangents symmetrically.
                out = fused_window_attention(
                    q.astype(jnp.float32), tk[:, :, i].astype(jnp.float32),
                    tv[:, :, i].astype(jnp.float32),
                    pe_k[:, i].astype(jnp.float32),
                    pe_v[:, i].astype(jnp.float32),
                    mb["w_idx"], mb["tl_start"], mb["tl_n_valid"],
                    mb["tl_s_lo"], mb["memory_mask"], trx.num_heads)
                return out.astype(q.dtype)
            return op

        ops = [make_op(i) for i in range(trx.num_blocks)]
        logits, value, _ = self.model.apply(
            params, mb["obs"], ops, method=model.forward_with_ops)
        return self._loss_from_outputs(logits, value, mb, clip_range, beta)

    def _loss_from_outputs(self, logits, value, mb, clip_range, beta):
        cfg = self.config
        log_probs, entropies = distributions.log_probs_and_entropies(
            logits, mb["actions"])

        adv = mb["advantages"]
        norm_adv = (adv - adv.mean()) / (adv.std(ddof=1) + 1e-8)
        norm_adv = norm_adv[:, None]  # broadcast over action branches
        log_ratio = log_probs - mb["log_probs"]
        ratio = jnp.exp(log_ratio)
        surr1 = ratio * norm_adv
        surr2 = jnp.clip(ratio, 1.0 - clip_range, 1.0 + clip_range) * norm_adv
        policy_loss = jnp.minimum(surr1, surr2).mean()

        sampled_return = mb["values"] + adv
        clipped_value = mb["values"] + jnp.clip(
            value - mb["values"], -clip_range, clip_range)
        vf_loss = jnp.maximum(
            (value - sampled_return) ** 2,
            (clipped_value - sampled_return) ** 2).mean()

        entropy_bonus = entropies.mean()
        loss = -(policy_loss - cfg.value_loss_coefficient * vf_loss
                 + beta * entropy_bonus)

        approx_kl = ((ratio - 1.0) - log_ratio).mean()
        clip_fraction = (jnp.abs(ratio - 1.0) > clip_range).mean()
        stats = jnp.stack([policy_loss, vf_loss, loss, entropy_bonus,
                           approx_kl, clip_fraction])
        return loss, stats

    def _update(self, params, opt_state, batch: RolloutBatch, rng,
                learning_rate, clip_range, beta):
        cfg = self.config
        trx = cfg.transformer
        W, T = cfg.n_workers, cfg.worker_steps
        B = W * T
        L = trx.memory_length

        # Training-time memory-window sources from rollout metadata.  The
        # trailing zero region resolves never-written slots to PE-only content
        # after projection (see WindowSources docstring).
        sources = compute_window_sources(
            batch.episode_steps, batch.dones, self.index_table, self.max_ep)
        src = jnp.concatenate([
            batch.snapshot, batch.tape,
            jnp.zeros_like(batch.snapshot)], axis=1)
        # Absolute episode-slot of each source entry (snapshot entries sit at
        # their slot; tape entries were written at that step's episode step).
        slot_range = jnp.tile(
            jnp.arange(self.max_ep, dtype=jnp.int32)[None], (W, 1))
        src_slots = jnp.concatenate([
            slot_range, batch.episode_steps.astype(jnp.int32), slot_range],
            axis=1)

        use_pallas = cfg.use_pallas_attention
        if use_pallas:
            from ..ops.memory_index import (build_timeline,
                                            build_timeline_slots,
                                            compute_timeline_sources)
            timeline = build_timeline(
                batch.snapshot, batch.tape, batch.episode_steps[:, 0], pad=L)
            timeline_slots = build_timeline_slots(
                batch.episode_steps, self.max_ep, pad=L)
            tl = compute_timeline_sources(
                batch.episode_steps, batch.dones, self.index_table, L)

        flat = lambda x: x.reshape((B,) + x.shape[2:])
        flat_batch = dict(
            obs=flat(batch.obs), actions=flat(batch.actions),
            log_probs=flat(batch.log_probs), values=flat(batch.values),
            advantages=flat(batch.advantages),
            episode_steps=flat(batch.episode_steps),
            flat_index=flat(sources.flat_index), valid=flat(sources.valid),
            slot=flat(sources.slot))
        if use_pallas:
            flat_batch.update(
                tl_start=flat(tl.start), tl_n_valid=flat(tl.n_valid),
                tl_s_lo=flat(tl.s_lo))

        # Shuffled minibatch schedule: one permutation per epoch
        # (reference: buffer.py:79-85).
        epoch_keys = jax.random.split(rng, cfg.epochs)
        perms = jnp.stack(
            [jax.random.permutation(k, B) for k in epoch_keys])
        mb_indices = perms.reshape(cfg.epochs * cfg.n_mini_batch,
                                   cfg.mini_batch_size)

        has_encoder = len(self.model.obs_shape) > 1
        n_branches = len(self.model.action_branches)

        def minibatch_step(carry, idx):
            params, opt_state = carry
            mb_obs = flat_batch["obs"][idx]
            if cfg.obs_uint8:
                mb_obs = mb_obs.astype(jnp.float32) / 255.0
            mb = dict(
                obs=mb_obs,
                actions=flat_batch["actions"][idx],
                log_probs=flat_batch["log_probs"][idx],
                values=flat_batch["values"][idx],
                advantages=flat_batch["advantages"][idx],
                w_idx=idx // T,
                flat_index=flat_batch["flat_index"][idx],
                valid=flat_batch["valid"][idx],
                memory_mask=self.mask_table[
                    jnp.clip(flat_batch["episode_steps"][idx], 0, L - 1)],
                memory_indices=flat_batch["slot"][idx])

            if use_pallas:
                mb.update(tl_start=flat_batch["tl_start"][idx],
                          tl_n_valid=flat_batch["tl_n_valid"][idx],
                          tl_s_lo=flat_batch["tl_s_lo"][idx])
                (loss, stats), grads = jax.value_and_grad(
                    self._loss_pallas, has_aux=True)(
                        params, mb, timeline, timeline_slots, clip_range, beta)
            else:
                (loss, stats), grads = jax.value_and_grad(
                    self._loss_fast, has_aux=True)(
                        params, mb, src, src_slots, clip_range, beta)
            grads, _ = clip_grads_torch(grads, cfg.max_grad_norm)
            grad_groups = grad_norm_groups(
                grads, has_encoder, trx.num_blocks, n_branches)
            updates, opt_state = self.optimizer.update(
                grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * -learning_rate, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (stats, grad_groups)

        (params, opt_state), (all_stats, all_grads) = jax.lax.scan(
            minibatch_step, (params, opt_state), mb_indices)

        stats = all_stats.mean(axis=0)
        grad_info = jax.tree.map(lambda x: x.mean(), all_grads)
        return params, opt_state, stats, grad_info
