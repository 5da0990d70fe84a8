"""Fused multi-update loop must be bit-identical to launch-per-update."""
import dataclasses

import numpy as np
import pytest

import jax

from etmppo_tpu.config import load_config
from etmppo_tpu.training.trainer import PPOTrainer


def _tiny_cfg(**overrides):
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    return dataclasses.replace(
        cfg, n_workers=4, worker_steps=16, n_mini_batch=2, epochs=2,
        hidden_layer_size=16,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=8),
        **overrides)


def test_fused_matches_unfused():
    t_unfused = PPOTrainer(_tiny_cfg(updates_per_launch=1), run_id="u",
                           enable_metrics=False)
    t_fused = PPOTrainer(_tiny_cfg(updates_per_launch=3), run_id="f",
                         enable_metrics=False)

    r_unfused = [t_unfused.train_one_update() for _ in range(3)]
    r_fused = t_fused.train_chunk(3)

    for ru, rf in zip(r_unfused, r_fused):
        for key in ("policy_loss", "value_loss", "loss", "entropy", "kl"):
            assert ru[key] == pytest.approx(rf[key], rel=1e-5, abs=1e-7), key
        assert ru.get("reward_mean") == pytest.approx(
            rf.get("reward_mean"), rel=1e-5)
    # params identical
    for a, b in zip(jax.tree.leaves(t_unfused.params),
                    jax.tree.leaves(t_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_run_training_uses_chunks(tmp_path):
    cfg = _tiny_cfg(updates_per_launch=4)
    cfg = dataclasses.replace(cfg, updates=6,
                              checkpoint_dir=str(tmp_path / "models"),
                              summary_dir=str(tmp_path / "summaries"))
    trainer = PPOTrainer(cfg, run_id="chunked", enable_metrics=False)
    result = trainer.run_training(print_every=0)
    assert trainer.update == 6
    assert "env_steps_per_second" in result


def test_bfloat16_compute_path_trains():
    """compute_dtype=bfloat16 (TPU-native mixed precision) must run and learn
    with fp32 params and finite stats."""
    import numpy as np
    cfg = _tiny_cfg(updates_per_launch=2)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    trainer = PPOTrainer(cfg, run_id="bf16", enable_metrics=False)
    results = trainer.train_chunk(2)
    for r in results:
        assert np.isfinite(r["loss"])
        assert np.isfinite(r["kl"])
    # params stay fp32
    import jax.numpy as jnp
    for leaf in jax.tree.leaves(trainer.params):
        assert leaf.dtype == jnp.float32


def test_bfloat16_with_pallas_attention_trains():
    """bf16 compute + the Pallas attention path: the kernel computes fp32
    internally, so _loss_pallas casts at the kernel boundary
    (training/ppo.py make_op) — the combination must train with finite
    stats and fp32 params (on CPU the kernels run in interpret mode)."""
    import numpy as np
    cfg = _tiny_cfg(updates_per_launch=2)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                              use_pallas_attention=True,
                              pallas_backward=True)
    trainer = PPOTrainer(cfg, run_id="bf16-pallas", enable_metrics=False)
    results = trainer.train_chunk(2)
    for r in results:
        assert np.isfinite(r["loss"])
        assert np.isfinite(r["kl"])
    import jax.numpy as jnp
    for leaf in jax.tree.leaves(trainer.params):
        assert leaf.dtype == jnp.float32


def test_obs_uint8_storage_trains():
    """uint8 obs storage (HBM saving for image envs) runs and matches fp32
    closely on a quantization-free env (PocMemory obs are multiples of 0.2
    and +-1... not exactly representable -> compare loosely)."""
    import numpy as np
    r32 = PPOTrainer(_tiny_cfg(), run_id="o32",
                     enable_metrics=False).train_chunk(2)
    cfg = dataclasses.replace(_tiny_cfg(), obs_uint8=True)
    r8 = PPOTrainer(cfg, run_id="o8", enable_metrics=False).train_chunk(2)
    for a, b in zip(r32, r8):
        assert np.isfinite(b["loss"])
        # same seed, nearly identical losses (quantization-level differences)
        assert abs(a["loss"] - b["loss"]) < 0.05
