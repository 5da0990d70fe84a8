"""Episode rendering (utils/render.py + enjoy GIF path)."""
import dataclasses
import os

import numpy as np
import pytest

import jax

from etmppo_tpu.utils.render import save_episode_gif

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def test_save_episode_gif_roundtrip(tmp_path):
    frames = [np.full((4, 6, 3), v, np.float32) for v in (0.0, 0.5, 1.0)]
    path = str(tmp_path / "ep.gif")
    out = save_episode_gif(frames, path, scale=2, fps=4,
                           png_dir=str(tmp_path / "png"))
    assert out == path
    img = Image.open(path)
    assert img.size == (12, 8)  # W x H, x2 upscale
    img.seek(2)  # all 3 frames present
    with pytest.raises(EOFError):
        img.seek(3)
    assert sorted(os.listdir(tmp_path / "png")) == [
        "frame_0000.png", "frame_0001.png", "frame_0002.png"]


def test_save_episode_gif_uint8_and_grayscale(tmp_path):
    frames = [np.zeros((3, 3, 1), np.uint8), np.full((3, 3, 1), 255, np.uint8)]
    path = save_episode_gif(frames, str(tmp_path / "g.gif"), scale=1)
    assert Image.open(path).size == (3, 3)
    with pytest.raises(ValueError):
        save_episode_gif([], str(tmp_path / "empty.gif"))


def test_enjoy_writes_gif_for_image_env(tmp_path):
    from etmppo_tpu.config import load_config
    from etmppo_tpu.enjoy import run_episodes
    from etmppo_tpu.envs.factory import create_env
    from etmppo_tpu.models.actor_critic import ActorCriticModel
    from etmppo_tpu.training.checkpoint import save_model

    cfg = load_config("etmppo_tpu/configs/minigrid.yaml")
    cfg = dataclasses.replace(
        cfg, hidden_layer_size=16,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=1, embed_dim=16, num_heads=2,
            memory_length=8))
    env = create_env(cfg.environment)
    model = ActorCriticModel(
        config=cfg, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "mg.nn")
    save_model(path, params, cfg)

    render_dir = str(tmp_path / "renders")
    run_episodes(path, episodes=1, render=True, seed=3,
                 render_dir=render_dir)
    gif = os.path.join(render_dir, "episode_000.gif")
    assert os.path.exists(gif)
    img = Image.open(gif)
    assert img.size == (84 * 4, 84 * 4)
    img.seek(1)  # at least two frames (first obs + terminal obs)
