"""Episode rendering to image files (reference enjoy.py:51 renders gameplay
to a window; this build host is headless, so image-observation episodes are
saved as animated GIFs + per-step PNGs instead)."""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def _to_image(frame: np.ndarray, scale: int):
    """(H, W, C) float [0,1] or uint8 -> upscaled PIL RGB image."""
    from PIL import Image
    frame = np.asarray(frame)
    if frame.dtype != np.uint8:
        frame = (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)
    if frame.ndim == 3 and frame.shape[2] == 1:
        frame = np.repeat(frame, 3, axis=2)
    img = Image.fromarray(frame, mode="RGB" if frame.ndim == 3 else "L")
    if scale != 1:
        img = img.resize((img.width * scale, img.height * scale),
                         resample=Image.NEAREST)
    return img.convert("RGB")


def save_episode_gif(frames: List[np.ndarray], path: str, scale: int = 4,
                     fps: int = 8, png_dir: Optional[str] = None) -> str:
    """Writes ``frames`` (each (H, W, C), float [0,1] or uint8) as an
    animated GIF at ``path``; optionally also one PNG per frame in
    ``png_dir``.  Returns the GIF path."""
    if not frames:
        raise ValueError("no frames to save")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    images = [_to_image(f, scale) for f in frames]
    images[0].save(path, save_all=True, append_images=images[1:],
                   duration=int(1000 / fps), loop=0)
    if png_dir is not None:
        os.makedirs(png_dir, exist_ok=True)
        for i, img in enumerate(images):
            img.save(os.path.join(png_dir, f"frame_{i:04d}.png"))
    return path
