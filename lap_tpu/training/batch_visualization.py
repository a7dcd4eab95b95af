"""Batch visualization panels (parity: lihzha/lap training/batch_visualization.py).

Renders first-batch image grids, decoded language-action captions, and
augmented-image comparisons. Output goes to PNG files under the checkpoint
dir (and to wandb when enabled) instead of wandb-only.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def _to_uint8(img) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
    return img


def make_image_grid(images, *, max_images: int = 16, cols: int = 4) -> np.ndarray:
    """[N, H, W, C] -> one tiled grid image."""
    images = [_to_uint8(i) for i in np.asarray(images)[:max_images]]
    if not images:
        return np.zeros((1, 1, 3), np.uint8)
    h, w, c = images[0].shape
    rows = (len(images) + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i, img in enumerate(images):
        r, cc = divmod(i, cols)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = img
    return grid


def caption_frame(img: np.ndarray, text: str) -> np.ndarray:
    """Draw a caption strip under the image (cv2 when available)."""
    img = _to_uint8(img)
    strip = np.full((24, img.shape[1], img.shape[2]), 255, np.uint8)
    try:
        import cv2

        cv2.putText(strip, text[:48], (2, 16), cv2.FONT_HERSHEY_SIMPLEX, 0.35, (0, 0, 0), 1)
    except ImportError:
        pass
    return np.concatenate([img, strip], axis=0)


def vis_batch(observation, *, out_dir: str | Path, tokenizer=None, step: int = 0,
              wandb_run=None, max_images: int = 8) -> Path | None:
    """Save a first-batch panel: per-camera grids + decoded langact captions."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    panels = []
    for name, imgs in observation.images.items():
        imgs = np.asarray(imgs)[:max_images]
        if tokenizer is not None and observation.tokenized_prompt is not None:
            captioned = []
            for i, img in enumerate(imgs):
                tokens = np.asarray(observation.tokenized_prompt[i])
                mask = (
                    np.asarray(observation.tokenized_langact_mask[i])
                    if observation.tokenized_langact_mask is not None
                    else np.zeros_like(tokens, bool)
                )
                text = tokenizer.decode(tokens[mask]) if mask.any() else ""
                captioned.append(caption_frame(img, text))
            imgs = np.stack(captioned)
        panels.append((name, make_image_grid(imgs)))

    try:
        import cv2

        paths = []
        for name, grid in panels:
            path = out_dir / f"batch_{step}_{name}.png"
            cv2.imwrite(str(path), grid[..., ::-1])
            paths.append(path)
        logger.info("wrote batch visualization to %s", out_dir)
    except ImportError:
        return None
    if wandb_run is not None:
        try:
            import wandb

            wandb_run.log(
                {f"batch/{name}": wandb.Image(grid) for name, grid in panels}, step=step
            )
        except ImportError:
            pass
    return paths[0] if paths else None


def vis_augmented_images(original, augmented, *, out_dir: str | Path, step: int = 0):
    """Side-by-side original vs augmented grid."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    pairs = []
    for o, a in zip(np.asarray(original)[:8], np.asarray(augmented)[:8], strict=False):
        pairs.append(np.concatenate([_to_uint8(o), _to_uint8(a)], axis=1))
    grid = make_image_grid(pairs, cols=2)
    try:
        import cv2

        path = Path(out_dir) / f"augmented_{step}.png"
        cv2.imwrite(str(path), grid[..., ::-1])
        return path
    except ImportError:
        return None
