"""Synthetic icon images for tests (the Icons-50 dataset is not shipped)."""

import numpy as np


def make_icon(seed: int = 0, size: int = 64) -> np.ndarray:
    """A white-background image with a dark star-ish blob, like an icon."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    cx, cy = size / 2, size / 2
    ang = np.arctan2(yy - cy, xx - cx)
    r = np.hypot(xx - cx, yy - cy)
    rad = size * 0.35 * (
        1 + 0.25 * np.sin(3 * ang + rng.uniform(0, 6)) + 0.1 * np.sin(7 * ang)
    )
    img = np.where(r < rad, 30, 255).astype(np.uint8)
    return np.stack([img] * 3, -1)
