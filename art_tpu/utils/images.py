"""Host-side image decode + device image atlas.

Replaces the reference's stb_image + cudaMemcpy path (reference
src/image_io.h:16-46): images are decoded with PIL on host (decode is
cold-path in the reference too), forced to 3 channels like
``stbi_load(..., 3)``, and packed into a padded ``(n, Hmax, Wmax, 3)``
uint8 atlas so texture lookups are a single gather with static shapes.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "assets", "textures")


def load_image_rgb(path: str) -> np.ndarray:
    """Decode an image to (H, W, 3) uint8 (reference src/image_io.h:24-41 semantics)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def asset_path(name: str) -> str:
    return os.path.join(ASSET_DIR, name)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImageAtlas:
    """Padded stack of images + per-image dims, sampled nearest-neighbor."""

    data: jnp.ndarray  # (n, Hmax, Wmax, 3) float32 in [0,1]
    heights: jnp.ndarray  # (n,) int32
    widths: jnp.ndarray  # (n,) int32

    @staticmethod
    def empty() -> "ImageAtlas":
        return ImageAtlas(
            data=jnp.zeros((1, 1, 1, 3), jnp.float32),
            heights=jnp.ones((1,), jnp.int32),
            widths=jnp.ones((1,), jnp.int32),
        )

    @staticmethod
    def pack(images: list[np.ndarray]) -> "ImageAtlas":
        if not images:
            return ImageAtlas.empty()
        hmax = max(im.shape[0] for im in images)
        wmax = max(im.shape[1] for im in images)
        data = np.zeros((len(images), hmax, wmax, 3), np.float32)
        hs, ws = [], []
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            data[i, :h, :w] = im.astype(np.float32) / 255.0
            hs.append(h)
            ws.append(w)
        return ImageAtlas(
            data=jnp.asarray(data),
            heights=jnp.asarray(hs, jnp.int32),
            widths=jnp.asarray(ws, jnp.int32),
        )

    def sample(self, img_id: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """Nearest-texel sample with clamp + v-flip (reference src/texture.cuh:51-59)."""
        img_id = jnp.clip(img_id, 0, self.data.shape[0] - 1)
        w = self.widths[img_id]
        h = self.heights[img_id]
        uu = jnp.clip(u, 0.0, 1.0)
        vv = jnp.clip(v, 0.0, 1.0)
        i = jnp.minimum((uu * w.astype(jnp.float32)).astype(jnp.int32), w - 1)
        j = jnp.minimum(((1.0 - vv) * h.astype(jnp.float32)).astype(jnp.int32), h - 1)
        return self.data[img_id, j, i]
