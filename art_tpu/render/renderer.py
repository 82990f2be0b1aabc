"""Render driver: tiling, sample batching, gamma, framebuffer assembly.

The reference launches one CUDA thread per pixel looping ns samples
(reference src/main.cu:107-133).  Here the renderer builds large ray
wavefronts of (pixel-tile x sample-chunk) so the TPU always sees dense
batches; tile and chunk sizes are planned from the scene's primitive counts
to bound the (R, N) intersection working set.
"""

from __future__ import annotations

import dataclasses
import sys
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core import rng as artrng
from art_tpu.core.camera import Camera, generate_rays
from art_tpu.render.integrator import trace
from art_tpu.scene.tables import SceneTables


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    nx: int = 400
    ny: int = 225
    spp: int = 16
    max_depth: int = 50  # reference hardcodes 50 (src/main.cu:54)
    gamma: float = 2.2
    seed: int = 1984  # reference seed (src/main.cu:92)
    # ray-batch budget: max (R x N) intersection elements per dispatch
    batch_budget: int = 1 << 23
    max_rays_per_batch: int = 1 << 17


def plan_batches(n_pixels: int, spp: int, n_prims_max: int, cfg: RenderConfig):
    """Choose (tile_pixels, spp_chunk) so R = tile * chunk fits the budget."""
    n_prims_max = max(n_prims_max, 1)
    rays = max(4096, min(cfg.max_rays_per_batch, cfg.batch_budget // n_prims_max))
    tile_pixels = min(n_pixels, rays)
    spp_chunk = min(spp, max(1, rays // tile_pixels))
    return tile_pixels, spp_chunk


def _render_batch(
    tables: SceneTables,
    cam: Camera,
    pix: jnp.ndarray,  # (P,) int32 pixel ids (j*nx + i)
    key: jax.Array,
    background: jnp.ndarray,
    *,
    nx: int,
    ny: int,
    spp_chunk: int,
    max_depth: int,
    gradient_bg: bool,
):
    """Sum of radiance over spp_chunk samples per pixel: (P,3), plus ray count."""
    P = pix.shape[0]
    R = P * spp_chunk
    pix_r = jnp.repeat(pix, spp_chunk)
    i = (pix_r % nx).astype(jnp.float32)
    j = (pix_r // nx).astype(jnp.float32)

    # sub-pixel jitter u=(i+xi)/nx, v=(j+xi)/ny (src/main.cu:121-122)
    xi = artrng.uniform(artrng.fold(key, artrng.SITE_JITTER), (R, 2))
    s = (i + xi[:, 0]) / nx
    t = (j + xi[:, 1]) / ny

    o, d, times = generate_rays(cam, s, t, key)
    radiance, rays_traced = trace(
        tables, o, d, times, key, background, gradient_bg, max_depth
    )
    return radiance.reshape(P, spp_chunk, 3).sum(axis=1), rays_traced


_render_batch_jit = jax.jit(
    _render_batch,
    static_argnames=("nx", "ny", "spp_chunk", "max_depth", "gradient_bg"),
)


def apply_gamma(fb: np.ndarray, gamma: float) -> np.ndarray:
    """Per-channel gamma (reference src/main.cu:37-42)."""
    if gamma == 1.0:
        return fb
    return np.power(np.maximum(fb, 0.0), 1.0 / gamma)


def render_scene(scene, cfg: RenderConfig, verbose: bool = False):
    """Render a CompiledScene; returns (framebuffer (ny,nx,3) float, stats dict).

    Row 0 of the framebuffer is the *bottom* scanline (reference fb layout,
    pixel = j*nx + i).
    """
    tables: SceneTables = scene.tables
    cam: Camera = scene.camera
    background = jnp.asarray(scene.background, jnp.float32)

    n_pixels = cfg.nx * cfg.ny
    n_prims_max = max(tables.n_spheres, tables.n_quads, tables.n_boxes, 1)
    tile_pixels, spp_chunk = plan_batches(n_pixels, cfg.spp, n_prims_max, cfg)
    n_tiles = -(-n_pixels // tile_pixels)
    n_chunks = -(-cfg.spp // spp_chunk)

    if verbose:
        print(
            f"render {cfg.nx}x{cfg.ny} spp={cfg.spp} depth={cfg.max_depth} "
            f"tiles={n_tiles}x{tile_pixels}px chunks={n_chunks}x{spp_chunk}spp",
            file=sys.stderr,
        )

    master = jax.random.PRNGKey(cfg.seed)
    fb = np.zeros((n_pixels, 3), np.float32)
    total_rays = 0.0
    start = _time.perf_counter()

    for tile in range(n_tiles):
        lo = tile * tile_pixels
        hi = min(lo + tile_pixels, n_pixels)
        ids = np.arange(lo, lo + tile_pixels, dtype=np.int32)
        ids = np.minimum(ids, n_pixels - 1)  # pad the last tile
        pix = jnp.asarray(ids)
        acc = jnp.zeros((tile_pixels, 3), jnp.float32)
        for chunk in range(n_chunks):
            k = artrng.fold(master, tile, chunk)
            batch, rays = _render_batch_jit(
                tables,
                cam,
                pix,
                k,
                background,
                nx=cfg.nx,
                ny=cfg.ny,
                spp_chunk=spp_chunk,
                max_depth=cfg.max_depth,
                gradient_bg=scene.gradient_bg,
            )
            acc = acc + batch
            total_rays += float(rays)
        fb[lo:hi] += np.asarray(acc)[: hi - lo]

    elapsed = _time.perf_counter() - start
    # Note: n_chunks * spp_chunk may exceed cfg.spp; normalize by actual samples.
    actual_spp = n_chunks * spp_chunk
    fb = fb / actual_spp
    fb = apply_gamma(fb, cfg.gamma)
    fb = fb.reshape(cfg.ny, cfg.nx, 3)

    stats = {
        "seconds": elapsed,
        "rays": total_rays,
        "mrays_per_sec": total_rays / elapsed / 1e6 if elapsed > 0 else 0.0,
        "spp": actual_spp,
        "tile_pixels": tile_pixels,
        "spp_chunk": spp_chunk,
    }
    if verbose:
        print(
            f"took {elapsed:.3f} seconds. rays={total_rays:.3g} "
            f"({stats['mrays_per_sec']:.2f} Mrays/s)",
            file=sys.stderr,
        )
    return fb, stats
