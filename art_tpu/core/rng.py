"""Counter-based random sampling for the wavefront tracer.

TPU-native replacement for the reference's per-pixel mutable curandState
(reference src/main.cu:89-105, README "RNG discipline"): every random draw
is produced from a threefry key folded with static *site* identifiers —
``fold(master, tile, chunk, bounce, site)`` — so the whole render is a pure
function of one seed, with full statistical independence across pixels,
samples, bounces, and sample sites.  No state is read or written.

The reference's rejection loops are replaced with analytic equal-distribution
samplers:

* ``random_in_unit_disk`` (reference src/camera.cuh:8-16, rejection) →
  polar inversion ``(sqrt(u1), 2*pi*u2)``;
* ``random_in_unit_sphere`` — uniform in the unit *ball* (reference
  src/material.cuh:12-18, rejection) → gaussian direction x cbrt-radius.

Both produce exactly the uniform distribution the rejection loops converge
to, with zero divergence — TPU lanes never idle in a retry loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stable site identifiers so fold chains never collide between sample sites.
SITE_JITTER = 1
SITE_LENS = 2
SITE_TIME = 3
SITE_SCATTER = 4
SITE_CHOICE = 5
SITE_MEDIUM = 6


def fold(key: jax.Array, *ids: int) -> jax.Array:
    """Fold a chain of identifiers into a key (order-sensitive)."""
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def uniform(key: jax.Array, shape) -> jnp.ndarray:
    """U[0,1) float32 block."""
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def random_in_unit_disk(key: jax.Array, n: int) -> jnp.ndarray:
    """(n, 2) points uniform in the unit disk.

    Equal in distribution to the reference rejection sampler
    (src/camera.cuh:8-16) but branch-free.
    """
    u = uniform(key, (n, 2))
    r = jnp.sqrt(u[:, 0])
    phi = (2.0 * jnp.pi) * u[:, 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def random_in_unit_ball(key: jax.Array, n: int) -> jnp.ndarray:
    """(n, 3) points uniform inside the unit ball.

    Equal in distribution to the reference's ``random_in_unit_sphere``
    rejection loop (src/material.cuh:12-18): gaussian direction scaled by
    U^(1/3) radius.
    """
    kg, kr = jax.random.split(key)
    g = jax.random.normal(kg, (n, 3), dtype=jnp.float32)
    # Guard the pathological all-zero gaussian draw.
    norm = jnp.sqrt(jnp.maximum(jnp.sum(g * g, axis=-1), 1e-30))
    d = g / norm[:, None]
    r = jnp.cbrt(uniform(kr, (n,)))
    return d * r[:, None]
