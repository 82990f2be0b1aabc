"""Wavefront path-tracing integrator.

The reference's per-thread recursive-turned-iterative ``color()`` loop
(reference src/main.cu:44-87) becomes a single ``lax.while_loop`` advancing
a SoA wavefront {origin, direction, time, throughput, radiance, alive}:

* per bounce: batched closest-surface intersection, medium overlay, masked
  background/emission accumulation, masked per-material scatter;
* early exit when every lane is dead (the reference breaks per-thread; the
  wavefront stops when ``~alive.any()``), bounded at ``max_depth`` (50 in
  every reference driver, src/main.cu:54);
* randomness is folded per (bounce, site) so the loop body is pure.

Also returns the total number of live ray-bounce steps, the basis of the
Mrays/s metric.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.vecmath import T_MIN, unit_vector
from art_tpu.ops.intersect import apply_media, closest_surface
from art_tpu.ops.shade import shade
from art_tpu.scene.tables import SceneTables


class _TraceState(NamedTuple):
    bounce: jnp.ndarray  # () int32
    origin: jnp.ndarray  # (R,3)
    direction: jnp.ndarray  # (R,3)
    time: jnp.ndarray  # (R,)
    throughput: jnp.ndarray  # (R,3)
    radiance: jnp.ndarray  # (R,3)
    alive: jnp.ndarray  # (R,) bool
    rays_traced: jnp.ndarray  # () float32 — cumulative live lanes


def background_color(d: jnp.ndarray, bg: jnp.ndarray, gradient: bool) -> jnp.ndarray:
    """Solid or y-gradient sky (reference src/main.cu:58-67)."""
    if not gradient:
        return jnp.broadcast_to(bg[None, :], (d.shape[0], 3))
    ud = unit_vector(d)
    t = 0.5 * (ud[:, 1] + 1.0)
    white = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    blue = jnp.asarray([0.5, 0.7, 1.0], jnp.float32)
    return (1.0 - t)[:, None] * white[None, :] + t[:, None] * blue[None, :]


def trace(
    tables: SceneTables,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    times: jnp.ndarray,
    key: jax.Array,
    background: jnp.ndarray,
    gradient_bg: bool,
    max_depth: int = 50,
):
    """Trace a ray batch to completion; returns (radiance (R,3), rays_traced ())."""
    R = origins.shape[0]
    state = _TraceState(
        bounce=jnp.int32(0),
        origin=origins,
        direction=directions,
        time=times,
        throughput=jnp.ones((R, 3), jnp.float32),
        radiance=jnp.zeros((R, 3), jnp.float32),
        alive=jnp.ones((R,), bool),
        rays_traced=jnp.float32(0.0),
    )

    def cond(st: _TraceState):
        return (st.bounce < max_depth) & jnp.any(st.alive)

    def body(st: _TraceState) -> _TraceState:
        kb = artrng.fold(key, 1000 + st.bounce)

        surf = closest_surface(tables, st.origin, st.direction, st.time, T_MIN)
        rec = apply_media(tables, st.origin, st.direction, T_MIN, surf, kb)

        # miss -> add background and terminate (src/main.cu:58-67)
        bg = background_color(st.direction, background, gradient_bg)
        miss = st.alive & ~rec.hit
        radiance = st.radiance + jnp.where(miss[:, None], st.throughput * bg, 0.0)

        live_hit = st.alive & rec.hit
        sc = shade(tables, st.direction, rec, kb)

        # emission at the hit (src/main.cu:71)
        radiance = radiance + jnp.where(live_hit[:, None], st.throughput * sc.emitted, 0.0)

        # scatter or absorb (src/main.cu:74-83)
        next_alive = live_hit & sc.scattered
        throughput = jnp.where(
            next_alive[:, None], st.throughput * sc.attenuation, st.throughput
        )
        origin = jnp.where(next_alive[:, None], rec.p, st.origin)
        direction = jnp.where(next_alive[:, None], sc.direction, st.direction)

        return _TraceState(
            bounce=st.bounce + 1,
            origin=origin,
            direction=direction,
            time=st.time,
            throughput=throughput,
            radiance=radiance,
            alive=next_alive,
            rays_traced=st.rays_traced + jnp.sum(st.alive.astype(jnp.float32)),
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.radiance, final.rays_traced
