"""Wavefront path-tracing integrators.

Two entry points, both pure functions of a threefry seed:

* ``trace`` — trace a fixed ray batch to completion (``lax.while_loop`` over
  bounces with early all-dead exit).  Direct analog of the reference
  ``color()`` loop (src/main.cu:44-87); used for tests and ad-hoc rays.

* ``render_wavefront`` — the production path: a **persistent ray pool with
  queue refill**.  The reference dedicates one CUDA thread per pixel for its
  whole sample loop (src/main.cu:107-133), which on a vector machine would
  leave most lanes dead while the deepest path finishes.  Here a fixed pool
  of R slots is kept saturated: every iteration, slots whose ray terminated
  are refilled with fresh camera rays from the (pixel x sample) queue and
  their radiance is scatter-added into the framebuffer.  Occupancy stays
  ~100% until the queue drains, so total cost is proportional to the number
  of *actual* ray segments rather than (batch x max-depth).

Randomness: one fused uniform block per iteration, derived from
``fold(key, iteration)`` — every (slot, iteration, site) triple is used at
most once, so all draws are independent without per-ray key state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.camera import Camera, rays_from_uniforms
from art_tpu.core.vecmath import T_MIN, unit_vector
from art_tpu.ops.intersect import apply_media, closest_surface
from art_tpu.ops.shade import shade
from art_tpu.scene.tables import SceneTables

# uniform-block column layout (per iteration)
_U_BALL = slice(0, 3)
_U_CHOICE = 3
_U_JITTER = slice(4, 6)
_U_LENS = slice(6, 8)
_U_TIME = 8
_U_MEDIA = 9  # columns 9.. are per-medium


def _n_uniform_cols(tables: SceneTables) -> int:
    return _U_MEDIA + max(tables.n_media, 1)


def background_color(d: jnp.ndarray, bg: jnp.ndarray, gradient: bool) -> jnp.ndarray:
    """Solid or y-gradient sky (reference src/main.cu:58-67)."""
    if not gradient:
        return jnp.broadcast_to(bg[None, :], (d.shape[0], 3))
    ud = unit_vector(d)
    t = 0.5 * (ud[:, 1] + 1.0)
    white = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    blue = jnp.asarray([0.5, 0.7, 1.0], jnp.float32)
    return (1.0 - t)[:, None] * white[None, :] + t[:, None] * blue[None, :]


def _bounce_step(tables, o, d, tm, throughput, radiance, active, U, background, gradient_bg):
    """One shared bounce: intersect -> media -> background/emission -> scatter.

    Returns (new_o, new_d, new_throughput, new_radiance, survived) where
    ``survived`` is the subset of ``active`` whose ray scattered on.
    """
    surf = closest_surface(tables, o, d, tm, T_MIN)
    rec = apply_media(tables, o, d, T_MIN, surf, U[:, _U_MEDIA:])

    bg = background_color(d, background, gradient_bg)
    miss = active & ~rec.hit
    radiance = radiance + jnp.where(miss[:, None], throughput * bg, 0.0)

    live_hit = active & rec.hit
    sc = shade(tables, d, rec, U[:, _U_BALL], U[:, _U_CHOICE])

    radiance = radiance + jnp.where(live_hit[:, None], throughput * sc.emitted, 0.0)

    survived = live_hit & sc.scattered
    throughput = jnp.where(survived[:, None], throughput * sc.attenuation, throughput)
    o = jnp.where(survived[:, None], rec.p, o)
    d = jnp.where(survived[:, None], sc.direction, d)
    return o, d, throughput, radiance, survived


# ---------------------------------------------------------------------------
# Fixed-batch tracer (tests / ad-hoc rays)
# ---------------------------------------------------------------------------


class _TraceState(NamedTuple):
    bounce: jnp.ndarray
    origin: jnp.ndarray
    direction: jnp.ndarray
    time: jnp.ndarray
    throughput: jnp.ndarray
    radiance: jnp.ndarray
    alive: jnp.ndarray
    rays_traced: jnp.ndarray


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
    ncols = _n_uniform_cols(tables)
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
        U = artrng.uniform(artrng.fold(key, 1000 + st.bounce), (R, ncols))
        o, d, throughput, radiance, survived = _bounce_step(
            tables, st.origin, st.direction, st.time,
            st.throughput, st.radiance, st.alive, U, background, gradient_bg,
        )
        return _TraceState(
            bounce=st.bounce + 1,
            origin=o,
            direction=d,
            time=st.time,
            throughput=throughput,
            radiance=radiance,
            alive=survived,
            rays_traced=st.rays_traced + jnp.sum(st.alive.astype(jnp.float32)),
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.radiance, final.rays_traced


# ---------------------------------------------------------------------------
# Persistent-wavefront renderer (the production path)
# ---------------------------------------------------------------------------


class _PoolState(NamedTuple):
    it: jnp.ndarray  # () int32 iteration counter (keys the RNG block)
    next_q: jnp.ndarray  # () int32 global queue head
    o: jnp.ndarray  # (R,3)
    d: jnp.ndarray  # (R,3)
    tm: jnp.ndarray  # (R,)
    throughput: jnp.ndarray  # (R,3)
    radiance: jnp.ndarray  # (R,3)
    bounce: jnp.ndarray  # (R,) int32
    pix: jnp.ndarray  # (R,) int32 destination row in fb
    active: jnp.ndarray  # (R,) bool
    fb: jnp.ndarray  # (P,3) radiance accumulator
    rays: jnp.ndarray  # () float32 cumulative traced segments


def render_wavefront(
    tables: SceneTables,
    cam: Camera,
    pix_offset,  # () int32 first pixel id of this tile (traced)
    spp: int,
    key: jax.Array,
    background: jnp.ndarray,
    *,
    tile_pixels: int,
    total_pixels: int,
    nx: int,
    ny: int,
    max_depth: int,
    gradient_bg: bool,
    n_slots: int,
):
    """Render tile_pixels x spp samples with a persistent R-slot ray pool.

    Refill is a *global work-stealing queue*: every iteration, dead slots
    claim the next contiguous queue elements (rank = exclusive prefix sum of
    the dead mask), so no slot can become a straggler — any free lane
    immediately picks up the next (pixel, sample) regardless of which pixel
    it belongs to.  (A per-slot strided partition was tried and rejected:
    residue classes rich in deep glass paths serialized the whole pool.)

    Returns (fb_sum (tile_pixels,3) — radiance *summed* over spp,
    rays_traced ()).
    """
    P = tile_pixels
    R = n_slots
    n_q = P * spp
    ncols = _n_uniform_cols(tables)
    # Safety bound: every queue element costs <= max_depth iterations.
    max_iters = (n_q * max_depth) // R + max_depth + 2

    state = _PoolState(
        it=jnp.int32(0),
        next_q=jnp.int32(0),
        o=jnp.zeros((R, 3), jnp.float32),
        d=jnp.zeros((R, 3), jnp.float32).at[:, 2].set(1.0),
        tm=jnp.zeros((R,), jnp.float32),
        throughput=jnp.ones((R, 3), jnp.float32),
        radiance=jnp.zeros((R, 3), jnp.float32),
        bounce=jnp.zeros((R,), jnp.int32),
        pix=jnp.zeros((R,), jnp.int32),
        active=jnp.zeros((R,), bool),
        fb=jnp.zeros((P, 3), jnp.float32),
        rays=jnp.float32(0.0),
    )

    def cond(st: _PoolState):
        return ((st.next_q < n_q) | jnp.any(st.active)) & (st.it < max_iters)

    def body(st: _PoolState) -> _PoolState:
        U = artrng.uniform(artrng.fold(key, st.it), (R, ncols))

        # ---- refill dead slots from the global queue ----
        dead = ~st.active
        dead_i = dead.astype(jnp.int32)
        rank = jnp.cumsum(dead_i) - dead_i  # exclusive prefix among dead
        q = st.next_q + rank
        take = dead & (q < n_q)
        p_row = q % P
        pixel = jnp.minimum(pix_offset + p_row, total_pixels - 1)
        i = (pixel % nx).astype(jnp.float32)
        j = (pixel // nx).astype(jnp.float32)
        s = (i + U[:, _U_JITTER][:, 0]) / nx
        t = (j + U[:, _U_JITTER][:, 1]) / ny
        o_new, d_new, tm_new = rays_from_uniforms(
            cam, s, t, U[:, _U_LENS], U[:, _U_TIME]
        )

        take3 = take[:, None]
        o = jnp.where(take3, o_new, st.o)
        d = jnp.where(take3, d_new, st.d)
        tm = jnp.where(take, tm_new, st.tm)
        throughput = jnp.where(take3, 1.0, st.throughput)
        radiance = jnp.where(take3, 0.0, st.radiance)
        bounce = jnp.where(take, 0, st.bounce)
        pix = jnp.where(take, p_row, st.pix)
        active = st.active | take
        next_q = st.next_q + jnp.sum(take.astype(jnp.int32))

        # ---- one bounce for the whole pool ----
        o2, d2, throughput, radiance, survived = _bounce_step(
            tables, o, d, tm, throughput, radiance, active, U,
            background, gradient_bg,
        )
        bounce = bounce + active.astype(jnp.int32)
        depth_ok = bounce < max_depth
        still_alive = survived & depth_ok

        # ---- flush newly-terminated rays to the framebuffer ----
        died = active & ~still_alive
        fb = st.fb.at[pix].add(jnp.where(died[:, None], radiance, 0.0))

        return _PoolState(
            it=st.it + 1,
            next_q=next_q,
            o=o2,
            d=d2,
            tm=tm,
            throughput=throughput,
            radiance=radiance,
            bounce=bounce,
            pix=pix,
            active=still_alive,
            fb=fb,
            rays=st.rays + jnp.sum(active.astype(jnp.float32)),
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.fb, final.rays, final.it
