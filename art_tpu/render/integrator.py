"""Wavefront path-tracing integrators (component-planar hot path).

Two entry points, both pure functions of a threefry seed:

* ``trace`` — trace a fixed ray batch to completion (``lax.while_loop`` over
  bounces with early all-dead exit).  Direct analog of the reference
  ``color()`` loop (src/main.cu:44-87); used for tests and ad-hoc rays.

* ``render_wavefront`` — the production path: a **persistent ray pool with
  global work-stealing queue refill**.  The reference dedicates one CUDA
  thread per pixel for its whole sample loop (src/main.cu:107-133), which
  on a vector machine would leave most lanes dead while the deepest path
  finishes.  Here a fixed pool of R slots is kept saturated: every
  iteration, slots whose ray terminated claim the next (pixel, sample)
  queue elements (rank = prefix sum of the dead mask — no slot can become a
  straggler) and dead-ray radiance is scatter-added into the framebuffer.

All per-ray vector state lives as component planes ((R,) per component):
TPU maps the last axis onto 128 lanes, so (R, 3) state would waste 125/128
lanes of every elementwise op; planes keep the VPU and HBM at full width
and match the Pallas kernel layout exactly.

Randomness: one fused uniform block per iteration, derived from
``fold(key, iteration)`` — every (slot, iteration, site) triple is used at
most once, so all draws are independent without per-ray key state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.camera import Camera, rays_from_uniforms_p
from art_tpu.core.vecmath import T_MIN, p_mul, p_scale, p_unstack, p_where
from art_tpu.ops.intersect import apply_media_p, closest_surface_p
from art_tpu.ops.shade import shade_p
from art_tpu.scene.tables import SceneTables

# uniform-block column layout (per iteration)
_U_BALL = slice(0, 3)
_U_CHOICE = 3
_U_JITTER0 = 4
_U_JITTER1 = 5
_U_LENS0 = 6
_U_LENS1 = 7
_U_TIME = 8
_U_MEDIA = 9  # columns 9.. are per-medium


def _n_uniform_cols(tables: SceneTables) -> int:
    return _U_MEDIA + max(tables.n_media, 1)


def background_color_p(d, bg: jnp.ndarray, gradient: bool):
    """Solid or y-gradient sky (reference src/main.cu:58-67), planar."""
    shape = d[0].shape
    if not gradient:
        return tuple(jnp.broadcast_to(bg[c], shape) for c in range(3))
    inv_len = 1.0 / jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    t = 0.5 * (d[1] * inv_len + 1.0)
    # (1-t)*white + t*blue
    return (1.0 - 0.5 * t, 1.0 - 0.3 * t, jnp.broadcast_to(jnp.float32(1.0), shape))


def background_color(d: jnp.ndarray, bg: jnp.ndarray, gradient: bool) -> jnp.ndarray:
    return jnp.stack(background_color_p(p_unstack(d), bg, gradient), axis=-1)


def _fused_refill_ok(R: int) -> bool:
    """Use the fused Pallas refill kernel on TPU backends."""
    import os

    if os.environ.get("ART_TPU_NO_FUSED_REFILL"):
        return False
    from art_tpu.core.platform import tpu_paths
    from art_tpu.ops.refill_kernel import RAY_BLOCK

    return tpu_paths() and R % RAY_BLOCK == 0


# Debug ablation flags, read once at import (never inside traced bodies).
_DBG = __import__("os").environ.get("ART_TPU_DBG", "")
_NO_FLUSH = bool(__import__("os").environ.get("ART_TPU_NO_FLUSH"))
# Framebuffer flush strategy:
# auto (pallas on TPU, aos elsewhere) | aos | aos4 | planar | planar_drop |
# drop | subslot | matmul | pallas.  Measured on v5e (docs/PERF_NOTES.md
# r2): the MXU one-hot matmul accumulate beats the colliding scatter-add by
# ~0.5 ms/iter (+28% throughput); the Pallas kernel (ops/flush_kernel.py)
# additionally builds the one-hot operands in VMEM instead of streaming
# ~230 MB/iter of them through HBM.
_FLUSH_ENV = __import__("os").environ.get("ART_TPU_FLUSH", "auto")
_NO_KERNEL_RNG = bool(__import__("os").environ.get("ART_TPU_NO_KERNEL_RNG"))
_SEAM_FLUSH = bool(__import__("os").environ.get("ART_TPU_SEAM_FLUSH"))
# Adaptive small flush window (opt-in, rows; 0 = off): the static window
# n_hi_win is sized for the WORST-case live-pixel span (a ray surviving all
# max_depth bounces while the queue advances R/iter), but the typical span
# is ~10x smaller (queue advances by deaths/iter ~0.4R, and bounce-10+
# survivors are <1% of the pool).  The MXU flush cost is linear in window
# rows, so flush through a small window whenever this iteration's died
# pixels actually fit it, falling back to the proven n_hi_win window (an
# exact lax.cond — never an approximation) otherwise.
# Default ON at 48 rows since round 2's measured A/B wins (bouncing
# 117.07 vs 113.11, final 63.31 vs 62.56 Mrays/s; on-chip parity
# corr=1.0 at win=24, docs/logs/flushwin_rest_r2.log,
# parity_onchip_r2.log).  ART_TPU_FLUSH_WIN=0 disables.
_FLUSH_WIN = int(__import__("os").environ.get("ART_TPU_FLUSH_WIN", "48"))
# Instrumentation: histogram the tail-cluster needy fraction per pool
# iteration (ART_TPU_STATS_NEEDY=1) — sizes the compact-sphere capacity
# knob (ART_TPU_SPH_K) against the real ray population instead of
# guessing.  Zero cost when unset (static python gate).
_STATS_NEEDY = bool(__import__("os").environ.get("ART_TPU_STATS_NEEDY"))
# Short-path megakernel (ops/sp_kernel.py): refill+intersect+shade fused
# into one Pallas launch for builder-gated small static scenes
# (tables.sp_consts).  ART_TPU_NO_SP=1 falls back to the staged path;
# ART_TPU_SP=1 forces SP on for dielectric scenes too (measured loss at
# defaults: three_spheres 322 SP vs 351 staged Mrays/s, queue_r3c.log —
# the always-evaluated dielectric lane math outweighs the glue saving).
_NO_SP = bool(__import__("os").environ.get("ART_TPU_NO_SP"))
_FORCE_SP = bool(__import__("os").environ.get("ART_TPU_SP"))
# Fused shade+flush kernel (ops/shade_kernel.py): the staged path's whole
# bounce tail — scatter math, throughput/radiance update, death
# bookkeeping and the fb flush of this iteration's died rays — in one
# Pallas launch.  Default ON since r3 (measured: bouncing 119.40 vs
# 117.90, original 61.48 vs 60.37, earth 91.40 vs 88.22 Mrays/s, wash on
# final/cornell_smoke; docs/logs/queue_r3e.log); ART_TPU_NO_SHADE_KERNEL=1
# reverts to the staged jnp bounce tail.
_SHADE_K = not __import__("os").environ.get("ART_TPU_NO_SHADE_KERNEL")
# Baked-consts shade kernel (tables.shade_consts): material/texture
# parameters become compile-time immediates keyed by the material-id
# plane — the per-iteration one-hot mat/tex row fetches, the texture
# wrapper-resolution refetches and 9 of the kernel's input planes
# disappear; only special leaf values (image texels via the compacted
# fetch, turbulence via the perlin kernel) are still computed outside
# (ops/texture_eval.eval_special_p).  ART_TPU_NO_BAKED_SHADE=1 reverts
# to the plane-fed fetch path.
_BAKED_SHADE = not __import__("os").environ.get("ART_TPU_NO_BAKED_SHADE")


def _flush_mode(R: int) -> str:
    """Resolved at trace time so importing this module never initializes
    the JAX backend (dryrun_multichip overrides the platform after import)."""
    if _FLUSH_ENV == "auto":
        from art_tpu.core.platform import tpu_paths

        if not tpu_paths():
            return "aos"
        from art_tpu.ops.flush_kernel import RAY_BLOCK

        return "pallas" if R % RAY_BLOCK == 0 else "matmul"
    return _FLUSH_ENV


_SUBSLOTS = 8
# numpy, not jnp: a module-level device array would initialize the backend
# at import time
_SLOT_IOTA = __import__("numpy").arange(1 << 20, dtype=__import__("numpy").int32)


def _bounce_step(tables, o, d, tm, throughput, radiance, active,
                 u_ball, u_choice, u_media, background, gradient_bg):
    """One shared bounce: intersect -> media -> background/emission -> scatter.

    All vector quantities are 3-tuples of (R,) planes; ``u_ball`` is a
    3-tuple of uniform planes, ``u_choice`` one plane, ``u_media`` an
    indexable block of per-medium planes.  Returns
    (new_o, new_d, new_throughput, new_radiance, survived)."""
    if "fake_intersect" in _DBG:  # perf-debug: dependency-preserving stub
        from art_tpu.ops.intersect import HitRecordP
        from art_tpu.core.vecmath import p_ray_at, p_unit

        t5 = jnp.abs(d[0]) + 5.0
        rec = HitRecordP(
            hit=active,
            t=t5,
            p=p_ray_at(o, d, t5),
            normal=p_unit((-d[0], -d[1], -d[2])),
            u=tm * 0.0,
            v=tm * 0.0,
            mat=jnp.zeros_like(active, dtype=jnp.int32),
        )
    else:
        surf = closest_surface_p(tables, o, d, tm, T_MIN)
        rec = apply_media_p(tables, o, d, T_MIN, surf, u_media, time=tm)

    bg = background_color_p(d, background, gradient_bg)
    miss = active & ~rec.hit
    radiance = tuple(
        radiance[c] + jnp.where(miss, throughput[c] * bg[c], 0.0) for c in range(3)
    )

    live_hit = active & rec.hit
    if "fake_shade" in _DBG:  # perf-debug: dependency-preserving stub
        from art_tpu.core.vecmath import p_reflect
        from art_tpu.ops.shade import ScatterResultP

        nd = p_reflect(d, rec.normal)
        z = jnp.zeros_like(rec.t)
        sc = ScatterResultP(
            emitted=(z, z, z),
            attenuation=(z + 0.9, z + 0.9, z + 0.9),
            direction=nd,
            scattered=rec.hit & (u_choice < 0.7),
        )
    else:
        sc = shade_p(tables, d, rec, u_ball, u_choice, valid=live_hit)

    radiance = tuple(
        radiance[c] + jnp.where(live_hit, throughput[c] * sc.emitted[c], 0.0)
        for c in range(3)
    )

    survived = live_hit & sc.scattered
    throughput = p_where(survived, p_mul(throughput, sc.attenuation), throughput)
    o = p_where(survived, rec.p, o)
    d = p_where(survived, sc.direction, d)
    return o, d, throughput, radiance, survived


# ---------------------------------------------------------------------------
# Fixed-batch tracer (tests / ad-hoc rays)
# ---------------------------------------------------------------------------


class _TraceState(NamedTuple):
    bounce: jnp.ndarray
    origin: tuple
    direction: tuple
    time: jnp.ndarray
    throughput: tuple
    radiance: tuple
    alive: jnp.ndarray
    rays_traced: jnp.ndarray


def trace(
    tables: SceneTables,
    origins: jnp.ndarray,  # (R,3)
    directions: jnp.ndarray,  # (R,3)
    times: jnp.ndarray,
    key: jax.Array,
    background: jnp.ndarray,
    gradient_bg: bool,
    max_depth: int = 50,
):
    """Trace a ray batch to completion; returns (radiance (R,3), rays_traced ())."""
    R = origins.shape[0]
    ncols = _n_uniform_cols(tables)
    ones = jnp.ones((R,), jnp.float32)
    zeros = jnp.zeros((R,), jnp.float32)
    state = _TraceState(
        bounce=jnp.int32(0),
        origin=p_unstack(origins),
        direction=p_unstack(directions),
        time=times,
        throughput=(ones, ones, ones),
        radiance=(zeros, zeros, zeros),
        alive=jnp.ones((R,), bool),
        rays_traced=jnp.float32(0.0),
    )

    def cond(st: _TraceState):
        return (st.bounce < max_depth) & jnp.any(st.alive)

    def body(st: _TraceState) -> _TraceState:
        U = artrng.uniform(artrng.fold(key, 1000 + st.bounce), (ncols, R))
        o, d, throughput, radiance, survived = _bounce_step(
            tables, st.origin, st.direction, st.time,
            st.throughput, st.radiance, st.alive,
            (U[0], U[1], U[2]), U[_U_CHOICE], U[_U_MEDIA:],
            background, gradient_bg,
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
    return jnp.stack(final.radiance, axis=-1), final.rays_traced


# ---------------------------------------------------------------------------
# Persistent-wavefront renderer (the production path)
# ---------------------------------------------------------------------------


class _PoolState(NamedTuple):
    it: jnp.ndarray  # () int32 iteration counter (keys the RNG block)
    next_q: jnp.ndarray  # () int32 global queue head
    fmin: jnp.ndarray  # () int32 min pixel row among last bounce's died
    # (seam-flush window base; 1<<30 when nothing died)
    o: tuple  # 3 x (R,)
    d: tuple  # 3 x (R,)
    tm: jnp.ndarray  # (R,)
    throughput: tuple  # 3 x (R,)
    radiance: tuple  # 3 x (R,)
    bounce: jnp.ndarray  # (R,) int32
    pix: jnp.ndarray  # (R,) int32 destination row in fb
    active: jnp.ndarray  # (R,) bool
    fb: jnp.ndarray  # (P,3) radiance accumulator
    rays: jnp.ndarray  # () float32 cumulative traced segments
    # (19,) int32 instrumentation accumulator (ART_TPU_STATS_NEEDY):
    # [0:16] histogram of needy-fraction buckets (needy*16//R),
    # [16] total needy, [17] total active, [18] iterations whose
    # UNMASKED needy count <= SPH_K (the compact-branch ratio).
    # All-zeros when off.
    aux: jnp.ndarray


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

    Returns (fb_sum (tile_pixels,3) — radiance *summed* over spp,
    rays_traced (), iterations ())."""
    P = tile_pixels
    R = n_slots
    n_q = P * spp
    ncols = _n_uniform_cols(tables)
    # Safety bound: every queue element costs <= max_depth iterations.
    max_iters = (n_q * max_depth) // R + max_depth + 2
    _FLUSH = _flush_mode(R)
    # planar framebuffer rows for the pallas/matmul one-hot flush; padded to
    # a sublane multiple so the kernel block shape is legal
    n_hi_pallas = -(-(-(-P // 128)) // 8) * 8
    # Windowed-flush row count: a live ray survives <= max_depth
    # iterations and the queue head advances <= R per iteration, so live
    # (hence dying) pixels span <= R*max_depth/spp + 1 under sample-major
    # order; +8 rows margin for the min-row alignment.
    n_hi_win = min(
        n_hi_pallas,
        (-(-(R * max_depth // max(spp, 1) // 128 + 1) // 8) + 1) * 8,
    )

    ones = jnp.ones((R,), jnp.float32)
    zeros = jnp.zeros((R,), jnp.float32)
    state = _PoolState(
        it=jnp.int32(0),
        next_q=jnp.int32(0),
        fmin=jnp.int32(1 << 30),
        o=(zeros, zeros, zeros),
        d=(zeros, zeros, ones),
        tm=zeros,
        throughput=(ones, ones, ones),
        radiance=(zeros, zeros, zeros),
        bounce=jnp.zeros((R,), jnp.int32),
        pix=jnp.zeros((R,), jnp.int32),
        active=jnp.zeros((R,), bool),
        fb=(
            tuple(jnp.zeros((P,), jnp.float32) for _ in range(3))
            if _FLUSH.startswith("planar")
            else jnp.zeros((n_hi_pallas, 384), jnp.float32)
            if _FLUSH == "pallas"
            else jnp.zeros((-(-P // 128), 384), jnp.float32)
            if _FLUSH == "matmul"
            else jnp.zeros(
                (P * _SUBSLOTS, 3) if _FLUSH == "subslot"
                else (P, 4 if _FLUSH == "aos4" else 3),
                jnp.float32,
            )
        ),
        rays=jnp.float32(0.0),
        aux=jnp.zeros((19,), jnp.int32),
    )

    def cond(st: _PoolState):
        return ((st.next_q < n_q) | jnp.any(st.active)) & (st.it < max_iters)

    use_fused_refill = _fused_refill_ok(R)
    use_kernel_rng = use_fused_refill and not _NO_KERNEL_RNG
    # Seam-merged flush (opt-in, ART_TPU_SEAM_FLUSH=1): the framebuffer
    # flush of iteration i happens at the top of iteration i+1 inside the
    # refill kernel (ops/refill_kernel.py), saving one pallas launch + the
    # XLA window glue per iteration.  Measured on v5e it LOSES ~1-3%
    # (quads 256 vs 263, bouncing 110.8 vs 112.0 Mrays/s): the refill
    # kernel's extra fb window in/out stream and one-hot VMEM scratch cost
    # more than the launch it saves (docs/PERF_NOTES.md).  Kept off.
    use_seam = (
        use_kernel_rng
        and _FLUSH == "pallas"
        and not _NO_FLUSH
        and _SEAM_FLUSH
    )
    # Short-path megakernel: the whole refill+intersect+shade stage in one
    # Pallas launch (ops/sp_kernel.py).  Excluded under ablation stubs
    # (they instrument the staged path) and the seam-flush experiment.
    use_sp = (
        use_kernel_rng
        and tables.sp_consts is not None
        and not _NO_SP
        and not _DBG
        and not use_seam
        # Dielectric scenes measured SLOWER fused (three_spheres 322 vs
        # 351 Mrays/s, docs/logs/queue_r3c.log): every lane pays the
        # refract/Schlick ALU chain each iteration.  Keep them staged
        # unless explicitly forced for measurement.
        and (_FORCE_SP
             or not any(m[0] == 2 for m in tables.sp_consts[2]))
    )
    if use_sp:
        from art_tpu.ops.sp_kernel import sp_step_flush_rng, sp_step_rng
    # Fully-fused form: the fb flush of this iteration's died rays merged
    # into the SP kernel (their radiance is still in-register — no extra
    # plane stream, unlike the seam experiment).  The window base comes
    # from the min LIVE pixel (<= min died pixel), covered by the same
    # n_hi_win band invariant as the standalone windowed flush.
    use_sp_flush = use_sp and _FLUSH == "pallas" and not _NO_FLUSH
    # Fused shade+flush kernel for the staged (generic-scene) path: the
    # intersection kernels and parameter fetches stay staged; the bounce
    # tail fuses into one launch with the died-ray flush in-register
    # (ops/shade_kernel.py).  Excluded under ablation stubs (they
    # instrument the jnp composition) and the seam experiment.
    use_shade_kernel = (
        use_fused_refill
        and _FLUSH == "pallas"
        and not _NO_FLUSH
        and not _DBG
        and not use_seam
        and _SHADE_K
    )
    if use_shade_kernel:
        from art_tpu.ops.shade import shade_params_p
        from art_tpu.ops.shade_kernel import shade_flush
    if use_fused_refill:
        from art_tpu.ops.refill_kernel import (
            fused_refill,
            fused_refill_flush_rng,
            fused_refill_rng,
            pack_camera,
        )

        cam_vec = pack_camera(cam)

    def body(st: _PoolState) -> _PoolState:
        if use_sp:
            # ---- whole refill+intersect+shade in ONE Pallas launch ----
            # (ops/sp_kernel.py; builder-gated small static scenes)
            planes = dict(
                ox=st.o[0], oy=st.o[1], oz=st.o[2],
                dx=st.d[0], dy=st.d[1], dz=st.d[2], tm=st.tm,
                t0=st.throughput[0], t1=st.throughput[1], t2=st.throughput[2],
                r0=st.radiance[0], r1=st.radiance[1], r2=st.radiance[2],
                bounce=st.bounce, pix=st.pix,
                act=st.active.astype(jnp.int32),
            )
            scal = jnp.stack([
                st.next_q // spp, st.next_q % spp,
                jnp.int32(spp), jnp.int32(P),
                jnp.asarray(pix_offset, jnp.int32), jnp.int32(total_pixels),
                jnp.int32(nx), jnp.int32(ny),
            ])
            key2 = jax.random.key_data(
                artrng.fold(key, st.it)
            ).astype(jnp.int32)
            if use_sp_flush:
                # window base from the min LIVE pixel: every ray that can
                # die this iteration is live after refill, and refilled
                # rows start at p_base = next_q // spp, so
                # min(live pix, p_base) lower-bounds every died pixel and
                # the live band fits n_hi_win rows (same invariant as the
                # standalone windowed flush above).
                minpix = jnp.minimum(
                    jnp.min(jnp.where(st.active, st.pix, jnp.int32(1 << 30))),
                    st.next_q // spp,
                )
                base = jnp.clip(
                    jax.lax.shift_right_logical(minpix, 7),
                    0, n_hi_pallas - n_hi_win,
                )
                window = jax.lax.dynamic_slice(
                    st.fb, (base, 0), (n_hi_win, 384)
                )
                new, take_count, died_sp, window2 = sp_step_flush_rng(
                    planes, key2, cam_vec, scal, background, window, base,
                    consts=tables.sp_consts,
                    n_media=max(tables.n_media, 1),
                    max_depth=max_depth, gradient=gradient_bg,
                )
                fb_sp = jax.lax.dynamic_update_slice(
                    st.fb, window2, (base, 0)
                )
            else:
                new, take_count, died_sp = sp_step_rng(
                    planes, key2, cam_vec, scal, background,
                    consts=tables.sp_consts,
                    n_media=max(tables.n_media, 1),
                    max_depth=max_depth, gradient=gradient_bg,
                )
            o2 = (new["ox"], new["oy"], new["oz"])
            d2 = (new["dx"], new["dy"], new["dz"])
            tm = new["tm"]
            throughput = (new["t0"], new["t1"], new["t2"])
            radiance = (new["r0"], new["r1"], new["r2"])
            bounce = new["bounce"]
            pix = new["pix"]
            still_alive = new["act"] != 0
            active = still_alive | died_sp
            next_q = st.next_q + take_count
            aux = st.aux
        else:
            if use_fused_refill:
                # ---- whole refill stage in one Pallas launch ----
                planes = dict(
                    ox=st.o[0], oy=st.o[1], oz=st.o[2],
                    dx=st.d[0], dy=st.d[1], dz=st.d[2], tm=st.tm,
                    t0=st.throughput[0], t1=st.throughput[1], t2=st.throughput[2],
                    r0=st.radiance[0], r1=st.radiance[1], r2=st.radiance[2],
                    bounce=st.bounce, pix=st.pix,
                    act=st.active.astype(jnp.int32),
                )
                # sample-major decomposition: [p_base, s_base] = divmod(q, spp)
                scal = jnp.stack([
                    st.next_q // spp, st.next_q % spp,
                    jnp.int32(spp), jnp.int32(P),
                    jnp.asarray(pix_offset, jnp.int32), jnp.int32(total_pixels),
                    jnp.int32(nx), jnp.int32(ny),
                ])
                if use_kernel_rng:
                    # every uniform this iteration needs comes from the TPU
                    # hardware PRNG inside the refill kernel — no XLA threefry
                    key2 = jax.random.key_data(
                        artrng.fold(key, st.it)
                    ).astype(jnp.int32)
                    if use_seam:
                        base = jnp.clip(
                            jax.lax.shift_right_logical(st.fmin, 7),
                            0, n_hi_pallas - n_hi_win,
                        )
                        window = jax.lax.dynamic_slice(
                            st.fb, (base, 0), (n_hi_win, 384)
                        )
                        (new, take_count, u_ball, u_choice, u_media,
                         window2) = fused_refill_flush_rng(
                            planes, key2, cam_vec, scal, window, base,
                            n_media=max(tables.n_media, 1),
                        )
                        fb_flushed = jax.lax.dynamic_update_slice(
                            st.fb, window2, (base, 0)
                        )
                    else:
                        (new, take_count, u_ball, u_choice,
                         u_media) = fused_refill_rng(
                            planes, key2, cam_vec, scal,
                            n_media=max(tables.n_media, 1),
                        )
                else:
                    U = artrng.uniform(artrng.fold(key, st.it), (ncols, R))
                    u_ball = (U[0], U[1], U[2])
                    u_choice = U[_U_CHOICE]
                    u_media = U[_U_MEDIA:]
                    new, take_count = fused_refill(
                        planes,
                        (U[_U_JITTER0], U[_U_JITTER1], U[_U_LENS0], U[_U_LENS1],
                         U[_U_TIME]),
                        cam_vec, scal,
                    )
                o = (new["ox"], new["oy"], new["oz"])
                d = (new["dx"], new["dy"], new["dz"])
                tm = new["tm"]
                throughput = (new["t0"], new["t1"], new["t2"])
                radiance = (new["r0"], new["r1"], new["r2"])
                bounce = new["bounce"]
                pix = new["pix"]
                active = new["act"] != 0
                next_q = st.next_q + take_count
            else:
                # ---- refill dead slots from the global queue (jnp path) ----
                U = artrng.uniform(artrng.fold(key, st.it), (ncols, R))
                u_ball = (U[0], U[1], U[2])
                u_choice = U[_U_CHOICE]
                u_media = U[_U_MEDIA:]
                dead = ~st.active
                dead_i = dead.astype(jnp.int32)
                rank = jnp.cumsum(dead_i) - dead_i  # exclusive prefix among dead
                q = st.next_q + rank
                take = dead & (q < n_q)
                # sample-major: spp consecutive queue ids share a pixel, so
                # live pixels form a monotone band (windowed-flush invariant)
                p_row = q // spp
                pixel = jnp.minimum(pix_offset + p_row, total_pixels - 1)
                i = (pixel % nx).astype(jnp.float32)
                j = (pixel // nx).astype(jnp.float32)
                s = (i + U[_U_JITTER0]) / nx
                t = (j + U[_U_JITTER1]) / ny
                o_new, d_new, tm_new = rays_from_uniforms_p(
                    cam, s, t, U[_U_LENS0], U[_U_LENS1], U[_U_TIME]
                )

                o = p_where(take, o_new, st.o)
                d = p_where(take, d_new, st.d)
                tm = jnp.where(take, tm_new, st.tm)
                throughput = p_where(take, (ones, ones, ones), st.throughput)
                radiance = p_where(take, (zeros, zeros, zeros), st.radiance)
                bounce = jnp.where(take, 0, st.bounce)
                pix = jnp.where(take, p_row, st.pix)
                active = st.active | take
                next_q = st.next_q + jnp.sum(take.astype(jnp.int32))

            if _STATS_NEEDY and tables.sph_tail_box:
                from art_tpu.ops.compact_sphere import SPH_K, tail_box_needy

                needy_raw = tail_box_needy(tables.sph_tail_box, o, d, 1e-3)
                needy = needy_raw & active
                ncnt = jnp.sum(needy.astype(jnp.int32))
                bucket = jnp.clip((ncnt * 16) // R, 0, 15)
                aux = st.aux.at[bucket].add(1)
                aux = aux.at[16].add(ncnt)
                aux = aux.at[17].add(jnp.sum(active.astype(jnp.int32)))
                # exact compact-branch ratio: the production predicate is
                # the UNMASKED needy count (stale dead-lane rays included)
                raw_cnt = jnp.sum(needy_raw.astype(jnp.int32))
                aux = aux.at[18].add((raw_cnt <= SPH_K).astype(jnp.int32))
            else:
                aux = st.aux

            if use_shade_kernel:
                # ---- bounce tail in ONE Pallas launch ----
                # (ops/shade_kernel.py: scatter + integrate + flush; the
                # intersection stays staged; parameter fetches stay
                # staged only when the scene has no baked shade_consts)
                surf = closest_surface_p(tables, o, d, tm, T_MIN)
                rec = apply_media_p(
                    tables, o, d, T_MIN, surf, u_media, time=tm
                )
                state_pl = dict(
                    ox=o[0], oy=o[1], oz=o[2],
                    dx=d[0], dy=d[1], dz=d[2],
                    t0=throughput[0], t1=throughput[1], t2=throughput[2],
                    r0=radiance[0], r1=radiance[1], r2=radiance[2],
                    bounce=bounce, pix=pix,
                    act=active.astype(jnp.int32),
                )
                shade_consts = (
                    tables.shade_consts if _BAKED_SHADE else None
                )
                rec_common = dict(
                    px=rec.p[0], py=rec.p[1], pz=rec.p[2],
                    nx=rec.normal[0], ny=rec.normal[1], nz=rec.normal[2],
                    ub0=u_ball[0], ub1=u_ball[1], ub2=u_ball[2],
                    uch=u_choice,
                )
                if shade_consts is not None:
                    rec_pl = dict(
                        rec_common, mat=rec.mat.astype(jnp.float32)
                    )
                    if shade_consts[1]:
                        from art_tpu.ops.texture_eval import eval_special_p

                        sp = eval_special_p(
                            tables, shade_consts[1], rec.mat,
                            rec.u, rec.v, rec.p,
                            valid=rec.hit & active,
                        )
                        rec_pl.update(sp0=sp[0], sp1=sp[1], sp2=sp[2])
                else:
                    mtype_f, fuzz_pl, refidx_pl, malb_pl, texv_pl = (
                        shade_params_p(tables, rec, valid=rec.hit & active)
                    )
                    rec_pl = dict(
                        rec_common,
                        mtype=mtype_f, fuzz=fuzz_pl, refidx=refidx_pl,
                        ma0=malb_pl[0], ma1=malb_pl[1], ma2=malb_pl[2],
                        tx0=texv_pl[0], tx1=texv_pl[1], tx2=texv_pl[2],
                    )
                # Window base from the min LIVE pixel: every ray that can
                # die this iteration is active now, so min(active pix)
                # lower-bounds every died pixel (same n_hi_win band
                # invariant as the standalone windowed flush below).
                minpix = jnp.min(
                    jnp.where(active, pix, jnp.int32(1 << 30))
                )

                def _run_tail(fb0, b, rows_w):
                    window = jax.lax.dynamic_slice(
                        fb0, (b, 0), (rows_w, 384)
                    )
                    new, died_k, window2 = shade_flush(
                        state_pl, rec.hit, rec_pl, background, window, b,
                        max_depth=max_depth, gradient=gradient_bg,
                        consts=shade_consts,
                    )
                    fbn = jax.lax.dynamic_update_slice(
                        fb0, window2, (b, 0)
                    )
                    return new, died_k, fbn

                base = jnp.clip(
                    jax.lax.shift_right_logical(minpix, 7),
                    0, n_hi_pallas - n_hi_win,
                )
                n_win2 = (_FLUSH_WIN // 8) * 8
                if 0 < n_win2 < n_hi_win:
                    # adaptive small window: exact whenever every ACTIVE
                    # pixel row fits it (a superset of the died rows)
                    base2 = jnp.clip(
                        jax.lax.shift_right_logical(minpix, 7),
                        0, n_hi_pallas - n_win2,
                    )
                    maxrow = jax.lax.shift_right_logical(
                        jnp.max(jnp.where(active, pix, jnp.int32(0))), 7
                    )
                    fits = maxrow < base2 + n_win2
                    new, died_k, fb_shade = jax.lax.cond(
                        fits,
                        lambda fb0: _run_tail(fb0, base2, n_win2),
                        lambda fb0: _run_tail(fb0, base, n_hi_win),
                        st.fb,
                    )
                else:
                    new, died_k, fb_shade = _run_tail(
                        st.fb, base, n_hi_win
                    )
                o2 = (new["ox"], new["oy"], new["oz"])
                d2 = (new["dx"], new["dy"], new["dz"])
                throughput = (new["t0"], new["t1"], new["t2"])
                radiance = (new["r0"], new["r1"], new["r2"])
                bounce = new["bounce"]
                still_alive = new["act"] != 0
            else:
                # ---- one bounce for the whole pool ----
                o2, d2, throughput, radiance, survived = _bounce_step(
                    tables, o, d, tm, throughput, radiance, active,
                    u_ball, u_choice, u_media, background, gradient_bg,
                )
                bounce = bounce + active.astype(jnp.int32)
                depth_ok = bounce < max_depth
                still_alive = survived & depth_ok

        # ---- flush newly-terminated rays to the framebuffer ----
        died = active & ~still_alive
        if use_sp_flush:
            fb = fb_sp  # flushed inside the SP kernel this iteration
        elif not use_sp and use_shade_kernel:
            fb = fb_shade  # flushed inside the shade kernel
        elif use_seam:
            # flushed at the top of the NEXT iteration inside the refill
            # kernel; carry the window base for it
            fb = fb_flushed
            fmin = jnp.min(jnp.where(died, pix, jnp.int32(1 << 30)))
        elif _NO_FLUSH:  # perf-debug only: wrong image
            fb = jax.tree_util.tree_map(
                lambda f: f.reshape(-1).at[0].add(
                    jnp.sum(jnp.where(died, radiance[0], 0.0))
                ).reshape(f.shape),
                st.fb,
            )
        elif _FLUSH == "planar":
            fb = tuple(
                st.fb[c].at[pix].add(jnp.where(died, radiance[c], 0.0))
                for c in range(3)
            )
        elif _FLUSH == "planar_drop":
            pix_w = jnp.where(died, pix, P)
            fb = tuple(
                st.fb[c].at[pix_w].add(radiance[c], mode="drop")
                for c in range(3)
            )
        elif _FLUSH == "pallas":
            from art_tpu.ops.flush_kernel import flush_accumulate

            from art_tpu.core.platform import tpu_paths

            interp = not tpu_paths()
            if n_hi_win < n_hi_pallas:
                # Windowed flush: the MXU one-hot accumulate costs
                # n_hi*384*R MACs, but sample-major queue order bounds the
                # live-pixel band by R*max_depth/spp pixels — flush only
                # that window of fb rows and splice it back.
                minpix = jnp.min(jnp.where(died, pix, jnp.int32(1 << 30)))
                base = jnp.clip(
                    jax.lax.shift_right_logical(minpix, 7),
                    0, n_hi_pallas - n_hi_win,
                )

                def _win_flush(fb0, b, rows):
                    window = jax.lax.dynamic_slice(fb0, (b, 0), (rows, 384))
                    slab = flush_accumulate(
                        pix, died, radiance, window, base=b, interpret=interp
                    )
                    return jax.lax.dynamic_update_slice(fb0, slab, (b, 0))

                n_win2 = (_FLUSH_WIN // 8) * 8
                if 0 < n_win2 < n_hi_win:
                    # adaptive small window: exact whenever this
                    # iteration's died rows fit it (no-died iterations
                    # vacuously fit: maxrow 0 < base2 + n_win2 since
                    # base2 >= 0 and n_win2 >= 8)
                    base2 = jnp.clip(
                        jax.lax.shift_right_logical(minpix, 7),
                        0, n_hi_pallas - n_win2,
                    )
                    maxrow = jax.lax.shift_right_logical(
                        jnp.max(jnp.where(died, pix, jnp.int32(0))), 7
                    )
                    fits = maxrow < base2 + n_win2
                    fb = jax.lax.cond(
                        fits,
                        lambda fb0: _win_flush(fb0, base2, n_win2),
                        lambda fb0: _win_flush(fb0, base, n_hi_win),
                        st.fb,
                    )
                else:
                    fb = _win_flush(st.fb, base, n_hi_win)
            else:
                fb = flush_accumulate(
                    pix, died, radiance, st.fb, interpret=interp
                )
        elif _FLUSH == "matmul":
            # MXU flush: fb[hi, c*128+lo] += sum_r onehot_hi[r] * W[r]
            # with W = onehot_lo * radiance — replaces the colliding
            # scatter-add (cost ~ target size) with one bf16 matmul whose
            # f32 accumulation is exact; the bf16 rounding of each died
            # sample (~0.4% relative) is far below Monte-Carlo noise.
            n_hi = st.fb.shape[0]
            hi = pix // 128
            lo = pix % 128
            lanes = _SLOT_IOTA[:128]
            lo_oh = lo[:, None] == lanes[None, :]
            W = jnp.concatenate(
                [
                    jnp.where(
                        lo_oh & died[:, None], radiance[c][:, None], 0.0
                    )
                    for c in range(3)
                ],
                axis=1,
            ).astype(jnp.bfloat16)  # (R, 384)
            oh_hi = (
                hi[:, None] == _SLOT_IOTA[:n_hi][None, :]
            ).astype(jnp.bfloat16)  # (R, n_hi)
            fb = st.fb + jax.lax.dot_general(
                oh_hi, W,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif _FLUSH == "subslot":
            # collision-light: K sub-accumulators per pixel keyed by
            # slot % K — two in-flight samples of one pixel collide only
            # when their slots are congruent mod K
            flush = jnp.stack(
                [jnp.where(died, radiance[c], 0.0) for c in range(3)],
                axis=-1,
            )
            idx = pix * _SUBSLOTS + (_SLOT_IOTA[: pix.shape[0]] & (_SUBSLOTS - 1))
            fb = st.fb.at[idx].add(flush)
        elif _FLUSH == "aos4":
            # 16-byte-aligned rows: pad the payload to 4 lanes
            flush = jnp.stack(
                [jnp.where(died, radiance[c], 0.0) for c in range(3)]
                + [jnp.zeros_like(radiance[0])],
                axis=-1,
            )
            fb = st.fb.at[pix].add(flush)
        elif _FLUSH == "drop":
            # non-died lanes write out of range and are dropped: fewer
            # effective writes and no where-masking of the payload
            pix_w = jnp.where(died, pix, P)
            flush = jnp.stack(radiance, axis=-1)
            fb = st.fb.at[pix_w].add(flush, mode="drop")
        else:  # "aos" (default)
            flush = jnp.stack(
                [jnp.where(died, radiance[c], 0.0) for c in range(3)], axis=-1
            )
            fb = st.fb.at[pix].add(flush)

        return _PoolState(
            it=st.it + 1,
            next_q=next_q,
            fmin=fmin if use_seam else st.fmin,
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
            aux=aux,
        )

    final = jax.lax.while_loop(cond, body, state)
    if use_seam:
        # rays that died in the FINAL bounce were never seam-flushed; all
        # other dead slots hold exact-zero radiance, so flushing every dead
        # slot once is exact.
        from art_tpu.core.platform import tpu_paths
        from art_tpu.ops.flush_kernel import flush_accumulate

        base = jnp.clip(
            jax.lax.shift_right_logical(final.fmin, 7),
            0, n_hi_pallas - n_hi_win,
        )
        window = jax.lax.dynamic_slice(final.fb, (base, 0), (n_hi_win, 384))
        slab = flush_accumulate(
            final.pix, ~final.active, final.radiance, window, base=base,
            interpret=not tpu_paths(),
        )
        final = final._replace(
            fb=jax.lax.dynamic_update_slice(final.fb, slab, (base, 0))
        )
    if isinstance(final.fb, tuple):
        fb = jnp.stack(final.fb, axis=-1)
    elif _FLUSH in ("pallas", "matmul"):
        # (n_hi, 384) [hi, c*128+lo] -> (P, 3)
        n_hi = final.fb.shape[0]
        fb = (
            final.fb.reshape(n_hi, 3, 128)
            .transpose(0, 2, 1)
            .reshape(n_hi * 128, 3)[:P]
        )
    elif _FLUSH == "subslot":
        fb = final.fb.reshape(P, _SUBSLOTS, 3).sum(axis=1)
    else:
        fb = final.fb[:, :3]
    if _STATS_NEEDY:
        # extra instrumentation output (axon has no debug.print callback);
        # renderer prints it after device_get
        return fb, final.rays, final.it, final.aux
    return fb, final.rays, final.it
