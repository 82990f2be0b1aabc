"""Microbench: dense per-ray atlas gather vs compact-then-gather.

Question (docs/PERF_NOTES.md, final_scene section): the (R,) random texel
gather costs ~1.0 ms/iter because XLA lowers it scalar-serially, and it is
evaluated masked-dense even when only a few % of rays hit an image-textured
material.  Round-2 notes observed scatter cost scales with the TARGET size,
which suggests: scatter the needy rays' (j, r) into a small (K,) buffer,
gather K texels, scatter them back — three ops whose costs are K-sized or
target-small instead of one R-sized serial gather.

All timings in-loop (fori_loop, per-iteration-varying indices) per the
measurement rules in CLAUDE.md.  Run on the real TPU:

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python scripts/exp_compact_gather.py
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

R = 131072
K = 8192
ATLAS = 524288  # final_scene earthmap atlas (u32 texels)
ITERS = 200
DENSITY_SHIFT = 4  # mask density = 2**-4 = 6.25%


def idx_and_mask(i, r_iota):
    """Cheap per-iteration-varying pseudo-random indices + needy mask."""
    h = (r_iota * jnp.uint32(2654435761) + i.astype(jnp.uint32) * jnp.uint32(40503)) ^ (
        r_iota >> 7
    )
    j = (h % jnp.uint32(ATLAS)).astype(jnp.int32)
    mask = ((h >> jnp.uint32(13)) & jnp.uint32((1 << DENSITY_SHIFT) - 1)) == 0
    return j, mask


def timed(name, body):
    atlas = jnp.arange(ATLAS, dtype=jnp.uint32)
    r_iota = jnp.arange(R, dtype=jnp.uint32)

    @jax.jit
    def loop(seed):
        def step(i, acc):
            j, mask = idx_and_mask(i + seed, r_iota)
            return acc + body(j, mask, atlas, r_iota)

        return lax.fori_loop(0, ITERS, step, jnp.zeros((R,), jnp.float32))

    loop(jnp.int32(0)).block_until_ready()  # compile
    t0 = time.perf_counter()
    out = loop(jnp.int32(1)).block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:28s} {dt:7.3f} ms/iter   (checksum {float(out.sum()):.3e})")
    return dt


def v_idx_only(j, mask, atlas, r_iota):
    return jnp.where(mask, j.astype(jnp.float32), 0.0)


def v_dense(j, mask, atlas, r_iota):
    px = atlas[j]
    return jnp.where(mask, (px & 0xFF).astype(jnp.float32), 0.0)


def v_cumsum(j, mask, atlas, r_iota):
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    return jnp.where(mask, (j + rank).astype(jnp.float32), 0.0)


def _compact(j, mask, r_iota):
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask & (rank < K), rank, K)  # K = out of bounds -> drop
    jbuf = jnp.zeros((K,), jnp.int32).at[slot].set(j, mode="drop")
    rbuf = jnp.full((K,), R, jnp.int32).at[slot].set(
        r_iota.astype(jnp.int32), mode="drop"
    )
    return jbuf, rbuf


def v_scatter_small(j, mask, atlas, r_iota):
    jbuf, rbuf = _compact(j, mask, r_iota)
    return jnp.zeros((R,), jnp.float32).at[0].add(
        jnp.sum(jbuf.astype(jnp.float32)) + jnp.sum(rbuf.astype(jnp.float32))
    )


def v_gather_k(j, mask, atlas, r_iota):
    jbuf, rbuf = _compact(j, mask, r_iota)
    tex = atlas[jbuf]
    return jnp.zeros((R,), jnp.float32).at[0].add(
        jnp.sum((tex & 0xFF).astype(jnp.float32)) + jnp.sum(rbuf.astype(jnp.float32))
    )


def v_full_compact(j, mask, atlas, r_iota):
    jbuf, rbuf = _compact(j, mask, r_iota)
    tex = (atlas[jbuf] & 0xFF).astype(jnp.float32)
    out = jnp.zeros((R,), jnp.float32).at[rbuf].set(tex, mode="drop")
    return out


def main():
    print(f"backend={jax.default_backend()}  R={R} K={K} atlas={ATLAS} "
          f"density=1/{1 << DENSITY_SHIFT} iters={ITERS}")
    base = timed("idx-gen only", v_idx_only)
    dense = timed("dense (R,) gather", v_dense)
    cs = timed("+ cumsum", v_cumsum)
    sc = timed("+ scatter->(K,) x2", v_scatter_small)
    gk = timed("+ gather K texels", v_gather_k)
    full = timed("full compact scheme", v_full_compact)
    print(f"\ndense gather cost       : {dense - base:.3f} ms")
    print(f"cumsum cost             : {cs - base:.3f} ms")
    print(f"scatter-to-K cost       : {sc - cs:.3f} ms")
    print(f"gather-K cost           : {gk - sc:.3f} ms")
    print(f"scatter-back cost       : {full - gk:.3f} ms")
    print(f"full compact total      : {full - base:.3f} ms  vs dense {dense - base:.3f} ms")


if __name__ == "__main__":
    main()
