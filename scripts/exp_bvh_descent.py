"""In-loop cost of per-ray BVH descent vs the brute sphere passes.

The ART_TPU_BVH render path (per-ray escape-link traversal, the direct
analog of the reference's bvh_node::hit, src/bvh.cuh:95-106) pays one
per-lane node fetch per traversal step — a serial (R,) gather on TPU.
This driver times one candidates pass per variant inside a dependency-
preserving fori_loop (rays vary per iteration, so XLA cannot hoist the
gathers; see docs/PERF_NOTES.md on microbenchmark methodology).

Usage: python scripts/exp_bvh_descent.py [variant ...] with variants in
{bvh, brute_jnp, pallas}; defaults to all three.
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp

from art_tpu.models import build_scene
from art_tpu.ops.intersect import (
    bvh_sphere_candidates_p,
    sphere_candidates_p,
)

R = 131072
ITERS = 8


def run(name, fn, o, d, tm):
    @jax.jit
    def loop(o, d, tm):
        def body(i, carry):
            o, d, tm = carry
            t, idx = fn(o, d, tm)
            # dependency-preserving ray update (cannot be DCE'd or hoisted)
            bump = jnp.minimum(t, 1.0) * 1e-3 + idx.astype(jnp.float32) * 1e-7
            o = (o[0] + bump, o[1] - bump, o[2] + bump)
            tm = jnp.mod(tm + bump, 1.0)
            return o, d, tm
        return jax.lax.fori_loop(0, ITERS, body, (o, d, tm))

    out = loop(o, d, tm)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(o, d, tm)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:10s}: {dt / ITERS * 1e3:9.3f} ms/pass")


def main():
    names = sys.argv[1:] or ["pallas", "brute_jnp", "bvh"]
    sc = build_scene("bouncing_spheres", 64, 32)
    t = sc.tables
    k = jax.random.PRNGKey(0)
    o = tuple(jax.random.uniform(jax.random.fold_in(k, i), (R,), minval=-13, maxval=13)
              for i in range(3))
    d = tuple(jax.random.normal(jax.random.fold_in(k, 3 + i), (R,)) for i in range(3))
    tm = jax.random.uniform(jax.random.fold_in(k, 9), (R,))

    if "pallas" in names:
        from art_tpu.ops import pallas_kernels as pk

        def pallas_fn(o, d, tm):
            ts, n, u, v, m = pk.sphere_hit_attrs_planar(
                t.sph_packed, o, d, tm,
                n_moving=t.sph_n_moving_pad, n_static=t.sph_n_static,
                needs_uv=False,
            )
            return ts, m
        run("pallas", pallas_fn, o, d, tm)
    if "brute_jnp" in names:
        run("brute_jnp", lambda o, d, tm: sphere_candidates_p(t, o, d, tm, 1e-3),
            o, d, tm)
    if "bvh" in names:
        run("bvh", lambda o, d, tm: bvh_sphere_candidates_p(t, o, d, tm, 1e-3),
            o, d, tm)


if __name__ == "__main__":
    main()
