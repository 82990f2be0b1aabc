"""Pallas sphere kernel: correctness vs jnp path + throughput."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core.vecmath import T_MIN
from art_tpu.models import build_scene
from art_tpu.ops.intersect import sphere_candidates
from art_tpu.ops.pallas_kernels import RAY_BLOCK, pack_spheres, sphere_closest_hit_pallas

scene = build_scene("bouncing_spheres", 400, 200)
tables = scene.tables
S = tables.n_spheres
sph = pack_spheres(tables)

R = RAY_BLOCK  # one block for correctness
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (R, 3)) * 24 - 12
o = o.at[:, 1].set(jax.random.uniform(jax.random.PRNGKey(9), (R,)) * 6)
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
tm = jax.random.uniform(jax.random.PRNGKey(2), (R,))

t_ref, i_ref = jax.jit(lambda: sphere_candidates(tables, o, d, tm, T_MIN))()
t_pl, i_pl = sphere_closest_hit_pallas(sph, o, d, tm, n_spheres=S, moving=tables.has_moving)
t_ref, i_ref, t_pl, i_pl = map(np.asarray, (t_ref, i_ref, t_pl, i_pl))

hit_ref = t_ref < 1e29
hit_pl = t_pl < 1e29
print("hit agreement:", (hit_ref == hit_pl).mean())
agree_idx = (i_ref[hit_ref & hit_pl] == i_pl[hit_ref & hit_pl]).mean()
print("idx agreement:", agree_idx)
dt = np.abs(t_ref[hit_ref & hit_pl] - t_pl[hit_ref & hit_pl])
print("t max abs diff:", dt.max() if dt.size else 0.0)

# throughput at large R
R = 131072
o = jax.random.uniform(key, (R, 3)) * 24 - 12
o = o.at[:, 1].set(jax.random.uniform(jax.random.PRNGKey(9), (R,)) * 6)
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
tm = jax.random.uniform(jax.random.PRNGKey(2), (R,))

f = jax.jit(lambda o, d, tm: sphere_closest_hit_pallas(
    sph, o, d, tm, n_spheres=S, moving=tables.has_moving))
jax.block_until_ready(f(o, d, tm))
t0 = time.perf_counter()
for _ in range(20):
    out = f(o, d, tm)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 20
print(f"pallas  R={R}: {dt*1e3:.3f} ms  {R/dt/1e6:.1f} Mrays/s")

g = jax.jit(lambda o, d, tm: sphere_candidates(tables, o, d, tm, T_MIN))
jax.block_until_ready(g(o, d, tm))
t0 = time.perf_counter()
for _ in range(20):
    out = g(o, d, tm)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 20
print(f"jnp     R={R}: {dt*1e3:.3f} ms  {R/dt/1e6:.1f} Mrays/s")
