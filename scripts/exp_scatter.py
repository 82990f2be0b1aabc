"""Flush-strategy microbench: how to get died-ray radiance into the fb.

a) current: fb(P,3).at[pix].add(masked (R,3))
b) planar:  3 x fb(P,).at[pix].add(masked (R,))
c) transposed: fb(3,P).at[:, pix].add? (measured as 3 planes on axis 1)
d) q-indexed scatter-set into a (Rq,3) buffer (unique indices, mode='drop')
e) no flush (floor)
All inside a fori_loop with live dependencies.
"""

import sys
import time

import jax
import jax.numpy as jnp

R = 131072
P = 65536
ITERS = 50

key = jax.random.PRNGKey(0)
rad0 = jax.random.uniform(key, (R, 3), jnp.float32)
pix0 = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, P, jnp.int32)
died0 = jax.random.uniform(jax.random.PRNGKey(2), (R,)) < 0.55


def timeit(name, make):
    f = make()
    args = (rad0, pix0, died0)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:22s} {dt*1e3:7.3f} ms/iter", flush=True)


def perturb(rad, fbsum):
    # cheap dependency: rotate radiance by a value derived from fb
    return jnp.clip(rad * 0.999 + fbsum * 1e-12, 0.0, 1.0)


def make_a():
    def run(rad, pix, died):
        fb0 = jnp.zeros((P, 3), jnp.float32)

        def body(i, carry):
            rad, fb = carry
            flush = jnp.where(died[:, None], rad, 0.0)
            fb = fb.at[pix].add(flush)
            return perturb(rad, fb[0, 0]), fb

        rad, fb = jax.lax.fori_loop(0, ITERS, body, (rad, fb0))
        return fb

    return jax.jit(run)


def make_b():
    def run(rad, pix, died):
        fbs = tuple(jnp.zeros((P,), jnp.float32) for _ in range(3))

        def body(i, carry):
            rad, fbs = carry
            new = tuple(
                fbs[c].at[pix].add(jnp.where(died, rad[:, c], 0.0))
                for c in range(3)
            )
            return perturb(rad, new[0][0]), new

        rad, fbs = jax.lax.fori_loop(0, ITERS, body, (rad, fbs))
        return fbs[0]

    return jax.jit(run)


def make_d():
    # q-indexed scatter-set: every died ray writes to a unique queue slot.
    # Simulated with q = i*R + slot_index (mod Rq buffer).
    Rq = 1 << 21

    def run(rad, pix, died):
        buf = jnp.zeros((Rq, 3), jnp.float32)
        slot = jnp.arange(R, dtype=jnp.int32)

        def body(i, carry):
            rad, buf = carry
            q = (i * R + slot) % Rq
            q = jnp.where(died, q, Rq)  # drop lanes that didn't die
            buf = buf.at[q].set(rad, mode="drop")
            return perturb(rad, buf[0, 0]), buf

        rad, buf = jax.lax.fori_loop(0, ITERS, body, (rad, buf))
        return buf

    return jax.jit(run)


def make_e():
    def run(rad, pix, died):
        def body(i, carry):
            rad, acc = carry
            flush = jnp.where(died, rad[:, 0], 0.0)
            return perturb(rad, jnp.sum(flush)), acc + jnp.sum(flush)

        rad, acc = jax.lax.fori_loop(0, ITERS, body, (rad, jnp.float32(0)))
        return acc

    return jax.jit(run)




def make_g():
    """Gather cost: permute 12 planes of pool state by a random index."""
    perm = jax.random.permutation(jax.random.PRNGKey(5), R).astype(jnp.int32)
    planes = tuple(
        jax.random.uniform(jax.random.PRNGKey(10 + i), (R,), jnp.float32)
        for i in range(12)
    )

    def run(rad, pix, died):
        def body(i, planes):
            out = tuple(p[perm] for p in planes)
            return tuple(o * 0.9999 for o in out)

        planes2 = jax.lax.fori_loop(0, ITERS, body, planes)
        return planes2[0]

    return jax.jit(run)


def make_h():
    """Gather cost: 12 planes via one (R,12) row gather instead."""
    perm = jax.random.permutation(jax.random.PRNGKey(5), R).astype(jnp.int32)
    state = jax.random.uniform(jax.random.PRNGKey(11), (R, 12), jnp.float32)

    def run(rad, pix, died):
        def body(i, st):
            return st[perm] * 0.9999

        st = jax.lax.fori_loop(0, ITERS, body, state)
        return st[:, 0]

    return jax.jit(run)


if __name__ == "__main__":
    which = sys.argv[1:] or ["a", "b", "d", "e"]
    for name, mk in (("a-aos-scatter-add", make_a), ("b-planar-scatter-add", make_b),
                     ("d-q-scatter-set", make_d), ("e-no-flush-floor", make_e),
                     ("g-gather-12planes", make_g), ("h-gather-rows12", make_h)):
        if name[0] in which:
            timeit(name, mk)
