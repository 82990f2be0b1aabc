"""Adaptive compacted image-texel fetch (ops/compact_fetch.py).

The compact path must be EXACT — bit-equal to the dense gather on needy
lanes — because it feeds the reference-parity image-texture pipeline
(src/texture.cuh:51-59 nearest-texel semantics).  Exactness rests on the
byte-split bf16 channels (integers <= 255 are exact in bf16) and on each
compacted slot receiving exactly one one-hot update.
"""

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.ops.compact_fetch import compact_gather

R = 8192  # one flush-kernel ray block
T = 1 << 19  # atlas span exercising all three index bytes


def _mk(density: float, seed: int = 3):
    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    flat = jax.random.randint(k0, (R,), 0, T, jnp.int32)
    needy = jax.random.uniform(k1, (R,)) < density
    data = jnp.arange(T, dtype=jnp.uint32) * jnp.uint32(2654435761)  # distinct texels
    return data, flat, needy


def test_compact_matches_dense_sparse():
    data, flat, needy = _mk(0.05)
    got = compact_gather(data, flat, needy, k=1024, interpret=True)
    want = jnp.where(needy, data[flat], 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_boundary_indices_exact():
    """Largest flat index (T-1) and largest ray id (R-1) must round-trip
    the byte-split channels exactly."""
    data, flat, _ = _mk(0.0)
    flat = flat.at[0].set(T - 1).at[R - 1].set(T - 1).at[17].set(0)
    needy = jnp.zeros((R,), bool).at[0].set(True).at[R - 1].set(True).at[17].set(True)
    got = compact_gather(data, flat, needy, k=1024, interpret=True)
    want = jnp.where(needy, data[flat], 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_overflow_falls_back_to_dense():
    """More needy lanes than compacted slots: the lax.cond must take the
    dense branch and stay exact."""
    data, flat, _ = _mk(0.0)
    needy = jnp.ones((R,), bool)
    got = compact_gather(data, flat, needy, k=1024, interpret=True)
    want = data[flat]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_unaligned_pool_uses_dense():
    data = jnp.arange(T, dtype=jnp.uint32)
    flat = jnp.arange(100, dtype=jnp.int32)
    needy = jnp.ones((100,), bool)
    got = compact_gather(data, flat, needy, k=1024)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(data[:100]))


def test_giant_atlas_uses_dense():
    """Atlases past the 24-bit byte-split capacity must take the dense
    branch (the compact path would silently truncate texel indices)."""
    big = (1 << 24) + 256
    data = jnp.zeros((big,), jnp.uint32).at[big - 7].set(jnp.uint32(0xDEAD))
    flat = jnp.zeros((R,), jnp.int32).at[5].set(big - 7)
    needy = jnp.zeros((R,), bool).at[5].set(True)
    got = compact_gather(data, flat, needy, k=1024, interpret=True)
    assert int(got[5]) == 0xDEAD
    assert int(got.sum()) == 0xDEAD


def test_atlas_sample_needy_matches_dense():
    """ImageAtlas.sample(needy=...) must equal the plain sample on needy
    lanes (the texture-eval integration point)."""
    from art_tpu.utils.images import ImageAtlas

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 96, 3), np.uint8)
    atlas = ImageAtlas.pack([img])
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(9), 3)
    u = jax.random.uniform(k0, (R,), jnp.float32) * 1.2 - 0.1  # incl. clamp
    v = jax.random.uniform(k1, (R,), jnp.float32) * 1.2 - 0.1
    img_id = jnp.zeros((R,), jnp.int32)
    needy = jax.random.uniform(k2, (R,)) < 0.07

    dense = atlas.sample(img_id, u, v)
    compact = atlas.sample(img_id, u, v, needy=needy, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(compact)[np.asarray(needy)],
        np.asarray(dense)[np.asarray(needy)],
    )
    assert (np.asarray(compact)[~np.asarray(needy)] == 0).all()


def test_compact_apply_matches_dense():
    """compact_apply must equal where(needy, fn(*inputs), 0).  The routing
    (which value lands on which lane) must be exact; values may differ
    from the eager dense reference in the last ulps because XLA fuses
    fn's mul+add chains (FMA) inside the compiled cond branches."""
    from art_tpu.ops.compact_fetch import compact_apply

    RR = 2 * R  # must exceed K for the compact branch to engage
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 4)
    x = jax.random.normal(k0, (RR,), jnp.float32) * 3.0
    y = jax.random.normal(k1, (RR,), jnp.float32) * 3.0
    z = jax.random.normal(k2, (RR,), jnp.float32) * 3.0
    needy = jax.random.uniform(k3, (RR,)) < 0.04

    def fn(a, b, c):
        return a * a + jnp.floor(b) * c - 3.0 * a

    got = compact_apply(fn, (x, y, z), needy, k=R, interpret=True)
    want = jnp.where(needy, fn(x, y, z), 0.0)
    # non-needy lanes must be exactly zero (routing is exact)
    np.testing.assert_array_equal(
        np.asarray(got)[~np.asarray(needy)], 0.0
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_compact_apply_overflow_falls_back():
    from art_tpu.ops.compact_fetch import compact_apply

    RR = 2 * R
    x = jnp.linspace(-4.0, 4.0, RR, dtype=jnp.float32)
    needy = jnp.ones((RR,), bool)
    got = compact_apply(jnp.sin, (x,), needy, k=R, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.sin(x)))


def test_compact_turb_texture_eval_matches_dense(monkeypatch):
    """ART_TPU_COMPACT_TURB texture evaluation must match the dense path
    (up to FMA-contraction ulps) on a batch mixing marble with other
    texture types, and must not perturb non-marble lanes at all."""
    from art_tpu.models import build_scene
    from art_tpu.ops import texture_eval as te

    tables = build_scene("final_scene", 64, 64).tables
    RR = 2 * R
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(7), 3)
    p = tuple(jax.random.normal(k, (RR,), jnp.float32) * 100.0 for k in
              jax.random.split(k0, 3))
    u = jax.random.uniform(k1, (RR,), jnp.float32)
    v = jax.random.uniform(k2, (RR,), jnp.float32)
    # spread hits over every texture row in the scene (incl. the marble)
    tex_id = (jnp.arange(RR, dtype=jnp.int32) * 31) % tables.tex_packed.shape[0]

    dense = te.eval_texture_p(tables, tex_id, u, v, p)
    monkeypatch.setattr(te, "_COMPACT_TURB", True)
    compact = te.eval_texture_p(tables, tex_id, u, v, p)
    from art_tpu.scene.tables import TexType

    # resolve leaf types (final_scene has no wrapper->noise chains, so the
    # raw row type identifies the marble lanes)
    is_noise = np.asarray(
        tables.tex_packed[np.asarray(tex_id), 0].astype(int)
    ) == int(TexType.NOISE)
    assert is_noise.any() and (~is_noise).any()
    for c in range(3):
        d, g = np.asarray(dense[c]), np.asarray(compact[c])
        np.testing.assert_array_equal(d[~is_noise], g[~is_noise])
        np.testing.assert_allclose(
            d[is_noise], g[is_noise], rtol=1e-4, atol=1e-5
        )


def test_compact_turb_noodle_matches_dense(monkeypatch):
    """The NOODLE branch rides the same compaction (original_scene has one
    noodle sphere among ~1410 objects, src/main.cu:617): compacted texture
    eval must match dense on noodle lanes (FMA ulps) and leave every other
    lane untouched.  The per-lane octave count must survive the f32 ride."""
    from art_tpu.models import build_scene
    from art_tpu.ops import texture_eval as te
    from art_tpu.scene.tables import TexType

    tables = build_scene("original_scene", 64, 64).tables
    RR = 2 * R
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(13), 3)
    p = tuple(jax.random.normal(k, (RR,), jnp.float32) * 100.0 for k in
              jax.random.split(k0, 3))
    u = jax.random.uniform(k1, (RR,), jnp.float32)
    v = jax.random.uniform(k2, (RR,), jnp.float32)
    tex_id = (jnp.arange(RR, dtype=jnp.int32) * 29) % tables.tex_packed.shape[0]

    dense = te.eval_texture_p(tables, tex_id, u, v, p)
    monkeypatch.setattr(te, "_COMPACT_TURB", True)
    compact = te.eval_texture_p(tables, tex_id, u, v, p)

    is_noodle = np.asarray(
        tables.tex_packed[np.asarray(tex_id), 0].astype(int)
    ) == int(TexType.NOODLE)
    assert is_noodle.any() and (~is_noodle).any()
    for c in range(3):
        d, g = np.asarray(dense[c]), np.asarray(compact[c])
        np.testing.assert_array_equal(d[~is_noodle], g[~is_noodle])
        np.testing.assert_allclose(
            d[is_noodle], g[is_noodle], rtol=1e-4, atol=1e-5
        )


def test_wide_tier_matches_dense(monkeypatch):
    """K < cnt <= K2 takes the wide tier (MXU table-gather route-back):
    bit-equal to dense on needy lanes, zero elsewhere."""
    import art_tpu.ops.compact_fetch as cf

    monkeypatch.setattr(cf, "WFETCH_K", 1024)
    data, flat, needy = _mk(0.05)  # cnt ~410 between k=128 and K2=1024
    data = data & jnp.uint32(0xFFFFFF)  # u24 packed-RGB contract
    cnt = int(jnp.sum(needy))
    assert 128 < cnt <= 1024
    got = compact_gather(
        data, flat, needy, k=128, max_value_bits=24, interpret=True
    )
    want = jnp.where(needy, data[flat], 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_wide_tier_cnt_exactly_k2(monkeypatch):
    """cnt == K2 exactly still takes (and fills) the wide tier; the
    trailing non-needy lanes carry rank == cnt == K2, which must match
    no one-hot row (not wrap into slot 0)."""
    import art_tpu.ops.compact_fetch as cf

    monkeypatch.setattr(cf, "WFETCH_K", 256)
    needy = jnp.zeros((R,), bool).at[jnp.arange(0, R, R // 256)].set(True)
    assert int(needy.sum()) == 256
    flat = jnp.arange(R, dtype=jnp.int32) % T
    data = (jnp.arange(T, dtype=jnp.uint32) * jnp.uint32(77)) & jnp.uint32(
        0xFFFFFF
    )
    got = compact_gather(
        data, flat, needy, k=128, max_value_bits=24, interpret=True
    )
    want = jnp.where(needy, data[flat], 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_wide_tier_overflow_falls_dense(monkeypatch):
    import art_tpu.ops.compact_fetch as cf

    monkeypatch.setattr(cf, "WFETCH_K", 256)
    data, flat, needy = _mk(0.2)  # cnt ~1640 > K2
    data = data & jnp.uint32(0xFFFFFF)
    got = compact_gather(
        data, flat, needy, k=128, max_value_bits=24, interpret=True
    )
    want = jnp.where(needy, data[flat], 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_wide_tier_gated_off_for_wide_values(monkeypatch):
    """max_value_bits > 24 (full-u32 data) must not enter the byte-split
    wide tier: values above 2^24 would corrupt.  Dense fallback stays
    exact."""
    import art_tpu.ops.compact_fetch as cf

    monkeypatch.setattr(cf, "WFETCH_K", 1024)
    data, flat, needy = _mk(0.05)  # full-u32 texels
    got = compact_gather(data, flat, needy, k=128, interpret=True)
    want = jnp.where(needy, data[flat], 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_table_gather_u24_exact():
    from art_tpu.ops.flush_kernel import table_gather_u24

    k0, k1 = jax.random.split(jax.random.PRNGKey(9))
    tab = jax.random.randint(k0, (512,), 0, 1 << 24, jnp.int32)
    idx = jax.random.randint(k1, (R,), 0, 512, jnp.int32)
    got = table_gather_u24(tab, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(tab)[np.asarray(idx)])
    # out-of-range indices (== T) return 0, not a wrapped row
    idx2 = jnp.full((R,), 512, jnp.int32)
    got2 = table_gather_u24(tab, idx2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got2), np.zeros(R, np.int32))
