"""Binned wavefront traversal (ops/binned_trace.py) against the linear
oracle — same contract as the packet kernels (prim ids, findFar), but
per-ray culling (docs/TRAVERSAL_PLAN.md prototype)."""

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.ops import binned_trace as bt
from echorenderer_tpu.ops import pallas_hier as ph
from echorenderer_tpu.ops.intersect import intersect_linear
from tests.test_pallas_hier import _geometry, _hier, _rays


@pytest.mark.parametrize(
    "num_tris,num_spheres",
    [(500, 100), (600, 0), (0, 600)],
    ids=["mixed", "tris-only", "spheres-only"],
)
def test_binned_matches_linear(num_tris, num_spheres):
    geom = _geometry(num_tris, num_spheres)
    soa = _hier(geom)
    o, d = _rays(256)
    ig = jnp.full((256,), -1, jnp.int32)
    h = bt.trace_binned(geom, soa, o, d, jnp.inf, ig, rounds=8, k=4)
    r = intersect_linear(geom, o, d, jnp.inf, ig)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(r.prim))
    both = np.asarray(h.prim) >= 0
    np.testing.assert_allclose(np.asarray(h.t)[both], np.asarray(r.t)[both], rtol=1e-4)
    tri = both & (np.asarray(h.prim) < num_tris)
    np.testing.assert_allclose(np.asarray(h.uv)[tri], np.asarray(r.uv)[tri], atol=1e-4)


def test_binned_ignore_and_findfar():
    geom = _geometry(500, 100, seed=3)
    soa = _hier(geom, seed=4)
    o, d = _rays(128, seed=5)
    ig0 = jnp.full((128,), -1, jnp.int32)
    first = bt.trace_binned(geom, soa, o, d, jnp.inf, ig0)
    second = bt.trace_binned(geom, soa, o, d, jnp.inf, jnp.maximum(first.prim, 0))
    tri_again = (second.prim == first.prim) & (first.prim >= 0) & (first.prim < 500)
    assert not bool(np.asarray(tri_again).any())

    # findFar: from sphere centers, ignoring the sphere, exit at t == radius
    centers = np.asarray(geom.sph_center)[:64]
    radii = np.asarray(geom.sph_radius)[:64]
    d2 = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (64, 1))
    ig = jnp.asarray(500 + np.arange(64), jnp.int32)
    h = bt.trace_binned(geom, soa, jnp.asarray(centers), d2, jnp.inf, ig)
    own = np.asarray(h.prim) == (500 + np.arange(64))
    np.testing.assert_allclose(np.asarray(h.t)[own], radii[own], rtol=1e-4)
    assert own.mean() > 0.5


def test_binned_occlude_matches_linear():
    geom = _geometry(500, 100, seed=7)
    soa = _hier(geom, seed=8)
    o, d = _rays(256, seed=9)
    ig = jnp.full((256,), -1, jnp.int32)
    for t_max in (0.5, 2.0, 1e30):
        want = intersect_linear(geom, o, d, t_max, ig).prim >= 0
        got = bt.occlude_binned(geom, soa, o, d, t_max, ig)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_binned_compaction_phase():
    """N above the compaction width so the straggler phase (gather first-nc
    pending rays, solve, scatter back) actually runs; results must still
    agree exactly with the linear oracle."""
    geom = _geometry(500, 100, seed=11)
    soa = _hier(geom, seed=12)
    o, d = _rays(2048, seed=13)
    n = 2048
    assert min(n, 1024) < n  # compaction path taken for this size
    ig = jnp.full((n,), -1, jnp.int32)
    h = bt.trace_binned(geom, soa, o, d, jnp.inf, ig)
    r = intersect_linear(geom, o, d, jnp.inf, ig)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(r.prim))
    both = np.asarray(h.prim) >= 0
    np.testing.assert_allclose(np.asarray(h.t)[both], np.asarray(r.t)[both], rtol=1e-4)


def test_binned_cap_hit_midmarch():
    """Rays that hit the bounded first compaction level's inner-round cap
    mid-march must carry their un-intersected pending selections through
    the scatter-back (regression: truncating them skipped chunks). Many
    chunks + enough rays to trigger both compaction levels."""
    geom = _geometry(20000, 500, seed=41)
    soa = _hier(geom, seed=42)
    n = 2048
    o, d = _rays(n, seed=43)
    ig = jnp.full((n,), -1, jnp.int32)
    h = bt.trace_binned(geom, soa, o, d, jnp.inf, ig, k=2, k_straggler=4)
    r = intersect_linear(geom, o, d, jnp.inf, ig)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(r.prim))


def test_binned_multi_super_level():
    """Enough chunks for several superchunks (two-level selection paths:
    guard-capped frontier, exhausted-super marking)."""
    geom = _geometry(20000, 500, seed=31)
    soa = _hier(geom, seed=32)
    assert soa.num_chunks > bt.SUP * 3  # multiple supers
    o, d = _rays(128, seed=33)
    ig = jnp.full((128,), -1, jnp.int32)
    h = bt.trace_binned(geom, soa, o, d, jnp.inf, ig, rounds=64, k=4)
    r = intersect_linear(geom, o, d, jnp.inf, ig)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(r.prim))
    both = np.asarray(h.prim) >= 0
    np.testing.assert_allclose(np.asarray(h.t)[both], np.asarray(r.t)[both], rtol=1e-4)


def test_binned_cascade_phases(monkeypatch):
    """The large-n straggler cascade (bounded mid stage + narrow final
    loop) must agree exactly with the linear oracle. CASCADE_MIN is
    lowered so a CPU-sized trace takes the cascade path; n=4096 is unique
    to this test so the jit cache can't serve a pre-patch trace."""
    monkeypatch.setattr(bt, "CASCADE_MIN", 2048)
    geom = _geometry(20000, 500, seed=51)
    soa = _hier(geom, seed=52)
    n = 4096
    o, d = _rays(n, seed=53)
    ig = jnp.full((n,), -1, jnp.int32)
    h = bt.trace_binned(geom, soa, o, d, jnp.inf, ig, k=2, k_straggler=4)
    r = intersect_linear(geom, o, d, jnp.inf, ig)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(r.prim))
    both = np.asarray(h.prim) >= 0
    # 5e-4: the recovery's band fallback (module docstring) plus 1/det
    # amplification near grazing hits — prim choice above is still exact
    np.testing.assert_allclose(np.asarray(h.t)[both], np.asarray(r.t)[both], rtol=5e-4)
    # occlude through the same cascade
    want = intersect_linear(geom, o, d, 2.0, ig).prim >= 0
    got = bt.occlude_binned(geom, soa, o, d, 2.0, ig, k=2, k_straggler=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_binned_capped_order_overflow(monkeypatch):
    """With ORD_CAP below the scene's super count, rays that need supers
    past the cap must park conservatively and complete in a compaction
    stage (never false-terminate with a miss or a too-far hit)."""
    monkeypatch.setattr(bt, "ORD_CAP", 2)
    geom = _geometry(20000, 500, seed=61)
    soa = _hier(geom, seed=62)
    assert -(-soa.num_chunks // bt.SUP) > 2  # cap genuinely binds
    n = 2048  # > 1024 so a compaction stage exists (cap only then)
    o, d = _rays(n, seed=63)
    ig = jnp.full((n,), -1, jnp.int32)
    h = bt.trace_binned(geom, soa, o, d, jnp.inf, ig, k=2, k_straggler=4)
    r = intersect_linear(geom, o, d, jnp.inf, ig)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(r.prim))


def test_setup_rank_kernel_matches_xla_sort():
    """The fused Pallas setup (slab + in-kernel bitonic rank,
    bt._setup_rank) must produce exactly the XLA reference pipeline's
    keys: _slab_all -> enc -> row sort, padded with _INT_INF. Keys are
    unique (super-id tiebreak in the low bits), so the orders must be
    bit-identical."""
    import jax

    geom = _geometry(20000, 500, seed=31)
    soa = _hier(geom, seed=32)
    o, d = _rays(1024, seed=7)
    n = 1024
    cb = soa.chunk_bounds
    c = cb.shape[0]
    s_count = -(-c // bt.SUP)
    c_pad = s_count * bt.SUP
    sbits = max(1, (s_count - 1).bit_length())
    cb_box = jnp.concatenate([
        cb,
        jnp.tile(jnp.asarray([[bt._INF] * 3 + [-bt._INF] * 3], jnp.float32),
                 (c_pad - c, 1)),
    ], axis=0)
    sup_cb = jnp.concatenate([
        cb_box[:, 0:3].reshape(s_count, bt.SUP, 3).min(1),
        cb_box[:, 3:6].reshape(s_count, bt.SUP, 3).max(1),
    ], axis=1)
    limit = jnp.full((n,), bt._INF)

    ord_t = bt._setup_rank(o, d, sup_cb, limit, sbits)
    assert ord_t is not None

    tn = bt._slab_all(o, d, sup_cb, limit)
    tb = jax.lax.bitcast_convert_type(jnp.maximum(tn, 0.0), jnp.int32)
    iota = jnp.broadcast_to(
        jnp.arange(s_count, dtype=jnp.int32)[None], tn.shape)
    keys = jnp.where(
        tn < bt._INF,
        (tb & ~jnp.int32((1 << sbits) - 1)) | iota,
        bt._INT_INF,
    )
    ref = np.asarray(jax.lax.sort(keys, dimension=1))

    got = np.asarray(ord_t.T)
    np.testing.assert_array_equal(got[:, :s_count], ref)
    assert np.all(got[:, s_count:] == bt._INT_INF)
