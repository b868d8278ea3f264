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
    # multiple supers (binned selection runs at 128-prim half-chunks)
    assert soa.num_chunks * 2 > bt.SUP * 3
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
    # cap genuinely binds (selection units: 128-prim half-chunks)
    assert -(-(soa.num_chunks * 2) // bt.SUP) > 2
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


def _instanced_scene():
    """TLAS scene: several placements (translate/scale/rotate) of a pack
    holding a small triangle mesh + spheres."""
    from echorenderer_tpu.scene import (
        BoxEntity, Diffuse, EntityPack, PackInstance, PerspectiveCamera,
        Scene, SphereEntity,
    )
    from echorenderer_tpu.scene.prepare import prepare_scene

    pack = EntityPack()
    pack.add(BoxEntity(size=(0.8, 0.6, 0.4),
                       material=Diffuse(albedo=(0.8, 0.5, 0.2))))
    pack.add(SphereEntity(radius=0.35, material=Diffuse(albedo=(0.2, 0.6, 0.9)),
                          position=(0, 0.9, 0)))
    scene = Scene()
    scene.add(PackInstance(pack, position=(-1.6, 0, 0)))
    scene.add(PackInstance(pack, position=(1.4, 0.2, 0.5), scale=0.6,
                           rotation=(0, 40, 0)))
    scene.add(PackInstance(pack, position=(0, -1.0, 1.0), scale=1.3,
                           rotation=(25, 0, 10)))
    scene.add(PerspectiveCamera(position=(0, 0, -5)))
    # force TLAS: auto mode now bakes scenes this small (the fused
    # megakernel path), and this suite exists to pin the TLAS binned walk
    return prepare_scene(scene, instancing="tlas")


def test_binned_instanced_matches_hier():
    """Instanced binned traversal (global virtual chunks + per-segment
    affines) must agree exactly with the instanced packet walk: same
    (prim, inst) and world t. Ref: PreparedInstance.cs:47-61."""
    prepared = _instanced_scene()
    soa = prepared.hier_soa
    assert soa.instanced and soa.binned_g2c.shape[0] > 0
    n = 512
    rs = np.random.RandomState(5)
    o_np = rs.uniform(-3, 3, (n, 3)).astype(np.float32)
    # aim at the placements so a healthy fraction genuinely hits
    anchors = np.asarray(
        [[-1.6, 0, 0], [1.4, 0.2, 0.5], [0, -1.0, 1.0]], np.float32)
    tgt = anchors[rs.randint(0, 3, n)] + rs.normal(
        scale=0.4, size=(n, 3)).astype(np.float32)
    dd = tgt - o_np
    o = jnp.asarray(o_np)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ig = jnp.full((n,), -1, jnp.int32)

    h = ph.intersect_hier(prepared.geometry, soa, o, d, jnp.inf, ig)
    b = bt.trace_binned(prepared.geometry, soa, o, d, jnp.inf, ig,
                        k=2, k_straggler=4)
    np.testing.assert_array_equal(np.asarray(b.prim), np.asarray(h.prim))
    found = np.asarray(h.prim) >= 0
    np.testing.assert_array_equal(
        np.asarray(b.inst)[found], np.asarray(h.inst)[found])
    np.testing.assert_allclose(
        np.asarray(b.t)[found], np.asarray(h.t)[found], rtol=5e-4)
    assert found.mean() > 0.2  # the rays genuinely hit the scene

    # occlusion through the same machinery
    for t_max in (1.5, 1e30):
        want = ph.occlude_hier(prepared.geometry, soa, o, d,
                               jnp.full((n,), t_max), ig)
        got = bt.occlude_binned(prepared.geometry, soa, o, d,
                                jnp.full((n,), t_max), ig, k=2, k_straggler=4)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_binned_instanced_per_instance_ignore():
    """A prim ignore applies only inside the ray's own instance: re-trace
    from each hit ignoring (prim, inst) and require the same (prim, inst)
    never repeats, matching the packet walk's result exactly."""
    prepared = _instanced_scene()
    soa = prepared.hier_soa
    n = 256
    rs = np.random.RandomState(7)
    o = jnp.asarray(rs.uniform(-3, 3, (n, 3)).astype(np.float32))
    dd = rs.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ig0 = jnp.full((n,), -1, jnp.int32)
    first = bt.trace_binned(prepared.geometry, soa, o, d, jnp.inf, ig0,
                            k=2, k_straggler=4)
    ig = jnp.maximum(first.prim, -1)
    second = bt.trace_binned(prepared.geometry, soa, o, d, jnp.inf, ig,
                             first.inst, k=2, k_straggler=4)
    ref = ph.intersect_hier(prepared.geometry, soa, o, d, jnp.inf, ig,
                            first.inst)
    np.testing.assert_array_equal(np.asarray(second.prim), np.asarray(ref.prim))
    found = np.asarray(ref.prim) >= 0
    np.testing.assert_array_equal(
        np.asarray(second.inst)[found], np.asarray(ref.inst)[found])
    # a triangle hit never repeats as the same (prim, inst)
    tri = (np.asarray(first.prim) >= 0) & (
        np.asarray(first.prim) < prepared.geometry.num_triangles)
    same = (np.asarray(second.prim) == np.asarray(first.prim)) & (
        np.asarray(second.inst) == np.asarray(first.inst))
    assert not bool((same & tri).any())
