"""Hierarchical packet-traversal kernel tests (interpret mode on CPU).
The linear accelerator is the oracle, as in test_pallas_intersect. The
hier path is built directly (scenes this small would not get one from
prepare_scene) to exercise the tree walk, DMA streaming, leaf merge,
ignore mapping and findFar sphere semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.ops import pallas_hier as ph
from echorenderer_tpu.ops.intersect import intersect_linear, occlude_linear
from tests.test_pallas_intersect import _geometry, _rays


def _hier(geom, seed=9):
    n = geom.num_triangles + geom.num_spheres
    perm = np.random.RandomState(seed).permutation(n)
    return ph.build_hier_soa(geom, perm)


@pytest.mark.parametrize(
    "num_tris,num_spheres",
    [(500, 100), (600, 0), (0, 600)],
    ids=["mixed", "tris-only", "spheres-only"],
)
def test_hier_trace_matches_linear(num_tris, num_spheres):
    geom = _geometry(num_tris, num_spheres)
    soa = _hier(geom)
    assert soa.num_chunks >= 2  # real tree, not a degenerate root
    o, d = _rays(256)
    ig = jnp.full((256,), -1, jnp.int32)
    h = ph.intersect_hier(geom, soa, o, d, jnp.inf, ig)
    r = intersect_linear(geom, o, d, jnp.inf, ig)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(r.prim))
    both = np.asarray(h.prim) >= 0
    np.testing.assert_allclose(np.asarray(h.t)[both], np.asarray(r.t)[both], rtol=1e-4)
    tri = both & (np.asarray(h.prim) < num_tris)
    np.testing.assert_allclose(np.asarray(h.uv)[tri], np.asarray(r.uv)[tri], atol=1e-4)


def test_hier_occlude_matches_linear():
    geom = _geometry(500, 100, seed=3)
    soa = _hier(geom, seed=4)
    o, d = _rays(256, seed=5)
    ig = jnp.full((256,), -1, jnp.int32)
    t_max = jnp.full((256,), 8.0)
    b = ph.occlude_hier(geom, soa, o, d, t_max, ig)
    br = occlude_linear(geom, o, d, t_max, ig)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(br))


def test_hier_ignore_and_findfar():
    # triangles: ignored prim never hit again; spheres: ignoring the hit
    # sphere from inside it must return its OWN far root (exit interface)
    geom = _geometry(600, 0, seed=7)
    soa = _hier(geom, seed=8)
    o, d = _rays(128, seed=9)
    ig0 = jnp.full((128,), -1, jnp.int32)
    first = ph.intersect_hier(geom, soa, o, d, jnp.inf, ig0)
    second = ph.intersect_hier(geom, soa, o, d, jnp.inf, jnp.maximum(first.prim, 0))
    hit_again = (second.prim == first.prim) & (first.prim >= 0)
    assert not bool(np.asarray(hit_again).any())

    geos = _geometry(500, 100, seed=11)
    soas = _hier(geos, seed=12)
    # rays from each sphere's center, ignoring that sphere -> must exit
    # through the far interface at t == radius (findFar)
    centers = np.asarray(geos.sph_center)[:64]
    radii = np.asarray(geos.sph_radius)[:64]
    d = np.tile(np.asarray([1.0, 0.0, 0.0], np.float32), (64, 1))
    ig = jnp.asarray(500 + np.arange(64), jnp.int32)
    h = ph.intersect_hier(geos, soas, jnp.asarray(centers), jnp.asarray(d), jnp.inf, ig)
    hit = np.asarray(h.prim)
    own = hit == (500 + np.arange(64))
    # where nothing else intervenes, the hit is the sphere's own far root
    ts = np.asarray(h.t)
    np.testing.assert_allclose(ts[own], radii[own], rtol=1e-4)
    assert own.mean() > 0.5  # most rays exit through their own sphere


# ---------------------------------------------------------------------------
# instanced TLAS traversal: baked (transform-expanded) linear is the oracle
# ---------------------------------------------------------------------------

def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.radians(deg)
    k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(a) * k + (1 - np.cos(a)) * (k @ k)).astype(np.float64)


def _instances():
    """(transforms, scales): a few uniform-scale TRS placements."""
    specs = [
        (np.eye(3), 1.0, (0.0, 0.0, 0.0)),
        (_rot((0, 1, 0), 40.0), 0.6, (25.0, 2.0, -4.0)),
        (_rot((1, 1, 0), -25.0), 1.7, (-28.0, -3.0, 8.0)),
        (_rot((0, 0, 1), 100.0), 1.0, (5.0, 30.0, 3.0)),
        (_rot((1, 0, 1), 170.0), 0.85, (-6.0, -27.0, -9.0)),
    ]
    mats, inv_a, inv_b = [], [], []
    for r, s, t in specs:
        m = np.eye(4)
        m[:3, :3] = r * s
        m[:3, 3] = t
        mats.append(m)
        a = r.T / s
        inv_a.append(a)
        inv_b.append(-a @ np.asarray(t))
    return np.asarray(mats), np.asarray(inv_a), np.asarray(inv_b)


def _bake(geom, mats):
    """Transform-expanded world geometry: instance j's copy of prim p lands
    at baked id j*P + p."""
    t = geom.num_triangles
    parts_v0, parts_e1, parts_e2, parts_c, parts_r = [], [], [], [], []
    for m in mats:
        r, tr = m[:3, :3], m[:3, 3]
        parts_v0.append(np.asarray(geom.tri_v0) @ r.T + tr)
        parts_e1.append(np.asarray(geom.tri_e1) @ r.T)
        parts_e2.append(np.asarray(geom.tri_e2) @ r.T)
        s = np.linalg.norm(r[:, 0])
        parts_c.append(np.asarray(geom.sph_center) @ r.T + tr)
        parts_r.append(np.asarray(geom.sph_radius) * s)
    nt, ns = t * len(mats), geom.num_spheres * len(mats)
    z3 = np.zeros((nt, 3), np.float32)
    z2 = np.zeros((nt, 2), np.float32)
    from echorenderer_tpu.ops.intersect import FlatGeometry

    return FlatGeometry(
        tri_v0=jnp.asarray(np.concatenate(parts_v0).astype(np.float32)),
        tri_e1=jnp.asarray(np.concatenate(parts_e1).astype(np.float32)),
        tri_e2=jnp.asarray(np.concatenate(parts_e2).astype(np.float32)),
        tri_n0=jnp.asarray(z3), tri_n1=jnp.asarray(z3), tri_n2=jnp.asarray(z3),
        tri_uv0=jnp.asarray(z2), tri_uv1=jnp.asarray(z2), tri_uv2=jnp.asarray(z2),
        tri_mat=jnp.zeros(nt, jnp.int32),
        sph_center=jnp.asarray(np.concatenate(parts_c).astype(np.float32)),
        sph_radius=jnp.asarray(np.concatenate(parts_r).astype(np.float32)),
        sph_mat=jnp.zeros(ns, jnp.int32),
    )


def _baked_to_pair(baked_prim, n_inst, pack_tris, pack_sph):
    """baked prim id -> (inst, storage prim) for the single-pack layout."""
    nt = pack_tris * n_inst
    is_tri = baked_prim < nt
    inst = np.where(is_tri, baked_prim // pack_tris, (baked_prim - nt) // pack_sph if pack_sph else 0)
    prim = np.where(is_tri, baked_prim % pack_tris, pack_tris + (baked_prim - nt) % pack_sph if pack_sph else 0)
    return inst, prim


def _build_instanced(geom, seed=21):
    mats, inv_a, inv_b = _instances()
    p = geom.num_triangles + geom.num_spheres
    order = np.random.RandomState(seed).permutation(p).astype(np.int32)
    # pack AABB -> world instance AABBs via the 8 corners
    from echorenderer_tpu.ops.pallas_intersect import pack_sorted_prims

    _, _, _, _, lo, hi = pack_sorted_prims(geom, np.arange(p))
    plo, phi = lo.min(0), hi.max(0)
    corners = np.array([[plo[i] if b & (1 << i) else phi[i] for i in range(3)] for b in range(8)])
    ilo, ihi = [], []
    for m in mats:
        wc = corners @ m[:3, :3].T + m[:3, 3]
        ilo.append(wc.min(0))
        ihi.append(wc.max(0))
    soa = ph.build_hier_soa_instanced(
        geom, [order], np.zeros(len(mats), np.int64), inv_a, inv_b,
        np.asarray(ilo, np.float32), np.asarray(ihi, np.float32),
    )
    return soa, mats


def test_instanced_trace_matches_baked():
    geom = _geometry(300, 60, seed=13)
    soa, mats = _build_instanced(geom)
    assert soa.instanced
    baked = _bake(geom, mats)

    o, d = _rays(256, seed=14)
    o = o * jnp.asarray([3.0, 3.0, 3.0])  # cover the spread-out instances
    ig = jnp.full((256,), -1, jnp.int32)
    h = ph.intersect_hier(geom, soa, o, d, jnp.inf, ig)
    r = intersect_linear(baked, o, d, jnp.inf, ig)

    rb = np.asarray(r.prim)
    exp_inst, exp_prim = _baked_to_pair(np.maximum(rb, 0), len(mats), 300, 60)
    exp_inst = np.where(rb >= 0, exp_inst, 0)
    exp_prim = np.where(rb >= 0, exp_prim, -1)

    np.testing.assert_array_equal(np.asarray(h.prim), exp_prim)
    np.testing.assert_array_equal(np.asarray(h.inst), exp_inst)
    both = np.asarray(h.prim) >= 0
    np.testing.assert_allclose(np.asarray(h.t)[both], np.asarray(r.t)[both], rtol=2e-3, atol=1e-4)
    assert both.mean() > 0.08  # the scene actually gets hit


def test_instanced_occlude_and_ignore():
    geom = _geometry(200, 40, seed=15)
    soa, mats = _build_instanced(geom, seed=22)
    baked = _bake(geom, mats)

    o, d = _rays(128, seed=16)
    o = o * jnp.asarray([3.0, 3.0, 3.0])
    ig = jnp.full((128,), -1, jnp.int32)
    t_max = jnp.full((128,), 30.0)
    b = ph.occlude_hier(geom, soa, o, d, t_max, ig)
    br = occlude_linear(baked, o, d, t_max, ig)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(br))

    # per-instance ignore: re-trace from each hit ignoring (prim, inst);
    # the same (prim, inst) pair must never win again, and findFar spheres
    # exit through their own far interface
    h = ph.intersect_hier(geom, soa, o, d, jnp.inf, ig)
    h2 = ph.intersect_hier(
        geom, soa, o, d, jnp.inf,
        jnp.maximum(h.prim, 0), ignore_inst=h.inst,
    )
    again = (h2.prim == h.prim) & (h2.inst == h.inst) & (h.prim >= 0)
    tri_again = again & (np.asarray(h.prim) < 200)
    assert not bool(np.asarray(tri_again).any())

    # rays from inside each instance's first sphere, ignoring it, must hit
    # its own far root at t = world radius (findFar across the transform)
    n_i = len(mats)
    centers, dirs, igs, insts, radii = [], [], [], [], []
    for j, m in enumerate(mats):
        c_local = np.asarray(geom.sph_center)[0]
        r_local = float(np.asarray(geom.sph_radius)[0])
        s = float(np.linalg.norm(m[:3, 0]))
        centers.append(m[:3, :3] @ c_local + m[:3, 3])
        dirs.append([1.0, 0.0, 0.0])
        igs.append(200)  # storage id of sphere 0
        insts.append(j)
        radii.append(r_local * s)
    pad = 128 - n_i
    o2 = jnp.asarray(np.pad(np.asarray(centers, np.float32), ((0, pad), (0, 0))))
    d2 = jnp.asarray(np.pad(np.asarray(dirs, np.float32), ((0, pad), (0, 0)), constant_values=1.0))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    ig2 = jnp.asarray(np.pad(np.asarray(igs, np.int32), (0, pad), constant_values=-1))
    ii2 = jnp.asarray(np.pad(np.asarray(insts, np.int32), (0, pad)))
    hf = ph.intersect_hier(geom, soa, o2, d2, jnp.inf, ig2, ignore_inst=ii2)
    hit_own = (np.asarray(hf.prim)[:n_i] == 200) & (np.asarray(hf.inst)[:n_i] == np.arange(n_i))
    ts = np.asarray(hf.t)[:n_i]
    close = np.abs(ts - np.asarray(radii)) < np.asarray(radii) * 5e-3
    assert (hit_own & close).mean() > 0.5  # most exit their own sphere


def test_instanced_two_packs():
    """Two distinct packs, interleaved instances; oracle = baked linear."""
    g1 = _geometry(150, 30, seed=17)
    g2 = _geometry(90, 0, seed=18)
    # combined storage space: g1 tris, g2 tris, g1 spheres
    from echorenderer_tpu.ops.intersect import FlatGeometry

    nt1, nt2, ns1 = 150, 90, 30
    cat = lambda a, b: jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], 0)
    geom = FlatGeometry(
        tri_v0=cat(g1.tri_v0, g2.tri_v0), tri_e1=cat(g1.tri_e1, g2.tri_e1),
        tri_e2=cat(g1.tri_e2, g2.tri_e2),
        tri_n0=cat(g1.tri_n0, g2.tri_n0), tri_n1=cat(g1.tri_n1, g2.tri_n1),
        tri_n2=cat(g1.tri_n2, g2.tri_n2),
        tri_uv0=cat(g1.tri_uv0, g2.tri_uv0), tri_uv1=cat(g1.tri_uv1, g2.tri_uv1),
        tri_uv2=cat(g1.tri_uv2, g2.tri_uv2),
        tri_mat=cat(g1.tri_mat, g2.tri_mat),
        sph_center=g1.sph_center, sph_radius=g1.sph_radius, sph_mat=g1.sph_mat,
    )
    pack1_ids = np.concatenate([np.arange(nt1), nt1 + nt2 + np.arange(ns1)])
    pack2_ids = nt1 + np.arange(nt2)
    rs = np.random.RandomState(23)
    orders = [pack1_ids[rs.permutation(len(pack1_ids))], pack2_ids[rs.permutation(nt2)]]

    mats, inv_a, inv_b = _instances()
    inst_pack = np.asarray([0, 1, 0, 1, 0], np.int64)

    from echorenderer_tpu.ops.pallas_intersect import pack_sorted_prims

    _, _, _, _, lo, hi = pack_sorted_prims(geom, np.arange(nt1 + nt2 + ns1))
    ilo, ihi = [], []
    for j, m in enumerate(mats):
        ids = orders[inst_pack[j]]
        plo, phi = lo[ids].min(0), hi[ids].max(0)
        corners = np.array([[plo[i] if b & (1 << i) else phi[i] for i in range(3)] for b in range(8)])
        wc = corners @ m[:3, :3].T + m[:3, 3]
        ilo.append(wc.min(0))
        ihi.append(wc.max(0))
    soa = ph.build_hier_soa_instanced(
        geom, orders, inst_pack, inv_a, inv_b,
        np.asarray(ilo, np.float32), np.asarray(ihi, np.float32),
    )

    # baked oracle: expand each instance's own pack
    t_all = nt1 + nt2
    exp_v0, exp_e1, exp_e2, exp_c, exp_r, key = [], [], [], [], [], []
    for j, m in enumerate(mats):
        ids = [pack1_ids, pack2_ids][inst_pack[j]]
        tri_ids = ids[ids < t_all]
        sph_ids = ids[ids >= t_all] - t_all
        r3, tr = m[:3, :3], m[:3, 3]
        exp_v0.append(np.asarray(geom.tri_v0)[tri_ids] @ r3.T + tr)
        exp_e1.append(np.asarray(geom.tri_e1)[tri_ids] @ r3.T)
        exp_e2.append(np.asarray(geom.tri_e2)[tri_ids] @ r3.T)
        s = np.linalg.norm(r3[:, 0])
        exp_c.append(np.asarray(geom.sph_center)[sph_ids] @ r3.T + tr)
        exp_r.append(np.asarray(geom.sph_radius)[sph_ids] * s)
        key += [(j, int(p)) for p in tri_ids]
    for j, m in enumerate(mats):
        ids = [pack1_ids, pack2_ids][inst_pack[j]]
        sph_ids = ids[ids >= t_all]
        key += [(j, int(p)) for p in sph_ids]
    nt = sum(len(v) for v in exp_v0)
    z3 = np.zeros((nt, 3), np.float32)
    z2 = np.zeros((nt, 2), np.float32)
    baked = FlatGeometry(
        tri_v0=jnp.asarray(np.concatenate(exp_v0).astype(np.float32)),
        tri_e1=jnp.asarray(np.concatenate(exp_e1).astype(np.float32)),
        tri_e2=jnp.asarray(np.concatenate(exp_e2).astype(np.float32)),
        tri_n0=jnp.asarray(z3), tri_n1=jnp.asarray(z3), tri_n2=jnp.asarray(z3),
        tri_uv0=jnp.asarray(z2), tri_uv1=jnp.asarray(z2), tri_uv2=jnp.asarray(z2),
        tri_mat=jnp.zeros(nt, jnp.int32),
        sph_center=jnp.asarray(np.concatenate(exp_c).astype(np.float32)),
        sph_radius=jnp.asarray(np.concatenate(exp_r).astype(np.float32)),
        sph_mat=jnp.zeros(sum(len(r) for r in exp_r), jnp.int32),
    )

    o, d = _rays(192, seed=19)
    o = o * jnp.asarray([3.0, 3.0, 3.0])
    ig = jnp.full((192,), -1, jnp.int32)
    h = ph.intersect_hier(geom, soa, o, d, jnp.inf, ig)
    r = intersect_linear(baked, o, d, jnp.inf, ig)
    rb = np.asarray(r.prim)
    exp = np.asarray([key[p] if p >= 0 else (0, -1) for p in rb])
    np.testing.assert_array_equal(np.asarray(h.prim), exp[:, 1])
    np.testing.assert_array_equal(np.asarray(h.inst) * (exp[:, 1] >= 0), exp[:, 0] * (exp[:, 1] >= 0))
    both = np.asarray(h.prim) >= 0
    np.testing.assert_allclose(np.asarray(h.t)[both], np.asarray(r.t)[both], rtol=2e-3, atol=1e-4)
