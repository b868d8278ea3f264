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
