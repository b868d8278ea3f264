"""Pallas intersection kernel tests (interpret mode on CPU): the XLA dense
path is the oracle. Exercises both static variants — the single-chunk fast
path and the multi-chunk streaming path with packet culling + prim
reordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.ops import pallas_intersect as pi
from echorenderer_tpu.ops.intersect import (
    FlatGeometry,
    intersect_linear,
    occlude_linear,
)


def _geometry(num_tris, num_spheres, seed=0):
    rs = np.random.RandomState(seed)
    v0 = rs.uniform(-10, 10, (num_tris, 3)).astype(np.float32)
    e1 = rs.uniform(-1, 1, (num_tris, 3)).astype(np.float32)
    e2 = rs.uniform(-1, 1, (num_tris, 3)).astype(np.float32)
    z3 = np.zeros((num_tris, 3), np.float32)
    z2 = np.zeros((num_tris, 2), np.float32)
    return FlatGeometry(
        tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
        tri_n0=jnp.asarray(z3), tri_n1=jnp.asarray(z3), tri_n2=jnp.asarray(z3),
        tri_uv0=jnp.asarray(z2), tri_uv1=jnp.asarray(z2), tri_uv2=jnp.asarray(z2),
        tri_mat=jnp.zeros(num_tris, jnp.int32),
        sph_center=jnp.asarray(rs.uniform(-10, 10, (num_spheres, 3)).astype(np.float32)),
        sph_radius=jnp.asarray(rs.uniform(0.3, 1.5, num_spheres).astype(np.float32)),
        sph_mat=jnp.zeros(num_spheres, jnp.int32),
    )


def _rays(n, seed=1):
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(-12, 12, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


@pytest.mark.parametrize(
    "num_tris,num_spheres,order",
    [
        (40, 20, False),     # single chunk, mixed types (fast path)
        (50, 0, False),      # tris only (static specialization)
        (0, 30, False),      # spheres only
        (200, 100, True),    # 3 chunks: streaming + culling + reorder
    ],
    ids=["mixed-1chunk", "tris-only", "spheres-only", "multichunk-reorder"],
)
def test_trace_matches_linear(num_tris, num_spheres, order):
    geom = _geometry(num_tris, num_spheres)
    perm = None
    if order:  # a deterministic shuffle stands in for the BVH leaf order
        perm = np.random.RandomState(9).permutation(num_tris + num_spheres)
    soa = pi.build_prim_soa(geom, order=perm)
    o, d = _rays(256)
    ig = jnp.full((256,), -1, jnp.int32)
    h = pi.intersect_pallas(geom, soa, o, d, jnp.inf, ig)
    r = intersect_linear(geom, o, d, jnp.inf, ig)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(r.prim))
    both = np.asarray(h.prim) >= 0
    np.testing.assert_allclose(
        np.asarray(h.t)[both], np.asarray(r.t)[both], rtol=1e-4
    )
    # uv carries triangle barycentrics only (sphere uv derives in interact)
    tri = both & (np.asarray(h.prim) < num_tris)
    np.testing.assert_allclose(
        np.asarray(h.uv)[tri], np.asarray(r.uv)[tri], atol=1e-4
    )


def test_occlude_matches_linear_multichunk():
    geom = _geometry(300, 60, seed=3)
    perm = np.random.RandomState(4).permutation(360)
    soa = pi.build_prim_soa(geom, order=perm)
    o, d = _rays(256, seed=5)
    ig = jnp.full((256,), -1, jnp.int32)
    t_max = jnp.full((256,), 8.0)
    b = pi.occlude_pallas(geom, soa, o, d, t_max, ig)
    br = occlude_linear(geom, o, d, t_max, ig)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(br))


def test_ignore_respected_across_reorder():
    geom = _geometry(200, 0, seed=7)
    perm = np.random.RandomState(8).permutation(200)
    soa = pi.build_prim_soa(geom, order=perm)
    o, d = _rays(128, seed=9)
    ig0 = jnp.full((128,), -1, jnp.int32)
    first = pi.intersect_pallas(geom, soa, o, d, jnp.inf, ig0)
    ig1 = jnp.maximum(first.prim, 0)
    second = pi.intersect_pallas(geom, soa, o, d, jnp.inf, ig1)
    hit_again = (second.prim == first.prim) & (first.prim >= 0)
    assert not bool(np.asarray(hit_again).any())
