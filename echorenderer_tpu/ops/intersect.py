"""Ray-primitive intersection ops.

TPU-native rebuild of the reference's intersection math:
  - Möller–Trumbore ray/triangle (Scenic/Geometries/TriangleEntity.cs:204-240)
  - ray/sphere with far-root selection (Scenic/Geometries/SphereEntity.cs:88)
  - brute-force "linear accelerator" (Aggregation/Acceleration/LinearAccelerator.cs)

All functions are batched over a leading ray axis; the linear accelerator
broadcasts rays against all primitives at once, which on TPU is a dense
(R, T) computation that the VPU eats — the analogue of the reference's
4-wide SIMD nodes, but 8x128 wide and fused by XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = jnp.float32(3.4e38)
# minimum travel distance for new rays, mirroring the self-intersection
# avoidance epsilon in the reference (Aggregation/Primitives/TraceQuery.cs)
RAY_EPSILON = jnp.float32(2.4e-4)


class Hit(NamedTuple):
    """SoA hit record for a batch of rays. `inst` identifies which scene
    instance owns the hit for TLAS-instanced scenes (reference
    TokenHierarchy.cs:17 carries the same instance token alongside the
    prim token); non-instanced accelerators report instance 0."""

    t: jax.Array  # (N,) distance, INF on miss
    prim: jax.Array  # (N,) int32 primitive id, -1 on miss
    uv: jax.Array  # (N, 2) triangle barycentrics (spheres: see interact())
    inst: jax.Array | None = None  # (N,) int32 instance id (None == all 0)

    @property
    def found(self) -> jax.Array:
        return self.prim >= 0

    @property
    def inst_or_zero(self) -> jax.Array:
        if self.inst is None:
            return jnp.zeros_like(self.prim)
        return self.inst


def ray_triangle(o, d, v0, e1, e2):
    """Möller–Trumbore. Shapes broadcast; returns (t, u, v, valid) where
    valid requires t > 0 and barycentrics inside the triangle."""
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    s = o - v0
    u = jnp.sum(s * p, axis=-1) * inv
    q = jnp.cross(s, e1)
    v = jnp.sum(d * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return t, u, v, valid


def ray_sphere_roots(o, d, center, radius):
    """Ray/sphere intersection returning BOTH roots (t_near <= t_far) and
    the discriminant validity mask. Callers pick the root: the near one
    normally, the far one when the sphere is the query's `ignore` target —
    the reference's findFar semantics (SphereEntity.cs:88) that let a
    refracted ray leaving a sphere hit its own exit interface."""
    f = o - center
    b = jnp.sum(f * d, axis=-1)
    c = jnp.sum(f * f, axis=-1) - radius * radius
    disc = b * b - c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return -b - sq, -b + sq, ok


def ray_sphere(o, d, center, radius, find_far=False):
    """Ray/sphere intersection returning the near (or far) positive root."""
    t_near, t_far, ok = ray_sphere_roots(o, d, center, radius)
    if find_far:
        t = t_far
    else:
        t = jnp.where(t_near > 0.0, t_near, t_far)
    valid = ok & (t > 0.0)
    return t, valid


def sphere_pick_root(t_near, t_far, ok, ignored, eps=RAY_EPSILON):
    """Select the sphere hit distance under `ignore` semantics: ignored
    spheres contribute only their far root (the exit interface), everything
    else takes the first root beyond eps (TraceQuery.cs:17 + findFar)."""
    t_std = jnp.where(t_near > eps, t_near, t_far)
    t = jnp.where(ignored, t_far, t_std)
    return t, ok & (t > eps)


def sphere_uv(local_point, radius):
    """Spherical (u, v) parameterization of a point on a sphere surface,
    matching PreparedSphere.GetTexcoord conventions (equirectangular)."""
    p = local_point / jnp.maximum(radius[..., None], 1e-20)
    theta = jnp.arccos(jnp.clip(p[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(p[..., 0], p[..., 2])
    u = (phi / (2.0 * jnp.pi)) + 0.5
    v = 1.0 - theta / jnp.pi
    return jnp.stack([u, v], axis=-1)


class FlatGeometry(NamedTuple):
    """Prepared SoA geometry of one pack — the device analogue of the
    reference's GeometryCollection (Aggregation/Preparation/GeometryCollection.cs).

    Primitive index space: [0, T) triangles, [T, T+S) spheres.
    Triangles store v0/e1/e2 exactly like PreparedTriangle
    (TriangleEntity.cs:103) plus per-vertex shading normals and texcoords.
    """

    tri_v0: jax.Array  # (T, 3)
    tri_e1: jax.Array  # (T, 3)
    tri_e2: jax.Array  # (T, 3)
    tri_n0: jax.Array  # (T, 3) shading normals
    tri_n1: jax.Array
    tri_n2: jax.Array
    tri_uv0: jax.Array  # (T, 2)
    tri_uv1: jax.Array
    tri_uv2: jax.Array
    tri_mat: jax.Array  # (T,) int32
    sph_center: jax.Array  # (S, 3)
    sph_radius: jax.Array  # (S,)
    sph_mat: jax.Array  # (S,) int32

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]

    @property
    def num_spheres(self) -> int:
        return self.sph_center.shape[0]

    @property
    def num_primitives(self) -> int:
        return self.num_triangles + self.num_spheres


def intersect_linear(geom: FlatGeometry, o, d, t_max, ignore) -> Hit:
    """Brute-force closest-hit over all primitives: rays (N, 3) against all
    T triangles and S spheres as one dense broadcast."""
    n = o.shape[0]
    # clamp to the INF sentinel so t_max=jnp.inf can't record phantom hits
    best_t = jnp.broadcast_to(jnp.minimum(jnp.asarray(t_max, jnp.float32), INF), (n,))
    best_prim = jnp.full((n,), -1, jnp.int32)
    best_uv = jnp.zeros((n, 2), jnp.float32)

    if geom.num_triangles:
        t, u, v, valid = ray_triangle(
            o[:, None, :], d[:, None, :], geom.tri_v0[None], geom.tri_e1[None], geom.tri_e2[None]
        )  # (N, T)
        prim_ids = jnp.arange(geom.num_triangles, dtype=jnp.int32)[None, :]
        valid &= (t > RAY_EPSILON) & (prim_ids != ignore[:, None])
        t = jnp.where(valid, t, INF)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        closer = tj < best_t
        best_prim = jnp.where(closer, j.astype(jnp.int32), best_prim)
        best_uv = jnp.where(
            closer[:, None],
            jnp.stack(
                [
                    jnp.take_along_axis(u, j[:, None], axis=1)[:, 0],
                    jnp.take_along_axis(v, j[:, None], axis=1)[:, 0],
                ],
                axis=-1,
            ),
            best_uv,
        )
        best_t = jnp.where(closer, tj, best_t)

    if geom.num_spheres:
        t_near, t_far, ok = ray_sphere_roots(
            o[:, None, :], d[:, None, :], geom.sph_center[None], geom.sph_radius[None]
        )  # (N, S)
        prim_ids = (
            jnp.arange(geom.num_spheres, dtype=jnp.int32)[None, :] + geom.num_triangles
        )
        t, valid = sphere_pick_root(t_near, t_far, ok, prim_ids == ignore[:, None])
        t = jnp.where(valid, t, INF)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        closer = tj < best_t
        best_prim = jnp.where(
            closer, j.astype(jnp.int32) + geom.num_triangles, best_prim
        )
        best_t = jnp.where(closer, tj, best_t)

    return Hit(t=best_t, prim=best_prim, uv=best_uv)


def occlude_linear(geom: FlatGeometry, o, d, t_max, ignore) -> jax.Array:
    """Any-hit test (shadow rays): True where the segment [eps, t_max) is
    blocked. Analogue of OccludeQuery (Aggregation/Primitives/OccludeQuery.cs)."""
    n = o.shape[0]
    blocked = jnp.zeros((n,), bool)
    if geom.num_triangles:
        t, _, _, valid = ray_triangle(
            o[:, None, :], d[:, None, :], geom.tri_v0[None], geom.tri_e1[None], geom.tri_e2[None]
        )
        prim_ids = jnp.arange(geom.num_triangles, dtype=jnp.int32)[None, :]
        valid &= (t > RAY_EPSILON) & (t < t_max[:, None]) & (prim_ids != ignore[:, None])
        blocked |= jnp.any(valid, axis=1)
    if geom.num_spheres:
        t_near, t_far, ok = ray_sphere_roots(
            o[:, None, :], d[:, None, :], geom.sph_center[None], geom.sph_radius[None]
        )
        prim_ids = (
            jnp.arange(geom.num_spheres, dtype=jnp.int32)[None, :] + geom.num_triangles
        )
        t, valid = sphere_pick_root(t_near, t_far, ok, prim_ids == ignore[:, None])
        valid &= t < t_max[:, None]
        blocked |= jnp.any(valid, axis=1)
    return blocked
