"""Pallas TPU kernels for ray-primitive intersection.

The performance heart of the framework (SURVEY.md §7 step 4, replacing the
reference's unsafe SIMD QBVH hot loop, QuadBoundingVolumeHierarchy.cs:121).

Why dense, not a pointer-chasing BVH: the XLA lockstep BVH walk
(aggregation/bvh.py) is gather-bound on TPU — every iteration fetches
nodes at per-lane dynamic indices from HBM, which serializes. The plain
XLA dense broadcast is better but writes every (N, T) intermediate back to
HBM (~15 temporaries for Möller-Trumbore), so it runs at ~1% of VPU peak.
This kernel tiles the computation: a block of BR rays stays resident in
VMEM while primitive chunks of BP stream past; all intermediates live in
registers/VMEM and only the running best-hit (BR, 1) columns are carried.
Primitives sit on sublanes, rays on lanes (prim rows transpose per
chunk — the only relayout direction Mosaic supports here).

Scenes up to ~16k primitives keep the whole primitive SoA VMEM-resident
(the common case for every reference benchmark scene); larger scenes fall
back to the two-level path in aggregation/ until the streaming-DMA variant
lands.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF, FlatGeometry, Hit, sphere_uv

_INF = 3.4e38  # python floats: jnp scalars would be captured consts in the kernel
_EPS = 2.4e-4  # RAY_EPSILON

RAY_BLOCK = 1024  # rays per grid step, laid out (G, 8, 128)
PRIM_BLOCK = 128  # primitives per grid chunk (streamed HBM -> VMEM)
# dense intersection cost grows linearly in prims; beyond this the
# hierarchical path wins (the limit is compute, not VMEM — chunks stream)
PALLAS_PRIM_LIMIT = 131072
VMEM_PRIM_LIMIT = PALLAS_PRIM_LIMIT  # backwards-compat alias


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class PrimSoA(NamedTuple):
    """Primitive data laid out for the kernel: (1, P) rows, triangles then
    spheres, padded to PRIM_BLOCK. Spheres are encoded in the same 9 rows:
    a/b/c = center, d/e/f = (radius, 0, 0)."""

    ax: jax.Array
    ay: jax.Array
    az: jax.Array
    bx: jax.Array
    by: jax.Array
    bz: jax.Array
    cx: jax.Array
    cy: jax.Array
    cz: jax.Array
    is_sphere: jax.Array  # (1, P) float32 0/1
    num_tris: int  # static: unpadded triangle count
    num_prims: int  # static: unpadded prim count (tris + spheres)

    @property
    def padded(self) -> int:
        return self.ax.shape[1]


def build_prim_soa(geom: FlatGeometry) -> PrimSoA:
    """Host-side packing of FlatGeometry into kernel layout."""
    t = geom.num_triangles
    s = geom.num_spheres
    p = t + s
    pad = -(-max(p, 1) // PRIM_BLOCK) * PRIM_BLOCK

    def row(tri_vals, sph_vals, fill):
        out = np.full(pad, fill, np.float32)
        if t:
            out[:t] = np.asarray(tri_vals)
        if s:
            out[t:p] = np.asarray(sph_vals)
        return jnp.asarray(out[None, :])

    zt = np.zeros(max(t, 1), np.float32)[: t or 1]
    zs = np.zeros(max(s, 1), np.float32)[: s or 1]
    v0 = np.asarray(geom.tri_v0) if t else np.zeros((1, 3), np.float32)
    e1 = np.asarray(geom.tri_e1) if t else np.zeros((1, 3), np.float32)
    e2 = np.asarray(geom.tri_e2) if t else np.zeros((1, 3), np.float32)
    sc = np.asarray(geom.sph_center) if s else np.zeros((1, 3), np.float32)
    sr = np.asarray(geom.sph_radius) if s else np.zeros(1, np.float32)

    soa = PrimSoA(
        # padded entries: v0 far away, e1=e2=0 -> det=0 -> invalid
        ax=row(v0[:t, 0] if t else zt, sc[:s, 0] if s else zs, 1e30),
        ay=row(v0[:t, 1] if t else zt, sc[:s, 1] if s else zs, 1e30),
        az=row(v0[:t, 2] if t else zt, sc[:s, 2] if s else zs, 1e30),
        bx=row(e1[:t, 0] if t else zt, sr[:s] if s else zs, 0.0),
        by=row(e1[:t, 1] if t else zt, zs, 0.0),
        bz=row(e1[:t, 2] if t else zt, zs, 0.0),
        cx=row(e2[:t, 0] if t else zt, zs, 0.0),
        cy=row(e2[:t, 1] if t else zt, zs, 0.0),
        cz=row(e2[:t, 2] if t else zt, zs, 0.0),
        is_sphere=row(np.zeros(t, np.float32) if t else zt,
                      np.ones(s, np.float32) if s else zs, 0.0),
        num_tris=t,
        num_prims=p,
    )
    return soa


jax.tree_util.register_pytree_node(
    PrimSoA,
    lambda s: (tuple(s[:10]), (s.num_tris, s.num_prims)),
    lambda aux, xs: PrimSoA(*xs, *aux),
)


def _chunk_hits(prim_block, k_base, ox, oy, oz, dx, dy, dz, ignore_f,
                has_tri, has_sph):
    """Intersect the ray block against one (1, BP)-blocked prim chunk.
    Returns (t, u, v, pid) as (BP, BR) — prims on sublanes, rays on lanes —
    with t = INF where invalid. Prim rows transpose (1, BP) -> (BP, 1)
    here (the only relayout Mosaic supports for this orientation). The
    has_tri/has_sph flags are static per scene: single-type scenes skip
    the other intersection entirely."""
    tr = lambda r: jnp.transpose(r[:])
    ax, ay, az = tr(prim_block[0]), tr(prim_block[1]), tr(prim_block[2])
    bx, by, bz = tr(prim_block[3]), tr(prim_block[4]), tr(prim_block[5])
    cx, cy, cz = tr(prim_block[6]), tr(prim_block[7]), tr(prim_block[8])
    sph = tr(prim_block[9])

    t_tri = u = v = None
    if has_tri:
        # --- Möller-Trumbore, fully scalarized per component ---
        px = dy * cz - dz * cy
        py = dz * cx - dx * cz
        pz = dx * cy - dy * cx
        det = bx * px + by * py + bz * pz
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
        sx = ox - ax
        sy = oy - ay
        sz = oz - az
        u = (sx * px + sy * py + sz * pz) * inv
        qx = sy * bz - sz * by
        qy = sz * bx - sx * bz
        qz = sx * by - sy * bx
        v = (dx * qx + dy * qy + dz * qz) * inv
        t_tri = (cx * qx + cy * qy + cz * qz) * inv
        tri_ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t_tri > _EPS)
        )

    if has_sph:
        # --- sphere: a=center, bx=radius ---
        fx = ox - ax
        fy = oy - ay
        fz = oz - az
        bq = fx * dx + fy * dy + fz * dz
        cq = fx * fx + fy * fy + fz * fz - bx * bx
        disc = bq * bq - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -bq - sq
        t_far = -bq + sq
        t_sph = jnp.where(t_near > _EPS, t_near, t_far)
        sph_ok = (disc >= 0.0) & (t_sph > _EPS)

    if has_tri and has_sph:
        is_sph = sph > 0.5
        t = jnp.where(is_sph, t_sph, t_tri)
        # logical compose, not select: Mosaic can't select between i1 vectors
        ok = (is_sph & sph_ok) | (~is_sph & tri_ok)
    elif has_tri:
        t, ok = t_tri, tri_ok
    else:
        t, ok = t_sph, sph_ok
    if u is None:
        u = jnp.zeros_like(t)
        v = jnp.zeros_like(t)

    # prim ids + ignore mask (prims are axis 0 in this orientation)
    pid = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0).astype(jnp.float32) + k_base
    ok &= pid != ignore_f
    return jnp.where(ok, t, _INF), u, v, pid


def _row(ref):
    """Read a (1, 8, 128) ray block as a (1, RAY_BLOCK) lane row. Ray
    arrays live as (G, 8, 128) in HBM — a dense (8, 128) tile per block,
    no padding."""
    return ref[:].reshape(1, -1)


def _trace_kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tmax_r, ign_r,
                  *prim_refs, t_out, prim_out, u_out, v_out, has_tri, has_sph):
    j = pl.program_id(1)
    ox, oy, oz = _row(ox_r), _row(oy_r), _row(oz_r)
    dx, dy, dz = _row(dx_r), _row(dy_r), _row(dz_r)
    ignore_f = _row(ign_r)

    k_base = (j * PRIM_BLOCK).astype(jnp.float32)
    t, u, v, pid = _chunk_hits(prim_refs, k_base, ox, oy, oz, dx, dy, dz,
                               ignore_f, has_tri, has_sph)
    tm = jnp.min(t, axis=0, keepdims=True)  # (1, BR)
    sel = t <= tm
    pm = jnp.min(jnp.where(sel, pid, 3.4e38), axis=0, keepdims=True)
    um = jnp.sum(jnp.where(sel & (pid == pm), u, 0.0), axis=0, keepdims=True)
    vm = jnp.sum(jnp.where(sel & (pid == pm), v, 0.0), axis=0, keepdims=True)

    # running best lives in the output block, which Pallas keeps resident
    # across the prim-chunk grid dimension (out index map ignores j)
    first = j == 0
    best_t = jnp.where(first, _row(tmax_r), t_out[:].reshape(1, -1))
    best_p = jnp.where(first, -1.0, prim_out[:].reshape(1, -1))
    best_u = jnp.where(first, 0.0, u_out[:].reshape(1, -1))
    best_v = jnp.where(first, 0.0, v_out[:].reshape(1, -1))
    closer = tm < best_t
    t_out[:] = jnp.where(closer, tm, best_t).reshape(1, 8, 128)
    prim_out[:] = jnp.where(closer, pm, best_p).reshape(1, 8, 128)
    u_out[:] = jnp.where(closer, um, best_u).reshape(1, 8, 128)
    v_out[:] = jnp.where(closer, vm, best_v).reshape(1, 8, 128)


def _occlude_kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tmax_r, ign_r,
                    *prim_refs, out_ref, has_tri, has_sph):
    j = pl.program_id(1)
    ox, oy, oz = _row(ox_r), _row(oy_r), _row(oz_r)
    dx, dy, dz = _row(dx_r), _row(dy_r), _row(dz_r)
    tmax = _row(tmax_r)
    ignore_f = _row(ign_r)

    k_base = (j * PRIM_BLOCK).astype(jnp.float32)
    t, _, _, _ = _chunk_hits(prim_refs, k_base, ox, oy, oz, dx, dy, dz,
                             ignore_f, has_tri, has_sph)
    hit = jnp.any(t < tmax, axis=0, keepdims=True)
    prev = jnp.where(j == 0, 0.0, out_ref[:].reshape(1, -1))
    out_ref[:] = jnp.where(hit, 1.0, prev).reshape(1, 8, 128)


def _ray_cols(o, d, t_max, ignore, n_pad):
    n = o.shape[0]

    def col(x, fill=0.0):
        """(n,) -> (n_pad/BR, BR): dense lane-major blocks, no tile padding."""
        x = jnp.asarray(x, jnp.float32)
        x = jnp.broadcast_to(x, (n,))
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(-1, 8, 128)

    return (
        col(o[:, 0]), col(o[:, 1]), col(o[:, 2]),
        col(d[:, 0]), col(d[:, 1]), col(d[:, 2], 1.0),
        col(t_max, -1.0),  # padded lanes: t_max < 0 -> nothing hits
        col(ignore.astype(jnp.float32), -1.0),
    )


def _specs(g, padded_prims):
    num_chunks = padded_prims // PRIM_BLOCK
    grid = (g, num_chunks)
    ray_spec = pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec((1, PRIM_BLOCK), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    return grid, ray_spec, prim_spec, out_spec


@functools.partial(jax.jit, static_argnames=("num_tris", "num_prims"))
def _trace_call(cols, prim_rows, num_tris, num_prims):
    g = cols[0].shape[0]  # ray blocks
    grid, ray_spec, prim_spec, out_spec = _specs(g, prim_rows[0].shape[1])
    kernel = functools.partial(
        _wrap_trace, has_tri=num_tris > 0, has_sph=num_prims > num_tris
    )
    t, p, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 8 + [prim_spec] * 10,
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((g, 8, 128), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*cols, *prim_rows)
    return t.reshape(-1), p.reshape(-1), u.reshape(-1), v.reshape(-1)


def _wrap_trace(*refs, has_tri, has_sph):
    ins, outs = refs[:18], refs[18:]
    _trace_kernel(
        *ins[:8], *ins[8:18],
        t_out=outs[0], prim_out=outs[1], u_out=outs[2], v_out=outs[3],
        has_tri=has_tri, has_sph=has_sph,
    )


def _wrap_occlude(*refs, has_tri, has_sph):
    ins, out = refs[:18], refs[18]
    _occlude_kernel(*ins[:8], *ins[8:18], out_ref=out, has_tri=has_tri, has_sph=has_sph)


@functools.partial(jax.jit, static_argnames=("num_tris", "num_prims"))
def _occlude_call(cols, prim_rows, num_tris, num_prims):
    g = cols[0].shape[0]  # ray blocks
    grid, ray_spec, prim_spec, out_spec = _specs(g, prim_rows[0].shape[1])
    blocked = pl.pallas_call(
        functools.partial(
            _wrap_occlude, has_tri=num_tris > 0, has_sph=num_prims > num_tris
        ),
        grid=grid,
        in_specs=[ray_spec] * 8 + [prim_spec] * 10,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*cols, *prim_rows)
    return blocked.reshape(-1)


def intersect_pallas(geom: FlatGeometry, soa: PrimSoA, o, d, t_max, ignore) -> Hit:
    """Closest-hit over all primitives via the tiled VMEM kernel."""
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    cols = _ray_cols(o, d, t_max, ignore, n_pad)
    t, p, u, v = _trace_call(cols, tuple(soa[:10]), soa.num_tris, soa.num_prims)
    t, p, u, v = t[:n], p[:n], u[:n], v[:n]
    prim = jnp.where(p >= 0.0, p, -1.0).astype(jnp.int32)
    found = prim >= 0
    # sphere uv computed post-hoc for the single best hit per lane
    is_sph = found & (prim >= soa.num_tris)
    if geom.num_spheres:
        si = jnp.clip(prim - soa.num_tris, 0, geom.num_spheres - 1)
        point = o + d * t[:, None]
        suv = sphere_uv(point - geom.sph_center[si], geom.sph_radius[si])
        uv = jnp.where(is_sph[:, None], suv, jnp.stack([u, v], axis=-1))
    else:
        uv = jnp.stack([u, v], axis=-1)
    return Hit(t=jnp.where(found, t, INF), prim=jnp.where(found, prim, -1), uv=uv)


def occlude_pallas(geom: FlatGeometry, soa: PrimSoA, o, d, t_max, ignore) -> jax.Array:
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    cols = _ray_cols(o, d, t_max, ignore, n_pad)
    blocked = _occlude_call(cols, tuple(soa[:10]), soa.num_tris, soa.num_prims)
    return blocked[:n] > 0.5
