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

from .intersect import INF, FlatGeometry, Hit

_INF = 3.4e38  # python floats: jnp scalars would be captured consts in the kernel
_EPS = 2.4e-4  # RAY_EPSILON

RAY_BLOCK = 1024  # rays per grid step, laid out (G, 8, 128)
PRIM_BLOCK = 128  # primitives per grid chunk (streamed HBM -> VMEM)
# dense intersection cost grows linearly in prims; beyond this the
# hierarchical path wins (the limit is compute, not VMEM — chunks stream)
PALLAS_PRIM_LIMIT = 262144
SC_FACTOR = 32  # chunks per superchunk (second culling level)
VMEM_PRIM_LIMIT = PALLAS_PRIM_LIMIT  # backwards-compat alias


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class PrimSoA(NamedTuple):
    """Primitive data laid out for the kernel: (1, P) rows, padded to
    PRIM_BLOCK, REORDERED into BVH-leaf (spatially coherent) order so each
    PRIM_BLOCK chunk is compact in space. Spheres are encoded in the same
    9 rows: a/b/c = center, d = radius. `chunk_bounds` (8, C) holds each
    chunk's AABB (rows: min xyz, max xyz, pad) — the kernel slab-tests a
    whole ray block against it and skips the chunk when nothing can hit
    (the packet-culling role of the reference's BoxBound4 SIMD test,
    Aggregation/Bounds/BoxBound4.cs:64)."""

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
    chunk_bounds: jax.Array  # (8, C) float32: min xyz / max xyz / pad
    super_bounds: jax.Array  # (8, SC) float32: AABBs of SC_FACTOR-chunk groups
    order: jax.Array  # (P,) int32 sorted slot -> original prim id
    inv_order: jax.Array  # (P_orig,) int32 original id -> sorted slot
    num_tris: int  # static: unpadded triangle count
    num_prims: int  # static: unpadded prim count (tris + spheres)

    @property
    def padded(self) -> int:
        return self.ax.shape[1]


def pack_sorted_prims(geom: FlatGeometry, order: np.ndarray, bounds=None):
    """Host-side shared packing: primitive components permuted into the
    given (spatially coherent) order, plus per-prim AABBs. Used by both the
    dense-chunk layout below and the hierarchical layout in pallas_hier.
    Returns (a, b, c, is_sph, lo, hi) as (p, ...) numpy arrays.

    `bounds` = precomputed (bmin, bmax) per-prim AABBs in ORIGINAL order
    (aggregation.bvh.geometry_bounds output) — passing them replaces the
    min/max temporary chain with two permutes. This host is page-fault
    bound (~10-25 MB/s first touch of fresh allocations, profiled r3), so
    prep cost tracks bytes allocated, not flops."""
    t = geom.num_triangles
    s = geom.num_spheres
    v0 = np.asarray(geom.tri_v0) if t else np.zeros((0, 3), np.float32)
    e1 = np.asarray(geom.tri_e1) if t else np.zeros((0, 3), np.float32)
    e2 = np.asarray(geom.tri_e2) if t else np.zeros((0, 3), np.float32)
    sc = np.asarray(geom.sph_center) if s else np.zeros((0, 3), np.float32)
    sr = np.asarray(geom.sph_radius) if s else np.zeros(0, np.float32)

    # original-id component rows, then permute into sorted order
    a = np.concatenate([v0, sc], 0)  # (p, 3)
    b = np.concatenate([e1, np.stack([sr, np.zeros_like(sr), np.zeros_like(sr)], -1)], 0)
    c = np.concatenate([e2, np.zeros((s, 3), np.float32)], 0)
    is_sph = np.concatenate([np.zeros(t, np.float32), np.ones(s, np.float32)])
    a, b, c, is_sph = a[order], b[order], c[order], is_sph[order]
    if bounds is not None:
        lo = np.ascontiguousarray(bounds[0][order], np.float32)
        hi = np.ascontiguousarray(bounds[1][order], np.float32)
        return a, b, c, is_sph, lo, hi
    lo = np.where(is_sph[:, None] > 0.5, a - b[:, :1], np.minimum(np.minimum(a, a + b), a + c))
    hi = np.where(is_sph[:, None] > 0.5, a + b[:, :1], np.maximum(np.maximum(a, a + b), a + c))
    return a, b, c, is_sph, lo, hi


def build_prim_soa(geom: FlatGeometry, order: np.ndarray | None = None,
                   packed=None) -> PrimSoA:
    """Host-side packing of FlatGeometry into kernel layout. `order` is a
    spatially coherent permutation (BVH leaf order) so chunk AABBs stay
    tight; identity when omitted. `packed` is an optional precomputed
    pack_sorted_prims(geom, order) result shared with the hierarchical
    builder (only honored when `order` is used as passed)."""
    t = geom.num_triangles
    s = geom.num_spheres
    p = t + s
    # prims sit on SUBLANES in the kernel, so a single-chunk scene only
    # needs 8-alignment (82 prims pad to 88, not 128 — 31% less work);
    # multi-chunk scenes pad to the chunk size
    if p <= PRIM_BLOCK:
        pad = -(-max(p, 1) // 8) * 8
    else:
        pad = -(-p // PRIM_BLOCK) * PRIM_BLOCK
    if order is None or len(order) != p or pad <= PRIM_BLOCK:
        # single chunk: culling never fires, keep identity (skips the
        # sorted<->original id gathers on every trace)
        order = np.arange(p, dtype=np.int32)
        packed = None
    order = np.asarray(order, np.int32)
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(p, dtype=np.int32)

    if pad > PALLAS_PRIM_LIMIT:
        # beyond the streamed kernel's envelope the dense tables are never
        # read (scene_ops gates on padded <= limit; hier/binned traversal
        # owns these scenes) — device zeros keep shapes/`padded` honest
        # without paying ~40 MB of page-fault-bound host packing
        zrow = jnp.zeros((1, pad), jnp.float32)
        z8 = jnp.zeros((8, 1), jnp.float32)
        return PrimSoA(
            ax=zrow, ay=zrow, az=zrow, bx=zrow, by=zrow, bz=zrow,
            cx=zrow, cy=zrow, cz=zrow, is_sphere=zrow,
            chunk_bounds=z8, super_bounds=z8,
            order=jnp.asarray(order), inv_order=jnp.asarray(inv_order),
            num_tris=t, num_prims=p,
        )

    a, b, c, is_sph, lo, hi = packed if packed is not None else pack_sorted_prims(geom, order)

    def row(vals, fill):
        out = np.full(pad, fill, np.float32)
        out[:p] = vals
        return jnp.asarray(out[None, :])

    n_chunks = max(1, pad // PRIM_BLOCK)
    cb = np.zeros((8, n_chunks), np.float32)
    cb[0:3] = 1e30
    cb[3:6] = -1e30
    for ci in range(n_chunks):
        seg = slice(ci * PRIM_BLOCK, min((ci + 1) * PRIM_BLOCK, p))
        if seg.start < p:
            cb[0:3, ci] = lo[seg].min(0)
            cb[3:6, ci] = hi[seg].max(0)
    n_super = -(-n_chunks // SC_FACTOR)
    scb = np.zeros((8, n_super), np.float32)
    scb[0:3] = 1e30
    scb[3:6] = -1e30
    for si in range(n_super):
        seg = slice(si * SC_FACTOR, min((si + 1) * SC_FACTOR, n_chunks))
        scb[0:3, si] = cb[0:3, seg].min(1)
        scb[3:6, si] = cb[3:6, seg].max(1)

    soa = PrimSoA(
        # padded entries: v0 far away, e1=e2=0 -> det=0 -> invalid
        ax=row(a[:, 0], 1e30), ay=row(a[:, 1], 1e30), az=row(a[:, 2], 1e30),
        bx=row(b[:, 0], 0.0), by=row(b[:, 1], 0.0), bz=row(b[:, 2], 0.0),
        cx=row(c[:, 0], 0.0), cy=row(c[:, 1], 0.0), cz=row(c[:, 2], 0.0),
        is_sphere=row(is_sph, 0.0),
        chunk_bounds=jnp.asarray(cb),
        super_bounds=jnp.asarray(scb),
        order=jnp.asarray(order),
        inv_order=jnp.asarray(inv_order),
        num_tris=t,
        num_prims=p,
    )
    return soa


jax.tree_util.register_pytree_node(
    PrimSoA,
    lambda s: (tuple(s[:14]), (s.num_tris, s.num_prims)),
    lambda aux, xs: PrimSoA(*xs, *aux),
)


def _chunk_hits(prim_block, k_base, ox, oy, oz, dx, dy, dz, ignore_f,
                has_tri, has_sph, unit_dir=True):
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

    # prim ids + ignore mask (prims are axis 0 in this orientation);
    # triangles skip their ignore outright, spheres take the FAR root when
    # ignored (reference findFar, SphereEntity.cs:88 — a refracted ray
    # leaving a sphere must hit its own exit interface)
    pid = jax.lax.broadcasted_iota(
        jnp.int32, (ax.shape[0], ignore_f.shape[-1]), 0
    ).astype(jnp.float32) + k_base
    ignored = pid == ignore_f

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
            & ~ignored
        )

    if has_sph:
        # --- sphere: a=center, bx=radius ---
        fx = ox - ax
        fy = oy - ay
        fz = oz - az
        bq = fx * dx + fy * dy + fz * dz
        cq = fx * fx + fy * fy + fz * fz - bx * bx
        if unit_dir:
            disc = bq * bq - cq
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_near = -bq - sq
            t_far = -bq + sq
        else:
            # instanced rays carry |d| = 1/scale, so the full quadratic
            # a t^2 + 2 b t + c is needed (t stays the WORLD parameter)
            aq = dx * dx + dy * dy + dz * dz
            disc = bq * bq - aq * cq
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = 1.0 / aq
            t_near = (-bq - sq) * inv_a
            t_far = (-bq + sq) * inv_a
        # ignored spheres contribute only their far root (findFar)
        t_sph = jnp.where(ignored, t_far, jnp.where(t_near > _EPS, t_near, t_far))
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
    return jnp.where(ok, t, _INF), u, v, pid


def _row(ref):
    """Read a (1, 8, 128) ray block as a (1, RAY_BLOCK) lane row. Ray
    arrays live as (G, 8, 128) in HBM — a dense (8, 128) tile per block,
    no padding."""
    return ref[:].reshape(1, -1)


def _block_box_hit(cb_ref, n_chunks, j, ox, oy, oz, dx, dy, dz, limit, base=0):
    """Scalar: can ANY ray in the block hit chunk j's AABB before `limit`?
    The packet-culling test — one cheap (1, BR) slab test gates the whole
    (BP, BP) intersection (BoxBound4.Intersect's role, BoxBound4.cs:64).
    cb_ref is the flat scalar-prefetch table in SMEM: chunk rows first,
    superchunk rows at `base` = 8 * num_chunks."""
    inv = lambda d: jnp.where(jnp.abs(d) < 1e-12, 1e12 * jnp.where(d < 0, -1.0, 1.0), 1.0 / d)
    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    t0x = (cb_ref[base + 0 * n_chunks + j] - ox) * ix
    t1x = (cb_ref[base + 3 * n_chunks + j] - ox) * ix
    t0y = (cb_ref[base + 1 * n_chunks + j] - oy) * iy
    t1y = (cb_ref[base + 4 * n_chunks + j] - oy) * iy
    t0z = (cb_ref[base + 2 * n_chunks + j] - oz) * iz
    t1z = (cb_ref[base + 5 * n_chunks + j] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
    return jnp.any((tn <= tf) & (tf > 0.0) & (tn < limit))


def _trace_kernel(cb_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tmax_r, ign_r,
                  *prim_refs, t_out, prim_out, u_out, v_out, sc_scratch,
                  has_tri, has_sph, cull, n_chunks, n_super):
    j = pl.program_id(1)
    ox, oy, oz = _row(ox_r), _row(oy_r), _row(oz_r)
    dx, dy, dz = _row(dx_r), _row(dy_r), _row(dz_r)
    ignore_f = _row(ign_r)

    first = j == 0
    # reads at j == 0 see uninitialized blocks; the where() masks them
    best_t = jnp.where(first, _row(tmax_r), t_out[:].reshape(1, -1))
    best_p = jnp.where(first, -1.0, prim_out[:].reshape(1, -1))
    best_u = jnp.where(first, 0.0, u_out[:].reshape(1, -1))
    best_v = jnp.where(first, 0.0, v_out[:].reshape(1, -1))

    def merge():
        k_base = (j * PRIM_BLOCK).astype(jnp.float32)
        t, u, v, pid = _chunk_hits(prim_refs[:10], k_base, ox, oy, oz, dx, dy, dz,
                                   ignore_f, has_tri, has_sph)
        tm = jnp.min(t, axis=0, keepdims=True)  # (1, BR)
        sel = t <= tm
        pm = jnp.min(jnp.where(sel, pid, 3.4e38), axis=0, keepdims=True)
        um = jnp.sum(jnp.where(sel & (pid == pm), u, 0.0), axis=0, keepdims=True)
        vm = jnp.sum(jnp.where(sel & (pid == pm), v, 0.0), axis=0, keepdims=True)
        closer = tm < best_t
        t_out[:] = jnp.where(closer, tm, best_t).reshape(1, RAY_BLOCK // 128, 128)
        prim_out[:] = jnp.where(closer, pm, best_p).reshape(1, RAY_BLOCK // 128, 128)
        u_out[:] = jnp.where(closer, um, best_u).reshape(1, RAY_BLOCK // 128, 128)
        v_out[:] = jnp.where(closer, vm, best_v).reshape(1, RAY_BLOCK // 128, 128)

    if not cull:  # static: single-chunk scenes skip the packet test
        # occupancy gate: regeneration tails leave whole ray blocks dead
        # (t_max <= 0); skip their intersection outright
        alive = jnp.any(_row(tmax_r) > 0.0)
        pl.when(alive)(merge)

        @pl.when(~alive)
        def _():
            t_out[:] = best_t.reshape(1, RAY_BLOCK // 128, 128)
            prim_out[:] = best_p.reshape(1, RAY_BLOCK // 128, 128)
            u_out[:] = best_u.reshape(1, RAY_BLOCK // 128, 128)
            v_out[:] = best_v.reshape(1, RAY_BLOCK // 128, 128)
        return

    def write_current():  # keep the running best when this chunk is skipped
        t_out[:] = best_t.reshape(1, RAY_BLOCK // 128, 128)
        prim_out[:] = best_p.reshape(1, RAY_BLOCK // 128, 128)
        u_out[:] = best_u.reshape(1, RAY_BLOCK // 128, 128)
        v_out[:] = best_v.reshape(1, RAY_BLOCK // 128, 128)

    if n_super > 1:
        # level 2: test the SC_FACTOR-chunk group once; misses reduce the
        # whole group to one scalar branch per chunk. The group test also
        # carries the occupancy gate (dead ray blocks have t_max <= 0).
        @pl.when(j % SC_FACTOR == 0)
        def _():
            sc = j // SC_FACTOR
            sc_hit = jnp.any(best_t > 0.0) & _block_box_hit(
                cb_ref, n_super, sc, ox, oy, oz, dx, dy, dz, best_t,
                base=8 * n_chunks,
            )
            sc_scratch[0] = sc_hit.astype(jnp.int32)

        sc_ok = sc_scratch[0] > 0

        @pl.when(sc_ok)
        def _():
            hit_any = _block_box_hit(cb_ref, n_chunks, j, ox, oy, oz, dx, dy, dz, best_t)
            pl.when(hit_any)(merge)
            pl.when(~hit_any & first)(write_current)

        pl.when(~sc_ok & first)(write_current)
    else:
        hit_any = _block_box_hit(cb_ref, n_chunks, j, ox, oy, oz, dx, dy, dz, best_t)
        pl.when(hit_any)(merge)
        pl.when(~hit_any & first)(write_current)


def _occlude_kernel(cb_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tmax_r, ign_r,
                    *prim_refs, out_ref, sc_scratch, has_tri, has_sph, cull,
                    n_chunks, n_super):
    j = pl.program_id(1)
    ox, oy, oz = _row(ox_r), _row(oy_r), _row(oz_r)
    dx, dy, dz = _row(dx_r), _row(dy_r), _row(dz_r)
    tmax = _row(tmax_r)
    ignore_f = _row(ign_r)

    first = j == 0
    prev = jnp.where(first, 0.0, out_ref[:].reshape(1, -1))

    def merge():
        k_base = (j * PRIM_BLOCK).astype(jnp.float32)
        t, _, _, _ = _chunk_hits(prim_refs[:10], k_base, ox, oy, oz, dx, dy, dz,
                                 ignore_f, has_tri, has_sph)
        hit = jnp.any(t < tmax, axis=0, keepdims=True)
        out_ref[:] = jnp.where(hit, 1.0, prev).reshape(1, RAY_BLOCK // 128, 128)

    if not cull:
        alive = jnp.any(tmax > 0.0)
        pl.when(alive)(merge)

        @pl.when(~alive)
        def _():
            out_ref[:] = prev.reshape(1, RAY_BLOCK // 128, 128)
        return

    def write_current():
        out_ref[:] = prev.reshape(1, RAY_BLOCK // 128, 128)

    # skip the chunk unless an unblocked ray could hit its box within tmax
    limit = jnp.where(prev > 0.5, -1.0, tmax)
    if n_super > 1:
        @pl.when(j % SC_FACTOR == 0)
        def _():
            sc = j // SC_FACTOR
            sc_hit = jnp.any(limit > 0.0) & _block_box_hit(
                cb_ref, n_super, sc, ox, oy, oz, dx, dy, dz, limit,
                base=8 * n_chunks,
            )
            sc_scratch[0] = sc_hit.astype(jnp.int32)

        sc_ok = sc_scratch[0] > 0

        @pl.when(sc_ok)
        def _():
            hit_any = _block_box_hit(cb_ref, n_chunks, j, ox, oy, oz, dx, dy, dz, limit)
            pl.when(hit_any)(merge)
            pl.when(~hit_any & first)(write_current)

        pl.when(~sc_ok & first)(write_current)
    else:
        hit_any = _block_box_hit(cb_ref, n_chunks, j, ox, oy, oz, dx, dy, dz, limit)
        pl.when(hit_any)(merge)
        pl.when(~hit_any & first)(write_current)


def _ray_cols(o, d, t_max, ignore, n_pad):
    n = o.shape[0]

    def col(x, fill=0.0):
        """(n,) -> (n_pad/BR, BR): dense lane-major blocks, no tile padding."""
        x = jnp.asarray(x, jnp.float32)
        x = jnp.broadcast_to(x, (n,))
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(-1, RAY_BLOCK // 128, 128)

    return (
        col(o[:, 0]), col(o[:, 1]), col(o[:, 2]),
        col(d[:, 0]), col(d[:, 1]), col(d[:, 2], 1.0),
        # clamp to the INF sentinel: a t_max above it (e.g. jnp.inf) would
        # otherwise record phantom hits at t = INF
        col(jnp.minimum(jnp.asarray(t_max, jnp.float32), _INF), -1.0),
        col(ignore.astype(jnp.float32), -1.0),
    )


def _specs(g, padded_prims):
    # with scalar prefetch, index maps get the prefetch ref appended last
    grid = (g, max(1, padded_prims // PRIM_BLOCK))
    block_p = padded_prims if grid[1] == 1 else PRIM_BLOCK
    ray_spec = pl.BlockSpec((1, RAY_BLOCK // 128, 128), lambda i, j, cb: (i, 0, 0), memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec((1, block_p), lambda i, j, cb: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, RAY_BLOCK // 128, 128), lambda i, j, cb: (i, 0, 0), memory_space=pltpu.VMEM)
    return grid, ray_spec, prim_spec, out_spec


@functools.partial(jax.jit, static_argnames=("num_tris", "num_prims"))
def _trace_call(cols, prim_rows, chunk_bounds, super_bounds, num_tris, num_prims):
    g = cols[0].shape[0]  # ray blocks
    grid, ray_spec, prim_spec, out_spec = _specs(g, prim_rows[0].shape[1])
    cull = grid[1] > 1
    n_super = super_bounds.shape[1] if grid[1] > SC_FACTOR else 1
    kernel = functools.partial(
        _wrap_trace, has_tri=num_tris > 0, has_sph=num_prims > num_tris,
        cull=cull, n_chunks=grid[1], n_super=n_super,
    )
    out_shape = [jax.ShapeDtypeStruct((g, RAY_BLOCK // 128, 128), jnp.float32)] * 4
    params = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))
    if cull:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # chunk (+superchunk) AABBs in SMEM
            grid=grid,
            in_specs=[ray_spec] * 8 + [prim_spec] * 10,
            out_specs=[out_spec] * 4,
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )
        table = jnp.concatenate([chunk_bounds.reshape(-1), super_bounds.reshape(-1)])
        t, p, u, v = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=params, interpret=_interpret(),
        )(table, *cols, *prim_rows)
    else:  # single chunk: no prefetch machinery at all (fast path)
        simple = lambda f: pl.BlockSpec(f.block_shape, lambda i, j: f.index_map(i, j, None), memory_space=pltpu.VMEM)
        t, p, u, v = pl.pallas_call(
            functools.partial(kernel, _NO_CB),
            grid=grid,
            in_specs=[simple(ray_spec)] * 8 + [simple(prim_spec)] * 10,
            out_specs=[simple(out_spec)] * 4,
            out_shape=out_shape,
            compiler_params=params, interpret=_interpret(),
        )(*cols, *prim_rows)
    return t.reshape(-1), p.reshape(-1), u.reshape(-1), v.reshape(-1)


_NO_CB = None  # placeholder cb_ref for the no-culling fast path


def _wrap_trace(*refs, has_tri, has_sph, cull, n_chunks, n_super):
    ins, outs = refs[:19], refs[19:23]
    scratch = refs[23] if cull else None
    _trace_kernel(
        ins[0], *ins[1:9], *ins[9:19],
        t_out=outs[0], prim_out=outs[1], u_out=outs[2], v_out=outs[3],
        sc_scratch=scratch,
        has_tri=has_tri, has_sph=has_sph, cull=cull, n_chunks=n_chunks,
        n_super=n_super,
    )


def _wrap_occlude(*refs, has_tri, has_sph, cull, n_chunks, n_super):
    ins, out = refs[:19], refs[19]
    scratch = refs[20] if cull else None
    _occlude_kernel(ins[0], *ins[1:9], *ins[9:19], out_ref=out,
                    sc_scratch=scratch,
                    has_tri=has_tri, has_sph=has_sph, cull=cull,
                    n_chunks=n_chunks, n_super=n_super)


@functools.partial(jax.jit, static_argnames=("num_tris", "num_prims"))
def _occlude_call(cols, prim_rows, chunk_bounds, super_bounds, num_tris, num_prims):
    g = cols[0].shape[0]  # ray blocks
    grid, ray_spec, prim_spec, out_spec = _specs(g, prim_rows[0].shape[1])
    cull = grid[1] > 1
    n_super = super_bounds.shape[1] if grid[1] > SC_FACTOR else 1
    kernel = functools.partial(
        _wrap_occlude, has_tri=num_tris > 0, has_sph=num_prims > num_tris,
        cull=cull, n_chunks=grid[1], n_super=n_super,
    )
    out_shape = jax.ShapeDtypeStruct((g, RAY_BLOCK // 128, 128), jnp.float32)
    params = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))
    if cull:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[ray_spec] * 8 + [prim_spec] * 10,
            out_specs=out_spec,
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )
        table = jnp.concatenate([chunk_bounds.reshape(-1), super_bounds.reshape(-1)])
        blocked = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=params, interpret=_interpret(),
        )(table, *cols, *prim_rows)
    else:
        simple = lambda f: pl.BlockSpec(f.block_shape, lambda i, j: f.index_map(i, j, None), memory_space=pltpu.VMEM)
        blocked = pl.pallas_call(
            functools.partial(kernel, _NO_CB),
            grid=grid,
            in_specs=[simple(ray_spec)] * 8 + [simple(prim_spec)] * 10,
            out_specs=simple(out_spec),
            out_shape=out_shape,
            compiler_params=params, interpret=_interpret(),
        )(*cols, *prim_rows)
    return blocked.reshape(-1)


def _has_reorder(soa: PrimSoA) -> bool:
    return soa.padded > PRIM_BLOCK  # identity order otherwise


def _sorted_ignore(soa: PrimSoA, ignore):
    if not _has_reorder(soa):
        return ignore
    ig = soa.inv_order[jnp.maximum(ignore, 0)]
    return jnp.where(ignore >= 0, ig, -1)


def intersect_pallas(geom: FlatGeometry, soa: PrimSoA, o, d, t_max, ignore) -> Hit:
    """Closest-hit over all primitives via the tiled VMEM kernel."""
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    cols = _ray_cols(o, d, t_max, _sorted_ignore(soa, ignore), n_pad)
    t, p, u, v = _trace_call(
        cols, tuple(soa[:10]), soa.chunk_bounds, soa.super_bounds,
        soa.num_tris, soa.num_prims,
    )
    t, p, u, v = t[:n], p[:n], u[:n], v[:n]
    if _has_reorder(soa):
        sorted_id = jnp.clip(p, 0.0, soa.num_prims - 1).astype(jnp.int32)
        prim = jnp.where(p >= 0.0, soa.order[sorted_id], -1)  # original ids
    else:
        prim = jnp.where(p >= 0.0, p, -1.0).astype(jnp.int32)
    found = prim >= 0
    # Hit.uv carries triangle barycentrics only; sphere uv parameterization
    # happens in interact() from the packed shading row (computing it here
    # cost two full-width small-table gathers per trace — 30% of a frame)
    uv = jnp.stack([u, v], axis=-1)
    return Hit(t=jnp.where(found, t, INF), prim=jnp.where(found, prim, -1), uv=uv)


def occlude_pallas(geom: FlatGeometry, soa: PrimSoA, o, d, t_max, ignore) -> jax.Array:
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    cols = _ray_cols(o, d, t_max, _sorted_ignore(soa, ignore), n_pad)
    blocked = _occlude_call(
        cols, tuple(soa[:10]), soa.chunk_bounds, soa.super_bounds,
        soa.num_tris, soa.num_prims,
    )
    return blocked[:n] > 0.5
